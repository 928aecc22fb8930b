"""Iteration hygiene for DataFrame-loop algorithms.

Iterative algorithms (LPA, connected components, BFS) re-derive a DataFrame
from itself each round; without truncation the Catalyst plan doubles per
iteration and analysis time explodes (SURVEY.md §4.1 "iterative-plan
hygiene", §7.4 #1). ``checkpointed`` materializes the frame and truncates
lineage every call.

``localCheckpoint`` keeps blocks on executors (no HDFS requirement) —
correct for local mode and acceptable on clusters with reliable executors;
flip ``eager_reliable=True`` (+ ``spark.sparkContext.setCheckpointDir``)
for fault-tolerant checkpoints on a real 1000-executor run where
recomputing 50 iterations on executor loss is worse than the HDFS write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpointed(
    df: DataFrame, eager_reliable: bool = False, lazy: bool = False
) -> DataFrame:
    """Materialize ``df`` and return a lineage-free frame.

    ``lazy=True`` marks the frame for checkpointing but defers
    materialization to the CALLER'S next action — for loops that read a
    driver scalar off the freshly-truncated state anyway (HITS L2 norm,
    PageRank delta), the scalar read and the checkpoint write then share
    ONE job instead of two (VERDICT r7 Next #5). The caller must run an
    action before deriving further lineage from the result."""
    if eager_reliable:
        return df.checkpoint(eager=not lazy)
    return df.localCheckpoint(eager=not lazy)
