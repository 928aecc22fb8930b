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

import itertools
import os

from pyspark.sql import DataFrame

# Loop-body plan capture (r15, VERDICT r14 Next #5): the per-round frames
# of the iterative algorithms execute inside collect()/count() actions and
# never appear in the returned frame's plan — the committed before/after
# "evidence" for loop queries was a vacuous 1-line Scan ExistingRDD. When
# ``SPARK_GRAFT_LOOP_PLAN_DIR`` is set (tools/profile_query.py --loop-plans
# sets it per query), every frame passed through ``checkpointed`` — i.e.
# each superstep's state, exactly where the loop optimizations live — has
# its ``explain("formatted")`` text written to that directory, numbered in
# call order. Zero overhead when unset (one env read per call).
_CAPTURE_SEQ = itertools.count()


def _capture_plan(df: DataFrame) -> None:
    cap_dir = os.environ.get("SPARK_GRAFT_LOOP_PLAN_DIR")
    if not cap_dir:
        return
    try:
        txt = df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        os.makedirs(cap_dir, exist_ok=True)
        with open(
            os.path.join(cap_dir, f"ckpt_{next(_CAPTURE_SEQ):03d}.txt"), "w"
        ) as f:
            f.write(txt)
    except Exception:
        pass  # diagnostics only — never fail the algorithm


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
    _capture_plan(df)
    if eager_reliable:
        return df.checkpoint(eager=not lazy)
    return df.localCheckpoint(eager=not lazy)
