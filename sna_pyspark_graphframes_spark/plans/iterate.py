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


def checkpointed(df: DataFrame, eager_reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and return a lineage-free frame."""
    if eager_reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def cadence(every: int = 3):
    """Checkpoint every ``every``-th call instead of every superstep.

    For fixed-iteration loops with NO per-round driver action (pagerank,
    LPA), materializing each superstep is pure overhead: one eager job +
    one block-store round-trip per iteration. Skipping to every k-th lets
    one job compute k chained supersteps — same arithmetic, 1/k of the
    materializations (VERDICT.md round 1, Next #6). Plans grow between
    checkpoints (LPA references the previous frame twice → ~2^k nodes), so
    k stays small.

    NOT for loops with per-round convergence checks (CC/SCC/SSSP/BFS):
    their count()/isEmpty() action would recompute every unmaterialized
    superstep from the last checkpoint each round — net loss.

    ALSO not for loops whose per-round state is BROADCAST
    (``algorithms._state_hinted`` when |V| fits the broadcast bound):
    building the broadcast relation executes the state plan, so every
    skipped checkpoint is re-run by each later round's broadcast — and
    for loops that reference the state twice per superstep the
    re-execution compounds exponentially. Measured at sf0.1 (LPA on the
    co-purchase graph): k=3 ran 16-33 s vs 4-10 s at k=1 once the
    broadcast hint landed. ``algorithms._state_cadence`` encodes the
    rule: broadcast-sized state or multiply-referenced state → k=1;
    shuffle-hash state → k=3.

    Returns ``ckpt(df, force=False)``; pass ``force=True`` on the final
    iteration so callers always receive a materialized, lineage-free frame.
    """
    state = {"n": 0}

    def ckpt(df: DataFrame, force: bool = False) -> DataFrame:
        state["n"] += 1
        if force or state["n"] % every == 0:
            return df.localCheckpoint(eager=True)
        return df

    return ckpt
