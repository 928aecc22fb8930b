"""Guard the session-memo pattern (VERDICT r14 Next #10).

The registry's cross-query memos (``_MEMO_CACHE``, ``_COPURCHASE_CACHE``,
``_OBJ_MEMO``) are legitimate redundant-work elimination ONLY because
``bench.py`` clears them between reps — every rep re-pays the build cost a
fresh session would. A future module-level cache that dodges
``clear_session_caches`` would silently persist results across reps and
turn the pattern into result-caching (gaming). These tests introspect the
module so the NEXT cache dict is covered automatically: adding one without
wiring it into the clear hook fails here, no Spark session needed.
"""

from __future__ import annotations

import sna_pyspark_graphframes_spark.registry as registry

# The one sanctioned exemption: deterministic reference trajectories that
# certify production runs (computed once per graph version in a real
# deployment — VERDICT r11 Next #4). It must still be emptied by the
# session-teardown hook ``clear_twin_memo``.
_EXEMPT_FROM_REP_CLEAR = {"_TWIN_MEMO"}


def _cache_dicts() -> dict[str, dict]:
    """Every module-level dict in the registry whose name marks it as a
    memo/cache. Naming is the contract: session caches in this module are
    ``_UPPER_SNAKE`` dicts containing MEMO or CACHE (all three existing
    ones do); a new cache following the house style is auto-covered."""
    found = {}
    for name, obj in vars(registry).items():
        if (
            isinstance(obj, dict)
            and name.startswith("_")
            and name == name.upper()
            and ("MEMO" in name or "CACHE" in name)
        ):
            found[name] = obj
    return found


def test_known_caches_discovered():
    names = set(_cache_dicts())
    # the three the bench contract depends on + the exempt twin memo —
    # if one is renamed this must be updated in the same commit as
    # bench.py's clear call
    assert {"_MEMO_CACHE", "_COPURCHASE_CACHE", "_OBJ_MEMO", "_TWIN_MEMO"} <= names


def test_clear_session_caches_empties_every_rep_cache():
    caches = _cache_dicts()
    saved = {n: dict(c) for n, c in caches.items()}
    try:
        for name, c in caches.items():
            c["__guard_sentinel__"] = object()
        registry.clear_session_caches()
        leaked = [
            n
            for n, c in caches.items()
            if n not in _EXEMPT_FROM_REP_CLEAR and len(c) > 0
        ]
        assert not leaked, (
            f"clear_session_caches() left {leaked} populated — wire the new "
            "cache into the clear hook or bench reps will serve stale results"
        )
        # the exempt twin memo must keep its entries across rep clears
        # (that IS its contract) ...
        for n in _EXEMPT_FROM_REP_CLEAR:
            assert "__guard_sentinel__" in caches[n]
    finally:
        for n, c in caches.items():
            c.clear()
            c.update(saved[n])


def test_clear_twin_memo_empties_the_exempt_cache():
    saved = dict(registry._TWIN_MEMO)
    try:
        registry._TWIN_MEMO["__guard_sentinel__"] = object()
        registry.clear_twin_memo()
        assert len(registry._TWIN_MEMO) == 0, (
            "clear_twin_memo() must empty _TWIN_MEMO (session teardown owns "
            "its eviction)"
        )
    finally:
        registry._TWIN_MEMO.clear()
        registry._TWIN_MEMO.update(saved)
