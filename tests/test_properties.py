"""Property-based invariants (hypothesis) — SURVEY.md §5.2 #3.

Few examples per property (each example runs Spark jobs); the properties
themselves are the point: they hold for ANY graph, not just fixtures.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph import algorithms, build

SETTINGS = dict(max_examples=8, deadline=None)

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=20,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_symmetrize_properties(spark, pairs):
    sym = build.symmetrize(_df(spark, pairs), dedup=True)
    rows = {(r.src, r.dst) for r in sym.collect()}
    assert all(a != b for a, b in rows)              # no self loops
    assert all((b, a) in rows for a, b in rows)      # closed under reversal
    covered = {tuple(sorted(p)) for p in pairs}
    got = {tuple(sorted(p)) for p in rows}
    assert got == covered                            # exactly the input edges


@given(pairs=edge_lists, sample=st.sets(st.integers(0, 12), max_size=8))
@settings(**SETTINGS)
def test_induced_subgraph_equals_brute_force(spark, pairs, sample):
    e = _df(spark, pairs)
    s = spark.createDataFrame([(int(x),) for x in sample] or [(-1,)], "id long")
    got = {(r.src, r.dst) for r in build.induced_subgraph(e, s).collect()}
    expected = {(a, b) for a, b in set(pairs) if a in sample and b in sample}
    assert got == expected


@given(
    labels=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-50, 50)),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_dense_rekey_is_order_preserving_bijection(spark, labels):
    df = spark.createDataFrame(
        [(int(i), int(l)) for i, l in labels], "id long, label long"
    )
    out = {r.id: r.label for r in algorithms.dense_rekey(df).collect()}
    orig = dict(labels)
    # dense: exactly 0..k-1
    k = len(set(orig.values()))
    assert set(out.values()) == set(range(k))
    # same grouping and same relative order
    for i1, l1 in orig.items():
        for i2, l2 in orig.items():
            assert (out[i1] == out[i2]) == (l1 == l2)
            assert (out[i1] < out[i2]) == (l1 < l2)


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_cc_simple_equals_twophase(spark, pairs):
    e = _df(spark, pairs)
    a = {r.id: r.component for r in algorithms.connected_components(e).collect()}
    b = {
        r.id: r.component
        for r in algorithms.connected_components_twophase(e).collect()
    }
    assert a == b


event_logs = st.lists(
    st.tuples(
        st.integers(0, 5),                   # user
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(0, 1000),                # minute offset
    ),
    min_size=1,
    max_size=25,
)


@given(rows=event_logs)
@settings(**SETTINGS)
def test_funnel_counts_monotone_nonincreasing(spark, rows):
    """For ANY event log, ordered-funnel counts can only shrink step to
    step, and step-1 equals the distinct users with that event type."""
    import datetime

    from sna_pyspark_graphframes_spark.operators import events as oevents

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, u, t, base + datetime.timedelta(minutes=m))
            for i, (u, t, m) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {r.step_idx: r.n_users for r in oevents.funnel(ev).collect()}
    assert got[1] >= got[2] >= got[3]
    assert got[1] == len({u for u, t, _ in rows if t == "view"})


@given(rows=event_logs)
@settings(**SETTINGS)
def test_latest_by_key_idempotent_and_complete(spark, rows):
    """Compaction is idempotent (latest of latest = latest) and keeps
    exactly one row per key."""
    import datetime

    from sna_pyspark_graphframes_spark.operators import relational

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, u, t, base + datetime.timedelta(minutes=m))
            for i, (u, t, m) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    once = relational.latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    twice = relational.latest_by_key(once, ["user_id"], ["ts", "event_id"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert len(a) == len({u for u, _, _ in rows})


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_hindex_cores_match_peel(spark, pairs):
    """The iterated-h-index fixed point equals the peel decomposition on
    ANY graph (the theorem, exercised)."""
    peel = {
        r.id: r.core for r in algorithms.core_numbers(_df(spark, pairs)).collect()
    }
    hx = {
        r.id: r.core
        for r in algorithms.core_numbers_hindex(_df(spark, pairs)).collect()
    }
    assert hx == peel


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_harmonic_bounds(spark, pairs):
    """0 < harmonic(v) <= n-1 for every vertex of any (nonempty) graph."""
    df = _df(spark, pairs)
    out = algorithms.harmonic_centrality(df).collect()
    n = len({v for p in pairs for v in p})
    for r in out:
        assert 0 < r.harmonic <= n - 1 + 1e-9


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_hits_matches_python_mirror(spark, pairs):
    """HITS on ANY directed graph equals the pure-Python mirror of the
    same normalize+round schedule (r7) — and hub/auth are L2-unit up to
    the 6-dp rounding."""
    n_iter = 2
    out = {
        r.id: (r.hub, r.auth)
        for r in algorithms.hits(_df(spark, pairs), n_iter=n_iter).collect()
    }
    edges = sorted({(a, b) for a, b in pairs})
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: 1.0 for v in verts}
    auth = {}
    for _ in range(n_iter):
        ra = {v: sum(hub[u] for u, w in edges if w == v) for v in verts}
        nrm = sum(x * x for x in ra.values()) ** 0.5
        auth = {v: round(ra[v] / nrm, 6) for v in verts}
        rh = {u: sum(auth[w] for x, w in edges if x == u) for u in verts}
        nrm = sum(x * x for x in rh.values()) ** 0.5
        hub = {u: round(rh[u] / nrm, 6) for u in verts}
    assert set(out) == set(verts)
    for v in verts:
        assert abs(out[v][0] - hub[v]) < 2e-6, (v, out[v], hub[v])
        assert abs(out[v][1] - auth[v]) < 2e-6, (v, out[v], auth[v])
    for i in (0, 1):
        s = sum(out[v][i] ** 2 for v in verts)
        assert abs(s - 1.0) < 1e-3


docs_lists = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=0, max_size=6
    ),
    min_size=1,
    max_size=6,
)


@given(docs=docs_lists)
@settings(**SETTINGS)
def test_duplicate_ngram_coverage_matches_brute_force(spark, docs):
    """dup-trigram coverage on ANY tiny corpus equals the brute-force
    Python computation over per-doc distinct trigrams (r7)."""
    from sna_pyspark_graphframes_spark.functions import dedup as fdedup

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_ngrams, r.dup_ngram_frac)
        for r in fdedup.duplicate_ngram_coverage(df, n=3).collect()
    }
    # brute force; NB empty text tokenizes to [""] (split semantics)
    grams = {
        i: {
            " ".join((words or [""])[j : j + 3])
            for j in range(len(words or [""]) - 2)
        }
        for i, words in enumerate(docs)
    }
    for i, g in grams.items():
        dup = sum(
            1 for x in g if any(x in g2 for j, g2 in grams.items() if j != i)
        )
        assert out[i][0] == len(g), (i, docs)
        expect = round(dup / len(g), 4) if g else 0.0
        assert abs(out[i][1] - expect) < 1e-9, (i, docs)


@given(pairs=edge_lists, seeds=st.sets(st.integers(0, 12), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_label_spreading_bounded_and_seed_faithful(spark, pairs, seeds):
    """Scores stay in [0, 1] for every vertex; a seed vertex always
    retains ≥ (1−α) mass on its own class (the Y term re-injects it
    every round)."""
    e = _df(spark, pairs)
    seed_df = spark.createDataFrame(
        [(int(s), int(s) % 2) for s in seeds], "id long, class int"
    )
    out = algorithms.label_spreading(e, seed_df, n_classes=2, alpha=0.8)
    rows = {r.id: r for r in out.collect()}
    for r in rows.values():
        assert -1e-9 <= r.f0 <= 1.0 + 1e-9
        assert -1e-9 <= r.f1 <= 1.0 + 1e-9
    for s in seeds:
        if s in rows:  # seed present in the graph
            own = rows[s].f0 if s % 2 == 0 else rows[s].f1
            assert own >= 0.2 - 1e-6  # (1-alpha) re-injection floor


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),            # user
            st.integers(0, 30),           # ts offset (seconds)
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=2,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_markov_transitions_match_brute_force(spark, rows):
    """Counts equal the sequential per-user bigram counts under the
    (ts, event_id) order, and per-from probabilities sum to ~1."""
    from sna_pyspark_graphframes_spark.operators import events as oevents

    data = [
        (i, f"2024-01-01 00:00:{ts:02d}", u, t)
        for i, (u, ts, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.from_type, r.to_type): r.n
        for r in oevents.markov_transitions(df).collect()
    }
    # brute force: per user, order by (ts, event_id)
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for i, (u, ts, t) in enumerate(rows):
        seqs[u].append((ts, i, t))
    want = Counter()
    for u, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    assert got == dict(want)
    # per-from probability mass ~1 (rounding at 6 dp per cell)
    from collections import defaultdict as dd

    mass = dd(float)
    for r in oevents.markov_transitions(df).collect():
        mass[r.from_type] += r.p
    for v in mass.values():
        assert abs(v - 1.0) < 1e-4


@given(
    rows=st.lists(
        st.tuples(
            st.floats(-3, 3, allow_nan=False),
            st.floats(-3, 3, allow_nan=False),
        ),
        min_size=4,
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_linreg_label_shift_moves_only_intercept(spark, rows):
    """OLS equivariance: y → y + c changes the intercept by ~c and the
    slope not at all — up to the 6-dp mean rounding, which the solve
    amplifies by the Gram condition number (linreg_normal's documented
    conditioning contract). The generator is therefore bounded away
    from near-singular designs: VERDICT r13 found x=[0,0,0,0.0625]
    (var(x) ≈ 7e-4, κ large enough that the 5e-7 quantization moved
    the slope by 6.6e-4, over the 5e-4 tolerance). Requiring
    var(x) ≥ 0.05 keeps κ·5e-7 well under 5e-4 for |x| ≤ 3."""
    import pytest as _pt
    from hypothesis import assume

    data = [(x, 0.5 + 1.5 * x + 0.1 * (i % 3)) for i, (x, _) in enumerate(rows)]
    xs = [x for x, _ in data]
    mx = sum(xs) / len(xs)
    assume(sum((x - mx) ** 2 for x in xs) / len(xs) >= 0.05)
    from sna_pyspark_graphframes_spark.functions import ml

    df = spark.createDataFrame(data, "x double, y double")
    w0 = ml.linreg_normal(df, ["x"], "y")
    if w0 == [0.0, 0.0]:  # degenerate/singular draw
        return
    c = 2.5
    df2 = df.select("x", (F.col("y") + c).alias("y"))
    w1 = ml.linreg_normal(df2, ["x"], "y")
    assert w1[1] == _pt.approx(w0[1], abs=5e-4)
    assert w1[0] == _pt.approx(w0[0] + c, abs=5e-4)


texts = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=20), min_size=1, max_size=8
)


@given(ta=texts, tb=texts)
@settings(max_examples=10, deadline=None)
def test_token_kl_properties(spark, ta, tb):
    """Gibbs: KL ≥ 0 both directions (0 iff the smoothed distributions
    coincide); JS bounded by ln 2; swapping the slices transposes
    kl_ab/kl_ba and fixes js."""
    import math

    from sna_pyspark_graphframes_spark.functions import corpus

    def df(ts):
        return spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")

    a, b = df(ta), df(tb)
    r = corpus.token_kl_drift(a, b).collect()[0]
    if not r.vocab:  # all-whitespace corpora: no tokens, no distribution
        return
    assert r.kl_ab >= 0 and r.kl_ba >= 0
    assert 0 <= r.js <= math.log(2) + 1e-9
    s = corpus.token_kl_drift(b, a).collect()[0]
    assert (s.kl_ab, s.kl_ba, s.js) == (r.kl_ba, r.kl_ab, r.js)
    assert (s.n_tokens_a, s.n_tokens_b) == (r.n_tokens_b, r.n_tokens_a)


@given(
    labels=st.lists(st.integers(0, 2), min_size=4, max_size=20),
    seed=st.integers(0, 5),
)
@settings(max_examples=10, deadline=None)
def test_nearest_centroid_confusion_partitions_input(spark, labels, seed):
    """The confusion matrix is a partition of the input: cell counts
    sum to |rows|, and per-true-label row sums equal the label counts."""
    import random

    from sna_pyspark_graphframes_spark.functions import ml

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)], lab)
        for i, lab in enumerate(labels)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cm = ml.nearest_centroid_confusion(df).collect()
    assert sum(r.n for r in cm) == len(labels)
    from collections import Counter

    want = Counter(labels)
    got = Counter()
    for r in cm:
        got[r.label] += r.n
    assert got == {k: v for k, v in want.items()}


@given(
    xs=st.lists(st.integers(0, 8), min_size=1, max_size=15),
    ys=st.lists(st.integers(0, 8), min_size=1, max_size=15),
)
@settings(max_examples=10, deadline=None)
def test_ks_statistic_properties(spark, xs, ys):
    """KS is symmetric (D(a,b) = D(b,a)), bounded in [0,1], zero iff
    the empirical distributions coincide, and matches a brute-force
    ECDF evaluation."""
    from sna_pyspark_graphframes_spark.operators import relational

    def df(vs):
        return spark.createDataFrame([(float(v),) for v in vs], "x double")

    r = relational.ks_statistic(df(xs), df(ys), "x").collect()[0]
    s = relational.ks_statistic(df(ys), df(xs), "x").collect()[0]
    assert (r.ks_num, r.ks) == (s.ks_num, s.ks)
    assert 0.0 <= r.ks <= 1.0
    # brute force over the pooled support
    na, nb = len(xs), len(ys)
    want = max(
        abs(sum(x <= v for x in xs) * nb - sum(y <= v for y in ys) * na)
        for v in set(xs) | set(ys)
    )
    assert r.ks_num == want
    assert r.ks == round(want / (na * nb), 6)
    if sorted(xs) == sorted(ys):
        assert r.ks == 0.0


@given(
    vals=st.lists(st.integers(0, 20), min_size=1, max_size=40),
    parts=st.integers(1, 9),
)
@settings(max_examples=10, deadline=None)
def test_range_prefix_sums_match_single_window(spark, vals, parts):
    """The distributed prefix-sum engine must equal a plain ordered
    cumsum for ANY partition count (the offsets stitch exactly)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sna_pyspark_graphframes_spark.operators import relational

    df = spark.createDataFrame(
        [(float(v), 1) for v in vals], "v double, c long"
    )
    g = df.groupBy("v").agg(F.sum("c").alias("c"))
    cum, totals = relational.range_prefix_sums(g, "v", ["c"], parts)
    got = {r.v: r.cum_c for r in cum.collect()}
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.v: r.cc
        for r in g.select("v", F.sum("c").over(w).alias("cc")).collect()
    }
    assert got == want
    assert totals["c"] == len(vals)


@given(
    plan=st.lists(
        st.tuples(st.integers(0, 6), st.booleans()), min_size=1, max_size=12
    )
)
@settings(max_examples=10, deadline=None)
def test_kaplan_meier_invariants(spark, plan):
    """For ANY cohort (duration, converted?) plan: survival starts ≤ 1,
    is non-increasing over duration, n_risk is strictly decreasing,
    and Σ(n_events + n_censored) = cohort size."""
    from datetime import datetime, timedelta

    from sna_pyspark_graphframes_spark.operators import temporal

    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid, (days, converted) in enumerate(plan, start=1):
        eid += 1
        rows.append((eid, uid, "view", base))
        eid += 1
        rows.append(
            (eid, uid, "purchase" if converted else "click",
             base + timedelta(days=days))
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = sorted(
        temporal.kaplan_meier(df).collect(), key=lambda r: r.duration_days
    )
    assert sum(r.n_events + r.n_censored for r in out) == len(plan)
    surv = [r.survival for r in out]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    risks = [r.n_risk for r in out]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    assert risks[0] == len(plan)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 40)),
        min_size=4,
        max_size=30,
    ).filter(lambda r: len({g for g, _ in r}) == 2)
)
@settings(**SETTINGS)
def test_mann_whitney_u_sum_identity(spark, rows):
    """U_a + U_b = n_a * n_b exactly (the textbook identity), for any
    data with any tie structure — and the tie term matches the brute
    count."""
    from collections import Counter

    from sna_pyspark_graphframes_spark.operators import relational

    df = spark.createDataFrame(
        [("a" if g else "b", float(v)) for g, v in rows],
        "g string, v double",
    )
    ra = relational.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    rb = relational.mann_whitney_u(df, "v", "g", "b", "a").collect()[0]
    assert ra.u2_a + rb.u2_a == 2 * ra.n_a * ra.n_b
    ties = Counter(v for _, v in rows)
    assert ra.tie_sum == sum(t**3 - t for t in ties.values())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=3,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_spearman_bounds_and_monotone_map_invariance(spark, rows):
    """ρ_s ∈ [−1, 1]; applying a strictly increasing map to either
    column leaves it EXACTLY unchanged (ranks are invariant), and
    swapping the columns leaves it unchanged (symmetry)."""
    from sna_pyspark_graphframes_spark.operators import relational

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in rows], "x double, y double"
    )
    r = relational.spearman_corr(df, "x", "y").collect()[0]
    if r.spearman is not None:
        assert -1.0 <= r.spearman <= 1.0
    mapped = df.select(
        (F.col("x") * 3 + 7).alias("x"), F.exp(F.col("y")).alias("y")
    )
    rm = relational.spearman_corr(mapped, "x", "y").collect()[0]
    assert rm.spearman == r.spearman and rm.srxy2 == r.srxy2
    rs = relational.spearman_corr(df, "y", "x").collect()[0]
    assert rs.spearman == r.spearman


@given(
    xs=st.lists(st.integers(0, 25), min_size=2, max_size=30),
    shift=st.integers(-5, 5),
)
@settings(**SETTINGS)
def test_cusum_shift_invariance_exact(spark, xs, shift):
    """Adding a constant c to every series value leaves the CUSUM
    statistic and its argmax EXACTLY unchanged: n·cum_x grows by
    n·t·c and t·Σx by t·n·c — the integer reshape cancels them
    bit-for-bit, not approximately."""
    from sna_pyspark_graphframes_spark.operators import relational

    base = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i long, x long"
    )
    shifted = base.select("i", (F.col("x") + shift).alias("x"))
    a = relational.cusum_changepoint(base, "i", "x").collect()[0]
    b = relational.cusum_changepoint(shifted, "i", "x").collect()[0]
    assert (a.cusum_num, a.t_star, a.idx_star) == (
        b.cusum_num,
        b.t_star,
        b.idx_star,
    )


@given(vals=st.lists(st.integers(1, 10**9), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_benford_partition_of_unity(spark, vals):
    """The 9 digit rows always partition the input: Σ observed = n,
    every positive value lands in exactly one digit class, and the
    expected probabilities sum to 1 (log10 telescoping)."""
    from sna_pyspark_graphframes_spark.operators import relational

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = relational.benford_digits(df, "v").collect()
    assert len(out) == 9
    assert sum(r.observed for r in out) == len(vals)
    assert sum(r.observed for r in out if str(abs(vals[0]))[0] == str(r.digit)) >= 0
    assert abs(sum(r.expected_p for r in out) - 1.0) < 1e-4
    brute = {d: 0 for d in range(1, 10)}
    for v in vals:
        brute[int(str(v)[0])] += 1
    assert {r.digit: r.observed for r in out} == brute


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 15)),
        min_size=4,
        max_size=30,
    ).filter(
        lambda r: len({g for g, _ in r}) == 2
        and min(sum(1 for g, _ in r if g == k) for k in (0, 1)) >= 2
    )
)
@settings(**SETTINGS)
def test_welch_antisymmetry_and_scale(spark, rows):
    """Swapping the groups flips t's sign exactly (same |t|, same df);
    t is invariant under adding a constant to every value."""
    from sna_pyspark_graphframes_spark.operators import relational

    df = spark.createDataFrame(
        [("a" if g else "b", float(v)) for g, v in rows],
        "g string, v double",
    )
    r1 = relational.welch_ttest(df, "v", "g", "a", "b").collect()[0]
    r2 = relational.welch_ttest(df, "v", "g", "b", "a").collect()[0]
    if r1.t_stat is not None:
        assert abs(r1.t_stat + r2.t_stat) <= 1e-4
        assert r1.df_welch == r2.df_welch
    shifted = df.select("g", (F.col("v") + 100).alias("v"))
    r3 = relational.welch_ttest(shifted, "v", "g", "a", "b").collect()[0]
    if r1.t_stat is not None:
        assert abs(r1.t_stat - r3.t_stat) <= 1e-3


@given(
    plan=st.lists(
        st.tuples(
            st.integers(0, 1),   # cohort
            st.integers(0, 6),   # duration days
            st.booleans(),       # converted?
        ),
        min_size=2,
        max_size=16,
    ).filter(lambda r: len({c for c, _, _ in r}) == 2)
)
@settings(**SETTINGS)
def test_logrank_cohort_swap_symmetry(spark, plan):
    """Swapping the cohort labels leaves χ² (and Σv) unchanged:
    O₂ − E₂ = −(O₁ − E₁) at every event time, so the squared statistic
    is cohort-symmetric."""
    import datetime as dt

    from sna_pyspark_graphframes_spark.operators import temporal

    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid, (cohort, days, conv) in enumerate(plan):
        u = uid * 2 + cohort  # parity encodes the cohort
        rows.append((u, "view", base))
        rows.append(
            (u, "purchase" if conv else "view", base + dt.timedelta(days=days))
        )
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    a = temporal.logrank_test(ev, F.col("uid") % 2 == 0).collect()[0]
    b = temporal.logrank_test(ev, F.col("uid") % 2 == 1).collect()[0]
    assert (a.n_1, a.n_2) == (b.n_2, b.n_1)
    assert a.var_sum == b.var_sum
    if a.chi2 is not None:
        assert b.chi2 is not None and abs(a.chi2 - b.chi2) <= 1e-4


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 15), st.integers(1, 9)),
        min_size=1,
        max_size=25,
    ),
    qx=st.lists(
        st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
@settings(**SETTINGS)
def test_weighted_quantiles_match_brute_force(spark, rows, qx):
    """Nearest-rank weighted quantile == the brute-force scan of the
    weight-expanded sorted list, for any weights and any q."""
    from sna_pyspark_graphframes_spark.operators import relational

    df = spark.createDataFrame(
        [(float(v), w) for v, w in rows], "v double, w int"
    )
    out = {r.q: r for r in relational.weighted_quantiles(
        df, "v", "w", qs=list(qx)).collect()}
    expanded = sorted(v for v, w in rows for _ in range(w))
    W = len(expanded)
    for q in qx:
        # smallest value whose cumulative weight >= q*W
        target = q * W
        cum = 0
        want = None
        for v in expanded:
            cum += 1
            if cum >= target:
                want = v
                break
        assert out[q].value == want and out[q].total_weight == W


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 30)),
        min_size=2,
        max_size=30,
    ).filter(lambda r: len({g for g, _ in r}) == 2)
)
@settings(**SETTINGS)
def test_quantile_normalize_order_preserving_and_pooled(spark, rows):
    """Within each group the mapping is monotone (order preserved) and
    every v_norm is an actual pooled data value."""
    from sna_pyspark_graphframes_spark.operators import relational

    df = spark.createDataFrame(
        [("g" + str(g), float(v)) for g, v in rows], "g string, v double"
    )
    out = relational.quantile_normalize(df, "v", "g", n_bins=4).collect()
    pooled = {float(v) for _, v in rows}
    by_g = {}
    for r in out:
        assert r.v_norm in pooled
        by_g.setdefault(r.g, []).append((r.v, r.v_norm))
    for pairs in by_g.values():
        pairs.sort()
        norms = [n for _, n in pairs]
        assert norms == sorted(norms)
