"""Hand-computed golden values on the micro-graphs from FIXTURES.md §4 —
the correctness contract for the non-SQL-expressible operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph import algorithms, build, metrics


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


TRI_PLUS_TAIL = [(1, 2), (2, 3), (1, 3), (3, 4)]
TWO_CLIQUES_BRIDGE = (
    [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    + [(4, 5)]
)
DISCONNECTED = [(1, 2), (3, 4)]
STAR5 = [(0, i) for i in range(1, 6)]
PATH4 = [(1, 2), (2, 3), (3, 4)]
TWO_TRIANGLES = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]


def as_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


class TestDegreesAndTriangles:
    def test_degrees(self, spark):
        deg = as_map(metrics.degrees(edges_df(spark, TRI_PLUS_TAIL)), "id", "degree")
        assert deg == {1: 2, 2: 2, 3: 3, 4: 1}

    def test_triangles(self, spark):
        tri = as_map(
            metrics.triangles_per_vertex(edges_df(spark, TRI_PLUS_TAIL)),
            "id",
            "triangles",
        )
        assert tri == {1: 1, 2: 1, 3: 1}

    def test_triangles_two_cliques(self, spark):
        tri = metrics.triangles_per_vertex(edges_df(spark, TWO_CLIQUES_BRIDGE))
        total = tri.agg(F.sum("triangles")).collect()[0][0]
        assert total == 8 * 3  # 8 triangles, each credited to 3 corners

    def test_local_clustering(self, spark):
        cc = as_map(metrics.local_clustering(edges_df(spark, TRI_PLUS_TAIL)), "id", "cc")
        assert cc[1] == pytest.approx(1.0)
        assert cc[2] == pytest.approx(1.0)
        assert cc[3] == pytest.approx(1 / 3)
        assert cc[4] == pytest.approx(0.0)

    def test_avg_clustering_and_transitivity(self, spark):
        e = edges_df(spark, TRI_PLUS_TAIL)
        assert metrics.average_clustering(e).collect()[0][0] == pytest.approx(
            0.5833, abs=1e-4
        )
        assert metrics.transitivity(e).collect()[0][0] == pytest.approx(0.6, abs=1e-4)

    def test_star_no_triangles(self, spark):
        e = edges_df(spark, STAR5)
        assert metrics.average_clustering(e).collect()[0][0] == 0.0
        assert metrics.transitivity(e).collect()[0][0] == 0.0


class TestConnectedComponents:
    def test_disconnected(self, spark):
        cc = as_map(
            algorithms.connected_components(edges_df(spark, DISCONNECTED)),
            "id",
            "component",
        )
        assert cc == {1: 1, 2: 1, 3: 3, 4: 3}

    def test_bridge_single_component(self, spark):
        cc = algorithms.connected_components(edges_df(spark, TWO_CLIQUES_BRIDGE))
        assert cc.select("component").distinct().count() == 1


class TestLPA:
    def test_two_triangles_converge(self, spark):
        labels = algorithms.label_propagation(edges_df(spark, TWO_TRIANGLES), max_iter=4)
        lab = as_map(labels, "id", "label")
        assert len({lab[1], lab[2], lab[3]}) == 1
        assert len({lab[4], lab[5], lab[6]}) == 1
        assert lab[1] != lab[4]

    def test_labels_are_vertex_ids(self, spark):
        labels = algorithms.label_propagation(edges_df(spark, TWO_CLIQUES_BRIDGE), max_iter=5)
        ids = {r.id for r in labels.collect()}
        labs = {r.label for r in labels.collect()}
        assert labs <= ids

    def test_dense_rekey(self, spark):
        labels = spark.createDataFrame(
            [(1, 100), (2, 100), (3, 7), (4, 55)], "id long, label long"
        )
        out = as_map(algorithms.dense_rekey(labels), "id", "label")
        assert out == {3: 0, 4: 1, 1: 2, 2: 2}


class TestDistances:
    def test_diameter_path(self, spark):
        assert algorithms.diameter(edges_df(spark, PATH4)).collect()[0][0] == 3

    def test_diameter_star(self, spark):
        assert algorithms.diameter(edges_df(spark, STAR5)).collect()[0][0] == 2

    def test_diameter_disconnected_max_over_components(self, spark):
        assert algorithms.diameter(edges_df(spark, DISCONNECTED)).collect()[0][0] == 1

    def test_closeness_star(self, spark):
        c = as_map(algorithms.closeness_centrality(edges_df(spark, STAR5)), "id", "closeness")
        assert c[0] == pytest.approx(1.0)
        for leaf in range(1, 6):
            assert c[leaf] == pytest.approx(5 / 9)  # (n-1)/sum_d = 5/9, connected

    def test_closeness_path(self, spark):
        c = as_map(algorithms.closeness_centrality(edges_df(spark, PATH4)), "id", "closeness")
        assert c[1] == pytest.approx(0.5)
        assert c[2] == pytest.approx(0.75)

    def test_closeness_disconnected_wf(self, spark):
        c = as_map(
            algorithms.closeness_centrality(edges_df(spark, DISCONNECTED)),
            "id",
            "closeness",
        )
        # r=2, n=4: (r-1)/sum_d * (r-1)/(n-1) = 1/1 * 1/3
        for v in (1, 2, 3, 4):
            assert c[v] == pytest.approx(1 / 3)


class TestBetweenness:
    def test_path4(self, spark):
        b = as_map(
            algorithms.betweenness_centrality(edges_df(spark, PATH4)), "id", "betweenness"
        )
        assert b[1] == pytest.approx(0.0)
        assert b[2] == pytest.approx(2 / 3)
        assert b[3] == pytest.approx(2 / 3)
        assert b[4] == pytest.approx(0.0)

    def test_star5_center(self, spark):
        b = as_map(
            algorithms.betweenness_centrality(edges_df(spark, STAR5)), "id", "betweenness"
        )
        assert b[0] == pytest.approx(1.0)
        for leaf in range(1, 6):
            assert b[leaf] == pytest.approx(0.0)

    def test_tri_plus_tail(self, spark):
        b = as_map(
            algorithms.betweenness_centrality(edges_df(spark, TRI_PLUS_TAIL)),
            "id",
            "betweenness",
        )
        # vertex 3 lies on (1,4) and (2,4) shortest paths → 2/((4-1)(4-2)/2)·…
        assert b[3] == pytest.approx(2 / 3)
        assert b[4] == pytest.approx(0.0)

    def test_bridge_has_max_betweenness(self, spark):
        b = as_map(
            algorithms.betweenness_centrality(edges_df(spark, TWO_CLIQUES_BRIDGE)),
            "id",
            "betweenness",
        )
        top = max(b, key=b.get)
        assert top in (4, 5)


class TestInducedSubgraph:
    def test_semi_join_equals_pair_filter(self, spark):
        e = edges_df(spark, TWO_CLIQUES_BRIDGE)
        s = spark.createDataFrame([(1,), (2,), (3,), (5,)], "id long")
        got = {(r.src, r.dst) for r in build.induced_subgraph(e, s).collect()}
        assert got == {(1, 2), (1, 3), (2, 3)}


class TestDoubleSweep:
    def test_exact_on_path(self, spark):
        from sna_pyspark_graphframes_spark.graph.algorithms import (
            diameter,
            diameter_double_sweep,
        )

        e = edges_df(spark, PATH4)
        assert diameter_double_sweep(e).collect()[0][0] == 3

    def test_lower_bound_on_cliques(self, spark):
        from sna_pyspark_graphframes_spark.graph.algorithms import (
            diameter,
            diameter_double_sweep,
        )

        e = edges_df(spark, TWO_CLIQUES_BRIDGE)
        lb = diameter_double_sweep(e).collect()[0][0]
        exact = diameter(e).collect()[0][0]
        assert lb <= exact
        assert lb >= 1


class TestTwoPhaseCC:
    def _check_equal(self, spark, pairs):
        a = as_map(algorithms.connected_components(edges_df(spark, pairs)), "id", "component")
        b = as_map(
            algorithms.connected_components_twophase(edges_df(spark, pairs)),
            "id",
            "component",
        )
        assert a == b

    def test_disconnected(self, spark):
        self._check_equal(spark, DISCONNECTED)

    def test_bridge(self, spark):
        self._check_equal(spark, TWO_CLIQUES_BRIDGE)

    def test_path(self, spark):
        self._check_equal(spark, PATH4)

    def test_random_graphs(self, spark):
        import random

        rng = random.Random(17)
        for trial in range(3):
            n = 30
            pairs = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(25)
            ]
            pairs = [(a, b) for a, b in pairs if a != b]
            self._check_equal(spark, pairs)

    def test_long_chain_few_rounds(self, spark):
        # 40-vertex path: diameter 39; two-phase must converge well within
        # 15 rounds (O(log^2 n)) where min-label propagation needs ~40
        chain = [(i, i + 1) for i in range(40)]
        out = as_map(
            algorithms.connected_components_twophase(edges_df(spark, chain), max_iter=15),
            "id",
            "component",
        )
        assert set(out.values()) == {0}


class TestPageRank:
    def test_uniform_on_symmetric_regular(self, spark):
        # triangle: every vertex identical → 1/3 each
        pr = as_map(
            algorithms.pagerank(edges_df(spark, [(1, 2), (2, 3), (1, 3)]), max_iter=30),
            "id",
            "pagerank",
        )
        for v in (1, 2, 3):
            assert pr[v] == pytest.approx(1 / 3, abs=1e-4)

    def test_star_closed_form(self, spark):
        # undirected star5, d=0.85: solve c = 0.025 + 0.85·5·l,
        # l = 0.025 + 0.17·c  →  c ≈ 0.472973, l ≈ 0.105405
        pr = as_map(
            algorithms.pagerank(edges_df(spark, STAR5), max_iter=60), "id", "pagerank"
        )
        assert pr[0] == pytest.approx(0.472973, abs=1e-3)
        for leaf in range(1, 6):
            assert pr[leaf] == pytest.approx(0.105405, abs=1e-3)

    def test_sums_to_one_with_dangling(self, spark):
        # directed chain 1→2→3: vertex 3 is dangling
        pr = algorithms.pagerank(
            edges_df(spark, [(1, 2), (2, 3)]), max_iter=40, directed=True
        )
        total = sum(r.pagerank for r in pr.collect())
        assert total == pytest.approx(1.0, abs=1e-3)

    def test_init_ranks_uniform_is_identity(self, spark):
        # init_ranks = the exact uniform vector → the trajectory is the
        # from-scratch one, so a fixed-iteration run is value-identical
        e = edges_df(spark, STAR5)
        base = as_map(
            algorithms.pagerank(e, max_iter=5, tol=None), "id", "pagerank"
        )
        uniform = spark.createDataFrame(
            [(i, 1.0 / 6) for i in range(6)], "id long, pr double"
        )
        seeded = as_map(
            algorithms.pagerank(e, max_iter=5, tol=None, init_ranks=uniform),
            "id",
            "pagerank",
        )
        assert seeded == base  # byte-identical at the 6-dp output rounding

    def test_init_ranks_continuation_reaches_fixed_point(self, spark):
        # the twin shape: continue the tol-run from a 4-round reference
        # state — power iteration's fixed point is init-independent, so
        # the continued run converges to the from-uniform answer
        # max_iter high enough that BOTH runs exit on tol (the star's
        # sign-alternating mode decays at 0.85/round → ~100 rounds to
        # 1e-7): each is then within 5.7·tol of the shared fixed point
        e = edges_df(spark, STAR5)
        ref = algorithms.pagerank(e, max_iter=4, tol=None, round_dp=6)
        cont = as_map(
            algorithms.pagerank(e, max_iter=200, init_ranks=ref), "id", "pagerank"
        )
        full = as_map(algorithms.pagerank(e, max_iter=200), "id", "pagerank")
        assert set(cont) == set(full)
        for k in full:
            assert cont[k] == pytest.approx(full[k], abs=1e-5)

    def test_init_ranks_directed_dangling_mass_reseeded(self, spark):
        # directed + danglings + provided init: the round-0 mass comes
        # from the one extra setup action, and the stationary answer
        # still sums to 1
        e = edges_df(spark, [(1, 2), (2, 3)])
        ref = algorithms.pagerank(e, max_iter=2, tol=None, directed=True)
        pr = algorithms.pagerank(e, max_iter=40, directed=True, init_ranks=ref)
        total = sum(r.pagerank for r in pr.collect())
        assert total == pytest.approx(1.0, abs=1e-3)

    def test_ppr_init_ranks_continuation(self, spark):
        e = edges_df(spark, STAR5)
        ref = algorithms.personalized_pagerank(e, [0], max_iter=4, tol=None)
        cont = as_map(
            algorithms.personalized_pagerank(e, [0], max_iter=200, init_ranks=ref),
            "id",
            "pagerank",
        )
        full = as_map(
            algorithms.personalized_pagerank(e, [0], max_iter=200), "id", "pagerank"
        )
        for k in full:
            assert cont[k] == pytest.approx(full[k], abs=1e-5)

    def test_init_ranks_resolved_by_name_over_position(self, spark):
        # ADVICE r11: a frame with an extra LEADING column used to be
        # silently misread by position — named (id, pagerank) now win
        e = edges_df(spark, STAR5)
        ref = algorithms.pagerank(e, max_iter=5, tol=None)
        base = as_map(
            algorithms.pagerank(e, max_iter=5, tol=None, init_ranks=ref),
            "id",
            "pagerank",
        )
        shuffled = ref.select(
            F.lit("x").alias("note"), "pagerank", "id"
        )
        got = as_map(
            algorithms.pagerank(e, max_iter=5, tol=None, init_ranks=shuffled),
            "id",
            "pagerank",
        )
        assert got == base

    def test_init_ranks_rejects_bad_frames(self, spark):
        e = edges_df(spark, STAR5)
        one_col = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match=">= 2 columns"):
            algorithms.pagerank(e, init_ranks=one_col)
        non_numeric = spark.createDataFrame(
            [(1, "a")], "id long, pagerank string"
        )
        with pytest.raises(ValueError, match="must be numeric"):
            algorithms.pagerank(e, init_ranks=non_numeric)


class TestLubyMis:
    @staticmethod
    def _py_luby(edges):
        import hashlib

        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        pr = {
            v: hashlib.md5(str(v).encode()).hexdigest() + "-" + str(v)
            for v in adj
        }
        active, out, rnd = set(adj), {}, 0
        while active:
            rnd += 1
            w = {
                v
                for v in active
                if all(pr[v] < pr[u] for u in adj[v] if u in active)
            }
            for v in w:
                out[v] = rnd
            rm = set()
            for v in w:
                rm |= adj[v] & active
            active -= w | rm
        return out

    def test_differential_vs_python_replay(self, spark):
        # deterministic md5 priorities → the distributed run must equal
        # the sequential replay exactly, rounds included
        E = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (12, 13), (12, 14), (13, 14)]
        got = {
            r.id: r.round
            for r in algorithms.luby_mis(edges_df(spark, E)).collect()
        }
        assert got == self._py_luby(E)

    def test_independent_and_maximal(self, spark):
        # structural invariants on a denser graph: no edge inside the
        # set; every non-member has a member neighbor
        import random

        rng = random.Random(7)
        E = list({tuple(sorted(rng.sample(range(30), 2))) for _ in range(60)})
        mis = {
            r.id for r in algorithms.luby_mis(edges_df(spark, E)).collect()
        }
        adj = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for a, b in E:
            assert not (a in mis and b in mis)
        for v in adj:
            assert v in mis or adj[v] & mis
        # drain contract (ADVICE r11): maximality holds ⇔ active drained
        assert algorithms.LAST_STATS["mis_residual"] == 0

    def test_empty_graph(self, spark):
        out = algorithms.luby_mis(edges_df(spark, []))
        assert out.columns == ["id", "round"]
        assert out.count() == 0

    def test_undersized_max_iter_records_residual_and_registry_raises(
        self, spark
    ):
        """FORCING test for the drain guard (VERDICT r12 Next #5): a
        20-vertex path needs 2 Luby rounds under the md5 priorities
        (verified by direct simulation of the deterministic rule), so
        max_iter=1 leaves survivors; the algorithm RECORDS the residual
        and the registry guard converts it to a loud raise."""
        from sna_pyspark_graphframes_spark import registry as R

        E = [(i, i + 1) for i in range(20)]
        out = algorithms.luby_mis(edges_df(spark, E), max_iter=1)
        assert out.count() > 0  # partial result exists...
        residual = algorithms.LAST_STATS["mis_residual"]
        assert residual > 0  # ...and is recorded as NOT maximal
        with pytest.raises(RuntimeError, match="did not drain"):
            R._assert_drained("mis_residual")
        # drained run passes the guard
        algorithms.luby_mis(edges_df(spark, E))
        R._assert_drained("mis_residual")
        # mst guard keys on the converged flag, same machinery
        algorithms.boruvka_mst(edges_df(spark, E), max_iter=1)
        assert algorithms.LAST_STATS["mst_converged"] is False
        with pytest.raises(RuntimeError, match="did not drain"):
            R._assert_drained("mst_converged", want=True)


class TestBoruvkaMst:
    @staticmethod
    def _w(e):
        import hashlib

        h = int(hashlib.md5(f"{e[0]}-{e[1]}".encode()).hexdigest()[:8], 16)
        return (h + 0.5) / 4294967296.0

    def _kruskal(self, edges):
        can = sorted({tuple(sorted(e)) for e in edges})
        order = sorted(can, key=lambda e: (self._w(e), e[0], e[1]))
        parent = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            return r

        mst = {}
        for e in order:
            a, b = find(e[0]), find(e[1])
            if a != b:
                parent[max(a, b)] = min(a, b)
                mst[e] = round(self._w(e), 6)
        return mst

    def test_differential_vs_kruskal(self, spark):
        # identical (w, src, dst) total order → the forest is unique, so
        # distributed Boruvka must equal sequential Kruskal exactly
        import random

        rng = random.Random(3)
        E = list({tuple(sorted(rng.sample(range(40), 2))) for _ in range(90)})
        E += [(100, 101), (101, 102), (102, 100)]  # second component
        got = {
            (r.src, r.dst): r.w
            for r in algorithms.boruvka_mst(edges_df(spark, E)).collect()
        }
        assert got == self._kruskal(E)

    def test_triangle_drops_max_edge(self, spark):
        # cycle property: exactly the (w, src, dst)-max edge is excluded
        E = [(1, 2), (2, 3), (1, 3)]
        got = {(r.src, r.dst) for r in algorithms.boruvka_mst(edges_df(spark, E)).collect()}
        drop = max(E, key=lambda e: (self._w(tuple(sorted(e))),) + tuple(sorted(e)))
        assert got == {tuple(sorted(e)) for e in E} - {tuple(sorted(drop))}

    def test_forest_size(self, spark):
        # spanning forest: |MST| = |V| - #components (path + triangle)
        E = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
        out = algorithms.boruvka_mst(edges_df(spark, E)).collect()
        assert len(out) == 7 - 2
        # drain contract (ADVICE r11): spanning ⇔ a round picked nothing
        assert algorithms.LAST_STATS["mst_converged"]

    def test_empty_graph(self, spark):
        out = algorithms.boruvka_mst(edges_df(spark, []))
        assert out.columns == ["src", "dst", "w"]
        assert out.count() == 0


class TestGreedyMatching:
    @staticmethod
    def _py_match(edges):
        import hashlib

        can = sorted({tuple(sorted(e)) for e in edges})
        pr = {
            e: hashlib.md5(f"{e[0]}-{e[1]}".encode()).hexdigest()
            + f"-{e[0]}-{e[1]}"
            for e in can
        }
        active, out, rnd = set(can), {}, 0
        while active:
            rnd += 1
            w = {
                e
                for e in active
                if all(
                    pr[e] <= pr[o]
                    for o in active
                    if o != e and (set(e) & set(o))
                )
            }
            for e in w:
                out[e] = rnd
            mv = {v for e in w for v in e}
            active = {e for e in active if not (set(e) & mv)}
        return out

    def test_differential_vs_python_replay(self, spark):
        E = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 12), (20, 21), (2, 1)]
        got = {
            (r.src, r.dst): r.round
            for r in algorithms.greedy_matching(edges_df(spark, E)).collect()
        }
        assert got == self._py_match(E)

    def test_matching_invariants(self, spark):
        import random

        rng = random.Random(11)
        E = list({tuple(sorted(rng.sample(range(24), 2))) for _ in range(50)})
        m = [
            (r.src, r.dst)
            for r in algorithms.greedy_matching(edges_df(spark, E)).collect()
        ]
        used = [v for e in m for v in e]
        assert len(used) == len(set(used))  # vertex-disjoint
        mv = set(used)
        for a, b in E:  # maximal: every edge touches a matched vertex
            assert a in mv or b in mv
        # drain contract (ADVICE r11): maximality holds ⇔ active drained
        assert algorithms.LAST_STATS["matching_residual"] == 0

    def test_empty_graph(self, spark):
        out = algorithms.greedy_matching(edges_df(spark, []))
        assert out.columns == ["src", "dst", "round"]
        assert out.count() == 0


class TestKatz:
    def test_triangle_rounded_recurrence(self, spark):
        # 2-regular: uniform per round, s <- round(0.2*s + 1, 6) from 0;
        # 8 rounds -> 1.249997 (NOT yet the 1.25 fixed point)
        tri = edges_df(spark, [(1, 2), (2, 3), (1, 3)])
        out = as_map(
            algorithms.katz_centrality(tri, max_iter=8, tol=None, round_dp=6),
            "id",
            "katz",
        )
        assert out == {1: 1.249997, 2: 1.249997, 3: 1.249997}

    def test_star_closed_form(self, spark):
        # (I - αA)^-1 β1 on star5, α=0.1: center = 1.5/0.95 ≈ 1.578947,
        # leaf = 0.1·center + 1 ≈ 1.157895
        out = as_map(
            algorithms.katz_centrality(edges_df(spark, STAR5), max_iter=60),
            "id",
            "katz",
        )
        assert out[0] == pytest.approx(1.578947, abs=1e-5)
        for leaf in range(1, 6):
            assert out[leaf] == pytest.approx(1.157895, abs=1e-5)

    def test_normalized_unit_l2(self, spark):
        out = algorithms.katz_centrality(
            edges_df(spark, STAR5), max_iter=40, normalized=True
        ).collect()
        assert sum(r.katz**2 for r in out) == pytest.approx(1.0, abs=1e-4)

    def test_empty_graph(self, spark):
        out = algorithms.katz_centrality(edges_df(spark, []))
        assert out.columns == ["id", "katz"]
        assert out.count() == 0


class TestMotifs:
    def test_triangles_tuples(self, spark):
        from sna_pyspark_graphframes_spark.graph import motifs

        out = {tuple(r) for r in motifs.triangles(edges_df(spark, TRI_PLUS_TAIL)).collect()}
        assert out == {(1, 2, 3)}

    def test_open_wedges(self, spark):
        from sna_pyspark_graphframes_spark.graph import motifs

        # tri_plus_tail: wedges through 3: (1,3,4),(2,3,4); (1,3,2) is closed
        out = {tuple(r) for r in motifs.wedges(edges_df(spark, TRI_PLUS_TAIL)).collect()}
        assert out == {(1, 3, 4), (2, 3, 4)}

    def test_wedges_count_matches_formula(self, spark):
        from sna_pyspark_graphframes_spark.graph import motifs

        e = edges_df(spark, TWO_CLIQUES_BRIDGE)
        total = motifs.wedges(e, open_only=False).count()
        # Σ deg(v)(deg(v)-1)/2: K4 degs 3,3,3,4(+bridge)... compute from engine
        deg = metrics.degrees(e)
        expected = deg.selectExpr("sum(degree*(degree-1)/2) s").collect()[0].s
        assert total == int(expected)

    def test_four_cycles_square(self, spark):
        from sna_pyspark_graphframes_spark.graph import motifs

        square = [(1, 2), (2, 3), (3, 4), (1, 4)]
        out = [tuple(r) for r in motifs.four_cycles(edges_df(spark, square)).collect()]
        assert out == [(1, 2, 3, 4)]

    def test_four_cycles_k4(self, spark):
        from sna_pyspark_graphframes_spark.graph import motifs

        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        assert motifs.four_cycles(edges_df(spark, k4)).count() == 3  # 3 cycles in K4


class TestSCC:
    def _scc(self, spark, pairs):
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in pairs], "src long, dst long"
        )
        out = algorithms.strongly_connected_components(df)
        m = as_map(out, "id", "component")
        inv = {}
        for k, v in m.items():
            inv.setdefault(v, set()).add(k)
        return sorted(map(frozenset, inv.values()), key=min)

    def test_cycle_is_one_scc(self, spark):
        assert self._scc(spark, [(1, 2), (2, 3), (3, 1)]) == [frozenset({1, 2, 3})]

    def test_dag_all_singletons(self, spark):
        assert self._scc(spark, [(1, 2), (2, 3), (1, 3)]) == [
            frozenset({1}),
            frozenset({2}),
            frozenset({3}),
        ]

    def test_two_cycles_linked(self, spark):
        # cycle {1,2,3} -> cycle {4,5} via edge 3->4: two SCCs
        pairs = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4)]
        assert self._scc(spark, pairs) == [frozenset({1, 2, 3}), frozenset({4, 5})]

    def test_mixed(self, spark):
        # self-contained figure-8 through 3: 1->2->3->1 and 3->4->5->3 is ONE scc
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
        assert self._scc(spark, pairs) == [frozenset({1, 2, 3, 4, 5})]


class TestLinkPrediction:
    def _scores(self, spark, pairs):
        from sna_pyspark_graphframes_spark.graph import linkpred

        out = linkpred.link_scores(edges_df(spark, pairs))
        return {
            (r["a"], r["b"]): (r["cn"], r["jaccard"], r["adamic_adar"])
            for r in out.collect()
        }

    def test_path_endpoints(self, spark):
        # 1-2-3: only candidate (1,3); cn=1, J=1/(1+1-1)=1, AA=1/ln2
        assert self._scores(spark, [(1, 2), (2, 3)]) == {
            (1, 3): (1, 1.0, 1.4427)
        }

    def test_k4_minus_edge(self, spark):
        # K4 without (3,4): candidate (3,4) via z in {1,2} (deg 3 each)
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
        assert self._scores(spark, pairs) == {(3, 4): (2, 1.0, 1.8205)}

    def test_adjacent_pairs_excluded(self, spark):
        # triangle: every pair adjacent -> no candidates
        assert self._scores(spark, [(1, 2), (2, 3), (1, 3)]) == {}


class TestKCore:
    def test_triangle_with_tail(self, spark):
        # triangle {1,2,3} + tail 3-4: 2-core = the triangle, tail peeled
        e = edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        core2 = sorted(
            (r["src"], r["dst"]) for r in algorithms.k_core(e, 2).collect()
        )
        assert core2 == [(1, 2), (1, 3), (2, 3)]
        cores = as_map(algorithms.core_numbers(e), "id", "core")
        assert cores == {1: 2, 2: 2, 3: 2, 4: 1}

    def test_k4(self, spark):
        k4 = edges_df(spark, [(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
        assert algorithms.k_core(k4, 3).count() == 6
        assert algorithms.k_core(k4, 4).isEmpty()
        assert as_map(algorithms.core_numbers(k4), "id", "core") == {
            1: 3, 2: 3, 3: 3, 4: 3,
        }

    def test_path_all_core1(self, spark):
        e = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
        assert algorithms.k_core(e, 2).isEmpty()
        assert as_map(algorithms.core_numbers(e), "id", "core") == {
            1: 1, 2: 1, 3: 1, 4: 1,
        }

    def test_hindex_equals_peel(self, spark):
        """Iterated h-index (Lü et al. 2016) must equal the peel
        decomposition on structurally distinct fixtures."""
        import random

        cases = [
            [(1, 2), (2, 3), (1, 3), (3, 4)],                       # tri+tail
            [(a, b) for a in range(1, 6) for b in range(a + 1, 6)], # K5
            [(1, 2), (2, 3), (3, 4)],                               # path
        ]
        rng = random.Random(7)
        cases.append(
            list(
                {
                    (min(a, b), max(a, b))
                    for _ in range(120)
                    for a, b in [(rng.randint(1, 40), rng.randint(1, 40))]
                    if a != b
                }
            )
        )
        for pairs in cases:
            e = edges_df(spark, pairs)
            peel = as_map(algorithms.core_numbers(e), "id", "core")
            hx = as_map(algorithms.core_numbers_hindex(e), "id", "core")
            assert hx == peel, pairs

    def test_max_k_clamp_keeps_every_vertex(self, spark):
        # K5 has core 4 > max_k=2: survivors must still get a (clamped)
        # row, not silently vanish (ADVICE r3 / sf0.01 copurchase audit)
        k5 = edges_df(spark, [(a, b) for a in range(1, 6) for b in range(a + 1, 6)])
        assert as_map(algorithms.core_numbers(k5, max_k=2), "id", "core") == {
            1: 2, 2: 2, 3: 2, 4: 2, 5: 2,
        }
        # unclamped stays exact
        assert as_map(algorithms.core_numbers(k5), "id", "core") == {
            1: 4, 2: 4, 3: 4, 4: 4, 5: 4,
        }


class TestPPR:
    def test_two_node_closed_form(self, spark):
        # source {1} on edge 1-2: p1 = 0.15 + 0.85*p2, p2 = 0.85*p1 —
        # replicate the same 20-step recurrence locally
        p1, p2 = 1.0, 0.0
        for _ in range(20):
            p1, p2 = 0.15 + 0.85 * p2, 0.85 * p1
        got = as_map(
            algorithms.personalized_pagerank(edges_df(spark, [(1, 2)]), [1]),
            "id", "pagerank",
        )
        assert got == {1: round(p1, 6), 2: round(p2, 6)}

    def test_path_matches_local_power_iteration(self, spark):
        # path 1-2-3-4-5, source 1 — independent local power iteration.
        # (note p2 > p1: the degree-1 source exports ALL its mass each step
        # and only the 0.15 restart returns, so its neighbor outranks it)
        adj = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4]}
        r = {v: (1.0 if v == 1 else 0.0) for v in adj}
        p = dict(r)
        for _ in range(20):
            new = {v: 0.15 * r[v] for v in adj}
            for v, nbrs in adj.items():
                for nb in nbrs:
                    new[nb] += 0.85 * p[v] / len(nbrs)
            p = new
        e = edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        got = as_map(algorithms.personalized_pagerank(e, [1]), "id", "pagerank")
        assert got == {v: round(p[v], 6) for v in adj}
        assert abs(sum(got.values()) - 1.0) < 1e-4

    def test_directed_dangling_mass_returns_to_source(self, spark):
        # directed edge 1→2, source {1}: vertex 2 is DANGLING, so its whole
        # mass returns to the source each round (the r7 driver-scalar fold:
        # dm enters the superstep as a literal, read off the previous
        # checkpoint). Local mirror of the exact recurrence:
        #   p1' = (0.15 + 0.85·dm)·1 + 0,  p2' = 0.85·p1,  dm = p2
        p1, p2 = 1.0, 0.0
        for _ in range(20):
            p1, p2 = (0.15 + 0.85 * p2) * 1.0, 0.85 * p1
        got = as_map(
            algorithms.personalized_pagerank(
                edges_df(spark, [(1, 2)]), [1], directed=True
            ),
            "id", "pagerank",
        )
        assert got == {1: round(p1, 6), 2: round(p2, 6)}
        assert abs(sum(got.values()) - 1.0) < 1e-4


class TestAggregateMessages:
    def test_degree_via_messages(self, spark):
        from sna_pyspark_graphframes_spark.graph import messages

        e = edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        sym = build.symmetrize(e)
        verts = sym.select(F.col("src").alias("id")).distinct().withColumn(
            "one", F.lit(1)
        )
        out = messages.aggregate_messages(
            sym, verts, to_dst=F.col("src_one"), agg={"deg": F.sum("msg")}
        )
        assert as_map(out, "id", "deg") == as_map(
            metrics.degrees(e), "id", "degree"
        )

    def test_to_src_and_to_dst_both(self, spark):
        from sna_pyspark_graphframes_spark.graph import messages

        # directed 1->2, 1->3: with both directions every vertex counts its
        # incident edges (undirected degree) without symmetrizing
        e = edges_df(spark, [(1, 2), (1, 3)])
        verts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        out = messages.aggregate_messages(
            e, verts, to_dst=F.lit(1), to_src=F.lit(1),
            agg={"deg": F.sum("msg")},
        )
        assert as_map(out, "id", "deg") == {1: 2, 2: 1, 3: 1}


class TestAssortativity:
    def test_star_is_minus_one(self, spark):
        star = edges_df(spark, [(1, 2), (1, 3), (1, 4)])
        row = metrics.degree_assortativity(star).collect()[0]
        assert row["assortativity"] == -1.0


class TestWeightedSSSP:
    def test_weighted_shortcut(self, spark):
        # 1->2 w=10 direct, but 1->3->2 w=1+2=3; 1->4 unreachable backward
        e = spark.createDataFrame(
            [(1, 2, 10.0), (1, 3, 1.0), (3, 2, 2.0), (4, 1, 5.0)],
            "src long, dst long, weight double",
        )
        got = as_map(algorithms.weighted_sssp(e, 1), "id", "dist")
        assert got == {1: 0.0, 2: 3.0, 3: 1.0}

    def test_matches_unweighted_bfs_when_unit(self, spark):
        pairs = [(1, 2), (2, 3), (3, 4), (1, 4)]
        sym = build.symmetrize(edges_df(spark, pairs))
        unit = sym.withColumn("weight", F.lit(1.0))
        got = as_map(algorithms.weighted_sssp(unit, 1), "id", "dist")
        assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 1.0}


class TestNeighborhoodFunction:
    """HyperANF on graphs small enough that the HLL sketch is exact."""

    def test_path4_matches_exact_ball_sizes(self, spark):
        nf = {
            r.r: r.n_pairs
            for r in algorithms.neighborhood_function(
                edges_df(spark, [(0, 1), (1, 2), (2, 3)])
            ).collect()
        }
        # balls: r=1 → 2+3+3+2; r=2 → 3+4+4+3; r=3 → all 16 pairs
        assert nf == {0: 4, 1: 10, 2: 14, 3: 16}

    def test_star_saturates_at_two(self, spark):
        nf = {
            r.r: r.n_pairs
            for r in algorithms.neighborhood_function(
                edges_df(spark, [(0, i) for i in range(1, 5)])
            ).collect()
        }
        assert nf == {0: 5, 1: 13, 2: 25}

    def test_disconnected_components_saturate_independently(self, spark):
        nf = {
            r.r: r.n_pairs
            for r in algorithms.neighborhood_function(
                edges_df(spark, [(0, 1), (2, 3)])
            ).collect()
        }
        assert nf == {0: 4, 1: 8}

    def test_effective_diameter_path_and_fraction(self, spark):
        p4 = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
        row = algorithms.effective_diameter(p4).collect()[0]
        # N = [4,10,14,16]; 0.9*16 = 14.4 → first r with N ≥ 14.4 is 3
        assert row.effective_diameter == 3 and row.n_pairs_max == 16
        row = algorithms.effective_diameter(p4, fraction=0.5).collect()[0]
        # 0.5*16 = 8 → first r with N ≥ 8 is 1
        assert row.effective_diameter == 1


class TestKTruss:
    def test_k4_is_its_own_4_truss_and_5_truss_empty(self, spark):
        k4 = edges_df(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
        kept = sorted((r.src, r.dst) for r in algorithms.k_truss(k4, 4).collect())
        assert kept == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        assert algorithms.k_truss(k4, 5).count() == 0

    def test_k4_minus_edge_cascades_to_empty_4_truss(self, spark):
        """Dropping (3,4) leaves edge (1,2) with support 2 at first, but the
        peel of its neighbors cascades — the 4-truss must be EMPTY (this is
        the within-subgraph recomputation that a single-pass support filter
        would get wrong)."""
        k4e = edges_df(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
        assert algorithms.k_truss(k4e, 4).count() == 0
        assert algorithms.k_truss(k4e, 3).count() == 5  # all in ≥1 triangle

    def test_truss_numbers_triangle_with_tail(self, spark):
        tt = edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = sorted(
            (r.src, r.dst, r.truss) for r in algorithms.truss_numbers(tt).collect()
        )
        assert got == [(1, 2, 3), (1, 3, 3), (2, 3, 3), (3, 4, 2)]

    def test_truss_hindex_equals_peel(self, spark):
        """Fixed-point truss numbers (Sariyüce et al. WWW'18) must equal
        the peel decomposition; includes the overlapping-cliques case."""
        import random

        cases = [
            [(1, 2), (2, 3), (1, 3), (3, 4)],
            [(a, b) for a in range(1, 6) for b in range(a + 1, 6)],  # K5
            # two K4s sharing an edge (overlap drives the descent)
            [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
            + [(a, b) for a in (3, 4, 5, 6) for b in (3, 4, 5, 6) if a < b],
        ]
        rng = random.Random(11)
        cases.append(
            list(
                {
                    (min(a, b), max(a, b))
                    for _ in range(100)
                    for a, b in [(rng.randint(1, 30), rng.randint(1, 30))]
                    if a != b
                }
            )
        )
        for pairs in cases:
            e = edges_df(spark, pairs)
            peel = sorted(
                (r.src, r.dst, r.truss)
                for r in algorithms.truss_numbers(e).collect()
            )
            for delta in (True, False):
                hx = sorted(
                    (r.src, r.dst, r.truss)
                    for r in algorithms.truss_numbers_hindex(
                        e, delta_frontier=delta
                    ).collect()
                )
                assert hx == peel, (pairs, delta)

    def test_truss_numbers_max_k_clamp(self, spark):
        # K5 is a 5-truss: with max_k=4 every edge must still get a row,
        # clamped at 4 (ADVICE r3 — previously silently dropped)
        k5 = edges_df(spark, [(a, b) for a in range(1, 6) for b in range(a + 1, 6)])
        got = sorted(
            (r.src, r.dst, r.truss)
            for r in algorithms.truss_numbers(k5, max_k=4).collect()
        )
        assert len(got) == 10 and all(t == 4 for _, _, t in got)
        # unclamped stays exact: all edges truss 5
        exact = algorithms.truss_numbers(k5).collect()
        assert len(exact) == 10 and all(r.truss == 5 for r in exact)


class TestHarmonic:
    def test_path3(self, spark):
        # path 1-2-3: h(1)=1+1/2, h(2)=2, h(3)=1.5
        e = edges_df(spark, [(1, 2), (2, 3)])
        got = as_map(algorithms.harmonic_centrality(e), "id", "harmonic")
        assert got == {1: 1.5, 2: 2.0, 3: 1.5}

    def test_disconnected_no_component_blowup(self, spark):
        # two disjoint edges: every vertex sees exactly one other at d=1;
        # unreachable pairs contribute 0 (the property closeness needs a
        # correction for)
        e = edges_df(spark, [(1, 2), (3, 4)])
        got = as_map(algorithms.harmonic_centrality(e), "id", "harmonic")
        assert got == {1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0}


class TestEigenvector:
    def test_star_ratio(self, spark):
        # star with 5 leaves: dominant eigenvector has center/leaf = sqrt(5)
        import math

        ev = as_map(
            algorithms.eigenvector_centrality(edges_df(spark, STAR5), max_iter=60),
            "id",
            "eigenvector",
        )
        assert ev[0] / ev[1] == pytest.approx(math.sqrt(5), abs=1e-4)
        # L2 normalized
        assert sum(v * v for v in ev.values()) == pytest.approx(1.0, abs=1e-4)

    def test_cycle_uniform_fixed_point(self, spark):
        # 2-regular: uniform 1/sqrt(n) is exact at EVERY iteration
        import math

        cyc = edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        ev = as_map(
            algorithms.eigenvector_centrality(cyc, max_iter=3), "id", "eigenvector"
        )
        for v in ev.values():
            assert v == pytest.approx(1 / math.sqrt(4), abs=1e-6)

    def test_path_symmetry(self, spark):
        ev = as_map(
            algorithms.eigenvector_centrality(edges_df(spark, PATH4), max_iter=60),
            "id",
            "eigenvector",
        )
        assert ev[1] == pytest.approx(ev[4], abs=1e-5)
        assert ev[2] == pytest.approx(ev[3], abs=1e-5)
        assert ev[2] > ev[1]

    def test_empty_graph_returns_empty(self, spark):
        # ADVICE r4: empty edges must yield an empty frame, not
        # ZeroDivisionError from 1/sqrt(0).
        out = algorithms.eigenvector_centrality(edges_df(spark, []))
        assert out.columns == ["id", "eigenvector"]
        assert out.count() == 0

    def test_pagerank_empty_graph_returns_empty(self, spark):
        # same class as the eigenvector ADVICE fix: 1.0/n at init —
        # caught by the round-5 empty-graph audit across all algorithms
        # (the only crasher; every other algorithm already returned an
        # empty/degenerate frame).
        out = algorithms.pagerank(edges_df(spark, []))
        assert out.columns == ["id", "pagerank"]
        assert out.count() == 0


class TestCommunityQuality:
    def test_modularity_two_triangles(self, spark):
        # two disjoint triangles, perfect partition: Q = 2*(3/6 - (6/12)^2)
        # = 0.5 (= nx.community.modularity)
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
        lab = spark.createDataFrame(
            [(i, 0 if i < 4 else 1) for i in range(1, 7)], "id long, label long"
        )
        assert metrics.modularity(e, lab).first()[0] == pytest.approx(0.5)

    def test_modularity_single_community_is_zero(self, spark):
        # everything in one community: Q = m/m - (2m/2m)^2 = 0
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(spark, [(1, 2), (2, 3), (1, 3)])
        lab = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], "id long, label long")
        assert metrics.modularity(e, lab).first()[0] == pytest.approx(0.0)

    def test_conductance_c4_parity(self, spark):
        # 4-cycle split by parity: every edge crosses -> cut=4, vol=4,
        # phi = 4/min(4,4) = 1.0 for both sides
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
        lab = spark.createDataFrame(
            [(1, 1), (3, 1), (2, 0), (4, 0)], "id long, label long"
        )
        rows = {r.label: r for r in metrics.community_conductance(e, lab).collect()}
        for lbl in (0, 1):
            assert rows[lbl].cut_edges == 4
            assert rows[lbl].volume == 4
            assert rows[lbl].conductance == pytest.approx(1.0)

    def test_conductance_disjoint_cliques_is_zero(self, spark):
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
        lab = spark.createDataFrame(
            [(i, 0 if i < 4 else 1) for i in range(1, 7)], "id long, label long"
        )
        rows = metrics.community_conductance(e, lab).collect()
        assert all(r.cut_edges == 0 and r.conductance == 0.0 for r in rows)


class TestRichClub:
    def test_path4(self, spark):
        # degrees 1,2,2,1; k=1: N={2,3}, E={(2,3)} -> phi = 2*1/(2*1) = 1
        from sna_pyspark_graphframes_spark.graph import metrics

        rows = [
            tuple(r)
            for r in metrics.rich_club_coefficient(
                edges_df(spark, PATH4)
            ).collect()
        ]
        assert rows == [(1, 2, 1, 1.0)]

    def test_k4_plus_pendant(self, spark):
        # K4 on 1-4 plus pendant 5-1: k=1 keeps the K4 (N=4, E=6, phi=1);
        # k=3 leaves only vertex 1 (N=1, filtered); nothing above.
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(
            spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
        )
        rows = sorted(tuple(r) for r in metrics.rich_club_coefficient(e).collect())
        assert rows == [(1, 4, 6, 1.0)]


class TestWidestPath:
    def test_bottleneck_picks_max_min(self, spark):
        # 1->2 (3), 2->3 (1), 1->4 (1), 4->3 (5): cap(3) = max(min(3,1), min(1,5)) = 1
        e = spark.createDataFrame(
            [
                (1, 2, 3.0), (2, 1, 3.0), (2, 3, 1.0), (3, 2, 1.0),
                (1, 4, 1.0), (4, 1, 1.0), (4, 3, 5.0), (3, 4, 5.0),
            ],
            "src long, dst long, weight double",
        )
        got = as_map(algorithms.widest_path(e, 1), "id", "capacity")
        assert got == {2: 3.0, 3: 1.0, 4: 1.0}

    def test_wide_detour_beats_short_narrow(self, spark):
        # direct 1->3 capacity 1; detour 1->2->3 capacity min(9, 8) = 8
        e = spark.createDataFrame(
            [(1, 3, 1.0), (1, 2, 9.0), (2, 3, 8.0)],
            "src long, dst long, weight double",
        )
        got = as_map(algorithms.widest_path(e, 1), "id", "capacity")
        assert got[3] == 8.0 and got[2] == 9.0


class TestHITS:
    def _ref(self, edges, n_iter):
        """Pure-Python HITS mirroring the per-half-step normalize+round."""
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
        return hub, auth

    def test_hits_bipartite_star(self, spark):
        """Customers→orders star: c1 with two orders out-hubs c2 with one;
        orders of the bigger hub out-auth the other. Exact per-step match
        against the Python mirror (same normalize+round schedule)."""
        edges = [(1, 101), (1, 102), (2, 103)]
        out = {
            r.id: (r.hub, r.auth)
            for r in algorithms.hits(edges_df(spark, edges), n_iter=3).collect()
        }
        hub, auth = self._ref(edges, 3)
        assert set(out) == set(hub)
        for v in hub:
            assert out[v][0] == pytest.approx(hub[v], abs=2e-6)
            assert out[v][1] == pytest.approx(auth[v], abs=2e-6)
        assert out[1][0] > out[2][0] > 0.0          # c1 the stronger hub
        assert out[101][1] == out[102][1] > out[103][1]  # its orders stronger auths
        assert out[101][0] == 0.0                   # orders point nowhere

    def test_hits_cycle_uniform(self, spark):
        """On a directed cycle every vertex has in=out=1, so the uniform
        vector is the exact fixed point of both half-steps."""
        cyc = [(1, 2), (2, 3), (3, 1)]
        out = {r.id: (r.hub, r.auth) for r in algorithms.hits(edges_df(spark, cyc), n_iter=2).collect()}
        u = round(1 / 3 ** 0.5, 6)
        for v in (1, 2, 3):
            assert out[v][0] == pytest.approx(u, abs=2e-6)
            assert out[v][1] == pytest.approx(u, abs=2e-6)

    def test_hits_empty(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        assert algorithms.hits(df).count() == 0


class TestAttributeAssortativity:
    def test_perfect_homophily_is_one(self, spark):
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(spark, [(1, 2), (3, 4)])
        attrs = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "id long, attr string"
        )
        r = metrics.attribute_assortativity(e, attrs).collect()[0]
        assert (r.n_edges, r.trace, r.assortativity) == (4, 1.0, 1.0)

    def test_perfect_disassortativity_is_minus_one(self, spark):
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(spark, [(1, 2)])
        attrs = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, attr string"
        )
        r = metrics.attribute_assortativity(e, attrs).collect()[0]
        assert (r.trace, r.assortativity) == (0.0, -1.0)

    def test_single_category_is_null(self, spark):
        # all one category: 0/0 — NULL, matching NetworkX's nan
        from sna_pyspark_graphframes_spark.graph import metrics

        e = edges_df(spark, [(1, 2)])
        attrs = spark.createDataFrame(
            [(1, "a"), (2, "a")], "id long, attr string"
        )
        r = metrics.attribute_assortativity(e, attrs).collect()[0]
        assert r.assortativity is None


class TestLabelSpreading:
    def test_two_components_adopt_their_seed_class(self, spark):
        # disjoint triangles, one seed each -> every member classified
        # by its component's seed; scores stay in [0, 1]
        E = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
        seeds = spark.createDataFrame([(1, 0), (10, 1)], "id long, class int")
        out = {
            r.id: r
            for r in algorithms.label_spreading(
                edges_df(spark, E), seeds, n_classes=2
            ).collect()
        }
        assert {v: out[v].label for v in (1, 2, 3)} == {1: 0, 2: 0, 3: 0}
        assert {v: out[v].label for v in (10, 11, 12)} == {10: 1, 11: 1, 12: 1}
        for r in out.values():
            assert 0.0 <= r.f0 <= 1.0 and 0.0 <= r.f1 <= 1.0

    def test_unseeded_component_scores_zero_class_zero(self, spark):
        E = [(1, 2), (10, 11)]
        seeds = spark.createDataFrame([(1, 1)], "id long, class int")
        out = {
            r.id: r
            for r in algorithms.label_spreading(
                edges_df(spark, E), seeds, n_classes=2
            ).collect()
        }
        assert out[10].f0 == 0.0 and out[10].f1 == 0.0
        assert out[10].label == 0  # tie -> class 0 (documented abstention)
        assert out[2].label == 1

    def test_empty_graph(self, spark):
        seeds = spark.createDataFrame([], "id long, class int")
        out = algorithms.label_spreading(edges_df(spark, []), seeds)
        assert out.columns == ["id", "f0", "f1", "label"]
        assert out.count() == 0


def test_rings_oracle_unroll_bound_covers_fixture(spark):
    """The MIS/matching replay twins unroll 21 rounds, derived from the
    worst case ceil(ring/2) with max orders/customer = 41 at TPC-H sf1
    (VERDICT r11/r12): FORCE the derivation against the actual fixtures
    so a regenerated fixture that outgrows the bound fails HERE, not as
    a silent oracle drift (the drain guard catches the Spark side; this
    catches the SQL side)."""
    import math

    from pyspark.sql import functions as F

    from sna_pyspark_graphframes_spark.sources import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        biggest = (
            load_table(spark, sf, "orders")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n").alias("m"))
            .first()["m"]
        )
        assert math.ceil(biggest / 2) <= 21, (sf, biggest)


class TestPagerankWeighted:
    def test_star_matches_hand_recurrence(self, spark):
        """One star a->b (w=1), a->c (w=2): 3-variable recurrence with
        weighted splits 1/3 vs 2/3 and b,c dangling."""
        edges = spark.createDataFrame(
            [(1, 2, 1), (1, 3, 2)], "src long, dst long, w int"
        )
        got = {
            r.id: r.pagerank
            for r in algorithms.pagerank_weighted(
                edges, "w", directed=True, max_iter=8
            ).collect()
        }
        n = 3.0
        a = b = c = 1 / n
        for _ in range(8):
            dm = (b + c) / 3
            a, b, c = (
                0.15 / n + 0.85 * dm,
                0.15 / n + 0.85 * (a / 3 + dm),
                0.15 / n + 0.85 * (2 * (a / 3) + dm),
            )
        assert got == {1: round(a, 6), 2: round(b, 6), 3: round(c, 6)}
        assert got[3] > got[2]  # the weight-2 target outranks weight-1

    def test_unit_weights_match_unweighted_loop(self, spark):
        """w=1 everywhere must reproduce the attested unweighted loop
        (same rounds, tol off) to the 6-dp output contract."""
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        ew = e.withColumn("w", F.lit(1))
        want = {
            r.id: r.pagerank
            for r in algorithms.pagerank(
                e, directed=True, max_iter=8, tol=None
            ).collect()
        }
        got = {
            r.id: r.pagerank
            for r in algorithms.pagerank_weighted(
                ew, "w", directed=True, max_iter=8
            ).collect()
        }
        assert got == want

    def test_undirected_symmetrizes(self, spark):
        # undirected single weighted edge: both endpoints symmetric
        e = spark.createDataFrame([(1, 2, 5)], "src long, dst long, w int")
        got = {
            r.id: r.pagerank
            for r in algorithms.pagerank_weighted(
                e, "w", directed=False, max_iter=5
            ).collect()
        }
        assert got[1] == got[2] == 0.5

    def test_empty(self, spark):
        e = spark.createDataFrame([], "src long, dst long, w int")
        assert algorithms.pagerank_weighted(e, "w").count() == 0


def test_average_neighbor_degree_star(spark):
    """Star5: the hub's neighbors are 5 leaves of degree 1 (avg 1.0);
    each leaf's only neighbor is the hub of degree 5 (avg 5.0)."""
    out = as_map(
        metrics.average_neighbor_degree(edges_df(spark, STAR5)),
        "id",
        "avg_nbr_degree",
    )
    assert out[0] == 1.0
    for leaf in range(1, 6):
        assert out[leaf] == 5.0
