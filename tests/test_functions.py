"""Unit tests for text / dedup / similarity / multimodal operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.functions import (
    dedup as fdedup,
    multimodal as fmm,
    similarity as fsim,
    text as ftext,
)


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestText:
    def test_lang_id(self, spark):
        df = docs_df(
            spark,
            [
                "the cat and the dog of the house",
                "el perro y la casa de que y",
                "der hund und die katze ist das",
                "xyzzy qwerty",
            ],
        )
        out = {r.doc_id: r.lang for r in df.select(
            "doc_id", ftext.lang_id(F.col("text")).alias("lang")).collect()}
        assert out == {0: "en", 1: "es", 2: "de", 3: "und"}

    def test_token_count(self, spark):
        df = docs_df(spark, ["hello, world! 42"])
        n = df.select(ftext.token_count(F.col("text")).alias("n")).collect()[0].n
        assert n == 5  # hello , world ! 42

    def test_fingerprint_normalizes_whitespace_case(self, spark):
        df = docs_df(spark, ["Hello  World", "hello world", "other"])
        fps = [r.fp for r in df.select(ftext.fingerprint(F.col("text")).alias("fp")).collect()]
        assert fps[0] == fps[1] != fps[2]

    def test_gopher_repetition(self, spark):
        df = docs_df(spark, ["a b a b a", "unique words only here", "solo"])
        rows = {
            r.doc_id: r
            for r in ftext.gopher_repetition(df).collect()
        }
        # "a b a b a": 5 words, 2 distinct, top word "a" x3;
        # bigrams: "a b" x2, "b a" x2 of 4 -> 0.5
        assert rows[0].n_words == 5
        assert rows[0].distinct_word_frac == 0.4
        assert rows[0].top_word_frac == 0.6
        assert rows[0].top_bigram_frac == 0.5
        # all-distinct doc
        assert rows[1].distinct_word_frac == 1.0
        assert rows[1].top_word_frac == 0.25
        assert rows[1].top_bigram_frac == round(1.0 / 3, 4)
        # single word: no bigrams -> 0.0 via the left-join coalesce
        assert rows[2].n_words == 1
        assert rows[2].top_bigram_frac == 0.0


class TestDedup:
    def test_exact_dedup(self, spark):
        df = docs_df(spark, ["same text here", "Same  Text here", "unique one"])
        out = fdedup.exact_dedup(df)
        groups = {r.keep_doc_id: r.n_dups for r in out.collect()}
        assert groups == {0: 2, 2: 1}

    def test_duplicate_ngram_coverage(self, spark):
        df = docs_df(
            spark,
            [
                "the cat sat on the mat",   # shares "the cat sat"/"cat sat on" with doc 1
                "the cat sat on a log",
                "entirely different words here",
                "too short",                 # < 3 words -> 0 grams
            ],
        )
        rows = {r.doc_id: r for r in fdedup.duplicate_ngram_coverage(df).collect()}
        # doc 0: grams {the cat sat, cat sat on, sat on the, on the mat} — first two shared
        assert rows[0].n_ngrams == 4
        assert rows[0].dup_ngram_frac == 0.5
        assert rows[1].n_ngrams == 4
        assert rows[1].dup_ngram_frac == 0.5
        assert rows[2].dup_ngram_frac == 0.0
        assert rows[3].n_ngrams == 0
        assert rows[3].dup_ngram_frac == 0.0

    def test_minhash_identical_docs_collide(self, spark):
        df = docs_df(
            spark,
            ["a b c d e f g h", "a b c d e f g h", "z y x w v u t s"],
        )
        pairs = {(r.doc_a, r.doc_b) for r in fdedup.minhash_near_dup_pairs(df).collect()}
        assert (0, 1) in pairs
        assert (0, 2) not in pairs

    def test_ngram_jaccard_values(self, spark):
        df = docs_df(spark, ["a b c d", "a b c d", "a b x y"])
        out = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in fdedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
        }
        assert out[(0, 1)] == pytest.approx(1.0)
        # shingles: {ab,bc,cd} vs {ab,bx,xy}: inter=1 union=5
        assert out[(0, 2)] == pytest.approx(0.2)

    def test_ngram_jaccard_prefix_path_matches_naive(self, spark):
        """AllPairs prefix filtering is an exact physical rewrite: both
        plans must emit the identical pair set at the real threshold
        (completeness of the prefix guarantee is the thing under test)."""
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox leaps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "pack my box with five dozen juice jugs",
            "a completely unrelated sentence about spark plans",
            "the quick brown fox jumps over the lazy dog",
        ]
        df = docs_df(spark, texts)
        naive = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in fdedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
        }
        prefix = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in fdedup.ngram_jaccard_pairs(
                df, threshold=0.5, use_prefix_filter=True
            ).collect()
        }
        assert naive == prefix
        assert (0, 5, 1.0) in naive  # exact dup pair survives both paths

    def test_simhash_identical(self, spark):
        df = docs_df(spark, ["alpha beta gamma", "alpha beta gamma", "delta eps"])
        s = {r.doc_id: r.simhash for r in fdedup.simhash(df).collect()}
        assert s[0] == s[1]
        groups = fdedup.simhash_dup_groups(df).collect()
        assert len(groups) == 1 and groups[0].n_docs == 2

    def test_embedding_near_dup_lsh_finds_planted_pairs(self, spark):
        """The LSH-bucketed path must find planted duplicates (identical
        and scaled copies hash to the same bucket deterministically) and
        must agree with the brute-force oracle on this corpus."""
        import random

        rng = random.Random(7)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
        # planted: 100 = copy of 0, 101 = scaled copy of 1 (cos exactly 1)
        vecs.append((100, list(vecs[0][1])))
        vecs.append((101, [2.0 * x for x in vecs[1][1]]))
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        lsh = {
            (r.id_a, r.id_b): r.cos
            for r in fdedup.embedding_near_dup_pairs(
                df, threshold=0.95, dim=16
            ).collect()
        }
        assert lsh[(0, 100)] == pytest.approx(1.0)
        assert lsh[(1, 101)] == pytest.approx(1.0)
        brute = {
            (r.id_a, r.id_b): r.cos
            for r in fdedup.embedding_near_dup_pairs(
                df, threshold=0.95, brute_force=True
            ).collect()
        }
        assert lsh == brute


class TestSimilarity:
    def test_cosine_topk_exact(self, spark):
        vecs = [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.05]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        out = fsim.cosine_topk(df.filter(F.col("vec_id") == 0), df, k=2)
        rows = sorted((r.rank, r.neighbor_id) for r in out.collect())
        assert rows == [(1, 3), (2, 1)]  # 3 is closer to [1,0] than 1

    def test_ivf_topk_probe_recall(self, spark):
        """IVF candidates with more probes are a superset → recall vs the
        exact top-k can only improve; home-list assignment covers every
        vector exactly once."""
        import random

        rng = random.Random(7)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        home = fsim.ivf_assign(df, stride=20, n_probe=1).collect()
        assert len(home) == 120  # every vector lands in exactly one list
        assert len({r.id for r in home}) == 120
        exact = {
            (r.query_id, r.neighbor_id)
            for r in fsim.cosine_topk(df, df, k=3).collect()
        }

        def recall(out):
            got = {(r.query_id, r.neighbor_id) for r in out.collect()}
            return len(got & exact) / len(exact)

        r1 = recall(fsim.ivf_topk(df, k=3, stride=20, n_probe=1))
        r3 = recall(fsim.ivf_topk(df, k=3, stride=20, n_probe=3))
        assert r3 >= r1
        assert r3 > 0.4  # probing 3 of 6 lists recovers a solid fraction

    def test_ivf_recall_clustered_fixture_hits_080(self, spark, sf_dir):
        """VERDICT r11 Next #2: on the planted-cluster fixture with the
        √nlist n_probe default, IVF recall@5 must be ≥ 0.8 — the index
        works when the structure it assumes exists."""
        from sna_pyspark_graphframes_spark import registry

        row = registry.REGISTRY["ivf_recall_clustered"].fn(
            spark, sf_dir
        ).collect()[0]
        assert row.mean_recall_at_5 >= 0.8

    def test_ivf_topk_default_n_probe_is_sqrt_nlist(self, spark):
        """n_probe=None resolves to max(2, isqrt(nlist)) — the default
        result equals the explicit-√nlist result."""
        import random

        rng = random.Random(11)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        # stride=20 over 120 contiguous ids -> nlist=6 -> n_probe=2
        auto = {(r.query_id, r.neighbor_id, r.rank)
                for r in fsim.ivf_topk(df, k=3, stride=20).collect()}
        explicit = {(r.query_id, r.neighbor_id, r.rank)
                    for r in fsim.ivf_topk(df, k=3, stride=20, n_probe=2).collect()}
        assert auto == explicit

    def test_derive_n_probe_counts_actual_centroids(self, spark):
        """ADVICE r12: nlist must come from the ACTUAL codebook (ids with
        id % stride == 0), not ceil(N/stride) — on a sparse id space the
        two disagree, and the SQL twin counts the centroid table. ids =
        0,100,...,900 with stride 10: every id is a centroid (nlist=10,
        n_probe=3); the ceil estimate said nlist=1 (n_probe=2)."""
        import random

        rng = random.Random(7)
        vecs = [
            (i * 100, [rng.uniform(-1, 1) for _ in range(4)])
            for i in range(10)
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        assert fsim._derive_n_probe(df, 10, "vec_id") == 3
        # trained-codebook path: nlist = codebook row count
        cb = fsim.ivf_centroids(df, 1)
        assert fsim._derive_n_probe(df, None, "vec_id", codebook=cb) == 3
        # k_rows short-circuits any job
        assert fsim._derive_n_probe(df, None, "vec_id", k_rows=100) == 10

    def test_ivf_assign_stat_gate_matches_exact_k_rows(self, spark):
        """The r9 plan-statistics byte gate (no per-call count() job) must
        produce the identical assignment as an exact caller-supplied
        k_rows, on BOTH sides of the gate: estimate path vs exact path,
        and exact path forced past the gate (sharded)."""
        import random

        from sna_pyspark_graphframes_spark.plans import hints

        rng = random.Random(11)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(90)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        est = fsim.ivf_assign(df, stride=15, n_probe=2).collect()
        exact = fsim.ivf_assign(df, stride=15, n_probe=2, k_rows=6).collect()
        key = lambda rows: sorted((r.id, r.centroid_id, r.probe_rank) for r in rows)
        assert key(est) == key(exact)
        # statistics never run a job and overestimate only toward sharding
        c = fsim.ivf_centroids(df, stride=15)
        assert fsim._plan_stat_bytes(c) > 0
        old = hints.STATE_BROADCAST_MAX_ROWS
        hints.STATE_BROADCAST_MAX_ROWS = 0  # force the sharded path
        try:
            sharded = fsim.ivf_assign(df, stride=15, n_probe=2).collect()
        finally:
            hints.STATE_BROADCAST_MAX_ROWS = old
        assert key(sharded) == key(exact)

    def test_gate_estimate_untrusted_past_budget(self, spark, monkeypatch):
        """An estimate is only trusted for the broadcast decision: when it
        lands past the byte budget, ``_gated_codebook_rows`` resolves the
        EXACT count before anything can size shards with it (ADVICE r9 —
        a garbage width-scaled sentinel or a stride-inflated estimate
        would otherwise replicate every vector once per phantom shard),
        and an exact count back inside the budget restores broadcast."""
        from sna_pyspark_graphframes_spark.plans import hints

        vecs = [(i, [float(i + d) for d in range(8)]) for i in range(30)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        c = fsim.ivf_centroids(df, stride=10)  # 3 rows
        # simulate the ADVICE failure: stats report a huge "measurement"
        monkeypatch.setattr(fsim, "_plan_stat_bytes", lambda _df: 1 << 50)
        k_rows, is_exact = fsim._gated_codebook_rows(c, dim=8)
        assert is_exact and k_rows == 3  # counted, not 1<<50 // row_bytes
        # the exact count keeps the broadcast plan (3 rows ≪ budget)
        assign = fsim.ivf_assign(df, stride=10, n_probe=1)
        plan = assign._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert assign.count() == 30

    def test_plan_stat_bytes_degrades_without_jdf(self, spark):
        """No ``_jdf`` (Spark Connect has no private JVM handle): the
        stats probe returns None instead of raising, and the gate falls
        back to the exact count (ADVICE r9 low)."""

        class _NoJvm:
            def __getattr__(self, name):  # every attribute access fails
                raise AttributeError(name)

        assert fsim._plan_stat_bytes(_NoJvm()) is None
        vecs = [(i, [float(d) for d in range(4)]) for i in range(20)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        c = fsim.ivf_centroids(df, stride=5)
        real = fsim._plan_stat_bytes

        class _Wrapped:
            """Forward everything except the JVM handle."""

            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                if name == "_jdf":
                    raise AttributeError(name)
                return getattr(self._inner, name)

        assert real(_Wrapped(c)) is None
        k_rows, is_exact = fsim._gated_codebook_rows(_Wrapped(c), dim=4)
        assert is_exact and k_rows == 4

    def test_kmeans_centroids_converge_on_separable_clusters(self, spark):
        """Two tight, well-separated direction clusters + a 2-sample stride
        init: Lloyd's must send every vector to its own cluster's centroid
        and the refined centroids must be the per-cluster means."""
        a = [[1.0, 0.0, 0.05 * i, 0.0] for i in range(4)]   # ids 0,2,4,6
        b = [[0.0, 1.0, 0.0, 0.05 * i] for i in range(4)]   # ids 1,3,5,7
        vecs = [(2 * i, a[i]) for i in range(4)] + [(2 * i + 1, b[i]) for i in range(4)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        # stride=2 -> init centroids = every even id = all of cluster A;
        # cluster B has no seed, so convergence must still split A-seeds
        # across the two directions? No: all seeds are A-like, every vector
        # assigns somewhere, empty seeds drop. Use stride=7 -> seeds 0 and 7
        # (one per cluster).
        out = {
            r.centroid_id: r
            for r in fsim.kmeans_centroids(df, stride=7, n_iter=3, dim=4).collect()
        }
        assert set(out) == {0, 7}
        assert out[0].n_members == 4 and out[7].n_members == 4
        mean_a = [round(sum(v[d] for v in a) / 4, 6) for d in range(4)]
        mean_b = [round(sum(v[d] for v in b) / 4, 6) for d in range(4)]
        assert [round(x, 6) for x in out[0].cv] == pytest.approx(mean_a, abs=1e-6)
        assert [round(x, 6) for x in out[7].cv] == pytest.approx(mean_b, abs=1e-6)

    def test_auto_stride_policy(self):
        """stride = ceil(N / target_k), default target_k = ⌊√N⌋ — the
        enforced form of the docstrings' "stride ≈ √N" posture."""
        assert fsim.auto_stride(0) == 1
        assert fsim.auto_stride(100) == 10        # k=10 → stride 10
        assert fsim.auto_stride(1_000_000) == 1000
        assert fsim.auto_stride(100, target_k=4) == 25
        assert fsim.auto_stride(5, target_k=100) == 1  # never below 1

    def test_auto_stride_resolves_from_count(self, spark):
        vecs = [(i, [1.0, float(i)]) for i in range(100)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        c = fsim.ivf_centroids(df, stride=None)  # auto: stride 10
        assert sorted(r.centroid_id for r in c.collect()) == list(range(0, 100, 10))

    def test_kmeans_empty_input_and_bad_n_iter(self, spark):
        """ADVICE r7: an empty embeddings frame returns an empty codebook
        (same convention as pagerank/hits), and n_iter=0 — whose init
        codebook has no n_members — is rejected up front."""
        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        out = fsim.kmeans_centroids(empty)
        assert out.columns == ["centroid_id", "n_members", "cv"]
        assert out.count() == 0
        with pytest.raises(ValueError, match="n_iter"):
            fsim.kmeans_centroids(empty, n_iter=0)

    def test_ann_topk_runs_and_ranks(self, spark):
        vecs = [(i, [float(i % 5), float((i * 7) % 3), 1.0]) for i in range(40)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        out = fsim.ann_topk(df, dim=3, k=3, n_planes=2)
        rows = out.collect()
        assert len(rows) > 0
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append((r.rank, r.cos))
        for q, rs in by_q.items():
            rs.sort()
            coss = [c for _, c in rs]
            assert coss == sorted(coss, reverse=True)


class TestMultimodal:
    def test_decode_media_unknown_format_raises(self):
        # JPEG magic: compressed formats need codecs absent here
        with pytest.raises(NotImplementedError):
            fmm.decode_media(b"\xff\xd8\xff\xe0 jpeg bytes")

    def test_bmp_golden_bytes(self):
        """Pin the BMP byte format against a hand-written file: 2x2 RGB
        with distinct corner colors. Bottom-up rows => the file's FIRST
        pixel row is the image's BOTTOM row; BGR order; 2px*3B=6B rows
        padded to 8."""
        import struct

        import numpy as np

        img = np.array(
            [[[255, 0, 0], [0, 255, 0]],   # top row: red, green
             [[0, 0, 255], [10, 20, 30]]], # bottom row: blue, (10,20,30)
            dtype=np.uint8,
        )
        row_bottom = bytes([255, 0, 0]) + bytes([30, 20, 10]) + b"\x00\x00"
        row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
        data = row_bottom + row_top
        golden = (
            struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 2835, 2835, 0, 0)
            + data
        )
        assert fmm.encode_bmp(img) == golden
        kind, decoded = fmm.decode_media(golden)
        assert kind == "image"
        assert np.array_equal(decoded, img)

    def test_bmp_top_down_negative_height(self):
        """A negative biHeight means top-down row order — decoder must
        handle files our encoder doesn't produce."""
        import struct

        import numpy as np

        img = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)  # 1x2
        data = bytes([3, 2, 1]) + bytes([6, 5, 4]) + b"\x00\x00"
        raw = (
            struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 24, 0, len(data), 0, 0, 0, 0)
            + data
        )
        assert np.array_equal(fmm.decode_bmp(raw), img)

    def test_wav_golden_bytes(self):
        """Pin RIFF/WAVE PCM16 against a hand-written file, including an
        extra LIST chunk the decoder must skip."""
        import struct

        import numpy as np

        samples = np.array([0, 1000, -1000, 32767], dtype=np.int16)
        golden = fmm.encode_wav(samples, 8000)
        assert golden[:4] == b"RIFF" and golden[8:12] == b"WAVE"
        assert golden[12:16] == b"fmt "
        assert struct.unpack_from("<HHI", golden, 20) == (1, 1, 8000)
        rate, arr = fmm.decode_wav(golden)
        assert rate == 8000 and np.array_equal(arr[:, 0], samples)
        # insert a LIST chunk between fmt and data; decode must skip it
        fmt_end = 20 + 16
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = golden[:fmt_end] + extra + golden[fmt_end:]
        spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        rate2, arr2 = fmm.decode_wav(spliced)
        assert rate2 == 8000 and np.array_equal(arr2[:, 0], samples)

    def test_ppm_roundtrip_with_comment(self):
        import numpy as np

        img = fmm._plant_pixels(5, 3, 4)
        raw = fmm.encode_ppm(img)
        assert np.array_equal(fmm.decode_ppm(raw), img)
        commented = b"P6\n# a comment\n3 4\n255\n" + img.tobytes()
        assert np.array_equal(fmm.decode_ppm(commented), img)

    def test_planted_decode_end_to_end(self, spark):
        import numpy as np

        ids = spark.range(3).select(F.col("id").alias("doc_id"))
        img_stats = {
            r.media_id: r for r in fmm.decode_image_stats(
                fmm.planted_bmp_media(ids, w=8, h=6)
            ).collect()
        }
        for m in range(3):
            flat = fmm._plant_pixels(m, 8, 6).reshape(-1).astype(np.int64)
            r = img_stats[m]
            assert (r.width, r.height) == (8, 6)
            assert r.px_sum == int(flat.sum())
            assert r.px_weighted == int((np.arange(flat.size) * flat).sum())
        aud = {
            r.media_id: r for r in fmm.decode_audio_stats(
                fmm.planted_wav_media(ids, n_samples=16, rate=22050)
            ).collect()
        }
        for m in range(3):
            s = fmm._plant_samples(m, 16).astype(np.int64)
            r = aud[m]
            assert (r.sample_rate, r.n_channels, r.n_samples) == (22050, 1, 16)
            assert r.amp_sum == int(s.sum())
            assert r.amp_weighted == int((np.arange(16) * s).sum())

    def test_featurize_deterministic(self, spark):
        df = docs_df(spark, ["payload one", "payload two"])
        media = fmm.documents_as_media(
            df.withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text"))
        )
        out1 = {r.media_id: (r.digest, tuple(r.feature)) for r in fmm.featurize(media).collect()}
        out2 = {r.media_id: (r.digest, tuple(r.feature)) for r in fmm.featurize(media).collect()}
        assert out1 == out2
        assert all(len(v[1]) == 8 for v in out1.values())
        import hashlib

        assert out1[0][0] == hashlib.md5(b"payload one").hexdigest()


class TestMultimodalOps:
    def test_frame_sample_fanout(self, spark):
        """One row per sampled frame; count driven by duration_ms."""
        df = docs_df(spark, ["abcde", "x"])  # n_chars column added below
        media = fmm.documents_as_media(
            df.withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text"))
        )
        out = fmm.sample_frames(media, fps=1.0).collect()
        # duration = n_chars*10 ms -> always < 1000 ms here -> 1 frame each
        assert sorted((r.media_id, r.frame_idx) for r in out) == [(0, 0), (1, 0)]
        assert all(r.frame_ms == 0 for r in out)

    def test_thumbnails_deterministic(self, spark):
        df = docs_df(spark, ["payload one"])
        media = fmm.documents_as_media(
            df.withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text"))
        )
        a = fmm.resize_thumbnails(media).collect()
        b = fmm.resize_thumbnails(media).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert a[0].out_w == 8 and a[0].out_h == 8
        import hashlib

        base = hashlib.md5(b"payload one").hexdigest()
        assert a[0].thumb_digest == hashlib.md5(f"{base}|8x8".encode()).hexdigest()


class TestMultiProbe:
    def test_multiprobe_recall_at_least_single_probe(self, spark):
        """Multi-probe candidates are a superset of single-probe → recall
        vs brute force can only improve."""
        import random

        rng = random.Random(5)
        vecs = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in fsim.cosine_topk(df, df, k=3).collect()
        }

        def recall(out):
            got = {(r.query_id, r.neighbor_id) for r in out.collect()}
            return len(got & exact) / len(exact)

        r0 = recall(fsim.ann_topk(df, dim=8, k=3, n_planes=4, probes=0))
        r4 = recall(fsim.ann_topk(df, dim=8, k=3, n_planes=4, probes=4))
        assert r4 >= r0
        assert r4 > 0.5  # hamming-1 probing should recover most neighbors


class TestDedupAgainst:
    def test_reasons_and_keeps(self, spark):
        corpus = docs_df(
            spark,
            [
                "alpha beta gamma delta epsilon zeta eta theta",
                "one two three four five six seven eight",
            ],
        )
        base = "alpha beta gamma delta epsilon zeta eta theta"
        new = spark.createDataFrame(
            [
                (100, base),                      # exact copy of corpus doc 0
                (101, base + " tail"),            # near dup of corpus doc 0
                (102, "completely novel words appear nowhere else at all"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.drop_reason for r in fdedup.dedup_against(new, corpus).collect()}
        assert out[100] == "exact"
        assert out[101] == "near_dup"
        assert out[102] is None

    def test_exact_beats_near_dup(self, spark):
        """An exact copy also band-collides; the reason must still be exact."""
        corpus = docs_df(spark, ["x y z w v u t s r q"])
        new = spark.createDataFrame(
            [(7, "x y z w v u t s r q")], "doc_id long, text string"
        )
        out = fdedup.dedup_against(new, corpus).collect()
        assert out[0].drop_reason == "exact"


class TestBinaryFileIngest:
    def test_binaryfile_source_to_decode(self, spark, tmp_path):
        """End-to-end multimodal ingestion: real BMP files on disk ->
        Spark's binaryFile source (path/length/content columns) -> the
        real decoder — the production shape for media ingest."""
        import numpy as np
        import pyspark.sql.functions as F

        imgs = {}
        for i in range(3):
            px = fmm._plant_pixels(i, 5, 4)
            (tmp_path / f"img_{i}.bmp").write_bytes(fmm.encode_bmp(px))
            imgs[i] = px
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bmp")
            .load(str(tmp_path))
            .select(
                F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp", 1)
                .cast("long")
                .alias("media_id"),
                "content",
            )
        )
        stats = {r.media_id: r for r in fmm.decode_image_stats(df).collect()}
        assert set(stats) == {0, 1, 2}
        for i, px in imgs.items():
            flat = px.reshape(-1).astype(np.int64)
            r = stats[i]
            assert (r.width, r.height) == (5, 4)
            assert r.px_sum == int(flat.sum())
            assert r.px_weighted == int((np.arange(flat.size) * flat).sum())


class TestTwinMemoEviction:
    def test_clear_twin_memo_unpersists_and_survives_rep_clear(self, spark):
        """ADVICE r12: the certificate-trajectory pool must survive the
        per-rep clear_session_caches (bench honesty contract) but be
        evictable at session teardown via the explicit hook."""
        from sna_pyspark_graphframes_spark import registry as R

        before = len(R._TWIN_MEMO)
        df = R._twin_memo(spark, "/tmp/none", "_test_tag", lambda: spark.range(3))
        assert df.count() == 3
        assert len(R._TWIN_MEMO) == before + 1
        R.clear_session_caches()  # per-rep clear must NOT touch the pool
        assert len(R._TWIN_MEMO) == before + 1
        # memo hit: same frame back, no rebuild
        assert R._twin_memo(spark, "/tmp/none", "_test_tag", lambda: 1 / 0) is df
        R.clear_twin_memo()
        assert len(R._TWIN_MEMO) == 0


class TestPcaPower:
    def test_planted_dominant_direction(self, spark):
        """Vectors = t·d + small noise for a fixed direction d: the
        6-round iterate must align with d (|cos| > 0.99) and the
        eigenvalue must capture most of the trace."""
        import math
        import random

        rng = random.Random(3)
        d = [0.6, 0.8, 0.0, 0.0]
        vecs = []
        for i in range(200):
            t = rng.uniform(-1, 1)
            vecs.append(
                (i, [t * dj + rng.uniform(-0.01, 0.01) for dj in d])
            )
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        rows = sorted(
            fsim.pca_power_component(df, n_iter=6, dim=4).collect(),
            key=lambda r: r.pos,
        )
        w = [r.loading for r in rows]
        assert abs(sum(wi * di for wi, di in zip(w, d))) > 0.99
        assert rows[0].eigenvalue / rows[0].total_var > 0.95
        # unit vector out of the normalize step
        assert math.isclose(sum(x * x for x in w), 1.0, rel_tol=1e-4)

    def test_zero_variance_returns_zero(self, spark):
        df = spark.createDataFrame(
            [(i, [1.0, 2.0]) for i in range(5)],
            "vec_id long, embedding array<float>",
        )
        rows = fsim.pca_power_component(df, n_iter=3, dim=2).collect()
        assert all(r.loading == 0.0 and r.eigenvalue == 0.0 for r in rows)

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert fsim.pca_power_component(df).count() == 0

    def test_zero_iterations_returns_start_vector(self, spark):
        """ADVICE r13: n_iter=0 ran no power step — the uniform start
        vector comes back with ev = tv = 0.0 (previously NameError)."""
        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [3.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        rows = sorted(
            fsim.pca_power_component(df, n_iter=0, dim=2).collect(),
            key=lambda r: r.pos,
        )
        assert [r.eigenvalue for r in rows] == [0.0, 0.0]
        assert [r.total_var for r in rows] == [0.0, 0.0]
        import math

        assert all(
            math.isclose(r.loading, round(1 / math.sqrt(2), 6)) for r in rows
        )


class TestAudioFrameEnergy:
    def test_hand_computed_frames_with_short_tail(self, spark):
        """100 samples at frame=80: one full frame + a 20-sample tail
        whose n/energy/peak are computed from the planted closed form."""
        import numpy as np

        ids = spark.createDataFrame([(3,)], "doc_id long")
        media = fmm.planted_wav_media(ids, n_samples=100, rate=8000)
        got = {
            r.frame_idx: (r.n, r.energy, r.peak)
            for r in fmm.audio_frame_energy(media, frame=80).collect()
        }
        s = ((3 * 31 + np.arange(100, dtype=np.int64) * 7) % 2000 - 1000)
        for f0 in (0, 80):
            w = s[f0 : f0 + 80]
            assert got[f0 // 80] == (
                len(w),
                int((w * w).sum()),
                int(np.abs(w).max()),
            )
        assert len(got) == 2


class TestEditDistancePairs:
    def test_hand_built_variants(self, spark):
        """Substitution, deletion, insertion each at distance 1 are
        found; distance-2 and unrelated strings are not; exact
        duplicates pair at distance 0."""
        rows = [
            (0, "spark"),
            (1, "spork"),    # substitution -> dist 1
            (2, "spar"),     # deletion -> dist 1
            (3, "sparko"),   # insertion -> dist 1
            (4, "spoon"),    # dist 3 from spark
            (5, "spark"),    # exact dup -> dist 0
            (6, "sprk"),     # deletion of 'a' -> dist 1
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): r.dist
            for r in fdedup.edit_distance_pairs(df, "text").collect()
        }
        assert got[(0, 1)] == 1 and got[(0, 2)] == 1 and got[(0, 3)] == 1
        assert got[(0, 5)] == 0 and got[(0, 6)] == 1
        assert (0, 4) not in got
        # symmetric companions of the planted pairs, nothing else bogus
        assert all(d <= 1 for d in got.values())

    def test_matches_brute_force(self, spark):
        """The deletion-neighborhood candidates are COMPLETE for
        distance <= 1: equal to the brute-force pair scan."""
        import itertools

        words = ["cat", "cut", "cart", "ca", "dog", "dig", "dg", "cat"]
        df = spark.createDataFrame(
            list(enumerate(words)), "doc_id long, text string"
        )
        got = {
            (r.id_a, r.id_b): r.dist
            for r in fdedup.edit_distance_pairs(df, "text").collect()
        }

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                    )
            return dp[len(b)]

        want = {
            (i, j): lev(words[i], words[j])
            for i, j in itertools.combinations(range(len(words)), 2)
            if lev(words[i], words[j]) <= 1
        }
        assert got == want
