"""Semantic tests for the corpus-pipeline operators (functions/corpus.py)
on hand-built documents where the right answer is computable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.functions import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNearDupClusters:
    def test_transitive_cluster_collapses_to_one_canonical(self, spark):
        """A~B and B~C must land in ONE cluster with one canonical doc,
        even if A and C alone would not pair."""
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = _docs(
            spark,
            [
                (1, base),
                (2, base + " extra"),
                (3, base + " extra more"),
                (50, "totally different words nothing shared here at all ok"),
            ],
        )
        out = corpus.near_dup_clusters(docs).collect()
        clustered = {r.doc_id: r for r in out}
        assert 50 not in clustered  # no pair → not in any cluster
        ids = set(clustered)
        assert ids == {1, 2, 3}
        assert len({r.cluster_id for r in out}) == 1
        canon = [r.doc_id for r in out if r.is_canonical]
        assert canon == [1]

    def test_dedup_corpus_keeps_canonical_and_singletons(self, spark):
        base = "one two three four five six seven eight nine ten"
        docs = _docs(
            spark,
            [
                (7, base),
                (9, base + " tail"),
                (11, "unrelated corpus text entirely distinct tokens everywhere"),
            ],
        )
        kept = {r.doc_id for r in corpus.dedup_corpus(docs).collect()}
        assert kept == {7, 11}


class TestDocChunks:
    def test_window_and_overlap(self, spark):
        words = " ".join(f"w{i}" for i in range(20))
        out = corpus.doc_chunks(
            _docs(spark, [(1, words)]), size=8, step=4
        ).collect()
        by_id = {r.chunk_id: r for r in out}
        # starts 0,4,8,12,16 → 5 chunks
        assert sorted(by_id) == [0, 1, 2, 3, 4]
        assert by_id[0].chunk.split() == [f"w{i}" for i in range(8)]
        assert by_id[1].chunk.split() == [f"w{i}" for i in range(4, 12)]
        # final partial window
        assert by_id[4].chunk.split() == [f"w{i}" for i in range(16, 20)]
        assert by_id[4].n_tokens == 4
        assert by_id[0].n_tokens == 8

    def test_short_doc_single_chunk(self, spark):
        out = corpus.doc_chunks(_docs(spark, [(1, "a b c")]), size=8, step=4).collect()
        assert len(out) == 1
        assert out[0].chunk == "a b c"
        assert out[0].n_tokens == 3


class TestRedact:
    def test_emails_and_urls_replaced_and_counted(self, spark):
        docs = _docs(
            spark,
            [
                (1, "mail me at bob.smith+x@ex-ample.org or see https://a.b/c?d=1 soon"),
                (2, "no pii here"),
            ],
        )
        out = {r.doc_id: r for r in corpus.redact(docs).collect()}
        assert out[1].clean_text == "mail me at <EMAIL> or see <URL> soon"
        assert out[1].n_redacted == 2
        assert out[2].clean_text == "no pii here"
        assert out[2].n_redacted == 0


class TestRepetition:
    def test_dup_ratio(self, spark):
        out = {
            r.doc_id: r
            for r in corpus.repetition_features(
                _docs(spark, [(1, "spam spam spam eggs"), (2, "a b c d")])
            ).collect()
        }
        assert out[1].n_words == 4 and out[1].n_distinct == 2
        assert out[1].dup_ratio == 0.5
        assert out[2].dup_ratio == 0.0


class TestVocabTfidf:
    def test_vocab_topk_order_and_ties(self, spark):
        docs = _docs(spark, [(1, "b a b c a b"), (2, "c a")])
        out = corpus.vocab_topk(docs, k=2).collect()
        assert [(r.w, r.n) for r in out] == [("a", 3), ("b", 3)]

    def test_tfidf_zero_for_ubiquitous_terms(self, spark):
        docs = _docs(spark, [(1, "x rare1"), (2, "x rare2")])
        rows = corpus.tf_idf_topk(docs, k=2).collect()
        got = {(r.doc_id, r.w): r.tfidf for r in rows}
        assert got[(1, "x")] == 0.0  # df == N → ln(1) = 0
        assert got[(1, "rare1")] == pytest.approx(0.6931, abs=1e-4)


class TestSplits:
    def test_hash_split_deterministic_and_partitioned(self, spark):
        docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in corpus.hash_split(docs).collect()}
        b = {r.doc_id: r.split for r in corpus.hash_split(docs).collect()}
        assert a == b
        frac_train = sum(1 for v in a.values() if v == "train") / len(a)
        assert 0.6 < frac_train < 0.9  # 12/16 expected
        assert set(a.values()) == {"train", "val", "test"}

    def test_stratified_sample_quota_and_determinism(self, spark):
        rows = [(i, "en" if i % 3 else "de") for i in range(90)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        out = corpus.stratified_sample(docs, per_stratum=5).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r.doc_id)
        assert {k: len(v) for k, v in by_lang.items()} == {"en": 5, "de": 5}
        out2 = corpus.stratified_sample(docs, per_stratum=5).collect()
        assert {(r.doc_id, r.rn) for r in out} == {(r.doc_id, r.rn) for r in out2}


class TestDecontaminate:
    def test_exact_benchmark_copy_is_fully_contaminated(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
        train = _docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon"),  # identical
                (2, "alpha beta something else entirely here"),  # partial
                (3, "totally unrelated words nothing shared four"),  # clean
            ],
        )
        out = {r.doc_id: r for r in corpus.decontaminate(train, bench).collect()}
        assert out[1].overlap == 1.0 and out[1].contaminated
        assert 0.0 < out[2].overlap < 0.5 and not out[2].contaminated
        assert out[3].overlap == 0.0 and not out[3].contaminated

    def test_overlap_is_fraction_of_training_doc_shingles(self, spark):
        """Denominator is the TRAINING doc's shingle count: a short doc
        fully inside a long benchmark doc is 100% contaminated."""
        bench = _docs(spark, [(100, "a b c d e f g h i j k l m n")])
        train = _docs(spark, [(1, "c d e")])  # 2 bigrams, both in bench
        (row,) = corpus.decontaminate(train, bench).collect()
        assert row.overlap == 1.0 and row.contaminated


class TestBowCosinePairs:
    def test_identical_docs_cosine_one(self, spark):
        docs = _docs(
            spark,
            [
                (1, "x y z x y"),
                (2, "x y z x y"),
                (3, "p q r s t"),
            ],
        )
        out = corpus.bow_cosine_pairs(docs, threshold=0.5).collect()
        assert [(r.doc_a, r.doc_b, r.cosine) for r in out] == [(1, 2, 1.0)]

    def test_orthogonal_docs_never_pair(self, spark):
        docs = _docs(spark, [(1, "a b c"), (2, "d e f")])
        assert corpus.bow_cosine_pairs(docs, threshold=0.0).count() == 0

    def test_max_df_drops_stop_terms_from_pairing(self, spark):
        """A term in every doc must not create candidate pairs once capped."""
        docs = _docs(
            spark,
            [(i, f"the unique{i} word{i}") for i in range(1, 6)],
        )
        # 'the' has df=5; with max_df=4 no shared terms remain
        assert corpus.bow_cosine_pairs(docs, threshold=0.0, max_df=4).count() == 0
        # without the cap, 'the' pairs everything
        assert corpus.bow_cosine_pairs(docs, threshold=0.0, max_df=None).count() == 10


class TestCurateCorpus:
    def test_stages_compose(self, spark):
        """Exact dup dropped, near-dup non-canonical dropped, low quality
        dropped, survivors get a split label."""
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (1, base + " uno dos tres quatro cinco seis", "en", "s0", 1),
            (2, base + " uno dos tres quatro cinco seis", "en", "s0", 1),  # exact dup of 1
            (3, base + " uno dos tres quatro cinco seis siete extra", "en", "s0", 1),  # near-dup of 1
            (4, "completely different healthy document with many plain words here", "en", "s1", 1),
            (5, "x", "en", "s1", 1),  # fails the n_words >= 5 quality gate
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = {r.doc_id: r for r in corpus.curate_corpus(docs).collect()}
        assert set(out) == {1, 4}
        assert all(r.split in ("train", "val", "test") for r in out.values())


class TestPackSequences:
    def test_blocks_partition_each_shard_token_stream(self, spark):
        """Per shard: block spans tile the concatenated token stream exactly
        — each doc's spans cover [0, n_toks) without gaps or overlaps, and
        every block except a shard's last holds exactly block_tokens."""
        rows = [(i, "tok " * (7 + i % 5)) for i in range(40)]
        docs = spark.createDataFrame(
            [(i, t.strip()) for i, t in rows], "doc_id long, text string"
        )
        out = corpus.pack_sequences(docs, block_tokens=8, n_shards=4).collect()
        # per-doc spans tile [0, n_toks)
        per_doc: dict[int, list] = {}
        for r in out:
            per_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, spans in per_doc.items():
            spans.sort(key=lambda r: r.doc_tok_start)
            n_toks = 7 + doc_id % 5
            assert spans[0].doc_tok_start == 0
            assert spans[-1].doc_tok_end == n_toks
            for a, b in zip(spans, spans[1:]):
                assert a.doc_tok_end == b.doc_tok_start
        # per (shard, block): full blocks carry exactly block_tokens
        blocks: dict[tuple, int] = {}
        last_block = {}
        for r in out:
            key = (r.shard, r.block_id)
            blocks[key] = blocks.get(key, 0) + (r.doc_tok_end - r.doc_tok_start)
            last_block[r.shard] = max(last_block.get(r.shard, -1), r.block_id)
        for (shard, block_id), tok in blocks.items():
            if block_id < last_block[shard]:
                assert tok == 8, (shard, block_id, tok)
            else:
                assert 0 < tok <= 8

    def test_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(i, "a b c d e") for i in range(10)], "doc_id long, text string"
        )
        a = sorted(map(tuple, corpus.pack_sequences(docs, 4, 2).collect()))
        b = sorted(map(tuple, corpus.pack_sequences(docs, 4, 2).collect()))
        assert a == b


class TestDomainMixture:
    def test_exact_ratio_and_bottleneck_domain(self, spark):
        """parts {a:2, b:1} with n_a=10, n_b=3 → K = min(10//2, 3//1) = 3;
        keep 6 a-docs and 3 b-docs — exact 2:1 mixture."""
        rows = [(i, "x", "a") for i in range(10)] + [
            (100 + i, "x", "b") for i in range(3)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = corpus.domain_mixture(docs, {"a": 2, "b": 1}).collect()
        by_lang: dict[str, int] = {}
        for r in out:
            by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
        assert by_lang == {"a": 6, "b": 3}

    def test_unlisted_domain_dropped_and_selection_deterministic(self, spark):
        rows = [(i, "x", "a") for i in range(4)] + [(50, "x", "junk")]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out1 = {r.doc_id for r in corpus.domain_mixture(docs, {"a": 1}).collect()}
        out2 = {r.doc_id for r in corpus.domain_mixture(docs, {"a": 1}).collect()}
        assert out1 == out2
        assert 50 not in out1
        assert len(out1) == 4  # K = 4//1, all of domain a kept


class TestEmbeddingDedupClusters:
    def test_transitive_semantic_cluster(self, spark):
        """0≈100 (copy) and 100≈101 via scaling → one cluster, canonical=
        min id; isolated vector 50 excluded."""
        import random

        rng = random.Random(3)
        base = [rng.uniform(-1, 1) for _ in range(16)]
        vecs = [
            (0, base),
            (100, list(base)),                 # exact copy of 0
            (101, [2.0 * x for x in base]),    # scaled copy (cos = 1)
            (50, [rng.uniform(-1, 1) for _ in range(16)]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        out = {r.vec_id: r for r in corpus.embedding_dedup_clusters(
            df, threshold=0.95, dim=16).collect()}
        assert set(out) == {0, 100, 101}
        assert {r.cluster_id for r in out.values()} == {0}
        assert [i for i, r in out.items() if r.is_canonical] == [0]


class TestProfileTable:
    def test_nulls_distincts_and_ranges(self, spark):
        from sna_pyspark_graphframes_spark.operators.relational import profile_table

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b"), (4, "a")],
            "id long, v string",
        )
        out = {r.col_name: r for r in profile_table(df, ["id", "v"]).collect()}
        assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
        assert out["id"].n_distinct == 4
        assert out["id"].min_value == "1" and out["id"].max_value == "4"
        assert out["v"].n_nulls == 1
        assert out["v"].n_distinct == 2  # nulls excluded
        assert out["v"].min_value == "a" and out["v"].max_value == "b"


class TestBigramSurprisal:
    def test_fluent_scores_lower_than_shuffled(self, spark):
        """A corpus of repeated fluent sentences vs one shuffled doc: the
        shuffled doc's bigrams are rare -> higher conditional surprisal,
        even though its unigram distribution matches."""
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        fluent = "the cat sat on the mat"
        docs = spark.createDataFrame(
            [(i, fluent) for i in range(5)] + [(9, "mat the on sat cat the")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.surprisal for r in fc.bigram_surprisal(docs).collect()}
        for i in range(5):
            assert got[i] < got[9]

    def test_hand_computed_single_doc(self, spark):
        """One doc 'a b a b': pairs (a,b),(b,a),(a,b); V=2;
        s(a,b) = -ln((2+1)/(2+2)); s(b,a) = -ln((1+1)/(1+2))."""
        import math

        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
        r = fc.bigram_surprisal(docs).collect()[0]
        assert r.n_bigrams == 3
        exp = (2 * -math.log(3 / 4) + -math.log(2 / 3)) / 3
        assert r.surprisal == round(exp, 4)


class TestKnBigram:
    def test_hand_computed_kn(self, spark):
        """Corpus ['a b','a b','a c','c b']: bigram types (a,b)x2,
        (a,c)x1, (c,b)x1; c(a.)=3, N1+(a.)=2, c(c.)=1, N1+(c.)=1;
        N1+(.b)=2, N1+(.c)=1, N1+(..)=3. With D=0.75:
        P(b|a)=1.25/3+0.5*(2/3)=0.75, P(c|a)=0.25/3+0.5*(1/3)=0.25
        (the a-context sums to 1 over its observed continuations here),
        P(b|c)=0.25/1+0.75*(2/3)=0.75."""
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(0, "a b"), (1, "a b"), (2, "a c"), (3, "c b")],
            "doc_id long, text string",
        )
        got = {(r.w1, r.w2): (r.c, r.p_kn) for r in fc.kn_bigram_top(docs).collect()}
        assert got == {
            ("a", "b"): (2, 0.75),
            ("a", "c"): (1, 0.25),
            ("c", "b"): (1, 0.75),
        }

    def test_single_word_docs_produce_no_pairs(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(0, "solo"), (1, ""), (2, "x y")], "doc_id long, text string"
        )
        rows = fc.kn_bigram_top(docs).collect()
        assert [(r.w1, r.w2) for r in rows] == [("x", "y")]

    def test_topk_ties_deterministic(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(0, "b a"), (1, "a b"), (2, "a c")], "doc_id long, text string"
        )
        rows = fc.kn_bigram_top(docs, k=2).collect()
        # all counts 1 → tie-break (w1, w2) ascending
        assert [(r.w1, r.w2) for r in rows] == [("a", "b"), ("a", "c")]


class TestKnDocSurprisal:
    def test_fluent_scores_lower_than_shuffled(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        fluent = "the cat sat on the mat"
        docs = spark.createDataFrame(
            [(i, fluent) for i in range(5)] + [(9, "mat the on sat cat the")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.kn_surprisal
            for r in fc.kn_doc_surprisal(docs).collect()
        }
        for i in range(5):
            assert got[i] < got[9]

    def test_uniform_repeat_single_bigram(self, spark):
        """One doc 'a b': the only bigram type — P_KN(b|a) =
        (1-.75)/1 + .75*1*(1/1) = 1.0, surprisal -ln(1) = 0."""
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        r = fc.kn_doc_surprisal(docs).collect()[0]
        assert (r.n_bigrams, r.kn_surprisal) == (1, 0.0)


class TestUnigramViterbi:
    def test_differential_vs_python_dp(self, spark):
        """Same vocab construction + DP in pure Python: 6-dp logps make
        the distributed unrolled-column DP EXACTLY equal."""
        import math
        from collections import Counter

        from sna_pyspark_graphframes_spark.functions import corpus as fc

        texts = ["ab ab b a abab", "ab ba"]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        words = Counter(w for t in texts for w in t.split())
        sub = Counter()
        for w, f in words.items():
            for j in range(len(w)):
                for l in range(1, min(4, len(w) - j) + 1):
                    sub[w[j : j + l]] += f
        ranked = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = {p for p, _ in ranked[:50]} | {p for p in sub if len(p) == 1}
        tot = sum(sub[p] for p in kept)
        logp = {p: round(math.log(sub[p] / tot), 6) for p in kept}

        def vit(w):
            b = [0.0] + [None] * len(w)
            for i in range(1, len(w) + 1):
                b[i] = max(
                    b[j] + logp.get(w[j:i], -1e9)
                    for j in range(max(0, i - 4), i)
                )
            return round(b[len(w)], 4)

        want = {w: (f, vit(w)) for w, f in words.items()}
        got = {
            r.word: (r.freq, r.score)
            for r in fc.unigram_viterbi_scores(docs).collect()
        }
        assert got == want

    def test_repeated_piece_composes(self, spark):
        """'abab' must score exactly 2x logp('ab') — the DP finds the
        2-piece segmentation over char-by-char alternatives."""
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(0, "ab ab b a abab"), (1, "ab ba")], "doc_id long, text string"
        )
        got = {r.word: r.score for r in fc.unigram_viterbi_scores(docs).collect()}
        assert got["abab"] == round(2 * (got["ab"] / 1), 4) == 2 * got["ab"]

    def test_words_over_cap_excluded(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(0, "short averyverylongword ok")], "doc_id long, text string"
        )
        words = {r.word for r in fc.unigram_viterbi_scores(docs).collect()}
        assert "averyverylongword" not in words and "short" in words


class TestTemperatureMixture:
    def test_flattens_toward_uniform(self, spark):
        """tau=0.5 must give the rare domain a LARGER share than its
        natural frequency and the dominant domain a smaller one."""
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(i, "t", "big" if i < 90 else "small") for i in range(100)],
            "doc_id long, text string, lang string",
        )
        kept = fc.temperature_mixture(docs, budget=50, tau=0.5, domain_col="lang")
        by = {r["lang"]: 0 for r in kept.collect()}
        for r in kept.collect():
            by[r["lang"]] += 1
        # natural shares: 90/10; sqrt shares: ~0.75/0.25
        assert by["small"] / (by["big"] + by["small"]) > 0.10 * 1.5
        assert by["big"] + by["small"] <= 50

    def test_tau_one_matches_natural_proportions(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(i, "t", "a" if i < 80 else "b") for i in range(100)],
            "doc_id long, text string, lang string",
        )
        kept = fc.temperature_mixture(docs, budget=50, tau=1.0, domain_col="lang")
        by = {}
        for r in kept.collect():
            by[r["lang"]] = by.get(r["lang"], 0) + 1
        assert by == {"a": 40, "b": 10}  # floor(50*0.8), floor(50*0.2)

    def test_quota_caps_at_domain_size(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus as fc

        docs = spark.createDataFrame(
            [(i, "t", "a" if i < 95 else "b") for i in range(100)],
            "doc_id long, text string, lang string",
        )
        # tau -> 0 pushes half the budget at the 5-doc domain; cap at 5
        kept = fc.temperature_mixture(docs, budget=80, tau=0.01, domain_col="lang")
        by = {}
        for r in kept.collect():
            by[r["lang"]] = by.get(r["lang"], 0) + 1
        assert by["b"] == 5  # saturated, not upsampled


class TestShuffleShards:
    def test_shuffle_shards_partition_and_determinism(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(64)], "doc_id long, text string"
        )
        out = corpus.shuffle_shards(df, n_shards=4, seed=7).collect()
        # permutation completeness: every doc exactly once
        assert sorted(r.doc_id for r in out) == list(range(64))
        # positions are 0..len-1 within each shard
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r.pos)
        assert set(by_shard) <= set(range(4))
        for ps in by_shard.values():
            assert sorted(ps) == list(range(len(ps)))
        # deterministic under re-run; different under a different seed
        again = corpus.shuffle_shards(df, n_shards=4, seed=7).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
        other = corpus.shuffle_shards(df, n_shards=4, seed=8).collect()
        assert sorted(map(tuple, out)) != sorted(map(tuple, other))


class TestDsirLogWeights:
    def test_target_like_docs_score_higher(self, spark):
        """DSIR (Xie et al. 2023): documents whose hashed-unigram profile
        matches the target slice must out-weigh off-target documents, and
        the weights are a deterministic function of the corpus."""
        from sna_pyspark_graphframes_spark.functions import corpus

        en = ["the cat sat on the mat", "the dog ate the food",
              "a cat and a dog met the mat"]
        de = ["der hund frisst das futter", "die katze sitzt auf der matte"]
        rows = [(i, t) for i, t in enumerate(en + de)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        target = docs.filter("doc_id < 3")  # the English slice
        out = {r.doc_id: r.log_weight
               for r in corpus.dsir_log_weights(docs, target).collect()}
        assert set(out) == set(range(5))
        assert min(out[i] for i in (0, 1, 2)) > max(out[i] for i in (3, 4))
        again = {r.doc_id: r.log_weight
                 for r in corpus.dsir_log_weights(docs, target).collect()}
        assert out == again

    def test_uniform_target_gives_zero_information(self, spark):
        """If the target IS the corpus, p̂ == q̂ bucket-for-bucket and every
        log-ratio is exactly 0 — the weights carry no signal."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma{i % 3}") for i in range(12)],
            "doc_id long, text string",
        )
        out = corpus.dsir_log_weights(docs, docs).collect()
        assert len(out) == 12
        assert all(r.log_weight == 0.0 for r in out)

    def test_empty_documents_produce_no_row(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(0, "some words here"), (1, ""), (2, "   ")],
            "doc_id long, text string",
        )
        out = corpus.dsir_log_weights(docs, docs.filter("doc_id = 0")).collect()
        assert sorted(r.doc_id for r in out) == [0]

    def test_select_topk_is_deterministic_weighted_sample(self, spark):
        """Gumbel-top-k selection: deterministic under re-run and seed-
        sensitive; ranks are 1..k over corpus doc_ids; a higher-weight
        doc wins a tie-free majority of slots when k is small."""
        from sna_pyspark_graphframes_spark.functions import corpus

        rows = [(i, "the cat sat on the mat" if i % 2 == 0
                 else "der hund frisst das futter") for i in range(40)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        target = docs.filter("doc_id % 2 = 0")
        out = corpus.dsir_select_topk(docs, target, k=10, seed=42).collect()
        assert len(out) == 10
        assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(range(1, 11))
        assert {r.doc_id for r in out} <= set(range(40))
        again = corpus.dsir_select_topk(docs, target, k=10, seed=42).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
        other = corpus.dsir_select_topk(docs, target, k=10, seed=7).collect()
        assert sorted(map(tuple, out)) != sorted(map(tuple, other))
        # sampling follows the weights: English (target-like) docs carry
        # strictly higher log-weight, so they must dominate the sample
        n_en = sum(1 for r in out if r.doc_id % 2 == 0)
        assert n_en >= 7


class TestBpePairCounts:
    def test_golden_counts_and_short_word_guard(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(0, "banana bandana"), (1, "a"), (2, "")],
            "doc_id long, text string",
        )
        rows = corpus.bpe_pair_counts(docs, k=10).collect()
        got = {r.pair: r.n for r in rows}
        # banana: ba,an,na,an,na ; bandana: ba,an,nd,da,an,na
        assert got == {"an": 4, "na": 3, "ba": 2, "nd": 1, "da": 1}
        # deterministic ordering: count desc, then pair asc
        assert [r.pair for r in rows] == ["an", "na", "ba", "da", "nd"]


class TestBpeLearn:
    def test_sennrich_loop_golden(self, spark):
        """Hand-computed merge sequence on the classic low/lower corpus:
        (l,o) wins round 1 on the ASC tie-break against (o,w) at equal
        count, then (lo,w) reassembles, then the e/w family."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(1, "low low low lower lowest"), (2, "new newer newest low")],
            "doc_id long, text string",
        )
        rows = corpus.bpe_learn(docs, n_merges=4).collect()
        got = [(r.merge_rank, r.l_sym, r.r_sym, r.n) for r in rows]
        assert got == [
            (1, "l", "o", 6),
            (2, "lo", "w", 6),
            (3, "e", "w", 3),
            (4, "n", "ew", 3),
        ]

    def test_greedy_left_to_right_on_equal_pair_runs(self, spark):
        """The l = r case where greedy semantics matter: 'aaaa' under the
        (a,a) merge must become [aa, aa] (2 occurrences consumed
        left-to-right, no overlap), and 'aaa' becomes [aa, a] — so round 2
        counts (aa,aa)=1 from 'aaaa' and (aa,a)=1 from 'aaa'."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(1, "aaaa aaa ab")], "doc_id long, text string"
        )
        rows = corpus.bpe_learn(docs, n_merges=2).collect()
        got = [(r.merge_rank, r.l_sym, r.r_sym, r.n) for r in rows]
        # round 1: (a,a) = 3+2 = 5 beats (a,b)=1
        assert got[0] == (1, "a", "a", 5)
        # round 2 pairs: aaaa->[aa,aa]: (aa,aa)=1; aaa->[aa,a]: (aa,a)=1;
        # ab: (a,b)=1 — tie at 1, ASC tie-break: (a,b) < (aa,a) < (aa,aa)
        assert got[1] == (2, "a", "b", 1)

    def test_merge_apply_is_jvm_only(self, spark):
        """The per-round merge application must stay whole-stage-codegen
        JVM lambdas — no Python evaluation anywhere in the loop."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(1, "low lower low")], "doc_id long, text string"
        )
        df = corpus.bpe_learn(docs, n_merges=2)
        assert len(df.collect()) == 2
        # the returned frame is a driver-assembled <=n_merges-row table;
        # the loop itself ran above — assert no Python stage leaked into
        # the state plan by rebuilding one round's scoring frame
        from pyspark.sql import functions as F

        vocab = (
            docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
            .filter(F.length("w") >= 2)
            .groupBy("w")
            .agg(F.count("*").alias("freq"))
        )
        plan = vocab._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_bpe_encode_fixed_merges_golden(self, spark):
        """Fixed merges [(l,o),(lo,w)] on 'low lower': low -> [low] (1
        token), lower -> [low,e,r] (3 tokens); doc totals follow. A word
        untouched by the merges keeps its character count."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(1, "low lower"), (2, "ab low")], "doc_id long, text string"
        )
        rows = corpus.bpe_encode(docs, [("l", "o"), ("lo", "w")]).collect()
        got = {r.doc_id: r.n_tokens for r in rows}
        assert got == {1: 1 + 3, 2: 2 + 1}

    def test_bpe_learn_matches_pure_python_reference(self, spark):
        """Differential test: bpe_learn vs an independent pure-Python
        Sennrich implementation (dict-of-tuples vocab, per-position pair
        counts, greedy left-to-right merge) on a seeded random corpus —
        catches any divergence in tie-breaks, overlap handling, or
        frequency weighting that the goldens are too small to hit."""
        import random

        from sna_pyspark_graphframes_spark.functions import corpus

        rng = random.Random(7)
        words = [
            "".join(rng.choice("abcde") for _ in range(rng.randint(2, 8)))
            for _ in range(120)
        ]
        docs = spark.createDataFrame(
            [(i, " ".join(words[i * 12:(i + 1) * 12])) for i in range(10)],
            "doc_id long, text string",
        )

        # --- reference implementation (independent of the Spark code) ---
        freqs: dict[tuple, int] = {}
        for w in words:
            freqs[tuple(w)] = freqs.get(tuple(w), 0) + 1

        def pair_counts(fr):
            pc = {}
            for syms, f in fr.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pc[p] = pc.get(p, 0) + f
            return pc

        def apply(syms, l, r):
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        want = []
        for step in range(1, 7):
            pc = pair_counts(freqs)
            if not pc:
                break
            (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            want.append((step, l, r, n))
            nf: dict[tuple, int] = {}
            for syms, f in freqs.items():
                m = apply(syms, l, r)
                nf[m] = nf.get(m, 0) + f  # merged spellings can collide
            freqs = nf

        got = [
            (r.merge_rank, r.l_sym, r.r_sym, r.n)
            for r in corpus.bpe_learn(docs, n_merges=6).collect()
        ]
        assert got == want


class TestSpanDedup:
    def test_first_occurrence_keep_and_reassembly(self, spark):
        """2-word spans: doc 1 = [a b][c d][a b] — the repeated span drops
        WITHIN the doc too; doc 2's [c d] loses to doc 1's earlier copy;
        doc 3 is all-duplicate and reassembles to ''; the empty doc has
        one empty-string span that doc 4 then duplicates."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [
                (1, "a b c d a b"),
                (2, "x y c d"),
                (3, "a b"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in corpus.span_dedup(docs, span_words=2).collect()}
        assert rows[1].clean_text == "a b c d" and rows[1].n_spans == 3
        assert rows[1].n_dropped == 1  # the second [a b]
        assert rows[2].clean_text == "x y" and rows[2].n_dropped == 1
        assert rows[3].clean_text == "" and rows[3].n_dropped == 1

    def test_tail_span_shorter_than_k(self, spark):
        """A 5-word doc at k=2 has a 1-word tail span, kept intact."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        r = corpus.span_dedup(docs, span_words=2).collect()[0]
        assert r.clean_text == "a b c d e"
        assert r.n_spans == 3 and r.n_dropped == 0

    def test_idempotent(self, spark):
        """Dedup is idempotent: a second pass over the cleaned corpus
        drops nothing (every surviving span is already unique)."""
        from sna_pyspark_graphframes_spark.functions import corpus

        docs = spark.createDataFrame(
            [(1, "a b c d a b x y"), (2, "c d a b q r"), (3, "q r q r")],
            "doc_id long, text string",
        )
        once = corpus.span_dedup(docs, span_words=2)
        again = corpus.span_dedup(
            once.select("doc_id", F.col("clean_text").alias("text")),
            span_words=2,
        )
        assert again.agg(F.sum("n_dropped")).collect()[0][0] == 0


class TestTokenKlDrift:
    def test_identical_slices_zero(self, spark):
        from sna_pyspark_graphframes_spark.functions import corpus

        df = spark.createDataFrame(
            [(0, "a b c a"), (1, "b c d")], "doc_id long, text string"
        )
        r = corpus.token_kl_drift(df, df).collect()[0]
        assert (r.kl_ab, r.kl_ba, r.js) == (0.0, 0.0, 0.0)
        assert r.n_tokens_a == r.n_tokens_b == 7
        assert r.vocab == 4

    def test_empty_vocab_returns_zero_counts_null_divergences(self, spark):
        """ADVICE r13: two whitespace-only slices have no union
        vocabulary — the row is (0, 0, 0, NULL, NULL, NULL), never
        all-NULL counts (and never 0 divergences, which would falsely
        read as 'identical slices')."""
        from sna_pyspark_graphframes_spark.functions import corpus

        a = spark.createDataFrame([(0, "   "), (1, "")], "doc_id long, text string")
        r = corpus.token_kl_drift(a, a).collect()[0]
        assert (r.n_tokens_a, r.n_tokens_b, r.vocab) == (0, 0, 0)
        assert r.kl_ab is None and r.kl_ba is None and r.js is None

    def test_disjoint_slices_positive_and_js_bounded(self, spark):
        import math

        from sna_pyspark_graphframes_spark.functions import corpus

        a = spark.createDataFrame([(0, "x x y")], "doc_id long, text string")
        b = spark.createDataFrame([(1, "z w w")], "doc_id long, text string")
        r = corpus.token_kl_drift(a, b).collect()[0]
        assert r.kl_ab > 0 and r.kl_ba > 0
        assert 0 < r.js <= math.log(2) + 1e-9
        assert r.vocab == 4  # union vocabulary

    def test_hand_computed_kl(self, spark):
        import math

        from sna_pyspark_graphframes_spark.functions import corpus

        # a: {x:2}, b: {y:1}; V=2, na=2, nb=1
        # p = (2+1)/4, (0+1)/4 ; q = (0+1)/3, (1+1)/3
        a = spark.createDataFrame([(0, "x x")], "doc_id long, text string")
        b = spark.createDataFrame([(1, "y")], "doc_id long, text string")
        p = [3 / 4, 1 / 4]
        q = [1 / 3, 2 / 3]
        kl_ab = sum(pi * math.log(pi / qi) for pi, qi in zip(p, q))
        kl_ba = sum(qi * math.log(qi / pi) for pi, qi in zip(p, q))
        r = corpus.token_kl_drift(a, b).collect()[0]
        assert r.kl_ab == round(kl_ab, 4)
        assert r.kl_ba == round(kl_ba, 4)
