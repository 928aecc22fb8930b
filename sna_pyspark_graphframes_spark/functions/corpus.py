"""Corpus-level training-data pipeline operators: near-dup clustering with
canonical-document selection, corpus deduplication, document chunking,
PII/URL redaction, repetition scoring, vocabulary statistics, TF-IDF, and
deterministic train/val/test splitting + stratified sampling.

These compose the per-document primitives (``functions/text.py``,
``functions/dedup.py``) into the whole-corpus operations a pretraining-data
pipeline runs at 100 TB. Everything is built-in expressions or existing
DataFrame-native algorithms (connected components for cluster formation);
no Python UDFs anywhere, so every operator runs JVM-side at scan speed.

Determinism contract (same as the rest of ``functions/``): every random
choice is a content hash (md5 — identical bytes in Spark, DuckDB, Python),
so each operator has an exact SQL twin in ``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.functions.dedup import (
    embedding_near_dup_pairs,
    minhash_near_dup_pairs,
)
from sna_pyspark_graphframes_spark.functions.text import token_count
from sna_pyspark_graphframes_spark.graph import algorithms

# Shared regexes — Java (Spark) and RE2 (DuckDB) agree on this subset:
# character classes, bounded repetition, alternation; no backrefs/lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def _words(col, lower: bool = True):
    c = F.lower(col) if lower else col
    return F.split(F.trim(c), r"\s+")


def near_dup_clusters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, cluster_id, is_canonical)`` for every document that
    participates in at least one near-dup pair.

    MinHash-LSH candidate pairs (``dedup.minhash_near_dup_pairs`` — banded
    inverted-index join, never all-pairs) become an undirected graph;
    clusters are its connected components (min-label propagation,
    ``graph.algorithms.connected_components``); the canonical document of a
    cluster is its minimum ``doc_id`` (= the component label).

    This is the standard production shape (e.g. the C4/RefinedWeb dedup
    stage): transitivity matters — if A~B and B~C, keeping A and C would
    leave two near-identical documents in the corpus, so dedup must drop
    whole clusters, not pair-members. Scale: pair generation is the banded
    join (Σ bucket²); the CC loop is O(cluster diameter) rounds over the
    *pair* set, which is tiny relative to the corpus (dup clusters are
    small and sparse).
    """
    pairs = minhash_near_dup_pairs(docs, text_col)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = algorithms.connected_components(edges)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("id")).alias("is_canonical"),
    )


def dedup_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus after near-dup removal: all documents minus non-canonical
    cluster members. One left-anti join against the (small) drop set."""
    drop = (
        near_dup_clusters(docs, text_col)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti")


def doc_chunks(
    docs: DataFrame, text_col: str = "text", size: int = 16, step: int = 8
) -> DataFrame:
    """Overlapping token-window chunks: ``(doc_id, chunk_id, chunk,
    n_tokens)`` — windows of ``size`` words starting every ``step`` words
    (``size > step`` ⇒ ``size - step`` words of overlap between adjacent
    chunks, the standard pretraining chunker shape).

    One projection + one explode of a ``sequence`` literal — no shuffle at
    all: chunking is embarrassingly parallel per document and stays inside
    whole-stage codegen.
    """
    words = _words(F.col(text_col), lower=False)
    d = docs.select(
        "doc_id", words.alias("words"), F.size(words).alias("n_words")
    )
    return (
        d.select(
            "doc_id",
            "words",
            "n_words",
            F.explode(
                F.sequence(F.lit(0), F.col("n_words") - 1, F.lit(step))
            ).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / step).cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice("words", F.col("start") + 1, size)).alias(
                "chunk"
            ),
            F.least(F.lit(size), F.col("n_words") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
        )
    )


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII/URL scrubbing: ``(doc_id, clean_text, n_redacted)`` with emails →
    ``<EMAIL>``, URLs → ``<URL>``. Pure ``regexp_replace`` — codegen,
    scan-speed; extend the regex list for phone numbers / IPs the same way.
    URLs are replaced first so an address inside a query string cannot
    resurface after the email pass."""
    c = F.col(text_col)
    n_red = (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all(c, F.lit(URL_RE), F.lit(0)))
    ).cast("int")
    clean = F.regexp_replace(
        F.regexp_replace(c, URL_RE, "<URL>"), EMAIL_RE, "<EMAIL>"
    )
    return docs.select(
        "doc_id", clean.alias("clean_text"), n_red.alias("n_redacted")
    )


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition: ``(doc_id, n_words, n_distinct,
    dup_ratio)`` where ``dup_ratio = 1 − distinct/total`` over lowercased
    word tokens — the boilerplate/template-detection filter (high ratio =
    repeated menus, lorem spam, keyword stuffing). Array expressions only;
    no shuffle."""
    words = _words(F.col(text_col))
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        nd.alias("n_distinct"),
        F.round(
            F.when(n > 0, 1 - nd / n).otherwise(F.lit(0.0)), 4
        ).alias("dup_ratio"),
    )


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: top-``k`` words by frequency ``(w, n)``.
    explode → hash-aggregate (map-side combine does the heavy lifting —
    the shuffle carries one row per distinct word per partition, not one
    per token) → global top-k. Tie-break by word keeps the cutoff
    deterministic."""
    return (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(k)
    )


def unigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens, surprisal)`` — per-document mean token
    surprisal −ln p(w) under the corpus's own unigram distribution: the
    classic self-referential quality-filter signal (boilerplate and
    repetitive spam score LOW, rare-token gibberish scores HIGH; both
    tails get filtered in training-data curation).

    Two passes over the token explode, all built-ins: vocabulary counts
    (map-side-combined hash aggregate), then a token⋈vocab equi-join and
    a per-doc average. The corpus-total token count is a 1-row aggregate
    broadcast via cross join — no collect. Cost is two |tokens| shuffles
    regardless of corpus size; the vocab join key (the word) is the same
    power-law key TF-IDF shuffles on, handled by AQE skew splitting."""
    words = docs.select(
        "doc_id", F.explode(_words(F.col(text_col))).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("n"))
    total = vocab.agg(F.sum("n").alias("total"))
    return (
        words.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.avg(-(F.log(F.col("n")) - F.log(F.col("total")))), 4
            ).alias("surprisal"),
        )
    )


def bigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_bigrams, surprisal)`` — per-document mean bigram
    surprisal −ln p(w_i | w_{i−1}) under the corpus's own add-one-smoothed
    bigram model: p = (c(w_{i−1}, w_i) + 1) / (c(w_{i−1}) + V).

    The conditional upgrade of :func:`unigram_surprisal` — fluent text
    scores low, shuffled/boilerplate-stitched text scores high even when
    its unigram distribution is normal (the signal unigrams can't see).
    All built-ins: per-doc adjacent pairs from one position self-join of
    the posexploded token table (equi-join on (doc_id, pos+1) — Σ len
    rows, never Σ len²), corpus bigram and context-count hash aggregates,
    then a pair⋈counts join and per-doc average. The scalar vocab size is
    a 1-row broadcast; the margin tables are vocabulary-sized and carry
    no forced broadcast hint (AQE decides)."""
    toks = docs.select(
        "doc_id", F.posexplode(_words(F.col(text_col))).alias("pos", "w")
    )
    nxt = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    pairs = toks.join(nxt, ["doc_id", "pos"]).select("doc_id", "w", "w2")
    bg = pairs.groupBy("w", "w2").agg(F.count("*").alias("c2"))
    ctx = pairs.groupBy("w").agg(F.count("*").alias("c1"))
    vocab_size = toks.agg(F.countDistinct("w").alias("v"))
    return (
        pairs.join(bg, ["w", "w2"])
        .join(ctx, "w")
        .crossJoin(F.broadcast(vocab_size))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(
                    -(
                        F.log(F.col("c2") + 1.0)
                        - F.log(F.col("c1") + F.col("v"))
                    )
                ),
                4,
            ).alias("surprisal"),
        )
    )


def kn_bigram_top(
    docs: DataFrame,
    k: int = 100,
    discount: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """``(w1, w2, c, p_kn)`` — the ``k`` most frequent bigrams with their
    interpolated Kneser–Ney probability (Kneser & Ney 1995; the standard
    n-gram LM smoothing — what a corpus-quality scorer or classic LM
    trainer computes over pretraining text):

        P(w2|w1) = (c(w1,w2) − D)/c(w1·)
                 + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)

    where N1+ are DISTINCT-continuation counts (how many contexts a word
    completes, not how often — the fix for "Francisco" following only
    "San").

    Shape: adjacent pairs are built IN-ROW (``transform`` over the word
    array indexed against its successor — no posexplode + position
    self-join, so the token stream is never shuffled pre-aggregation),
    then ONE bigram-type hash aggregate; all four margins (c(w1·),
    N1+(w1·), N1+(·w2), N1+(··)) are aggregates of the already-collapsed
    TYPE table, which is vocabulary²-bounded and orders of magnitude
    smaller than the corpus. The type table is MATERIALIZED once
    (eager localCheckpoint — four independent consumers; measured
    without it, exchange reuse did NOT canonicalize the four subtrees
    and the final adaptive plan re-scanned + re-exploded the corpus
    per margin). Every observed bigram has c ≥ 1 > D, so the
    max(·−D, 0) clamp never binds and is omitted. Top-k rides
    TakeOrderedAndProject (c DESC, w1, w2 — deterministic ties)."""
    from sna_pyspark_graphframes_spark.plans.iterate import checkpointed
    toks = docs.select(_words(F.col(text_col)).alias("ws"))
    pairs = toks.select(
        F.explode(
            F.transform(
                F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda w, i: F.struct(
                    w.alias("w1"), F.col("ws")[i + 1].alias("w2")
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bg = checkpointed(
        pairs.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c"))
    )
    left = bg.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c_w1"),
        F.count("*").cast("long").alias("n1p_fwd"),
    )
    right = bg.groupBy("w2").agg(F.count("*").cast("long").alias("n1p_bwd"))
    tot = bg.agg(F.count("*").cast("long").alias("n_types"))
    d = float(discount)
    return (
        bg.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c",
            F.round(
                (F.col("c") - d) / F.col("c_w1")
                + (F.lit(d) * F.col("n1p_fwd") / F.col("c_w1"))
                * (F.col("n1p_bwd") / F.col("n_types")),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(k)
    )


def kn_doc_surprisal(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_bigrams, kn_surprisal)`` — per-document mean
    −ln P_KN(w_i|w_{i−1}) under the corpus's own interpolated
    Kneser–Ney bigram model (:func:`kn_bigram_top`'s distribution,
    applied as a document quality score): the properly-smoothed upgrade
    of :func:`bigram_surprisal`'s add-one model — template/boilerplate
    text scores low, shuffled or stitched text high, and the
    distinct-continuation term stops frequent-but-fixed collocations
    from masking junk.

    Every scored bigram occurs in the corpus (the model is
    self-referential), so c ≥ 1 and no unseen-event backoff path is
    needed. Same layout as ``kn_bigram_top`` — in-row adjacent pairs
    (doc_id retained), ONE materialized bigram-type aggregate, margins
    off the type table — plus one pairs⋈scores join and a per-doc
    average."""
    from sna_pyspark_graphframes_spark.plans.iterate import checkpointed

    toks = docs.select("doc_id", _words(F.col(text_col)).alias("ws"))
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda w, i: F.struct(
                    w.alias("w1"), F.col("ws")[i + 1].alias("w2")
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bg = checkpointed(
        pairs.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c"))
    )
    left = bg.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c_w1"),
        F.count("*").cast("long").alias("n1p_fwd"),
    )
    right = bg.groupBy("w2").agg(F.count("*").cast("long").alias("n1p_bwd"))
    tot = bg.agg(F.count("*").cast("long").alias("n_types"))
    d = float(discount)
    scores = (
        bg.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            (
                (F.col("c") - d) / F.col("c_w1")
                + (F.lit(d) * F.col("n1p_fwd") / F.col("c_w1"))
                * (F.col("n1p_bwd") / F.col("n_types"))
            ).alias("p_kn"),
        )
    )
    return (
        pairs.join(scores, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log("p_kn")), 4).alias("kn_surprisal"),
        )
    )


def tf_idf_topk(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF:
    ``(doc_id, w, tfidf, rank)`` with ``tfidf = tf · ln(N/df)``.

    Three hash aggregates (term counts, document frequencies, corpus
    size); the per-document top-k is a window over ``doc_id`` — per-group
    sort, never global. The document-frequency margin is VOCABULARY-sized,
    so it carries no forced broadcast hint (same rule as ``word_pmi``:
    AQE decides from measured size); only the 1-row corpus count is
    broadcast unconditionally."""
    words = docs.select("doc_id", F.explode(_words(F.col(text_col))).alias("w"))
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "w",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias(
                "tfidf"
            ),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("w"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
    )


def hash_split(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic train/val/test assignment: ``(doc_id, split)`` from the
    first hex digit of ``md5(doc_id)`` — 12/16 train, 2/16 val, 2/16 test.

    Content-hash splitting is the production norm (stable under re-runs,
    re-shards, and corpus growth; no RNG state to coordinate across 1000
    executors). Pure projection — no shuffle, no action."""
    return docs.select(F.col(id_col), split_expr(id_col).alias("split"))


def split_expr(id_col: str = "doc_id"):
    """The hash-split assignment as a bare column expression, for operators
    that add the split in-place instead of joining ``hash_split``'s
    two-column frame back on."""
    d = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return (
        F.when(d.isin(*"0123456789ab"), F.lit("train"))
        .when(d.isin(*"cd"), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_sample(
    docs: DataFrame,
    per_stratum: int = 20,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: the ``per_stratum`` docs with the
    smallest ``md5(doc_id)`` per stratum — ``(doc_id, <stratum>, rn)``.

    Hash-rank-per-group is how you take a balanced (e.g. per-language)
    sample without an RNG: one window per stratum (per-group sort). Skewed
    strata cost one sort of their partition; for a stratum too big to sort,
    pre-filter on a hash prefix first (same determinism, bounded input).
    """
    win = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("rn", F.row_number().over(win).cast("int"))
        .filter(F.col("rn") <= per_stratum)
        .select(id_col, stratum_col, "rn")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction of
    its distinct k-word shingles that appear anywhere in the benchmark
    corpus — ``(doc_id, overlap, contaminated)``.

    The pretraining-data gate against eval leakage: a document whose
    shingle overlap with the held-out benchmark exceeds ``threshold`` is
    flagged for removal. Shape at 100 TB: benchmarks are tiny next to the
    corpus, so the benchmark shingle set is BROADCAST and the check is one
    map-side semi-join over the corpus shingles + one aggregate — the
    corpus is never shuffled by shingle.
    """
    from sna_pyspark_graphframes_spark.functions.dedup import word_shingles

    train_sh = word_shingles(docs, text_col, k)
    bench_sh = word_shingles(bench, text_col, k).select("sh").distinct()
    sizes = train_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    matched = (
        train_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("m"))
    )
    return (
        sizes.join(matched, "doc_id", "left")
        .fillna({"m": 0})
        .select(
            "doc_id",
            F.round(F.col("m") / F.col("n"), 4).alias("overlap"),
            (F.col("m") / F.col("n") >= threshold).alias("contaminated"),
        )
    )


def bow_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Bag-of-words cosine similarity for document pairs sharing ≥1 term,
    via a term inverted-index join — ``(doc_a, doc_b, cosine)`` with
    rounded cosine ≥ threshold. Never an all-pairs product.

    Term counts are exact integers, so the pair dot product and the
    squared norms are integers and ``round(dot/sqrt(ssa·ssb), 4)`` is
    bit-identical across engines (sqrt/÷ are correctly-rounded IEEE ops on
    exact inputs) — unlike a float TF-IDF weighting, this is safely
    oracle-checkable.

    ``max_df`` drops terms present in more than that many documents before
    pairing: the stop-term guard that bounds the join at Σ min(df,
    max_df)² — at corpus scale the df distribution is Zipfian and the cap
    is what keeps the candidate set near-linear.
    """
    words = docs.select(
        "doc_id", F.explode(_words(F.col(text_col))).alias("w")
    )
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    if max_df is not None:
        keep = (
            tf.groupBy("w")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("w")
        )
        tf = tf.join(keep, "w", "left_semi")
    tf = tf.cache()  # feeds both the norm aggregate and both join sides
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("ss")
    )
    a = tf.select(F.col("doc_id").alias("doc_a"), "w", F.col("tf").alias("tfa"))
    b = tf.select(F.col("doc_id").alias("doc_b"), "w", F.col("tf").alias("tfb"))
    dots = (
        a.join(b, "w")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ssa"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ssb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cosine",
            F.round(F.col("dot") / F.sqrt(F.col("ssa") * F.col("ssb")), 4),
        )
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def curate_corpus(
    docs: DataFrame, text_col: str = "text", min_quality: float = 0.5
) -> DataFrame:
    """The end-to-end curation pipeline in one operator: exact dedup →
    near-dup cluster removal → quality gate → deterministic split —
    ``(doc_id, lang, source, split)`` for every surviving document.

    Both dedup stages are computed on the FULL corpus (dedup-before-
    filter, the common production order — duplicate statistics shouldn't
    depend on downstream filter tuning), then the quality gate and the
    split assignment apply to the survivors.

    Plan shape at 100 TB: three keep/drop sets, each the output of an
    already-scale-safe stage (hash aggregate / banded LSH join + CC over
    the pair set / pure column expressions), intersected with the corpus
    by semi/anti joins on ``doc_id`` — the corpus itself flows through
    exactly once and never shuffles on anything but ``doc_id``.
    """
    from sna_pyspark_graphframes_spark.functions.text import quality_features

    exact_keep = (
        docs.groupBy(F.md5(F.col(text_col)).alias("dg"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    near_drop = (
        near_dup_clusters(docs, text_col)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    quality_keep = (
        quality_features(docs, text_col)
        .filter(F.col("quality") >= min_quality)
        .select("doc_id")
    )
    kept = (
        docs.join(exact_keep, "doc_id", "left_semi")
        .join(near_drop, "doc_id", "left_anti")
        .join(quality_keep, "doc_id", "left_semi")
    )
    return kept.select(
        "doc_id", "lang", "source", split_expr("doc_id").alias("split")
    )


def pack_sequences(
    docs: DataFrame,
    block_tokens: int = 256,
    n_shards: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the doc→training-block mapping
    ``(shard, block_id, doc_id, doc_tok_start, doc_tok_end)``.

    GPT-style pretraining batching: documents are concatenated and the
    token stream is cut into fixed ``block_tokens`` blocks, documents
    spanning block boundaries. Computed WITHOUT materializing a single
    token: per-doc token counts (``text.token_count``), a deterministic
    md5 shard, a window cumsum for each doc's stream offset, then one
    bounded explode of the block range each doc spans —
    ``sequence(floor(start/B), floor((start+n−1)/B))``.

    Scale: packing is per-shard (the window sorts only within a shard), so
    100 TB packs with ``n_shards`` ≈ cluster parallelism and no global
    sort; output rows ≈ |docs| + total_tokens/B. Deterministic: shard and
    order derive from md5(doc_id), so re-runs (and the SQL oracle twin)
    reproduce the exact packing.
    """
    h = F.md5(F.col("doc_id").cast("string"))
    toks = docs.select(
        "doc_id",
        token_count(F.col(text_col)).cast("long").alias("n_toks"),
        h.alias("h"),
    ).filter(F.col("n_toks") > 0)
    # 32 hash bits, not 8: the first md5 byte alone caps the shard count at
    # 256 and biases shards when n_shards doesn't divide 256 — with
    # "n_shards ≈ cluster parallelism" at 100 TB that ceiling binds
    # (ADVICE r3). 8 hex chars give 2^32 buckets before the modulo.
    toks = toks.withColumn(
        "shard",
        (F.conv(F.substring("h", 1, 8), 16, 10).cast("long") % n_shards).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    placed = toks.withColumn(
        "start", F.sum("n_toks").over(w) - F.col("n_toks")
    )
    b = F.lit(block_tokens)
    return placed.select(
        "shard",
        "doc_id",
        "n_toks",
        "start",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / b),
                F.floor((F.col("start") + F.col("n_toks") - 1) / b),
            )
        ).alias("block_id"),
    ).select(
        "shard",
        F.col("block_id").cast("long").alias("block_id"),
        "doc_id",
        F.greatest(F.lit(0).cast("long"), F.col("block_id") * b - F.col("start"))
        .alias("doc_tok_start"),
        F.least(F.col("n_toks"), (F.col("block_id") + 1) * b - F.col("start"))
        .alias("doc_tok_end"),
    )


def domain_mixture(
    docs: DataFrame,
    parts: dict[str, int],
    domain_col: str = "lang",
) -> DataFrame:
    """Deterministic mixture resampling: downsample each domain so kept
    counts follow the integer ratio ``parts`` exactly.

    The achievable scale is ``K = min over domains of (n_d div parts_d)``;
    each domain keeps ``parts_d · K`` documents — the largest corpus whose
    domain mixture matches the target ratio using downsampling only.
    Selection within a domain is the md5(doc_id) order (content-free,
    reproducible); domains absent from ``parts`` are dropped (weight 0).

    All-integer arithmetic (no float rate boundaries), so Spark and the
    SQL oracle agree bit-for-bit. Scale: one count per domain (tiny), the
    quota table broadcasts, and the rank window shuffles once on the
    domain key — AQE splits a skewed mega-domain's sort.
    """
    spark = docs.sparkSession
    parts_df = spark.createDataFrame(
        sorted(parts.items()), f"{domain_col} string, parts long"
    )
    counts = docs.groupBy(domain_col).agg(F.count("*").alias("n"))
    quota_base = counts.join(F.broadcast(parts_df), domain_col)
    k = quota_base.agg(
        F.min(F.expr("n div parts")).alias("k")
    )
    quota = quota_base.crossJoin(F.broadcast(k)).select(
        domain_col, (F.col("parts") * F.col("k")).alias("quota")
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", domain_col, F.row_number().over(w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(quota), domain_col)
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", domain_col)
    )


def temperature_mixture(
    docs: DataFrame,
    budget: int,
    tau: float = 0.5,
    domain_col: str = "lang",
) -> DataFrame:
    """Temperature-weighted mixture sampling: keep ``quota_d =
    min(n_d, floor(budget · n_d^τ / Σ_e n_e^τ))`` documents per domain —
    the standard multilingual/domain rebalancing knob (τ=1 reproduces the
    natural distribution, τ→0 approaches uniform over domains; cf. the
    sampling-temperature scheme of multilingual pretraining). Keep-only:
    quotas cap at ``n_d`` (no upsampling), so the realized budget can
    undershoot when a rare domain saturates — by design, not silently
    rebalanced.

    Selection within a domain is md5(doc_id) order (content-free,
    reproducible — same convention as :func:`domain_mixture`). The
    per-domain counts and quota table are tiny and broadcast; the corpus
    shuffles once for the per-domain rank window."""
    counts = docs.groupBy(domain_col).agg(F.count("*").alias("n"))
    z = counts.agg(F.sum(F.pow("n", F.lit(tau))).alias("z"))
    quota = counts.crossJoin(F.broadcast(z)).select(
        domain_col,
        F.least(
            F.col("n"),
            F.floor(F.lit(float(budget)) * F.pow("n", F.lit(tau)) / F.col("z")),
        ).alias("quota"),
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", domain_col, F.row_number().over(w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(quota), domain_col)
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", domain_col)
    )


def embedding_dedup_clusters(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    **near_dup_kw,
) -> DataFrame:
    """Semantic (embedding-space) corpus dedup: ``(vec_id, cluster_id,
    is_canonical)`` for every vector in at least one near-dup pair.

    The embedding-space twin of :func:`near_dup_clusters`: candidate pairs
    come from the hyperplane-LSH + exact-rerank path
    (``dedup.embedding_near_dup_pairs`` — Σ bucket², never all-pairs),
    transitive closure via connected components, canonical = min id. Same
    rationale as text near-dup: A≈B and B≈C must drop a whole cluster, not
    pair members; this is the semantic-dedup stage (SemDeDup-style) of a
    pretraining pipeline, run on embeddings instead of shingles.
    """
    pairs = embedding_near_dup_pairs(
        embeddings, threshold=threshold, id_col=id_col, **near_dup_kw
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = algorithms.connected_components(edges)
    return cc.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("id")).alias("is_canonical"),
    )


def quality_bucketize(
    docs: DataFrame, n_buckets: int = 4, text_col: str = "text"
) -> DataFrame:
    """Curriculum binning: ``(doc_id, quality, bucket)`` with bucket =
    fixed-width range over the [0,1] quality score —
    ``least(n−1, floor(q·n))``.

    Deliberately range-based, NOT rank-based (NTILE): an NTILE over the
    whole corpus is a single-partition global sort — the one plan shape
    this engine bans at 100 TB. Fixed-width buckets are elementwise
    (scan-speed, no shuffle), deterministic, and the downstream curriculum
    only needs monotone-in-quality bins, not equal-population ones; for
    population-balanced bins use ``approxQuantile`` breakpoints and the
    same elementwise assignment."""
    from sna_pyspark_graphframes_spark.functions.text import quality_features

    q = quality_features(docs, text_col).select("doc_id", "quality")
    b = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("quality") * n_buckets).cast("int"),
    )
    return q.select("doc_id", "quality", b.cast("int").alias("bucket"))


def quality_bucketize_quantile(
    docs: DataFrame, n_buckets: int = 4, text_col: str = "text"
) -> DataFrame:
    """Equal-population curriculum bins: ``(doc_id, quality, bucket)`` with
    bucket = number of corpus quantile breakpoints strictly below the
    doc's quality score.

    The population-balanced companion of :func:`quality_bucketize`: the
    n−1 breakpoints come from ONE exact-percentile aggregate (linear
    interpolation — the same definition DuckDB's ``quantile_cont`` uses,
    so the oracle matches bit-for-bit on 4-dp-rounded scores), broadcast
    back over the corpus, and the bucket assignment stays elementwise —
    still no global sort; the only extra cost over fixed-width bins is the
    1-row percentile aggregate."""
    from sna_pyspark_graphframes_spark.functions.text import quality_features

    q = quality_features(docs, text_col).select("doc_id", "quality")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    brk = q.agg(
        F.percentile("quality", F.array(*[F.lit(p) for p in probs])).alias("brk")
    )
    bucket = sum(
        F.when(F.col("quality") > F.col("brk")[i], 1).otherwise(0)
        for i in range(n_buckets - 1)
    )
    return (
        q.crossJoin(F.broadcast(brk))
        .select("doc_id", "quality", bucket.cast("int").alias("bucket"))
    )


def skipgram_pairs(
    docs: DataFrame, window: int = 2, text_col: str = "text"
) -> DataFrame:
    """Skip-gram training pairs ``(doc_id, center, context, offset)`` —
    every token paired with its neighbors within ``window`` positions
    (word2vec-style corpus preparation).

    Offset-explode formulation: each token emits its 2·window candidate
    positions and equi-joins back on ``(doc_id, pos)`` — cost
    Σ len·2·window (linear in corpus size), never the Σ len² of a
    join-then-filter position self-join. All built-ins, one shuffle on the
    (doc_id, pos) key."""
    toks = docs.select(
        "doc_id",
        F.posexplode(_words(F.col(text_col))).alias("pos", "w"),
    )
    deltas = [d for d in range(-window, window + 1) if d != 0]
    cand = toks.select(
        "doc_id",
        "pos",
        F.col("w").alias("center"),
        F.explode(F.array(*[F.lit(d) for d in deltas])).alias("offset"),
    ).withColumn("ppos", F.col("pos") + F.col("offset"))
    ctx = toks.select(
        "doc_id", F.col("pos").alias("ppos"), F.col("w").alias("context")
    )
    return cand.join(ctx, ["doc_id", "ppos"]).select(
        "doc_id", "center", "context", "offset"
    )


def word_pmi(
    docs: DataFrame, window: int = 2, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Pointwise mutual information over the skip-gram co-occurrence
    table: ``(center, context, n, pmi)`` for pairs seen ≥ ``min_count``.

    ``pmi = ln( p(c,x) / (p(c)·p(x)) )`` with all probabilities taken from
    the pair table and its margins — one co-occurrence aggregate, two
    margin aggregates, one scalar total via cross join; no collect. The
    classic collocation / association signal used for phrase-mining a
    pretraining corpus.

    Scale note: the margin tables are VOCABULARY-sized (one row per
    distinct token) — unbounded on a 100 TB corpus — so they carry no
    forced broadcast hint (an ``F.broadcast`` would bypass the
    ``autoBroadcastJoinThreshold`` safety and OOM the driver on a large
    vocab); AQE picks broadcast vs shuffle from the measured margin size
    at runtime. Only the 1-row ``total`` frame is broadcast
    unconditionally."""
    pairs = skipgram_pairs(docs, window, text_col)
    cc = pairs.groupBy("center", "context").agg(F.count("*").alias("n"))
    m_center = pairs.groupBy("center").agg(F.count("*").alias("n_center"))
    m_context = pairs.groupBy("context").agg(F.count("*").alias("n_context"))
    total = pairs.agg(F.count("*").alias("n_total"))
    return (
        cc.filter(F.col("n") >= min_count)
        .join(m_center, "center")
        .join(m_context, "context")
        .crossJoin(F.broadcast(total))
        .select(
            "center",
            "context",
            "n",
            # + 0.0 normalizes IEEE negative zero (ln of an exact 1.0 can
            # round to -0.0, which engines print differently)
            (
                F.round(
                    F.log(
                        F.col("n") * F.col("n_total")
                        / (F.col("n_center") * F.col("n_context"))
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training-data
    export: ``(doc_id, shard, pos)`` where the corpus is re-ordered by
    ``md5(seed || id)`` (a stable pseudo-random permutation — same
    everywhere, no RNG state across 1000 executors, re-runnable) and
    dealt round-robin into ``n_shards`` by hash so every shard is an
    unbiased sample of the corpus; ``pos`` is the 0-based within-shard
    read order.

    Plan: one projection + ONE per-shard window sort (partitionBy shard —
    each shard sorts independently, never a global sort). At 100 TB the
    downstream writer is ``partitionBy("shard")`` + ``sortWithinPartitions
    ("pos")``; the md5 keys are uniform so shard sizes are balanced by
    construction (no skew salting needed).
    """
    h = F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string")))
    assigned = docs.select(
        F.col(id_col),
        F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        h.alias("_h"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return assigned.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, log_weight)`` — Data Selection with Importance
    Resampling log weights (DSIR; Xie et al., NeurIPS 2023): score every
    raw document by how much more likely its hashed-unigram features are
    under a TARGET corpus (e.g. the English slice, a quality exemplar
    set) than under the raw corpus itself. Downstream selection samples
    ∝ exp(log_weight) (Gumbel top-k over this column — the repo's
    ``shuffle_shards`` md5 trick supplies reproducible noise) or simply
    takes the top-k; this function produces the weights.

    Model: bag of hashed unigrams, ``b(w) = int(md5(w)[:4], 16) %
    n_buckets`` (the cross-engine-stable ``shuffle_shards`` hash — no
    engine-private hash in the contract), add-one-smoothed multinomials
    p̂ (target) and q̂ (raw):

        log_weight(x) = Σ_{w ∈ x} [ln p̂(b(w)) − ln q̂(b(w))]

    summed over token OCCURRENCES (the multinomial likelihood ratio).
    Per-bucket log-ratios are rounded to 6 dp before the per-doc sum
    (the kmeans/HITS reproducibility recipe: both engines then sum the
    same decimals) and the sum to 6 dp as well — the sum of 6-dp
    multiples IS a 6-dp multiple, so the final rounding grid aligns
    with the summands and fp accumulation order (~1e-13) can never
    straddle a tie (a COARSER final grid would: sums ending in …5 at
    the 5th decimal are half-ties at 4 dp — measured 1-ulp mismatches
    on ~10% of docs before this was fixed).

    Plan: tokenize+hash both corpora (one projection each, no Python),
    two bucket-count aggregates, the ≤``n_buckets``-row ratio table —
    FIXED size, a legal unconditional broadcast — joined back onto the
    token stream, one keyed sum per doc. Two |tokens|-keyed shuffles
    total; at 100 TB the ratio table is still ``n_buckets`` rows.
    Documents with zero tokens produce no row (no features ⇒ no
    likelihood ratio), mirrored by the SQL twin.
    """
    def _buckets(df, keep_id: bool):
        toks = df.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode(_words(F.col(text_col))).alias("w"),
        ).filter(F.col("w") != "")
        b = (
            F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
            % n_buckets
        ).cast("int").alias("b")
        return toks.select(*([id_col] if keep_id else []), b)

    src_b = _buckets(docs, keep_id=True)
    q_cnt = src_b.groupBy("b").agg(F.count("*").alias("cq"))
    p_cnt = _buckets(target, keep_id=False).groupBy("b").agg(
        F.count("*").alias("cp")
    )
    tot_q = q_cnt.agg(F.coalesce(F.sum("cq"), F.lit(0)).alias("tq"))
    tot_p = p_cnt.agg(F.coalesce(F.sum("cp"), F.lit(0)).alias("tp"))
    nb = float(n_buckets)
    ratio = (
        q_cnt.join(p_cnt, "b", "left")
        .fillna({"cp": 0})
        .crossJoin(F.broadcast(tot_q))  # 1-row scalars
        .crossJoin(F.broadcast(tot_p))
        .select(
            "b",
            F.round(
                F.log((F.col("cp") + 1.0) / (F.col("tp") + F.lit(nb)))
                - F.log((F.col("cq") + 1.0) / (F.col("tq") + F.lit(nb))),
                6,
            ).alias("lr"),
        )
    )
    return (
        # ratio is ≤ n_buckets rows (a caller CONSTANT, not data-growing):
        # unconditional broadcast is within the unbounded-frame rule
        src_b.join(F.broadcast(ratio), "b")
        .groupBy(F.col(id_col))
        .agg(F.round(F.sum("lr"), 6).alias("log_weight"))
    )


def dsir_select_topk(
    docs: DataFrame,
    target: DataFrame,
    k: int = 100,
    seed: int = 42,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, select_key, rank)`` — the DSIR SELECTION step: sample
    ``k`` documents without replacement with probability ∝ exp(DSIR log
    weight), via the Gumbel-top-k trick (Kool et al., ICML 2019):

        key(x) = log_weight(x) + G(x),   G = −ln(−ln(U)),
        U(x) = (int(md5(seed‖id)[:8], 16) + 0.5) / 2³²

    and take the k largest keys. The Gumbel noise comes from the same
    md5 device as ``shuffle_shards`` — a stable pseudo-random U(0,1) per
    doc, identical on every engine and every retry, so "sampling" is a
    deterministic, oracle-checkable computation (no RNG state across
    1000 executors). ``+0.5`` keeps U strictly inside (0,1) so both ln
    calls are finite. Keys are rounded to 6 dp (the cross-engine recipe;
    ties broken by doc_id) and the top-k is an ORDER BY ... LIMIT — a
    per-partition TakeOrderedAndProject heap, never a global sort."""
    w = dsir_log_weights(docs, target, n_buckets, id_col, text_col)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    return (
        w.select(F.col(id_col), key.alias("select_key"))
        .orderBy(F.col("select_key").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "select_key",
            F.row_number()
            .over(
                Window.orderBy(F.col("select_key").desc(), F.col(id_col))
            )
            .alias("rank"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """``(pair, n)`` — the ``k`` most frequent adjacent character pairs
    inside words across the corpus: the scoring statistic of one BPE
    merge step (Sennrich et al. 2016), the corpus-side inner loop of
    tokenizer training. Companion to ``vocab_topk`` (word level) and
    ``token_count`` (doc level).

    Plan: one projection chain — lower/trim/split (the shared word
    recipe), an in-row ``transform(sequence(...))`` emitting each word's
    character bigrams (JVM lambda, no Python), explode, one
    count-aggregate with map-side partials, TakeOrderedAndProject top-k.
    One |tokens|-keyed shuffle at any corpus size; the result is ≤ k
    rows. Words shorter than 2 characters contribute nothing (guarded
    explicitly: Spark's ``sequence(1, 0)`` would DESCEND, not return
    empty)."""
    words = docs.select(
        F.explode(_words(F.col(text_col))).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )


def _bpe_apply_merge(syms_col, l: str, r: str):
    """One BPE merge applied to a symbol array, greedy left-to-right, as
    a JVM ``aggregate()`` fold: append each symbol, or coalesce it into
    the accumulator's last element when that element is ``l`` and the
    incoming symbol is ``r``. The fold IS the single-pass non-overlapping
    replace — the freshly merged symbol ``l+r`` can never re-match ``l``
    in the same pass (``r`` is non-empty)."""
    merged = l + r
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(l))
            & (x == F.lit(r)),
            F.concat(
                F.slice(
                    acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))
                ),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    docs: DataFrame, n_merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """``(merge_rank, l_sym, r_sym, n)`` — the first ``n_merges`` BPE
    merges learned from the corpus: the Sennrich et al. (2016) tokenizer
    TRAINING loop, completing what :func:`bpe_pair_counts` started (that
    operator is one iteration's scoring statistic; this applies the top
    pair and recounts).

    Distributed shape: the corpus collapses ONCE into the word-frequency
    vocabulary (token-keyed shuffle — the only pass over the raw text at
    any corpus size), each word becomes its symbol array, and every merge
    round is (a) one partial-aggregating (l, r)-keyed count over the
    exploded adjacent-symbol pairs weighted by word frequency, (b) a
    driver-side top-1 read (count DESC, pair ASC tie-break — the
    documented one-scalar-action-per-round pattern; the winning pair must
    become a plan literal for the merge lambda), and (c) an in-row
    ``aggregate()`` fold over each symbol array applying the merge
    greedily left-to-right (the fold appends or coalesces one symbol at a
    time; the freshly merged symbol ``l+r`` can never re-match ``l`` in
    the same pass since ``r`` is non-empty — so the fold IS the
    single-pass non-overlapping replace). All JVM lambdas, no Python in
    any hot path; per-round state is lineage-truncated.

    At 100 TB: the vocab is |distinct words| rows (millions, not
    billions), so the per-merge shuffle is tiny; the driver does exactly
    one 1-row action per merge — the same loop structure every industrial
    BPE trainer uses. The returned merge table (≤ ``n_merges`` rows) is
    assembled driver-side by construction."""
    from sna_pyspark_graphframes_spark.plans.iterate import checkpointed

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    state = checkpointed(
        vocab.select(
            "freq",
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ).alias("syms"),
        )
    )
    merges = []
    for step in range(1, n_merges + 1):
        z = F.arrays_zip(
            F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1).alias("l"),
            F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1).alias("r"),
        )
        top = (
            state.filter(F.size("syms") >= 2)
            .select("freq", F.explode(z).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, n = top[0].l, top[0].r, int(top[0].n)
        merges.append((step, l, r, n))
        state = checkpointed(
            state.select("freq", _bpe_apply_merge("syms", l, r).alias("syms"))
        )
    return spark.createDataFrame(
        merges, "merge_rank int, l_sym string, r_sym string, n long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_tokens)`` — per-document token count after encoding
    with a FIXED, ordered BPE merge list (the inference-side complement
    of :func:`bpe_learn`; together they are the full Sennrich tokenizer
    life cycle). Deterministic given ``merges``, so it hard-oracles.

    Distributed shape: the merge list is a PLAN LITERAL, so all k merge
    folds chain into ONE projection over the distinct-word vocabulary
    (no loop state, no checkpoints, no driver actions) — the corpus-side
    cost is one token-keyed vocab shuffle plus one word→token-count join
    back to the exploded documents. At 100 TB the expensive text pass
    happens exactly twice (vocab build, join-back), both as
    partial-aggregating keyed shuffles; the per-word fold work is
    O(len·k) on |vocab| rows only."""
    words = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.select("w").distinct()
    syms = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    for l, r in merges:
        syms = _bpe_apply_merge(syms, l, r)
    wtok = vocab.select("w", F.size(syms).alias("wt"))
    return (
        words.join(wtok, "w")
        .groupBy(id_col)
        .agg(F.sum("wt").cast("long").alias("n_tokens"))
    )


def span_dedup(
    docs: DataFrame,
    span_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, clean_text, n_spans, n_dropped)`` — SUB-document exact
    dedup (the Lee et al. 2021 exact-substring criterion at span
    granularity, the C4/RefinedWeb stage document-level dedup misses):
    each document splits into non-overlapping ``span_words``-word spans,
    every span keeps only its corpus-wide FIRST occurrence (min
    (doc_id, span_idx) — deterministic, engine-independent), and the
    survivors reassemble in document order. Boilerplate repeated across
    documents disappears from every copy but the first.

    Plan: spans build IN-ROW (``transform`` over a guarded ``sequence``
    + ``array_join(slice(...))`` — Spark's ``sequence(0, -1)`` DESCENDS,
    so empty token lists are gated to an empty span array) and STAY an
    in-row array on the reassembly side. The span-keyed traffic carries
    only ``xxhash64(span)`` (8 bytes) + (doc_id, span_idx): one
    partial-aggregating shuffle finds each span-hash's minimum owner,
    one doc-keyed aggregate collapses the winners to a per-doc
    ``keep_idx`` set (ints only), and a single doc-keyed join brings the
    surviving indices back to the array frame where ``filter(spans,
    (s, i) -> ...)`` rebuilds the text in place. The raw span strings
    never enter a shuffle; the document text moves exactly once (the
    final join). A 64-bit hash collision would merge two distinct spans'
    first-occurrence groups — at web-corpus scale (2^40 spans) the
    collision odds are ~2^-(64-80/2) ≈ one pair per ~16M corpora,
    an accepted property of every production exact-substring dedup.
    At 100 TB: two narrow |spans| shuffles + one |docs| join, no windows
    over unbounded partitions, no Python anywhere."""
    k = int(span_words)
    if k < 1:
        raise ValueError(f"span_words must be >= 1, got {k}")
    d = docs.select(F.col(id_col), _words(F.col(text_col)).alias("ws"))
    span_arr = F.when(
        F.size("ws") > 0,
        F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size("ws") / F.lit(k)).cast("int") - 1
            ),
            lambda i: F.array_join(
                F.slice("ws", i * k + 1, F.lit(k)), " "
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    arrs = d.select(F.col(id_col), span_arr.alias("spans"))
    keys = arrs.select(
        F.col(id_col),
        F.posexplode(
            F.transform("spans", lambda s: F.xxhash64(s))
        ).alias("span_idx", "span_key"),
    )
    first = keys.groupBy("span_key").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("span_idx").alias("i"))
        ).alias("o")
    )
    keep = first.groupBy(F.col("o.d").alias(id_col)).agg(
        F.collect_set("o.i").alias("keep_idx")
    )
    kept_arr = F.filter(
        "spans",
        lambda s, i: F.array_contains(
            F.coalesce(F.col("keep_idx"), F.expr("CAST(array() AS array<int>)")),
            i,
        ),
    )
    return arrs.join(keep, id_col, "left").select(
        id_col,
        F.array_join(kept_arr, " ").alias("clean_text"),
        F.size("spans").cast("long").alias("n_spans"),
        (F.size("spans") - F.size(kept_arr)).cast("long").alias("n_dropped"),
    )


def unigram_piece_vocab(
    docs: DataFrame,
    max_piece_len: int = 4,
    top_k: int = 50,
    max_word_len: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """``(piece, logp)`` — a SentencePiece-style unigram-LM piece
    vocabulary: all character substrings of length ≤ ``max_piece_len``
    of the corpus's words, counted weighted by word frequency; kept =
    every single character (guarantees segmentability) plus the
    ``top_k`` pieces by count (ties by piece); log-probabilities
    normalized over the KEPT vocabulary and rounded to 6 dp (the
    cross-engine recipe — every downstream Viterbi sum is then a sum of
    identical decimals in both engines).

    The substring expansion is IN-ROW (``transform(sequence(...))``
    over the distinct-word table, which is vocabulary-sized — the
    corpus token stream collapses before any piece work); the top-k
    rank is a window over that piece table (bounded by
    Σ word_len·max_piece_len piece types, not corpus size)."""
    words = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    subs = words.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, length(w)-1), j -> "
                f"transform(sequence(1, least({max_piece_len}, length(w)-j)), "
                f"l -> substring(w, j+1, l))))"
            )
        ).alias("piece"),
    )
    cnt = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    ranked = cnt.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "piece"))
    )
    kept = ranked.filter(
        (F.length("piece") == 1) | (F.col("rk") <= top_k)
    ).select("piece", "cnt")
    tot = kept.agg(F.sum("cnt").cast("double").alias("tot"))
    return kept.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.round(F.log(F.col("cnt").cast("double") / F.col("tot")), 6).alias(
            "logp"
        ),
    )


def unigram_viterbi_scores(
    docs: DataFrame,
    max_piece_len: int = 4,
    top_k: int = 50,
    max_word_len: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """``(word, freq, score)`` — each distinct word's best unigram-LM
    segmentation score ``max_seg Σ logp(piece)`` (the Viterbi DP at the
    heart of SentencePiece tokenization, Kudo 2018), under the
    corpus-derived :func:`unigram_piece_vocab`.

    The DP is UNROLLED AS COLUMN EXPRESSIONS — no UDF, no recursion:
    position ``i``'s best score is ``greatest`` over the ≤
    ``max_piece_len`` predecessors of ``b_j + logp(word[j:i])``, with
    the piece scores carried per word in ONE map column
    (``map_from_entries`` over the in-row substring expansion joined to
    the vocab). ``max_word_len`` bounds the unroll depth — longer words
    are excluded (documented cap; raise it and the plan just grows
    ``max_word_len`` columns). Absent pieces carry −1e9 (single chars
    are always in vocab, so every kept word is segmentable and the
    sentinel never reaches a final score). 6-dp-rounded logps make the
    score EXACT across engines: every sum is the same decimals added in
    the same order, so the twin's unrolled position-table CTE matches
    value-for-value."""
    vocab = unigram_piece_vocab(
        docs, max_piece_len, top_k, max_word_len, text_col
    )
    words = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    subs = words.select(
        "w",
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, length(w)-1), j -> "
                f"transform(sequence(j+1, least(j+{max_piece_len}, length(w))), "
                f"i -> struct(j as j, i as i, substring(w, j+1, i-j) as piece))))"
            )
        ).alias("s"),
    ).select("w", "freq", "s.j", "s.i", "s.piece")
    scored = subs.join(vocab, "piece", "left").select(
        "w",
        "freq",
        F.concat_ws(":", "j", "i").alias("k"),
        F.coalesce("logp", F.lit(-1e9)).alias("lp"),
    )
    m = scored.groupBy("w", "freq").agg(
        F.map_from_entries(F.collect_list(F.struct("k", "lp"))).alias("m")
    )
    b = [F.lit(0.0)]
    for i in range(1, max_word_len + 1):
        cands = [
            b[j]
            + F.coalesce(
                F.element_at("m", F.lit(f"{j}:{i}")), F.lit(-1e9)
            )
            for j in range(max(0, i - max_piece_len), i)
        ]
        b.append(F.greatest(*cands) if len(cands) > 1 else cands[0])
    score = F.when(F.length("w") == 1, b[1])
    for i in range(2, max_word_len + 1):
        score = score.when(F.length("w") == i, b[i])
    return m.select(
        F.col("w").alias("word"), "freq", F.round(score, 4).alias("score")
    )


def doc_token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens, n_distinct, entropy)`` — Shannon entropy (in
    nats) of each document's OWN token distribution: −Σ p·ln p over the
    doc's token counts. The within-document diversity signal next to
    ``unigram_surprisal``'s corpus-relative one — repetitive spam scores
    LOW entropy at any corpus frequency (the Gopher repetition fractions
    measure specific repetition shapes; entropy is their scale-free
    summary). One explode + one (doc, token) hash aggregate + one
    per-doc rollup — two keyed shuffles, all built-ins, map-side
    combining; entropy is exact integer-ratio arithmetic per term,
    rounded at 4 dp."""
    counts = (
        docs.select("doc_id", F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    # per-doc total rides a window over the (doc, token) counts — same
    # partitioning as the rollup, so no extra exchange
    t = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c") / F.col("t")
    return (
        counts.withColumn("t", t)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
        )
    )


def zipf_slope(
    docs: DataFrame, text_col: str = "text", min_rank: int = 1, max_rank: int = 200
) -> DataFrame:
    """1-row ``(n_ranks, slope, intercept, r2)`` — the Zipf exponent of
    the corpus: OLS of ln(frequency) on ln(rank) over the top
    ``max_rank`` token ranks (natural corpora fit slope ≈ −1; synthetic
    or templated corpora flatten — a cheap distribution-health probe
    for training data). One token aggregate + one rank window over
    ≤ ``max_rank`` rows + Spark's built-in ``regr_slope`` /
    ``regr_intercept`` / ``regr_r2`` aggregates (the same functions
    exist verbatim in DuckDB — the twin is the identical expression).
    Rank ties break on the token string, so ranks are deterministic."""
    freq = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("w").asc())
    ranked = (
        freq.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") >= min_rank) & (F.col("rank") <= max_rank))
        .select(
            F.log(F.col("rank").cast("double")).alias("lx"),
            F.log(F.col("n").cast("double")).alias("ly"),
        )
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_ranks"),
        F.round(F.expr("regr_slope(ly, lx)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(ly, lx)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(ly, lx)"), 6).alias("r2"),
    )


def token_kl_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """1-row ``(n_tokens_a, n_tokens_b, vocab, kl_ab, kl_ba, js)`` —
    add-one-smoothed unigram-distribution divergences between two corpus
    slices: the TEXT sibling of ``population_stability`` (PSI watches a
    numeric feature drift; this watches the token distribution drift
    between ingest batches — the standard new-crawl health check before
    mixing data into a training run).

    ``p = (c_a + 1)/(n_a + V)``, ``q = (c_b + 1)/(n_b + V)`` over the
    UNION vocabulary (smoothing keeps every term finite without an eps
    floor); ``kl_ab = Σ p·ln(p/q)``, ``kl_ba`` symmetric, and ``js`` the
    Jensen–Shannon divergence against the midpoint m = (p+q)/2 (bounded
    by ln 2, the usual report number).

    Plan: one token-count aggregate per slice (map-side combining), a
    full-outer equi-join on token, three 1-row scalar reductions — the
    per-term math is codegen expressions over exact integer counts, so
    the only fp is the final Σ over |V| terms (continuous values, ~1e-13
    relative jitter against the half-quantum at ``round_dp=4`` — the
    safe class in the REPORT r13 fp audit).

    Empty-vocabulary contract (ADVICE r13): if BOTH slices tokenize to
    nothing (empty/whitespace-only corpora) the joined frame is empty
    and the aggregate still returns one well-defined row —
    ``(0, 0, 0, NULL, NULL, NULL)`` via COALESCE on the integer
    columns; the divergences stay NULL because no distribution exists
    to diverge (0 would falsely read as "identical slices")."""

    def counts(df, name):
        return (
            df.select(F.explode(_words(F.col(text_col))).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count("*").alias(name))
        )

    ca, cb = counts(docs_a, "ca"), counts(docs_b, "cb")
    j = ca.join(cb, "w", "full").fillna({"ca": 0, "cb": 0})
    tot = j.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count("*").cast("long").alias("v"),
    )
    p = (F.col("ca") + 1) / (F.col("na") + F.col("v"))
    q = (F.col("cb") + 1) / (F.col("nb") + F.col("v"))
    m = (p + q) / 2
    return (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.coalesce(F.min("na"), F.lit(0)).cast("long").alias("n_tokens_a"),
            F.coalesce(F.min("nb"), F.lit(0)).cast("long").alias("n_tokens_b"),
            F.coalesce(F.min("v"), F.lit(0)).cast("long").alias("vocab"),
            F.round(F.sum(p * F.log(p / q)), round_dp).alias("kl_ab"),
            F.round(F.sum(q * F.log(q / p)), round_dp).alias("kl_ba"),
            F.round(
                (F.sum(p * F.log(p / m)) + F.sum(q * F.log(q / m))) / 2,
                round_dp,
            ).alias("js"),
        )
    )
