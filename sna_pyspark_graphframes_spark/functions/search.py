"""Keyword search over the document corpus: inverted-index construction
and BM25 ranking — the retrieval layer a training-data pipeline uses for
targeted corpus probes (finding benchmark leaks, topic slices, quality
audits) without an external search engine.

Pure built-in expressions end-to-end (explode + hash aggregates + joins —
no UDFs), so index build is one shuffle over the token table and scoring
touches only the query terms' postings. (Reference scope: none — search is
a beyond-reference pipeline component; tokenization shares
``corpus._words`` so index terms match the TF-IDF/PMI surface.)

Scale notes: the postings table is partitioned by term — the classic
shard-by-term layout; scoring a query reads |query| posting lists via a
semi-join on a literal array (partition-prunable), never a corpus scan.
Document-frequency margins are vocabulary-sized and therefore carry NO
forced broadcast hint (same rule as ``corpus.word_pmi``): AQE decides from
measured size. The per-document length norm joins on ``doc_id`` only for
matched postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.functions.corpus import _words


def postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The inverted index as a postings table: ``(w, doc_id, tf)`` — one
    row per (term, document) with its term frequency. Downstream layouts
    (per-term arrays, positional lists) are a ``groupBy(w)`` away; the
    flat form is the one that joins."""
    words = docs.select("doc_id", F.explode(_words(F.col(text_col))).alias("w"))
    return words.groupBy("w", "doc_id").agg(F.count("*").alias("tf"))


def index_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Dictionary view of the inverted index: ``(w, df, total_tf)`` per
    term — document frequency and collection frequency, the statistics
    BM25/IDF read."""
    p = postings(docs, text_col)
    return p.groupBy("w").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson/Sparck Jones probabilistic idf variant):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))

    Output ``(doc_id, score, rank)``; rank ties break by doc_id so the
    result is fully deterministic. Only the query terms' postings are
    touched (semi-join on a literal term array); N and avgdl are 1-row
    broadcasts."""
    p = postings(docs, text_col)
    qt = F.array(*[F.lit(t) for t in query_terms])
    matched = p.filter(F.array_contains(qt, F.col("w")))
    dfreq = matched.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    dlen = docs.select(
        "doc_id", F.size(_words(F.col(text_col))).alias("dl")
    )
    corpus = docs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(_words(F.col(text_col)))).alias("avgdl"),
    )
    scored = (
        matched.join(dfreq, "w")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 4).alias("score"))
    )
    # Global top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps + driver merge of k rows — no global sort, no single-partition
    # window); the rank column is then a window over just k rows.
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return topk.withColumn("rank", F.row_number().over(win).cast("int"))


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    top: int | None = None,
) -> DataFrame:
    """``(doc_id, n_systems, rrf_score, rank)`` — Reciprocal Rank
    Fusion (Cormack, Clarke & Buettcher 2009): fuse N rankings by
    ``score(d) = Σ_systems 1/(k + rank_sys(d))`` — THE standard
    rank-level combiner for hybrid retrieval (BM25 ⊕ dense ANN), and
    provably robust without score normalization because it never looks
    at the systems' incomparable raw scores. Documents missing from a
    system simply contribute nothing (the standard convention).

    Each input frame needs ``(id_col, rank)``. Determinism: each term
    is ONE division of exact integers, the fused sum is over ≤N such
    doubles (commutative-exact at N=2; identical decimals at any N —
    the per-engine add order matches because both engines sum the same
    set), rounded 6 dp before the final ranking with doc_id tie-break.
    Plan: union of the (already tiny, top-k-sized) ranking frames + one
    keyed sum + one ordered window over the fused candidates — the
    window input is |candidates| ≤ Σ k_sys rows, never the corpus.

    ``rankings`` must be non-empty (there is nothing to fuse — and no
    schema to return — from zero systems: ValueError). ``top=0`` is a
    real cap returning zero rows; only ``top=None`` means uncapped
    (ADVICE r13)."""
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking frame")
    parts = [
        r.select(
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("t"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_systems"),
        F.round(F.sum("t"), 6).alias("rrf_score"),
    )
    win = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    out = fused.withColumn("rank", F.row_number().over(win).cast("int"))
    return out.filter(F.col("rank") <= top) if top is not None else out


def ndcg_at_k(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rel_col: str = "rel",
    round_dp: int = 6,
) -> DataFrame:
    """1-row ``(k, n_ranked, n_relevant, dcg, idcg, ndcg)`` — normalized
    discounted cumulative gain at depth ``k`` (Järvelin & Kekäläinen
    2002), the standard graded-relevance quality score for a retrieval
    ranking: ``DCG = Σ_{rank≤k} (2^rel − 1) / log2(rank + 1)`` over the
    system's ranking, normalized by the IDCG of the ideal reordering of
    the relevance table. The eval-side sibling of :func:`bm25_topk` /
    :func:`rrf_fuse` — train-data search pipelines report NDCG@k when
    tuning either.

    ``ranking`` needs ``(id_col, rank)`` (1-based, e.g. ``bm25_topk``
    output); ``relevance`` needs ``(id_col, rel_col)`` with integer
    grades ≥ 0 (docs absent from ``relevance`` count as grade 0; docs
    absent from ``ranking`` contribute only to IDCG). ``ndcg`` is NULL
    when IDCG = 0 (no relevant documents — quality is undefined, and 0
    would misread as "worst possible ranking").

    Plan: the ranked side is ≤k rows joined LEFT to relevance on the id
    (broadcast — a top-k frame is tiny by construction); the ideal side
    is a global top-k of the relevance table by grade, which Spark
    plans as TakeOrderedAndProject (no full sort at any scale). Both
    sums are over ≤k doubles of magnitude ~1 — the ~1e-16 add-order
    jitter class, safe under 6-dp rounding. Ideal-order ties break on
    ``id_col`` so both engines rank the identical ideal list."""
    r = (
        ranking.filter(F.col("rank") <= k)
        .join(
            relevance.select(
                F.col(id_col), F.col(rel_col).cast("double").alias("__rel")
            ),
            id_col,
            "left",
        )
        .select(
            F.col("rank"),
            F.coalesce(F.col("__rel"), F.lit(0.0)).alias("__rel"),
        )
    )
    dcg = r.agg(
        F.coalesce(
            F.sum(
                (F.pow(F.lit(2.0), F.col("__rel")) - 1.0)
                / F.log2(F.col("rank") + F.lit(1.0))
            ),
            F.lit(0.0),
        ).alias("dcg"),
        F.count("*").cast("long").alias("n_ranked"),
    )
    ideal = (
        relevance.select(
            F.col(rel_col).cast("double").alias("__rel"), F.col(id_col)
        )
        .filter(F.col("__rel") > 0)
        .orderBy(F.col("__rel").desc(), F.col(id_col))
        .limit(k)
    )
    iw = Window.orderBy(F.col("__rel").desc(), F.col(id_col))
    idcg = ideal.withColumn("__irank", F.row_number().over(iw)).agg(
        F.coalesce(
            F.sum(
                (F.pow(F.lit(2.0), F.col("__rel")) - 1.0)
                / F.log2(F.col("__irank") + F.lit(1.0))
            ),
            F.lit(0.0),
        ).alias("idcg"),
        F.count("*").cast("long").alias("n_relevant"),
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.lit(k).cast("int").alias("k"),
        "n_ranked",
        "n_relevant",
        F.round("dcg", round_dp).alias("dcg"),
        F.round("idcg", round_dp).alias("idcg"),
        F.when(
            F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), round_dp)
        ).alias("ndcg"),
    )


def precision_recall_at_k(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rel_col: str = "rel",
    min_rel: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """1-row ``(k, n_hits, n_relevant, precision, recall, f1)`` — the
    set-based retrieval quality pair at depth ``k`` (NDCG's binary
    sibling — :func:`ndcg_at_k` grades, this counts): a document is
    RELEVANT iff its grade ≥ ``min_rel``; ``precision = hits/k``,
    ``recall = hits/|relevant|``, F1 their harmonic mean.

    All three are divisions of exact BIGINTs (hits and |relevant| are
    counts, k a literal) — identical decimals cross-engine at
    ``round_dp``. ``recall``/``f1`` are NULL when no document is
    relevant (undefined, never 0); ``precision`` divides by ``k``
    even when fewer than k rows were ranked (the standard padded-list
    convention).

    Plan: the ≤k ranked rows semi-join the relevant set (broadcast of
    a top-k-sized frame); |relevant| is one filtered count of the
    relevance table — one scan each, no sorts."""
    rel_docs = relevance.filter(
        F.col(rel_col) >= F.lit(min_rel)
    ).select(id_col)
    hits = (
        ranking.filter(F.col("rank") <= k)
        .join(rel_docs, id_col, "left_semi")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    n_rel = rel_docs.agg(F.count("*").cast("long").alias("n_relevant"))
    p = F.col("n_hits") / F.lit(float(k))
    r = F.col("n_hits") / F.col("n_relevant")
    return hits.crossJoin(F.broadcast(n_rel)).select(
        F.lit(k).cast("int").alias("k"),
        "n_hits",
        "n_relevant",
        F.round(p, round_dp).alias("precision"),
        F.when(F.col("n_relevant") > 0, F.round(r, round_dp)).alias("recall"),
        F.when(
            (F.col("n_relevant") > 0) & (p + r > 0),
            F.round(2.0 * p * r / (p + r), round_dp),
        ).alias("f1"),
    )
