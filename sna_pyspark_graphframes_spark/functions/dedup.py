"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup — the core of a training-data pipeline at scale.

Portability-first design: the hash family is md5 (available and identical
in Spark, DuckDB, and Python), and MinHash minimizes *hex-string* order —
min over uniformly-distributed strings is exactly as valid as min over
ints, and it makes every signature SQL-oracle-able byte-for-byte.

Scale posture:
  * exact dedup — one hash-aggregate on the digest (map-side combine).
  * MinHash — shingle explode → per-doc signature agg → band-bucket
    equi-join; never an all-pairs product. Bucket-join skew (a hot bucket)
    is AQE-handled; band width tunes precision/recall.
  * n-gram Jaccard — candidate pairs come from the shared-shingle
    equi-join (inverted-index style), so cost is Σ(docs-per-shingle²) not
    |docs|²; threshold filters before the final agg.
  * SimHash — per-token hash bits aggregated by sign, one pass; near-dup =
    signature band match (here: exact signature match or small hamming via
    band join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.functions.text import fingerprint

N_MINHASH = 8          # hash functions in the MinHash signature
MINHASH_BANDS = 4      # bands of 2 → near-dup if any band collides


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest doc_id per normalized-content fingerprint.

    ``groupBy(digest).agg(min(id))`` — the canonical exact-dedup plan: one
    shuffle on the 16-byte digest, no text comparison, no skew (digests are
    uniform)."""
    return (
        docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


def word_shingles(docs: DataFrame, text_col: str = "text", k: int = 2) -> DataFrame:
    """Distinct k-word shingles per document: ``(doc_id, sh)``.

    posexplode + lead-window keeps the construction expressible in ANSI SQL
    (the oracle uses the identical lead() formulation)."""
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "pos", "w"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = words.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.lead("w", i).over(w) if i else F.col("w") for i in range(k)]
        ).alias("sh"),
        *[F.lead("w", i).over(w).alias(f"_w{i}") for i in range(1, k)],
    )
    cond = F.lit(True)
    for i in range(1, k):
        cond = cond & F.col(f"_w{i}").isNotNull()
    return sh.filter(cond).select("doc_id", "sh").distinct()


def minhash_signatures(shingles: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """Per-doc MinHash signature: ``sig_i = min(md5(i || '|' || sh))``.

    One aggregate computes all signature positions (n_hashes min() columns);
    md5 hex strings are uniform, so string-min is a valid minhash and is
    bit-identical across Spark/DuckDB/Python."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"sig{i}")
        for i in range(n_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    bands: int = MINHASH_BANDS,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs ``(doc_a, doc_b)``: some LSH band collides.

    Band r = concat of its signature positions; per-band equi-join on the
    band key (inverted index — never all-pairs), union, distinct.
    ``shingles``: pass a precomputed ``(doc_id, sh)`` table to share the
    shingle pass with other dedup operators over the same corpus."""
    if shingles is None:
        shingles = word_shingles(docs, text_col)
    sigs = minhash_signatures(shingles, n_hashes).cache()
    rows_per_band = n_hashes // bands
    pair_dfs = []
    for b in range(bands):
        cols = [f"sig{b * rows_per_band + r}" for r in range(rows_per_band)]
        banded = sigs.select("doc_id", F.concat_ws("|", *cols).alias("band_key"))
        a = banded.select(F.col("doc_id").alias("doc_a"), "band_key")
        bb = banded.select(F.col("doc_id").alias("doc_b"), "band_key")
        pair_dfs.append(
            a.join(bb, "band_key").filter(F.col("doc_a") < F.col("doc_b")).select(
                "doc_a", "doc_b"
            )
        )
    out = pair_dfs[0]
    for p in pair_dfs[1:]:
        out = out.union(p)
    return out.distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.5,
    use_prefix_filter: bool = False,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle:
    ``(doc_a, doc_b, jaccard)`` with jaccard ≥ threshold.

    Two physically different plans, identical output:

    * default — inverted-index join: intersection sizes from the
      shared-shingle equi-join in ONE pass (73M narrow rows → one
      hash-aggregate at sf0.1), union sizes from per-doc shingle counts
      (|A∪B| = |A|+|B|−|A∩B|). Cost is Σ per-shingle df².
    * ``use_prefix_filter=True`` — AllPairs/PPJoin prefix filtering
      (Bayardo et al. WWW'07; Xiao et al. WWW'08): order shingles by
      ascending global document frequency; a pair with jaccard ≥ t must
      share a shingle among each doc's first ``n − ⌈t·n⌉ + 1`` shingles,
      so only that rare-shingle prefix is indexed; candidates are then
      verified exactly against the full sets.

    Which wins is a property of the shingle-frequency distribution. On
    real web text the df mass concentrates in stop-shingles ("of the"),
    which prefix filtering excludes from the index — at 100 TB it is the
    published scale path. On corpora whose shingle vocabulary is small and
    uniformly hot (like the synthetic bench corpus: 931 distinct bigrams
    over 5000 docs), the prefix only shrinks Σ df² ~2× while the
    candidate-verify join adds Σ|A| per candidate — measured 8× SLOWER at
    sf0.1, so the single-pass join stays the default. Both paths are
    equality-tested; MinHash banding above is the approximate fallback
    when even the prefix index is too hot.

    ``shingles``: pass a precomputed ``(doc_id, sh)`` table (k must match)
    to share the shingle pass with other dedup operators."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(docs, text_col, k).cache()
    )
    if use_prefix_filter:
        return _ngram_jaccard_prefix(sh, threshold)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _ngram_jaccard_prefix(sh: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filtered path of :func:`ngram_jaccard_pairs` (see its
    docstring); ``sh`` is the distinct ``(doc_id, sh)`` shingle table."""
    doc_freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    w_rank = Window.partitionBy("doc_id").orderBy("df", "sh")
    w_doc = Window.partitionBy("doc_id")
    ranked = sh.join(doc_freq, "sh").select(
        "doc_id",
        "sh",
        F.row_number().over(w_rank).alias("rnk"),
        F.count("*").over(w_doc).alias("n"),
    )
    prefix = ranked.filter(
        F.col("rnk")
        <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + F.lit(1)
    )
    a = prefix.select(F.col("doc_id").alias("doc_a"), "sh", F.col("n").alias("na"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "sh", F.col("n").alias("nb"))
    cand = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # size filter: jaccard ≥ t needs t·max(|A|,|B|) ≤ min(|A|,|B|)
        .filter(
            F.least("na", "nb")
            >= F.lit(threshold) * F.greatest("na", "nb")
        )
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint ``(doc_id, simhash)`` over word tokens.

    Bit b of token t = parity of hex digit b of md5(t); the document bit is
    the sign of Σ(±1 weighted by token count). ``bits`` ≤ 32 (md5 hex
    digits). One explode + one aggregate — a single shuffle; the per-bit
    sums are plain conditional sums, all codegen.
    """
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
    )
    h = F.md5(F.col("w"))
    bit_cols = [
        F.sum(
            F.when(
                F.conv(F.substring(h, b + 1, 1), 16, 10).cast("int") % 2 == 1, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = words.groupBy("doc_id").agg(*bit_cols)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_dup_groups(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Groups of documents sharing an identical SimHash — the coarse
    near-dup bucket (hamming-distance banding refines it at scale)."""
    s = simhash(docs, text_col, bits)
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def _cos(va: str, vb: str):
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(va, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(vb, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    return dot / (na * nb)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    dim: int | None = None,
    n_planes: int = 6,
    seed: int = 42,
    brute_force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ``(id_a, id_b, cos)`` with cos ≥
    threshold.

    Default path (the one a 100 TB run takes): random-hyperplane LSH
    candidate generation — each vector lands in a sign-bit bucket
    (``similarity.lsh_buckets``), one side additionally probes every 1-bit
    flip of its bucket, candidates are bucket-mate equi-join pairs, and the
    exact cosine rerank keeps only true matches. Cost is Σ bucket², never
    |N|²; probing all Hamming-1 buckets makes a miss require the pair to
    disagree on ≥ 2 of ``n_planes`` hyperplanes (vanishing for true
    near-dups at cos ≥ 0.95, and impossible for exact/scaled duplicates).
    The rerank is exact, so false positives are impossible at any setting.

    ``brute_force=True`` is the all-pairs exact scorer — the test oracle
    (and DuckDB-twin semantics); quadratic, never the production path.
    Dot products stay in codegen via zip_with/aggregate (no Python).
    """
    v = embeddings.select(
        F.col(id_col), F.col("embedding").cast("array<double>").alias("v")
    )
    if brute_force:
        a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
        b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(_cos("va", "vb"), 4).alias("cos"))
            .filter(F.col("cos") >= threshold)
        )

    from sna_pyspark_graphframes_spark.functions import similarity

    if dim is None:
        # one-row driver action to infer the vector width (plan literal only)
        dim = len(embeddings.select("embedding").head()[0])
    buckets = similarity.lsh_buckets(
        embeddings, dim=dim, n_planes=n_planes, seed=seed, id_col=id_col
    )
    bv = buckets.join(v.withColumnRenamed(id_col, "id"), "id")
    # probe side: own bucket + every 1-bit flip (Hamming-1 neighborhood)
    flips = [F.col("bucket")]
    for i in range(n_planes):
        flipped = F.when(
            F.substring("bucket", i + 1, 1) == "1", F.lit("0")
        ).otherwise(F.lit("1"))
        flips.append(
            F.concat(
                F.substring("bucket", 1, i),
                flipped,
                F.expr(f"substring(bucket, {i + 2})"),
            )
        )
    a = bv.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.explode(F.array(*flips)).alias("bucket"),
    )
    b = bv.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])  # collapse multi-probe hits
        .select("id_a", "id_b", F.round(_cos("va", "vb"), 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def band_keys(sigs: DataFrame, bands: int = MINHASH_BANDS) -> DataFrame:
    """LSH band keys ``(doc_id, band, band_key)`` from a signature table —
    one posexplode over an array of per-band concatenations (single pass,
    no per-band union)."""
    n_sig = len([c for c in sigs.columns if c.startswith("sig")])
    rows_per_band = n_sig // bands
    keys = [
        F.concat_ws(
            "|", *[f"sig{b * rows_per_band + r}" for r in range(rows_per_band)]
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.posexplode(F.array(*keys)).alias("band", "band_key")
    )


def dedup_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Incremental dedup — classify each NEW document against an existing
    corpus: ``(doc_id, drop_reason)`` with reason ``'exact'`` (normalized
    content already present), ``'near_dup'`` (some MinHash band collides
    with a corpus document), or NULL (keep).

    The production shape at 100 TB: a daily drop is deduped against the
    corpus *index* (fingerprints + band keys — both tiny next to the
    corpus text), never by re-deduping the whole corpus. Both probes are
    semi-joins of the small new side against the index: cost is one
    shuffle of the new batch per probe, and a deployment would have the
    corpus side precomputed and bucketed by key. Exact beats near_dup
    when both hit, so reasons are deterministic."""
    fp_new = new_docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))
    fp_old = corpus.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    exact_hit = fp_new.join(fp_old, "fp", "left_semi").select("doc_id")

    bk_new = band_keys(
        minhash_signatures(word_shingles(new_docs, text_col), n_hashes), bands
    )
    bk_old = band_keys(
        minhash_signatures(word_shingles(corpus, text_col), n_hashes), bands
    ).select("band", "band_key").distinct()
    near_hit = (
        bk_new.join(bk_old, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        new_docs.select("doc_id")
        .join(exact_hit.withColumn("__ex", F.lit(1)), "doc_id", "left")
        .join(near_hit.withColumn("__nd", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__ex") == 1, F.lit("exact"))
            .when(F.col("__nd") == 1, F.lit("near_dup"))
            .alias("drop_reason"),
        )
    )


def duplicate_ngram_coverage(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Corpus-global duplicated-span signal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", the
    exact-substring criterion at word-n-gram granularity): for every
    document, the fraction of its DISTINCT word n-grams that also occur
    in at least one OTHER document — ``(doc_id, n_ngrams,
    dup_ngram_frac)``. Pairwise ops (MinHash/Jaccard above) find near-dup
    *pairs*; this is the per-document contamination score a curation
    pipeline thresholds on.

    Plan: n-grams are built and de-duplicated INSIDE each row
    (``transform`` over the token array + ``array_distinct`` — map-side,
    no window, no shuffle), then one explode feeds exactly three keyed
    shuffles: gram → distinct-doc count (map-side partials), gram-keyed
    join back, doc_id rollup. Docs shorter than ``n`` words score 0 over
    0 grams. Hot grams (stopword runs) are AQE-skew-join territory; the
    count aggregate itself is partial-aggregated so the hot key ships one
    row per map task.
    """
    grams_arr = F.array_distinct(
        F.expr(
            f"transform(slice(w, 1, size(w) - {n - 1}),"
            f" (x, i) -> concat_ws(' ', slice(w, i + 1, {n})))"
        )
    )
    grams = (
        docs.select(
            "doc_id", F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("w")
        )
        .filter(F.size("w") >= n)
        .select("doc_id", F.explode(grams_arr).alias("g"))
    )
    gram_docs = grams.groupBy("g").agg(F.count("*").alias("nd"))
    per_doc = (
        grams.join(gram_docs, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("dup"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.round(
                F.coalesce(F.col("dup") / F.col("n_ngrams"), F.lit(0.0)), 4
            ).alias("dup_ngram_frac"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_a, id_b, dist)`` — all pairs of strings within Levenshtein
    distance 1, by the SymSpell deletion-neighborhood join (Garbe 2012,
    the industry-standard spelling-variant blocker): two strings at
    distance ≤ 1 MUST share a key in ``{s} ∪ {s minus one char}``
    (equality shares s; an insertion/deletion pair shares the shorter
    string; a substitution pair shares the both-sides deletion at the
    differing position), so candidate generation is an EQUI-JOIN on
    those keys — never an all-pairs product — and the exact
    ``levenshtein`` then verifies each candidate once. The short-string
    sibling of the n-gram/MinHash near-dup family (those block on
    content overlap; this blocks on character edits — usernames,
    titles, entity names).

    Scale: key fan-out is len+1 per string (explode → |rows|·len keys,
    map-side), the self-join shuffles on the key, dup candidates
    collapse with one distinct, and the verify is a codegen
    ``levenshtein`` on O(candidates) pairs. Everything integer/string —
    hash-exact output in any engine."""
    s = F.trim(F.col(text_col))
    keys = F.array_union(
        F.array(s),
        F.expr(
            f"transform(sequence(1, length(trim({text_col}))), i -> "
            f"concat(substring(trim({text_col}), 1, i - 1), "
            f"substring(trim({text_col}), i + 1, length(trim({text_col})))))"
        ),
    )
    k = df.select(
        F.col(id_col).alias("id"), s.alias("s"), F.explode(keys).alias("k")
    )
    a = k.select(F.col("id").alias("id_a"), F.col("s").alias("sa"), "k")
    b = k.select(F.col("id").alias("id_b"), F.col("s").alias("sb"), "k")
    return (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.levenshtein("sa", "sb").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )
