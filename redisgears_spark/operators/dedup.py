"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (driver north star): exact dedup, n-gram
Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup — each designed
partition-parallel. The exact/Jaccard variants carry DuckDB oracles; the
sketch-based ones (MinHash/SimHash) are probabilistic by design and use the
driver's rows-only check, with exact-verification stages inside the plan.

Determinism: shingle hashing uses xxhash64 with integer salts (stable across
runs/partitions); cosine uses integer-quantized embeddings (see similarity).

Scale design:
  * exact dedup — one hash-shuffle on the fingerprint; at 100 TB group on
    md5 (16 bytes) not the full text (map-side projection drops the payload
    before the exchange).
  * n-gram Jaccard — exact pairwise via shingle self-join; quadratic in
    docs-per-shingle, so it is the *verifier*, not the candidate generator.
  * MinHash LSH — the 100 TB candidate generator: per-doc signature is one
    narrow pass, banding shuffles only (band_id, band_hash, doc_id), and the
    exact verifier runs on candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import load_table

# shared shingle expressions -------------------------------------------------

_WORDS = "filter(split(lower(text), '\\\\s+'), x -> x != '')"
# 0-based word 3-grams, distinct
_SHINGLES = (
    f"CASE WHEN size({_WORDS}) >= 3 THEN "
    f"array_distinct(transform(sequence(0, size({_WORDS}) - 3), "
    f"i -> concat({_WORDS}[i], ' ', {_WORDS}[i+1], ' ', {_WORDS}[i+2]))) "
    "ELSE array('') END"
)

_ORACLE_DOCS_CTE = """
    docs AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3 THEN
               list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              for i in generate_series(1, len(ws) - 2)])
             ELSE [''] END AS sh
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents)
    )
"""


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, sh: array<string> of distinct word 3-grams).

    Implemented as an Arrow-batched mapInPandas stage rather than the
    equivalent Catalyst expression (kept above as _SHINGLES for reference):
    exploding a Catalyst-computed nested array re-evaluates the shingle
    transform per output row (no common-subexpression reuse through
    Generate), turning an O(words) projection into O(words x shingles) —
    measured 7-10x slower at sf0.1. The pandas stage materializes the array
    once; downstream explodes are then free. Semantics are identical to the
    DuckDB oracle (same \\s+ split, lower, first-occurrence distinct).
    """

    def shingle(batches):
        import re

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = [x for x in re.split(r"\s+", text.lower()) if x]
                if len(w) >= 3:
                    sh = list(
                        dict.fromkeys(
                            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
                        )
                    )
                else:
                    sh = [""]
                out.append((doc_id, sh))
            yield pd.DataFrame(out, columns=["doc_id", "sh"])

    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(shingle, "doc_id long, sh array<string>")
    )


# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT fingerprint, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM (SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS fingerprint
          FROM documents)
    GROUP BY fingerprint
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-content hash (keep lowest doc_id).

    Scale: project to (md5, doc_id) before the exchange — the shuffle
    carries 24 bytes/row regardless of document size; at 100 TB this is the
    difference between shuffling 100 TB and shuffling ~50 GB.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return (
        docs.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_ORACLE_DOCS_CTE},
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    sizes AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM docs),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, inter,
           (sa.n + sb.n - inter) AS union_n,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM pairs
    JOIN sizes sa ON pairs.a_id = sa.doc_id
    JOIN sizes sb ON pairs.b_id = sb.doc_id
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity pairs (>= 0.2).

    The deterministic verifier behind MinHash. Jaccard is a ratio of exact
    integers → bit-identical across engines. Scale: the shingle self-join is
    quadratic in per-shingle document frequency — at 100 TB run it only on
    LSH candidates (dedup_minhash_lsh); here it doubles as the oracle-checked
    ground truth.
    """
    # cache: the shingle stage feeds four plan branches (two self-join
    # sides + two size projections) — without it the Python shingling
    # recomputes per branch
    docs = shingled_docs(spark, sf_dir).cache()
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    sizes = docs.select("doc_id", F.size("sh").cast("long").alias("n"))
    a = ex.select(F.col("doc_id").alias("a_id"), F.col("s").alias("s_a"))
    b = ex.select(F.col("doc_id").alias("b_id"), F.col("s").alias("s_b"))
    pairs = (
        a.join(b, (a.s_a == b.s_b) & (a.a_id < b.b_id))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("n_b"))
    jac = F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.join(F.broadcast(sa), "a_id")
        .join(F.broadcast(sb), "b_id")
        .select(
            "a_id",
            "b_id",
            "inter",
            (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("union_n"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


# MinHash parameters: 32 hashes in 8 bands of 4 rows → catches jaccard ≳ 0.3
_MINHASH_N = 32
_MINHASH_BANDS = 8
_MINHASH_ROWS = _MINHASH_N // _MINHASH_BANDS


@query("dedup_minhash_lsh")  # probabilistic candidate gen — rows-only check
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection (shingle → minhash signature → band →
    bucket-join → exact-Jaccard verify).

    The 100 TB dedup path: signature computation is a single narrow pass
    (explode shingles → 32 min-aggregates, map-side partial); the only
    shuffles carry (doc_id, band_id, band_hash) and the candidate pairs.
    The final exact-verify joins shingle sets for candidates only, so the
    quadratic cost is confined to actual near-dups. Output matches
    dedup_ngram_jaccard's schema for pairs the LSH recalls (verified
    jaccard >= 0.2).
    """
    docs = shingled_docs(spark, sf_dir).cache()
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    # hash each shingle string ONCE (variable-length input), then derive the
    # 32 salted hashes from the fixed-width value — ~32x less string hashing
    hashed = ex.select("doc_id", F.xxhash64("s").alias("h"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"h{i}")
            for i in range(_MINHASH_N)
        ]
    )
    # bands: hash each contiguous row-group of the signature
    band_cols = []
    for b in range(_MINHASH_BANDS):
        hs = [F.col(f"h{b * _MINHASH_ROWS + r}") for r in range(_MINHASH_ROWS)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.xxhash64(*hs).alias("band_hash"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    l = buckets.select("band_id", "band_hash", F.col("doc_id").alias("a_id"))
    r = buckets.select("band_id", "band_hash", F.col("doc_id").alias("b_id"))
    cand = (
        l.join(r, ["band_id", "band_hash"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # exact verify on candidates only
    sa = docs.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    sb = docs.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("long")
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            inter.alias("inter"),
            union.alias("union_n"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


@query(
    "pipeline_corpus_filter",
    oracle="""
    WITH quality AS (
      SELECT doc_id, text, lang,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    keep AS (
      SELECT fingerprint, MIN(doc_id) AS keep_doc_id
      FROM (SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                     AS fingerprint
            FROM documents)
      GROUP BY fingerprint
    )
    SELECT q.doc_id, q.lang, CAST(q.n_tokens AS BIGINT) AS n_tokens
    FROM quality q
    JOIN keep k
      ON md5(lower(trim(regexp_replace(q.text, '\\s+', ' ', 'g'))))
         = k.fingerprint AND q.doc_id = k.keep_doc_id
    WHERE q.n_tokens >= 10 AND q.lang IN ('en', 'de', 'fr', 'es')
    """,
)
def pipeline_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline: quality gate (token floor) →
    language allow-list → exact-dedup survivor selection, in ONE plan.

    This is the shape the engine exists for: each stage is a cheap column
    predicate or a fingerprint aggregate, composed so Catalyst fuses the
    scans — the quality+language filters prune *before* the dedup join, and
    the dedup side carries only (fingerprint, keep_doc_id). At 100 TB the
    filters drop the bulk of the corpus before anything shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    n_tokens = F.expr(f"CAST(size({_WORDS}) AS BIGINT)")
    keep = (
        docs.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"))
    )
    gated = (
        docs.withColumn("n_tokens", n_tokens)
        .filter(
            (F.col("n_tokens") >= 10)
            & F.col("lang").isin("en", "de", "fr", "es")
        )
        .withColumn("fingerprint", fp)
    )
    return (
        gated.join(
            F.broadcast(keep),
            (gated.fingerprint == keep.fingerprint)
            & (gated.doc_id == keep.keep_doc_id),
        )
        .select("doc_id", "lang", "n_tokens")
    )


@query(
    "pipeline_stratified_sample",
    oracle="""
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 100 AS bucket
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100
          < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified subsampling — downsample dominant strata
    (here: keep 50% of 'en', 20% of everything else) with a portable
    content hash, so the SAME rows are selected on any engine, any
    partitioning, any run (df.sample() is none of those things).

    The hash is the first 8 hex digits of md5(doc_id) — identical in Spark
    (conv base-16) and DuckDB (0x cast), making a sampling operator
    oracle-checkable at all. Scale: pure narrow projection + filter;
    at 100 TB the predicate rides the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 50).otherwise(20)
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    )


_SIMHASH_BITS = 48
_SIMHASH_BANDS = 4  # 12 bits per band → candidates within hamming ≈ 3


@query("dedup_simhash")  # sketch-based — rows-only check
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 48-bit signature over word hashes, banded
    candidate generation, hamming-distance <= 6 filter.

    Scale: the signature is one explode + 48 conditional-sum aggregates
    (all map-side partial); banding shuffles only (band_id, band_bits,
    doc_id). Hamming check on candidates uses xor+bit_count — JVM built-ins.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.expr(_WORDS)).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    # per-bit balance: +1 if bit set, -1 otherwise; sign → signature bit
    bit_sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    sim = sum(
        F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(_SIMHASH_BITS)
    )
    sigs = bit_sums.select("doc_id", sim.alias("simhash"))
    band_width = _SIMHASH_BITS // _SIMHASH_BANDS
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), b * band_width)
                        .bitwiseAND((1 << band_width) - 1)
                        .alias("band_bits"),
                    )
                    for b in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_bits")
    l = bands.select(
        "band_id", "band_bits", F.col("doc_id").alias("a_id"), F.col("simhash").alias("sim_a")
    )
    r = bands.select(
        "band_id", "band_bits", F.col("doc_id").alias("b_id"), F.col("simhash").alias("sim_b")
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        l.join(r, ["band_id", "band_bits"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "sim_a", "sim_b")
        .distinct()
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= 6)
    )
