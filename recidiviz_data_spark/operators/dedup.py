"""Deduplication operators for a training-data pipeline over ``documents``:
exact (content hash), n-gram Jaccard, MinHash+LSH banding, SimHash.

All scale-path constructions: shingle -> explode -> equi-join on shingle /
band bucket (never an O(n²) cross join except the explicitly-bounded SimHash
pair scan), expressed in native Catalyst ops and mirrored exactly in the
DuckDB oracles via the portable md5-int60 hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recidiviz_data_spark.operators.base import _q
from recidiviz_data_spark.operators.relational import load
from recidiviz_data_spark.operators.textops import PHASH_SQL, phash

N_HASHES = 8
N_BANDS = 4  # rows per band = 2


def _shingles(spark, sf_dir):
    """Distinct 3-word shingles per doc (native HOFs: split/transform/slice)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    # guard: sequence(1, 0) is DESCENDING in Spark (yields [1, 0] and slice
    # throws on start=0) — docs with < 3 words produce no shingles, matching
    # DuckDB's empty generate_series(1, 0)
    sh = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .distinct()
    )


_SHINGLES_SQL = """
  words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') w FROM documents),
  sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         FROM words, UNNEST(generate_series(1, greatest(len(w)-2, 0))) t(i))
"""


@_q(
    "d_exact_dedup",
    f"""
    SELECT {PHASH_SQL.format(x="lower(trim(text))")} AS content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper
    FROM documents GROUP BY 1
    """,
)
def d_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized content, keep min doc_id."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(phash(F.lower(F.trim("text"))).alias("content_hash")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper")
    )


@_q(
    "d_ngram_jaccard",
    f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT d1, d2, shared,
           CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
    FROM pairs JOIN sizes sa ON d1 = sa.doc_id JOIN sizes sb ON d2 = sb.doc_id
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.3
    """,
)
def d_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs: shingle equi-join (the scalable
    shape — candidate pairs only where a shingle is shared, never n²)."""
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("shared"))
    )
    j = (
        pairs.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "na"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "nb"), "d2")
        .withColumn("jaccard", F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jaccard") >= 0.3)
    )
    return j.select("d1", "d2", "shared", "jaccard")


_MINHASH_SQL = f"""
  hashes AS (SELECT doc_id, j,
                    MIN({PHASH_SQL.format(x="concat(shingle, '#', CAST(j AS VARCHAR))")}) AS mh
             FROM sh, UNNEST(generate_series(0, {N_HASHES - 1})) t(j)
             GROUP BY doc_id, j),
  bands AS (SELECT doc_id, j // 2 AS band,
                   MIN(CASE WHEN j % 2 = 0 THEN mh END) AS h_lo,
                   MIN(CASE WHEN j % 2 = 1 THEN mh END) AS h_hi
            FROM hashes GROUP BY doc_id, j // 2)
"""


@_q(
    "d_minhash_lsh",
    f"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL}
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_bands_shared
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.h_lo = b.h_lo AND a.h_hi = b.h_hi
     AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def d_minhash_lsh(spark, sf_dir):
    """MinHash+LSH: shingle -> k=8 minhash signature -> 4 bands of 2 ->
    bucket-join on band value. Candidate pairs = docs agreeing on >=1 band.
    The band bucket-join is the 100TB-scale path (no pairwise work)."""
    sh = _shingles(spark, sf_dir)
    hashed = (
        sh.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("j"), "shingle")
        .groupBy("doc_id", "j")
        .agg(F.min(phash(F.concat(F.col("shingle"), F.lit("#"), F.col("j").cast("string")))).alias("mh"))
    )
    bands = hashed.groupBy("doc_id", (F.col("j") / 2).cast("int").alias("band")).agg(
        F.min(F.when(F.col("j") % 2 == 0, F.col("mh"))).alias("h_lo"),
        F.min(F.when(F.col("j") % 2 == 1, F.col("mh"))).alias("h_hi"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h_lo") == F.col("b.h_lo"))
            & (F.col("a.h_hi") == F.col("b.h_hi"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


_SIMHASH_SQL = f"""
  tokens AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
             FROM documents),
  bits AS (SELECT doc_id, i,
                  SUM(CASE WHEN ({PHASH_SQL.format(x="word")} >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM tokens, UNNEST(generate_series(0, 31)) t(i)
           GROUP BY doc_id, i),
  sig AS (SELECT doc_id,
                 CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id)
"""


@_q(
    "d_simhash",
    f"""
    WITH {_SIMHASH_SQL}
    SELECT doc_id, simhash FROM sig
    """,
)
def d_simhash(spark, sf_dir):
    """32-bit SimHash signature per doc (word-hash bit voting)."""
    return _simhash_sig(spark, sf_dir)


def _simhash_sig(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word")
    ).withColumn("h", phash(F.col("word")))
    bits = (
        tokens.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"))
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(h, i) & 1") == 1, 1).otherwise(-1)
            ).alias("s")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(0)
        ).alias("simhash")
    )


@_q(
    "d_simhash_neardup",
    f"""
    WITH {_SIMHASH_SQL}
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def d_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 2). The bounded pairwise scan is for
    verification at test scale; at 100TB one buckets by simhash prefix bands
    first (same trick as MinHash LSH)."""
    sig = _simhash_sig(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 2)
    )
