"""Text-analysis operators for a training-data pipeline over ``documents``:
language-ID heuristic, quality scoring, token counting, fingerprinting.
All native Catalyst expressions (no Python in the hot path); every query is
DuckDB-oracle checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recidiviz_data_spark.operators.base import _q, _qx
from recidiviz_data_spark.operators.relational import load

# portable 60-bit hash (identical in Spark & DuckDB)
def phash(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


PHASH_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "los", "de", "y", "un"],
}


@_q(
    "t_token_count",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE) / COUNT(*) AS avg_tokens,
           MAX(len(regexp_split_to_array(trim(text), '\\s+'))) AS max_tokens
    FROM documents GROUP BY lang
    """,
)
def t_token_count(spark, sf_dir):
    """Whitespace tokenization counts per language (token budget accounting)."""
    d = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim("text"), r"\s+"))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n).alias("total_tokens"),
        (F.sum(n).cast("double") / F.count("*")).alias("avg_tokens"),
        F.max(n).alias("max_tokens"),
    )


@_q(
    "t_langid_heuristic",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 x -> list_contains(['the','a','of','and','to'], x))) AS s_en,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 x -> list_contains(['le','la','de','et','un'], x))) AS s_fr,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 x -> list_contains(['der','die','das','und','ein'], x))) AS s_de,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 x -> list_contains(['el','los','de','y','un'], x))) AS s_es
      FROM documents)
    SELECT lang,
           CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS predicted,
           COUNT(*) AS n
    FROM scored GROUP BY 1, 2
    """,
)
def t_langid_heuristic(spark, sf_dir):
    """Stopword-hit language ID (n-gram-heuristic class): confusion counts of
    labeled vs predicted language."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), r"\s+")

    def score(lang):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(words, lambda x: F.array_contains(sw, x)))

    scored = d.select(
        "lang",
        score("en").alias("s_en"), score("fr").alias("s_fr"),
        score("de").alias("s_de"), score("es").alias("s_es"),
    )
    pred = (
        F.when((F.col("s_en") >= F.col("s_fr")) & (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")), "en")
        .when((F.col("s_fr") >= F.col("s_de")) & (F.col("s_fr") >= F.col("s_es")), "fr")
        .when(F.col("s_de") >= F.col("s_es"), "de")
        .otherwise("es")
    )
    return scored.groupBy("lang", pred.alias("predicted")).agg(F.count("*").alias("n"))


@_q(
    "t_quality_score",
    """
    WITH q AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
             n_chars,
             len(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS n_uniq
      FROM documents)
    SELECT doc_id, lang, n_words,
           CAST(n_chars AS DOUBLE) / n_words AS chars_per_word,
           CAST(n_uniq AS DOUBLE) / n_words AS uniq_ratio,
           CASE WHEN n_words >= 60 AND CAST(n_uniq AS DOUBLE) / n_words > 0.3 THEN 'high'
                WHEN n_words >= 25 THEN 'medium' ELSE 'low' END AS quality_bucket
    FROM q
    """,
)
def t_quality_score(spark, sf_dir):
    """Quality heuristics: length, lexical diversity, chars/word -> bucket
    (the doc-filtering stage of a training-data pipeline)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    lwords = F.split(F.lower("text"), r"\s+")
    q = d.select(
        "doc_id", "lang",
        F.size(words).alias("n_words"),
        F.col("n_chars"),
        F.size(F.array_distinct(lwords)).alias("n_uniq"),
    )
    bucket = (
        F.when((F.col("n_words") >= 60) & (F.col("n_uniq").cast("double") / F.col("n_words") > 0.3), "high")
        .when(F.col("n_words") >= 25, "medium")
        .otherwise("low")
    )
    return q.select(
        "doc_id", "lang", "n_words",
        (F.col("n_chars").cast("double") / F.col("n_words")).alias("chars_per_word"),
        (F.col("n_uniq").cast("double") / F.col("n_words")).alias("uniq_ratio"),
        bucket.alias("quality_bucket"),
    )


@_q(
    "t_fingerprint",
    f"""
    SELECT doc_id,
           {PHASH_SQL.format(x="lower(trim(text))")} AS fingerprint,
           {PHASH_SQL.format(x="substr(lower(trim(text)), 1, 64)")} AS prefix_fp,
           CAST(n_chars // 100 AS BIGINT) AS len_bucket
    FROM documents
    """,
)
def t_fingerprint(spark, sf_dir):
    """Document fingerprinting: full + prefix content hashes and a length
    bucket — the cheap pre-filter for dedup."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.trim("text"))
    return d.select(
        "doc_id",
        phash(norm).alias("fingerprint"),
        phash(F.substring(norm, 1, 64)).alias("prefix_fp"),
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
    )


@_qx(
    "x_winnowing_fingerprint",
    f"""
    WITH nd AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
    g AS (SELECT doc_id, i, {PHASH_SQL.format(x="substr(t, i, 8)")} AS h
          FROM nd, UNNEST(generate_series(1, greatest(length(t) - 7, 0))) u(i)),
    wmin AS (SELECT doc_id, i,
                    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
                    COUNT(*) OVER (PARTITION BY doc_id) AS m
             FROM g),
    fp AS (SELECT DISTINCT doc_id, mh FROM wmin WHERE i <= m - 3)
    SELECT doc_id, COUNT(*) AS n_fingerprints, MIN(mh) AS min_fp
    FROM fp GROUP BY doc_id
    """,
)
def x_winnowing_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing, the MOSS scheme):
    hash every char 8-gram, keep the minimum of each 4-hash sliding window,
    dedupe — a content-position-robust fingerprint set (insertion/deletion
    moves only nearby fingerprints, unlike the whole-doc hash in
    t_fingerprint). Shape: build the per-doc k-gram hash array with one
    transform, posexplode it, take sliding minima with a rows-window — the
    same plan as the oracle. (An all-array form using slice() inside a
    transform lambda re-evaluates the WHOLE gram array per element — lambda
    bodies are not common-subexpression-eliminated — turning O(m) into O(m²)
    md5 calls; measured ~60x slower.) Docs with fewer than k+w-1 chars have
    no full window and are excluded, matching the oracle."""
    from pyspark.sql.window import Window

    k, w = 8, 4
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    t = F.lower(F.trim("text"))
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(0))
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams), lambda i: phash(t.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<long>"))
    # carry the gram count from before the explode (size is O(1) per doc)
    # instead of re-counting the exploded rows with a second window; grams is
    # aliased in its own projection first so size+posexplode don't each
    # re-evaluate the md5 transform (CollapseProject won't inline a non-cheap
    # alias referenced twice)
    g = d.select("doc_id", grams.alias("grams")).select(
        "doc_id", F.size("grams").alias("m"), F.posexplode("grams").alias("i", "h")
    )  # i is 0-based
    w_min = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    wmin = g.select("doc_id", "i", "m", F.min("h").over(w_min).alias("mh"))
    fp = wmin.filter(F.col("i") <= F.col("m") - w).select("doc_id", "mh").distinct()
    return fp.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"), F.min("mh").alias("min_fp")
    )


@_qx(
    "x_bpe_token_count",
    """
    WITH tok AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f]')) AS n_bpe,
             len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\r\\f]')) AS n_punct
      FROM documents)
    SELECT lang,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_punct) AS BIGINT) AS total_punct,
           CAST(SUM(n_punct) AS DOUBLE) / SUM(n_bpe) AS punct_ratio
    FROM tok GROUP BY lang
    """,
)
def x_bpe_token_count(spark, sf_dir):
    """BPE-ish tokenization counts (the GPT-2-pretokenizer shape: letter
    runs | digit runs | single punctuation) + punctuation-ratio quality
    signal — complements t_token_count's whitespace tokens. The whitespace
    class is spelled out explicitly ([ \\t\\n\\r\\f]) instead of \\s because
    Java's ASCII \\s includes vertical tab \\x0B while RE2's does not — the
    explicit class makes Spark and DuckDB agree on every byte."""
    d = load(spark, sf_dir, "documents")
    # idx=0 (whole match): Spark defaults to capture group 1, which these
    # group-free patterns don't have
    n_bpe = F.size(
        F.regexp_extract_all(
            "text", F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f]"), F.lit(0)
        )
    )
    n_punct = F.size(
        F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 \\t\\n\\r\\f]"), F.lit(0))
    )
    return (
        d.select("lang", n_bpe.alias("n_bpe"), n_punct.alias("n_punct"))
        .groupBy("lang")
        .agg(
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum("n_punct").alias("total_punct"),
            (F.sum("n_punct").cast("double") / F.sum("n_bpe")).alias("punct_ratio"),
        )
    )
