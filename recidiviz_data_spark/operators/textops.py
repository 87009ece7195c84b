"""Text-analysis operators for a training-data pipeline over ``documents``:
language-ID heuristic, quality scoring, token counting, fingerprinting.
All native Catalyst expressions (no Python in the hot path); every query is
DuckDB-oracle checked.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringized
# annotations (future-annotations) against module globals
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
    """Whitespace tokenization counts per language (token budget accounting).

    The token count is projected ONCE (three aggregate expressions would
    otherwise each re-run the regex split per row) and the 2-column slice is
    repartitioned first: the demo documents table is one parquet row group,
    so the split would otherwise run on a single task."""
    d = load(spark, sf_dir, "documents").select(
        "lang", "text", "doc_id"
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    pro = d.select("lang", F.size(F.split(F.trim("text"), r"\s+")).alias("_n"))
    return pro.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("_n").alias("total_tokens"),
        (F.sum("_n").cast("double") / F.count("*")).alias("avg_tokens"),
        F.max("_n").alias("max_tokens"),
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
    # split once into a projected column (the four per-language scores would
    # otherwise each re-run the regex split inside their interpreted filter
    # lambda — no CSE across select expressions), and hash-repartition past
    # the single-row-group scan so the interpreted stopword filters run
    # cluster-wide
    d = load(spark, sf_dir, "documents").select("lang", "text", "doc_id").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).withColumn("_w", F.split(F.lower("text"), r"\s+"))

    def score(lang):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(F.col("_w"), lambda x: F.array_contains(sw, x)))

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
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # (single-row-group scan: repartition spreads the two regex splits +
    # array_distinct; 4-column slice keeps the shuffle lean)
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
    g AS (SELECT doc_id, i, md5(substr(t, i, 8)) AS h
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
    no full window and are excluded, matching the oracle.

    Hash = the raw md5 HEX: fixed-width lowercase hex orders exactly like
    the number in both engines, so the window-min works on the string and
    the per-gram conv(hex, 16, 10) decode — measured ~25% of this op's cost
    (1.6M interpreted BigInteger parses at sf0.1) — is dropped entirely."""
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
            F.sequence(F.lit(1), n_grams), lambda i: F.md5(t.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<string>"))
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


# --------------------------------------------------------------- merge-table BPE
# A real byte-pair-encoding merge table (rank-ordered; every multi-char part
# is created by a strictly earlier merge, as a trained table guarantees).
# Toy-sized on purpose — the mechanism (broadcast merge dict + Arrow-batched
# encoder), not the table, is the operator.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"),
    ("a", "l"), ("in", "g"), ("c", "h"), ("l", "l"), ("s", "e"),
]

_BPE_MERGES_VALUES = ", ".join(
    f"({r}, '{x}', '{y}')" for r, (x, y) in enumerate(BPE_MERGES)
)

# The oracle runs the SAME merge table through a recursive CTE: token
# boundaries are ASCII unit-separator (chr 31) characters — a control char,
# reserved by stripping it from the text in BOTH engines first (a printable
# separator like '|' would collide with corpus text and miscount); each
# step applies the best-ranked (lowest rank) merge present, at its LEFTMOST
# occurrence, one at a time. For a consistent table (parts exist before
# use) this is equivalent to classic BPE's merge-all-occurrences loop, and
# the Python encoder below implements the identical one-at-a-time rule so
# equality is structural, not lucky.
_BPE_SQL = f"""
    merges(rank, x, y) AS (VALUES {_BPE_MERGES_VALUES}),
    docw AS (SELECT doc_id,
                    unnest(regexp_split_to_array(
                        replace(lower(text), chr(31), ''), '[ \\t\\n\\r\\f]+')) AS word
             FROM documents),
    words AS (SELECT DISTINCT word FROM docw WHERE word <> ''),
    enc(word, state) AS (
      SELECT word, chr(31) || array_to_string(
               list_transform(generate_series(1, length(word)),
                              i -> substr(word, i, 1)), chr(31)) || chr(31)
      FROM words
      UNION ALL
      SELECT e.word,
             substr(e.state, 1, position((chr(31) || m.x || chr(31) || m.y || chr(31)) IN e.state) - 1)
             || chr(31) || m.x || m.y ||
             substr(e.state, position((chr(31) || m.x || chr(31) || m.y || chr(31)) IN e.state)
                              + length(m.x) + length(m.y) + 2)
      FROM enc e JOIN merges m
        ON position((chr(31) || m.x || chr(31) || m.y || chr(31)) IN e.state) > 0
      WHERE NOT EXISTS (SELECT 1 FROM merges m2 WHERE m2.rank < m.rank
                        AND position((chr(31) || m2.x || chr(31) || m2.y || chr(31)) IN e.state) > 0)
    ),
    final AS (SELECT word, state FROM enc e
              WHERE NOT EXISTS (SELECT 1 FROM merges m
                                WHERE position(chr(31)||m.x||chr(31)||m.y||chr(31) IN e.state) > 0)),
    wc AS (SELECT word, length(state) - length(replace(state, chr(31), '')) - 1 AS n_tok
           FROM final),
    per_doc AS (SELECT d.doc_id, SUM(wc.n_tok) AS n
                FROM docw d JOIN wc USING (word) GROUP BY d.doc_id)
"""


@_qx(
    "x_subword_bpe",
    f"""
    WITH RECURSIVE {_BPE_SQL}
    SELECT doc_id, CAST(COALESCE(per_doc.n, 0) AS BIGINT) AS n_subword
    FROM documents LEFT JOIN per_doc USING (doc_id)
    """,
)
def x_subword_bpe(spark, sf_dir):
    """Merge-table BPE token counting: the merge dict (BPE_MERGES, rank ->
    pair) is broadcast to executors and an Arrow-batched pandas_udf encodes
    each document — the real subword-tokenizer shape (vs the regex
    pretokenizer in x_bpe_token_count). Per Arrow batch a word-level memo
    collapses repeated words, so cost scales with distinct words per batch.
    NOT a row-at-a-time Python UDF: the plan shows ArrowEvalPython
    (tests/test_plans.py asserts BatchEvalPython never appears)."""
    ranks = {pair: r for r, pair in enumerate(BPE_MERGES)}
    pairs = list(BPE_MERGES)
    bc = spark.sparkContext.broadcast((ranks, pairs))

    @F.pandas_udf("long")
    def n_subword_udf(texts: pd.Series) -> pd.Series:
        ranks, pairs = bc.value
        memo: dict[str, int] = {}

        import heapq

        def word_count(w: str) -> int:
            """Heap + linked-list BPE merge, O(L log L) per distinct word
            (the naive rescan-per-merge form is O(L^2·merges) — it showed up
            in the round-3 review). Semantics identical to the oracle's
            recursive CTE: repeatedly merge the LEFTMOST occurrence of the
            best-rank pair. The heap orders by (rank, position); positions
            are stable leftmost-char indices, so the min entry IS the
            best-rank leftmost pair; stale entries (a side changed by an
            earlier merge) fail the rank re-check and are skipped — every
            merge pushes fresh entries for its new neighbor pairs, so all
            live pairs stay represented."""
            n = memo.get(w)
            if n is not None:
                return n
            n0 = len(w)
            tok = list(w)
            nxt = list(range(1, n0)) + [-1]
            prv = [-1] + list(range(n0 - 1))
            alive = [True] * n0
            heap = [
                (r, i)
                for i in range(n0 - 1)
                if (r := ranks.get((tok[i], tok[i + 1]))) is not None
            ]
            heapq.heapify(heap)
            count = n0
            while heap:
                r, i = heapq.heappop(heap)
                if not alive[i]:
                    continue
                j = nxt[i]
                if j == -1 or ranks.get((tok[i], tok[j])) != r:
                    continue  # stale entry: this pair changed since push
                tok[i] += tok[j]
                alive[j] = False
                nxt[i] = nxt[j]
                if nxt[i] != -1:
                    prv[nxt[i]] = i
                count -= 1
                p = prv[i]
                if p != -1 and (rp := ranks.get((tok[p], tok[i]))) is not None:
                    heapq.heappush(heap, (rp, p))
                if nxt[i] != -1 and (rn := ranks.get((tok[i], tok[nxt[i]]))) is not None:
                    heapq.heappush(heap, (rn, i))
            memo[w] = count
            return count

        import re

        ws = re.compile(r"[ \t\n\r\f]+")  # explicit class: Python's str.split
        # and engine \s definitions disagree on \x0B / Unicode spaces

        def doc_count(text) -> int:
            if text is None:
                return 0
            # chr(31) is the oracle's reserved token-boundary char — strip
            # it identically on both sides (it is corpus junk anyway)
            return sum(
                word_count(w)
                for w in ws.split(text.lower().replace("\x1f", ""))
                if w
            )

        return texts.map(doc_count).astype("int64")

    d = load(spark, sf_dir, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )  # hash, not round-robin: no sortBeforeRepartition pass; 2-col slice
    # so only (doc_id, text) crosses the shuffle and the Arrow boundary
    return d.select("doc_id", n_subword_udf("text").alias("n_subword"))


@_qx(
    "x_tfidf_topterms",
    """
    WITH docw AS (SELECT doc_id,
                         unnest(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+')) AS word
                  FROM documents),
    w AS (SELECT doc_id, word, COUNT(*) AS tf FROM docw WHERE word <> '' GROUP BY 1, 2),
    dfreq AS (SELECT word, COUNT(*) AS df FROM w GROUP BY 1),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    scored AS (SELECT doc_id, word, tf,
                      CAST(tf AS DOUBLE) * n / df AS score
               FROM w JOIN dfreq USING (word) CROSS JOIN nd)
    SELECT doc_id, word, tf, score
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, word) rn FROM scored)
    WHERE rn <= 3
    """,
)
def x_tfidf_topterms(spark, sf_dir):
    """Term-importance scoring: top-3 terms per doc by tf x (N/df) — the
    TF-IDF shape with a RATIONAL idf (tf*N/df is one IEEE division of exact
    integers, bit-portable between engines; ln() is libm-dependent and is
    deliberately avoided in an oracle-hashed query). Two hash aggregations +
    a broadcast of the tiny df table — at corpus scale df fits the same
    hot-list reasoning as the dedup DF cap."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    words = F.split(F.lower("text"), "[ \\t\\n\\r\\f]+")
    docw = d.select("doc_id", F.explode(words).alias("word")).filter(
        F.col("word") != ""
    )
    w = docw.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = w.groupBy("word").agg(F.count("*").alias("df"))
    nd = load(spark, sf_dir, "documents").select(
        F.countDistinct("doc_id").alias("n")
    )
    scored = (
        w.join(dfreq, "word")
        .crossJoin(F.broadcast(nd))
        .withColumn("score", F.col("tf").cast("double") * F.col("n") / F.col("df"))
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter("rn <= 3")
        .select("doc_id", "word", "tf", "score")
    )
