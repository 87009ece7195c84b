"""Training-data pipeline assembly ops over ``documents``: token-budget
shard packing, deterministic stratified sampling, and context-window
chunking — the steps between a cleaned corpus and a training run.

All are pytest-only EXTRA queries (the driver registry is capped at 50)
with exact DuckDB oracles, and all are built on the distributed shapes that
survive 100 TB: the shard packer's global running sum is a TWO-PHASE scan
(per-bucket windows in parallel + a tiny bucket-offset table broadcast
back), never a single-partition global window; sampling is a pure hash
filter; chunking is a stride explode.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recidiviz_data_spark.operators.base import _qx
from recidiviz_data_spark.operators.relational import load
from recidiviz_data_spark.operators.textops import PHASH_SQL, phash

SHARD_BUDGET_CHARS = 16384  # pack shards to ~16 KiB of text
PACK_BUCKET = 100  # docs per cumsum bucket (the parallel unit of phase 1)

# deterministic per-language sampling rates (percent)
SAMPLE_PCT = {"en": 50, "fr": 25, "de": 25, "es": 10}

CHUNK_LEN = 50  # words per chunk
CHUNK_STRIDE = 40  # 10-word overlap


# the two-phase running-sum packing over a CTE named ``src`` (doc_id,
# n_chars) — shared by the plain packing oracle and the composed pipeline
_PACK_SQL = f"""
    d AS (SELECT doc_id, n_chars, doc_id // {PACK_BUCKET} AS b FROM src),
    wb AS (SELECT doc_id, n_chars, b,
                  SUM(n_chars) OVER (PARTITION BY b ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_in_b
           FROM d),
    bsum AS (SELECT b, SUM(n_chars) AS tot FROM d GROUP BY b),
    boff AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
             FROM bsum),
    g AS (SELECT wb.doc_id, wb.n_chars, boff.off + wb.cum_in_b AS gcum
          FROM wb JOIN boff USING (b)),
    assigned AS (SELECT doc_id, n_chars,
                        (gcum - n_chars) // {SHARD_BUDGET_CHARS} AS shard_id
                 FROM g)
"""

_SHARD_SUMMARY_SQL = """
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM assigned GROUP BY 1
"""


@_qx(
    "x_token_shard_packing",
    f"""
    WITH src AS (SELECT doc_id, n_chars FROM documents),
    {_PACK_SQL}
    {_SHARD_SUMMARY_SQL}
    """,
)
def x_token_shard_packing(spark, sf_dir):
    """Pack documents into ~budget-sized output shards by running size —
    the write-side step of a training pipeline (each shard becomes one
    training file). Each doc is assigned by the shard its STARTING offset
    falls in, so assignment is a pure function of the global running sum.

    The running sum is computed in TWO phases so no stage ever sees a
    global single-partition window: phase 1 windows WITHIN doc_id buckets
    (all buckets in parallel); phase 2 prefix-sums the tiny per-bucket
    totals (rows = n_docs / PACK_BUCKET) and broadcasts the offsets back.
    At 100 TB the offset table is still only ~10^6 rows of two longs."""
    return _shard_summary(assign_shards(load(spark, sf_dir, "documents")))


def assign_shards(d):
    """(doc_id, n_chars, ...) -> (doc_id, n_chars, shard_id): the two-phase
    distributed running sum (see x_token_shard_packing docstring)."""
    d = d.select(
        "doc_id", "n_chars",
        # floor, not cast: Spark cast(double AS long) truncates toward zero,
        # DuckDB // floors — identical only because doc_id >= 0; floor keeps
        # them identical unconditionally
        F.floor(F.col("doc_id") / PACK_BUCKET).cast("long").alias("b"),
    )
    w_in = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wb = d.withColumn("cum_in_b", F.sum("n_chars").over(w_in))
    bsum = d.groupBy("b").agg(F.sum("n_chars").alias("tot"))
    # the per-bucket table is tiny — its global window is O(buckets), and
    # the result broadcasts back to the doc-level stream
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.select(
        "b", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off")
    )
    g = wb.join(F.broadcast(boff), "b").withColumn(
        "gcum", F.col("off") + F.col("cum_in_b")
    )
    return g.withColumn(
        "shard_id",
        F.floor((F.col("gcum") - F.col("n_chars")) / SHARD_BUDGET_CHARS),
    )


def _shard_summary(assigned):
    return assigned.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("shard_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@_qx(
    "x_corpus_pipeline",
    f"""
    WITH keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents
                     GROUP BY {PHASH_SQL.format(x="lower(trim(text))")}),
    q AS (SELECT d.doc_id, d.n_chars,
                 len(regexp_split_to_array(trim(d.text), '\\s+')) AS n_words
          FROM documents d JOIN keepers USING (doc_id)),
    src AS (SELECT doc_id, n_chars FROM q WHERE n_words >= 25),
    {_PACK_SQL}
    {_SHARD_SUMMARY_SQL}
    """,
)
def x_corpus_pipeline(spark, sf_dir):
    """End-to-end corpus preparation in ONE declarative plan — the composed
    shape a real training pipeline runs nightly: exact dedup (content-hash
    keepers) -> quality gate (drop 'low' docs, < 25 words) -> pack survivors
    into ~budget-sized training shards (two-phase distributed running sum).
    Each stage is the already-verified operator (d_exact_dedup /
    t_quality_score / x_token_shard_packing) composed as DataFrame algebra,
    so Catalyst fuses the whole thing: one scan of documents feeds the hash
    groupBy; the keeper semi-join and word-count filter run before any
    packing shuffle."""
    from recidiviz_data_spark.operators.textops import phash

    d = load(spark, sf_dir, "documents")
    keepers = (
        d.groupBy(phash(F.lower(F.trim("text"))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    words = F.split(F.trim("text"), r"\s+")
    kept = (
        d.join(keepers, "doc_id", "left_semi")
        .withColumn("n_words", F.size(words))
        .filter(F.col("n_words") >= 25)
        .select("doc_id", "n_chars")
    )
    return _shard_summary(assign_shards(kept))


_SAMPLE_CASE = " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in SAMPLE_PCT.items()
)


@_qx(
    "x_stratified_sample",
    f"""
    WITH d AS (SELECT lang,
                      {PHASH_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS h
               FROM documents),
    rates AS (SELECT lang, h,
                     CASE {_SAMPLE_CASE} ELSE 0 END AS pct
              FROM d)
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN h < pct THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN h < pct THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ratio
    FROM rates GROUP BY lang
    """,
)
def x_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (the reproducible analog of
    ``sampleBy``): keep a doc iff hash(doc_id) mod 100 falls under its
    language's percentage. A pure per-row filter — no shuffle, no RNG
    state, and the SAME sample on every run and every engine, which is
    what a training-data pipeline actually wants from its sampler."""
    d = load(spark, sf_dir, "documents")
    h = F.pmod(phash(F.col("doc_id").cast("string")), F.lit(100))
    # first-match-wins CASE, same order as the oracle's
    pct = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in SAMPLE_PCT.items()],
        F.lit(0),
    )
    keep = (h < pct).cast("int")
    return d.select("lang", keep.alias("k")).groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum("k").alias("n_sampled"),
        (F.sum("k").cast("double") / F.count("*")).alias("ratio"),
    )


@_qx(
    "x_doc_chunking",
    f"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+') AS ws
               FROM documents),
    nz AS (SELECT doc_id, list_filter(ws, x -> x <> '') AS ws FROM w),
    starts AS (SELECT doc_id, ws, len(ws) AS n, i
               FROM nz, UNNEST(generate_series(1, greatest(len(ws), 1), {CHUNK_STRIDE})) t(i)
               WHERE len(ws) > 0),
    chunks AS (SELECT doc_id, (i - 1) // {CHUNK_STRIDE} AS chunk_idx, i AS start_word,
                      least({CHUNK_LEN}, n - i + 1) AS chunk_words,
                      {PHASH_SQL.format(x=f"array_to_string(ws[i:i+{CHUNK_LEN - 1}], ' ')")} AS chunk_hash
               FROM starts)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(start_word AS BIGINT) AS start_word,
           CAST(chunk_words AS BIGINT) AS chunk_words, chunk_hash
    FROM chunks
    """,
)
def x_doc_chunking(spark, sf_dir):
    """Context-window chunking: split each document into CHUNK_LEN-word
    windows advancing by CHUNK_STRIDE (overlap = LEN - STRIDE), the step
    that turns documents into model-context-sized training rows. Shape:
    stride sequence + posexplode + slice — one output row per chunk, no
    Python. chunk_hash fingerprints the exact chunk text cross-engine."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = F.filter(
        F.split(F.lower("text"), "[ \\t\\n\\r\\f]+"), lambda x: x != ""
    )
    base = d.select("doc_id", ws.alias("ws")).withColumn("n", F.size("ws")).filter(
        "n > 0"
    )
    starts = base.select(
        "doc_id", "ws", "n",
        F.explode(
            F.sequence(F.lit(1), F.greatest("n", F.lit(1)), F.lit(CHUNK_STRIDE))
        ).alias("i"),
    )
    chunk = F.slice("ws", F.col("i"), F.lit(CHUNK_LEN))
    return starts.select(
        "doc_id",
        F.floor((F.col("i") - 1) / CHUNK_STRIDE).alias("chunk_idx"),
        F.col("i").cast("long").alias("start_word"),
        F.least(F.lit(CHUNK_LEN), F.col("n") - F.col("i") + 1)
        .cast("long")
        .alias("chunk_words"),
        phash(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


SEQ_LEN = 128  # tokens per packed training row


@_qx(
    "x_sequence_packing",
    f"""
    WITH nz AS (SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+'),
                                   x -> x <> '') AS ws
                FROM documents),
    lens AS (SELECT doc_id, len(ws) AS n, doc_id // {PACK_BUCKET} AS b FROM nz),
    wb AS (SELECT doc_id, n, b,
                  SUM(n) OVER (PARTITION BY b ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n AS off_in_b
           FROM lens),
    bsum AS (SELECT b, SUM(n) AS tot FROM lens GROUP BY b),
    boff AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
             FROM bsum),
    offs AS (SELECT wb.doc_id, boff.boff + wb.off_in_b AS off
             FROM wb JOIN boff USING (b)),
    tok AS (SELECT nz.doc_id, offs.off + i - 1 AS pos, nz.ws[i] AS word
            FROM nz JOIN offs USING (doc_id),
                 UNNEST(generate_series(1, len(nz.ws))) t(i)),
    seqs AS (SELECT pos // {SEQ_LEN} AS seq_id, doc_id, pos, word FROM tok)
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc,
           {PHASH_SQL.format(x="string_agg(word, ' ' ORDER BY pos)")} AS seq_hash
    FROM seqs GROUP BY 1
    """,
)
def x_sequence_packing(spark, sf_dir):
    """Cross-document sequence packing — the training-example packer: every
    document's token stream is laid end-to-end at a GLOBAL offset and cut
    into fixed SEQ_LEN rows, so one packed row can span a doc boundary and
    no token is padded away. The global offset is the same two-phase scan
    as x_token_shard_packing (per-bucket windows in parallel + a tiny
    broadcast offset table — never a global single-partition window); the
    packed row's content hash is order-exact in both engines."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = F.filter(F.split(F.lower("text"), "[ \\t\\n\\r\\f]+"), lambda x: x != "")
    nz = d.select("doc_id", ws.alias("ws"))
    lens = nz.select(
        "doc_id", F.size("ws").alias("n"),
        F.floor(F.col("doc_id") / PACK_BUCKET).cast("long").alias("b"),
    )
    w_in = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wb = lens.withColumn("off_in_b", F.sum("n").over(w_in) - F.col("n"))
    bsum = lens.groupBy("b").agg(F.sum("n").alias("tot"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.select("b", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("boff"))
    offs = wb.join(F.broadcast(boff), "b").select(
        "doc_id", (F.col("boff") + F.col("off_in_b")).alias("off")
    )
    tok = (
        nz.join(offs, "doc_id")
        .select("doc_id", "off", F.posexplode("ws").alias("j", "word"))
        .select("doc_id", (F.col("off") + F.col("j")).alias("pos"), "word")
        .withColumn("seq_id", F.floor(F.col("pos") / SEQ_LEN))
    )
    # order-exact row hash: collect (pos, word), sort by pos, re-join —
    # deterministic in both engines (DuckDB uses string_agg ORDER BY pos)
    packed = tok.groupBy("seq_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        phash(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
            )
        ).alias("seq_hash"),
    )
    return packed


# ---------------------------------------------------------------------------
# token-level span scrub -> sequence packing (the stage between the dedup
# suite and a training-ready corpus: cut cross-doc duplicated TOKEN spans out
# of the engine payload shape — tokens array<int> — recompute n_tok, and pack
# the scrubbed streams into fixed-length training rows in one composed plan)

TOKEN_VOCAB = 50257  # same vocab the changelog generator uses (gen.py)

from recidiviz_data_spark.operators.dedup import SPAN_LEN  # noqa: E402 — one
# source of truth for the span width shared with the text-level scrub


def tokenize_docs(d):
    """documents(text) -> (doc_id, toks array<int>): deterministic word-level
    token ids (phash(word) mod vocab), identical in both engines — the stand-
    in for a real tokenizer that keeps every downstream op oracle-exact."""
    ws = F.filter(F.split(F.lower("text"), "[ \\t\\n\\r\\f]+"), lambda x: x != "")
    return d.select(
        "doc_id",
        F.transform(
            ws, lambda w: F.pmod(phash(w), F.lit(TOKEN_VOCAB)).cast("int")
        ).alias("toks"),
    )


def _kept_token_rows(docs, sl: int, pre_tokenized: bool = False):
    """(doc_id, pos, tok) rows SURVIVING the cross-doc duplicate-span mask —
    the shared core of the token scrub: span hashes are a per-doc transform
    (token strings materialized once — HOF lambdas are interpreted with no
    common-subexpression elimination, so casting inside the per-SPAN slice
    would redo sl casts per position), cross-doc detection is ONE
    hash-partitioned window (min != max doc), and the cut is a (doc, pos)
    anti-join. Linear in corpus tokens; no pair join anywhere.

    ``pre_tokenized=True`` takes (doc_id, tokens array<int>) — the engine's
    own payload shape (a miniberg CDC table read) — instead of text."""
    from pyspark.sql.window import Window as _W

    t = (
        docs.select("doc_id", F.col("tokens").alias("toks"))
        if pre_tokenized
        else tokenize_docs(docs)
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    # NOT checkpointed: the two consumers (span-hash branch, token-row
    # branch) re-tokenize, but materializing here measured SLOWER — the
    # extra synchronous barrier costs more than the ~0.5 s recompute
    t = t.withColumn("strs", F.transform("toks", lambda x: x.cast("string")))
    n = F.size("toks")
    span_h = lambda i: phash(F.concat_ws(" ", F.slice("strs", i, sl)))
    grams = F.when(
        n >= sl,
        F.transform(
            F.sequence(F.lit(1), n - (sl - 1)),
            lambda i: F.struct(i.alias("i"), span_h(i).alias("h")),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,h:long>>"))
    g = t.select("doc_id", F.explode(grams).alias("g")).select("doc_id", "g.i", "g.h")
    w = _W.partitionBy("h")
    dup = (
        g.withColumn("mn", F.min("doc_id").over(w))
        .withColumn("mx", F.max("doc_id").over(w))
        .filter(F.col("mn") != F.col("mx"))
        .select("doc_id", "i")
    )
    cut = dup.select(
        "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + (sl - 1))).alias("pos")
    ).distinct()
    tpos = t.select("doc_id", F.posexplode("toks").alias("p0", "tok")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "tok"
    )
    return tpos.join(cut, ["doc_id", "pos"], "left_anti")


def scrub_token_spans(spark, docs, span_len: int | None = None,
                      keep_empty_docs: bool = True,
                      pre_tokenized: bool = False):
    """Cut cross-doc duplicated token spans out of each doc's token stream:
    (doc_id, tokens array<int>, n_tok) with every masked position removed —
    the engine-payload form of ``x_span_scrub`` (round-4 verdict item 1).
    Reassembly is a per-doc sort (never global); ``keep_empty_docs=False``
    omits docs whose stream scrubbed away entirely (skips a join);
    ``pre_tokenized=True`` consumes (doc_id, tokens) directly — i.e. a CDC
    table read — closing the ingest -> dedup -> training-corpus loop on the
    engine's own payload."""
    from recidiviz_data_spark.operators.dedup import SPAN_LEN

    kept = _kept_token_rows(docs, span_len or SPAN_LEN, pre_tokenized=pre_tokenized)
    scrubbed = kept.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
        ).alias("tokens"),
        F.count("*").cast("int").alias("n_tok"),
    )
    if not keep_empty_docs:
        return scrubbed
    # docs fully scrubbed away (or empty) come back with an empty stream
    return (
        docs.select("doc_id")
        .join(scrubbed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("tokens", F.array().cast("array<int>")).alias("tokens"),
            F.coalesce("n_tok", F.lit(0).cast("int")).alias("n_tok"),
        )
    )


_SCRUB_PACK_ORACLE = f"""
    WITH nz AS (SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f]+'),
                                   x -> x <> '') AS ws
                FROM documents),
    tk AS (SELECT doc_id,
                  list_transform(ws, w -> {PHASH_SQL.format(x="w")} % {TOKEN_VOCAB}) AS t
           FROM nz),
    ts AS (SELECT doc_id, t, list_transform(t, x -> CAST(x AS VARCHAR)) AS s,
                  len(t) AS n
           FROM tk),
    grams AS (SELECT doc_id, i,
                     {PHASH_SQL.format(x=f"array_to_string(s[i:i+{SPAN_LEN - 1}], ' ')")} AS h
              FROM ts, UNNEST(generate_series(1, greatest(n - {SPAN_LEN - 1}, 0))) g(i)),
    dup AS (SELECT doc_id, i FROM (
              SELECT doc_id, i,
                     MIN(doc_id) OVER (PARTITION BY h) AS mn,
                     MAX(doc_id) OVER (PARTITION BY h) AS mx
              FROM grams)
            WHERE mn <> mx),
    cut AS (SELECT DISTINCT doc_id, pos
            FROM dup, UNNEST(generate_series(i, i + {SPAN_LEN - 1})) p(pos)),
    tpos AS (SELECT ts.doc_id, gp.pos, ts.t[gp.pos] AS tok
             FROM ts, UNNEST(generate_series(1, n)) gp(pos)),
    kept AS (SELECT tp.doc_id, tp.pos, tp.tok,
                    row_number() OVER (PARTITION BY tp.doc_id ORDER BY tp.pos) AS r
             FROM tpos tp
             WHERE NOT EXISTS (SELECT 1 FROM cut
                               WHERE cut.doc_id = tp.doc_id AND cut.pos = tp.pos)),
    lens AS (SELECT doc_id, COUNT(*) AS n, doc_id // {PACK_BUCKET} AS b
             FROM kept GROUP BY doc_id),
    wb AS (SELECT doc_id, n, b,
                  SUM(n) OVER (PARTITION BY b ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n AS off_in_b
           FROM lens),
    bsum AS (SELECT b, SUM(n) AS tot FROM lens GROUP BY b),
    boff AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
             FROM bsum),
    offs AS (SELECT wb.doc_id, boff.boff + wb.off_in_b AS off
             FROM wb JOIN boff USING (b)),
    seqs AS (SELECT (offs.off + k.r - 1) // {SEQ_LEN} AS seq_id, k.doc_id,
                    offs.off + k.r - 1 AS gpos, k.tok
             FROM kept k JOIN offs USING (doc_id))
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc,
           {PHASH_SQL.format(x="string_agg(CAST(tok AS VARCHAR), ' ' ORDER BY gpos)")} AS seq_hash
    FROM seqs GROUP BY 1
    """


@_qx("x_token_scrub_pack", _SCRUB_PACK_ORACLE)
def x_token_scrub_pack(spark, sf_dir, docs=None):
    """The missing stage between the dedup suite and a training run (round-4
    verdict item 1): tokenize -> cut cross-doc duplicated TOKEN spans
    (``scrub_token_spans`` — the array<int> analog of x_span_scrub, n_tok
    recomputed) -> lay the SCRUBBED streams end-to-end at a global offset ->
    cut into SEQ_LEN training rows. One composed Catalyst plan; the global
    offset is the same two-phase scan as x_sequence_packing (per-bucket
    windows + a tiny broadcast offset table), and each packed row's content
    hash is order-exact in both engines.

    The packer consumes the scrub's SURVIVING (doc, pos, tok) rows directly
    (per-doc rank = position in the scrubbed stream, mirroring the oracle's
    row_number) — re-assembling token arrays only to re-explode them would
    add a groupBy + explode stage pair for nothing."""
    from pyspark.sql.window import Window as _W

    from recidiviz_data_spark.operators.dedup import SPAN_LEN
    from recidiviz_data_spark.operators.relational import load

    d = docs if docs is not None else load(spark, sf_dir, "documents")
    kept = _kept_token_rows(d, SPAN_LEN)
    # materialize the scrubbed stream ONCE: it has three consumers (length
    # table, offset join, final pack) and the plain DAG recomputes the whole
    # scrub per consumer (the anti-join's AQE reshaping defeats exchange
    # reuse — measured 12 scans of documents without this). A real pipeline
    # persists the scrubbed corpus between stages anyway; localCheckpoint is
    # the in-session form (same precedent as connected_components).
    from recidiviz_data_spark.session import materialize

    ranked = materialize(
        kept.withColumn(
            "r", F.row_number().over(_W.partitionBy("doc_id").orderBy("pos"))
        )
    )
    lens = ranked.groupBy(
        "doc_id", F.floor(F.col("doc_id") / PACK_BUCKET).cast("long").alias("b")
    ).agg(F.count("*").alias("n"))
    w_in = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wb = lens.withColumn("off_in_b", F.sum("n").over(w_in) - F.col("n"))
    bsum = lens.groupBy("b").agg(F.sum("n").alias("tot"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.select("b", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("boff"))
    offs = wb.join(F.broadcast(boff), "b").select(
        "doc_id", (F.col("boff") + F.col("off_in_b")).alias("off")
    )
    tok = (
        ranked.join(offs, "doc_id")
        .select("doc_id", "r", (F.col("off") + F.col("r") - 1).alias("gpos"), "tok")
        .withColumn("seq_id", F.floor(F.col("gpos") / SEQ_LEN))
    )
    # n_docs WITHOUT countDistinct's two-phase expand: streams are laid
    # contiguously, so each (doc, seq) pair has exactly ONE row that is a
    # doc start (r = 1) or a seq start (gpos % SEQ_LEN = 0) — counting those
    # rows IS the distinct-doc count, in a single aggregation pass
    is_doc_head = (F.col("r") == 1) | (F.col("gpos") % SEQ_LEN == 0)
    return tok.groupBy("seq_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_doc_head.cast("long")).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        phash(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gpos", "tok"))),
                    lambda s: s["tok"].cast("string"),
                ),
            )
        ).alias("seq_hash"),
    )
