"""Round-4 additions: param-keyed cdc workdir caches, near-dup clustering,
merge-on-read deletes, disjoint-bucket commit rebase, secondary-column stats
skipping, banded-join candidate budget."""

from __future__ import annotations

import os

from recidiviz_data_spark.operators.cdcops import (
    APPLY_GEN,
    changelog_dir,
    ensure_changelog,
)


def test_cdc_workdir_keyed_on_generator_params():
    """Changing ANY gen_changelog argument must land in a fresh workdir and
    regenerate — a stale /tmp changelog from older parameters can never be
    served (round-3 verdict: the old key was (sf_dir, tag) only)."""
    p1 = dict(APPLY_GEN)
    p2 = {**APPLY_GEN, "n_events": APPLY_GEN["n_events"] + 1}
    d1, d2 = changelog_dir("apply", p1), changelog_dir("apply", p2)
    assert d1 != d2

    c1 = ensure_changelog("apply", p1)
    sentinel = os.path.join(c1, "_GEN_SUCCESS")
    mtime = os.path.getmtime(sentinel)
    # identical params: cached, no regeneration
    assert ensure_changelog("apply", p1) == c1
    assert os.path.getmtime(sentinel) == mtime
    # different params: provably regenerates into the new dir
    c2 = ensure_changelog("stream", {**p1, "n_docs": 50, "n_events": 200})
    assert c2 != c1
    assert os.path.exists(os.path.join(c2, "_GEN_SUCCESS"))


# --------------------------------------------- commit rebase + stats skipping
def _mk_table(tmp_path, name, num_buckets=4):
    from pyspark.sql import types as T

    from recidiviz_data_spark.tables.miniberg import Miniberg

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("source", T.StringType(), True),
            T.StructField("_seq", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    )
    return Miniberg.create(str(tmp_path / name), schema, num_buckets=num_buckets)


def _stage_file(table, bucket, rows):
    """Stage one parquet file of (doc_id, source, _seq, _deleted) rows into
    ``bucket`` and return its collected entries (footer stats recorded)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    staging = table.staging_dir()
    bdir = os.path.join(staging, f"_bucket={bucket}")
    os.makedirs(bdir)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows]),
                "source": pa.array([r[1] for r in rows]),
                "_seq": pa.array([r[2] for r in rows], type=pa.int64()),
                "_deleted": pa.array([False] * len(rows)),
            }
        ),
        os.path.join(bdir, "part-0.parquet"),
    )
    return table.collect_staged_files(staging, 0)


def test_disjoint_bucket_commit_rebase(tmp_path):
    """Two writers committing to DISJOINT buckets from the same parent both
    land (the loser auto-rebases); overlapping buckets and watermark
    movement still conflict."""
    import pytest

    from recidiviz_data_spark.tables.miniberg import CommitConflict

    table = _mk_table(tmp_path, "t_rebase")
    v0 = table.current_version()
    e_b0 = _stage_file(table, 0, [("a", "web", 1)])
    e_b1 = _stage_file(table, 1, [("b", "web", 1)])
    assert table.commit(added_files=e_b0, replaced_buckets={0}, expected_parent=v0) == 1
    # stale parent, disjoint bucket: rebases internally, no caller replay
    assert table.commit(added_files=e_b1, replaced_buckets={1}, expected_parent=v0) == 2
    paths = {f["path"] for f in table.files()}
    assert {e["path"] for e in e_b0 + e_b1} <= paths
    # overlap: bucket 1 was just touched -> a stale-parent commit to it raises
    e_b1b = _stage_file(table, 1, [("c", "web", 2)])
    with pytest.raises(CommitConflict):
        table.commit(added_files=e_b1b, replaced_buckets={1}, expected_parent=v0)
    # watermark: once batch 3 is applied, a stale-parent batch-3 commit raises
    e_b2 = _stage_file(table, 2, [("d", "web", 3)])
    v3 = table.commit(added_files=e_b2, replaced_buckets={2}, last_applied_batch=3)
    e_b3 = _stage_file(table, 3, [("e", "web", 4)])
    with pytest.raises(CommitConflict):
        table.commit(added_files=e_b3, replaced_buckets={3},
                     last_applied_batch=3, expected_parent=v3 - 1)


def test_secondary_stats_skipping(spark, tmp_path):
    """Files whose recorded footer min/max exclude the predicate range are
    not opened: a source='code' read over a table whose 'web' rows live in
    other files prunes those files at the manifest level AND returns the
    exact rows."""
    table = _mk_table(tmp_path, "t_stats")
    added = []
    added += _stage_file(table, 0, [(f"w{i}", "web", i) for i in range(5)])
    added += _stage_file(table, 1, [(f"c{i}", "code", 10 + i) for i in range(5)])
    added += _stage_file(table, 2, [(f"b{i}", "books", 20 + i) for i in range(5)])
    table.commit(added_files=added, replaced_buckets=set())
    files = table.files()
    assert all("stats" in f and "source" in f["stats"] for f in files)

    kept = table.files_for_stats(files, {"source": ("code", "code")})
    assert len(kept) == 1 and kept[0]["stats"]["source"] == ["code", "code"]
    rows = table.read(spark, stats_filter={"source": ("code", "code")}).collect()
    assert sorted(r["doc_id"] for r in rows) == [f"c{i}" for i in range(5)]
    # range predicate on _seq: only the middle file survives
    kept_seq = table.files_for_stats(files, {"_seq": (10, 14)})
    assert len(kept_seq) == 1
    # unbounded side + type-mismatch bounds are conservative (no crash)
    assert len(table.files_for_stats(files, {"source": (None, "code")})) == 2
    assert len(table.files_for_stats(files, {"source": (5, 7)})) == 3

    # a bucket with delta files is never pruned (MOR resolution needs base)
    files_d = [dict(f) for f in files]
    files_d[0]["kind"] = "delta"
    assert len(table.files_for_stats(files_d, {"source": ("code", "code")})) == 2


def test_read_keys_with_stats_filter(spark, tmp_path):
    """Point lookup + secondary predicate: key skipping and stats skipping
    compose, and the residual filter is exact."""
    table = _mk_table(tmp_path, "t_rks")
    added = _stage_file(table, 0, [("a", "web", 1), ("b", "code", 2)])
    added += _stage_file(table, 1, [("c", "books", 3)])
    table.commit(added_files=added, replaced_buckets=set())
    got = table.read_keys(spark, ["a", "b"], stats_filter={"source": ("code", "code")})
    assert [r["doc_id"] for r in got.collect()] == ["b"]


def test_files_for_keys_type_guard(tmp_path):
    """Mismatched key type vs recorded stats raises a clear ValueError
    instead of a bare TypeError mid-comparison."""
    import pytest

    from recidiviz_data_spark.tables.miniberg import Miniberg

    table = _mk_table(tmp_path, "t_guard")
    added = _stage_file(table, 0, [("a", "web", 1)])
    table.commit(added_files=added, replaced_buckets=set())
    with pytest.raises(ValueError, match="recorded stats type"):
        Miniberg.files_for_keys(table.files(), [42])


def test_table_changes_across_schema_evolution(spark, tmp_path):
    """CDF read spanning a schema-evolution boundary: the old snapshot lacks
    the later-added column; table_changes must null-fill it, not raise."""
    from pyspark.sql import types as T

    table = _mk_table(tmp_path, "t_cdf")
    added = _stage_file(table, 0, [("a", "web", 1), ("b", "web", 2)])
    v1 = table.commit(added_files=added, replaced_buckets=set())
    # evolve: add a column, then write a file carrying it
    new_fields, changed = table.evolve_schema(
        T.StructType([T.StructField("lang", T.StringType(), True)])
    )
    assert changed
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    staging = table.staging_dir()
    os.makedirs(os.path.join(staging, "_bucket=0"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["a", "c"]),
                "source": pa.array(["web", "code"]),
                "lang": pa.array(["en", "fr"]),
                "_seq": pa.array([3, 4], type=pa.int64()),
                "_deleted": pa.array([False, False]),
            }
        ),
        os.path.join(staging, "_bucket=0", "part-0.parquet"),
    )
    v2 = table.commit(
        added_files=table.collect_staged_files(staging, 1),
        replaced_buckets={0},
        schema_fields=new_fields,
    )
    ev = {r["doc_id"]: r for r in table.table_changes(spark, v1, v2).collect()}
    assert ev["c"]["op"] == "I" and ev["c"]["lang"] == "fr"
    assert ev["a"]["op"] == "U" and ev["a"]["lang"] == "en"  # null -> 'en'
    assert ev["b"]["op"] == "D"


# ------------------------------------------------------- merge-on-read (MOR)
V1_PAYLOAD = None  # built lazily (pyspark types import inside fixtures)


def _v1_payload():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )


def _table_state(spark, table, with_lang=False):
    df = table.read(spark)
    cols = ["doc_id", "tokens", "n_tok", "source"] + (["lang"] if with_lang else [])
    return df.selectExpr(
        *[c if c != "n_tok" else "CAST(n_tok AS BIGINT) AS n_tok" for c in cols]
    ).toPandas()


def test_mor_forced_replay_equality(spark, changelog_small, tmp_path):
    """Forced merge-on-read (every eligible bucket writes deltas, never a
    rewrite) must reproduce the LWW-fold oracle exactly — deletes become
    delta tombstones, stale replays stay dead, the mid-log schema bump
    lands in delta files read against older base files."""
    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
    from recidiviz_data_spark.oracle import assert_state_equal, expected_state_with_lang

    d, _ = changelog_small
    table = create_empty_table(str(tmp_path / "t_mor"), _v1_payload(), num_buckets=8)
    apply_batches(spark, table, d, mor=True, compact=False)
    kinds = [f.get("kind") for f in table.files()]
    assert "delta" in kinds, "forced MOR produced no delta entries"
    assert_state_equal(
        _table_state(spark, table, with_lang=True), expected_state_with_lang(d)
    )


def test_mor_autocompact_folds_deltas(spark, changelog_small, tmp_path):
    """With compact='auto', delta depth is bounded: once a bucket hits the
    file threshold the next write COWs it, folding deltas into base files.
    Equality must survive the fold."""
    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
    from recidiviz_data_spark.oracle import assert_state_equal, expected_state_with_lang
    from recidiviz_data_spark.tables.miniberg import Miniberg

    d, _ = changelog_small
    table = create_empty_table(str(tmp_path / "t_morc"), _v1_payload(), num_buckets=8)
    apply_batches(spark, table, d, mor=True, compact="auto", compact_files_per_bucket=3)
    summ = Miniberg.bucket_summaries(table.manifest())
    assert summ and all(s["n_files"] <= 3 for s in summ.values()), summ
    assert_state_equal(
        _table_state(spark, table, with_lang=True), expected_state_with_lang(d)
    )


def test_mor_point_lookup_and_tombstone(spark, changelog_plain, tmp_path):
    """read_keys on a MOR table resolves deltas: an updated key returns its
    newest payload, a deleted key disappears (tombstone delta wins over the
    live base row)."""
    from pyspark.sql import functions as F

    from recidiviz_data_spark.cdc.apply import apply_batch, apply_batches, create_empty_table

    d, _ = changelog_plain
    table = create_empty_table(str(tmp_path / "t_morp"), _v1_payload(), num_buckets=4)
    apply_batches(spark, table, d)
    live = table.read(spark).select("doc_id").limit(2).collect()
    k_upd, k_del = live[0][0], live[1][0]
    batch = spark.createDataFrame(
        [
            (10_000_000, "U", k_upd, [7, 7, 7], 3, "web"),
            (10_000_001, "D", k_del, None, None, None),
        ],
        "event_seq long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )
    apply_batch(spark, table, batch, table.manifest()["last_applied_batch"] + 1,
                mor=True, compact=False)
    assert any(f.get("kind") == "delta" for f in table.files())
    got = {r["doc_id"]: r for r in table.read_keys(spark, [k_upd, k_del]).collect()}
    assert list(got) == [k_upd] and got[k_upd]["tokens"] == [7, 7, 7]
    # stale replay AFTER the tombstone must not resurrect the doc
    stale = spark.createDataFrame(
        [(1, "U", k_del, [9], 1, "web")],
        "event_seq long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )
    apply_batch(spark, table, stale, table.manifest()["last_applied_batch"] + 1,
                mor=True, compact=False)
    assert table.read(spark).filter(F.col("doc_id") == k_del).count() == 0
    # the MOR-resolved read plan stays JVM-side and join-sane
    from recidiviz_data_spark.plans.checks import assert_no_row_python, plan_string

    resolved = table.read(spark)
    p = plan_string(resolved)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert_no_row_python(resolved)


def test_split_buckets_folds_mor_deltas(spark, changelog_plain, tmp_path):
    """Bucket split reads through MOR resolution and replaces every bucket,
    so delta files fold away and state is preserved across the re-bucket."""
    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
    from recidiviz_data_spark.tables.maintenance import split_buckets

    d, _ = changelog_plain
    table = create_empty_table(str(tmp_path / "t_split"), _v1_payload(), num_buckets=4)
    apply_batches(spark, table, d, mor=True, compact=False)
    assert any(f.get("kind") == "delta" for f in table.files())
    before = _table_state(spark, table).sort_values("doc_id").reset_index(drop=True)
    split_buckets(spark, table, factor=2)
    assert table.manifest()["num_buckets"] == 8
    assert not any(f.get("kind") == "delta" for f in table.files())
    after = _table_state(spark, table).sort_values("doc_id").reset_index(drop=True)
    assert before.drop(columns=["tokens"]).equals(after.drop(columns=["tokens"]))
    assert (before.tokens.map(tuple) == after.tokens.map(tuple)).all()


def test_mor_write_amplification(spark, tmp_path):
    """A 1%-change dribble batch under MOR writes < 10% of the bytes the
    copy-on-write rewrite would, and both modes read back identically."""
    import shutil

    from recidiviz_data_spark.cdc.apply import apply_batch, apply_batches, create_empty_table
    from recidiviz_data_spark.gen import gen_changelog
    from recidiviz_data_spark.tables.miniberg import Miniberg

    cl = str(tmp_path / "cl")
    gen_changelog(cl, n_docs=4000, n_events=4000, n_batches=1, delete_rate=0.0)
    base_root = str(tmp_path / "t_base")
    table = create_empty_table(base_root, _v1_payload(), num_buckets=8)
    apply_batches(spark, table, cl)
    cow_root = str(tmp_path / "t_cow")
    shutil.copytree(base_root, cow_root)

    batch = spark.createDataFrame(
        [
            (1_000_000 + i, "U", f"doc_{i:08d}", [1, 2, 3], 3, "web")
            for i in range(0, 4000, 100)  # 40 docs = 1%
        ],
        "event_seq long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )

    def added_bytes(t, **kw):
        before = {f["path"] for f in t.files()}
        apply_batch(spark, t, batch, t.manifest()["last_applied_batch"] + 1,
                    compact=False, **kw)
        return sum(f["bytes"] for f in t.files() if f["path"] not in before)

    mor_b = added_bytes(table, mor="auto")
    cow_b = added_bytes(Miniberg(cow_root), mor=False)
    assert any(f.get("kind") == "delta" for f in table.files()), "auto MOR did not fire"
    assert mor_b < 0.1 * cow_b, (mor_b, cow_b)
    a = _table_state(spark, table).sort_values("doc_id").reset_index(drop=True)
    b = _table_state(spark, Miniberg(cow_root)).sort_values("doc_id").reset_index(drop=True)
    assert a.drop(columns=["tokens"]).equals(b.drop(columns=["tokens"]))
    assert (a.tokens.map(tuple) == b.tokens.map(tuple)).all()


def test_bloom_filter_written_and_reads_exact(spark, tmp_path):
    """bloom_ndv writes a parquet-native bloom on the key column (file grows
    by the bloom bytes); point lookups stay exact. Compaction can add blooms
    too."""
    from recidiviz_data_spark.cdc.apply import apply_batch, create_empty_table
    from recidiviz_data_spark.tables.maintenance import compact

    batch = spark.createDataFrame(
        [(i, "I", f"doc_{i:08d}", [1, 2], 2, "web") for i in range(2000)],
        "event_seq long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )
    t1 = create_empty_table(str(tmp_path / "t_bloom"), _v1_payload(), num_buckets=2)
    t2 = create_empty_table(str(tmp_path / "t_plain"), _v1_payload(), num_buckets=2)
    apply_batch(spark, t1, batch, 0, bloom_ndv=2000)
    apply_batch(spark, t2, batch, 0)
    b1 = sum(f["bytes"] for f in t1.files())
    b2 = sum(f["bytes"] for f in t2.files())
    assert b1 > b2 + 1000, (b1, b2)  # bloom bytes actually landed
    got = t1.read_keys(spark, ["doc_00000042"]).collect()
    assert len(got) == 1 and got[0]["n_tok"] == 2
    assert compact(spark, t2, min_files=1, bloom_ndv=2000) is not None
    b2c = sum(f["bytes"] for f in t2.files())
    assert b2c > b2 + 1000, (b2c, b2)
    assert t2.read_keys(spark, ["doc_00000042"]).count() == 1


def test_span_dedup_planted(spark):
    """Two docs sharing one 8-word run (plus unique tails) are both flagged
    with exactly the shared span's occurrences and coverage; a doc with no
    cross-doc span is absent."""
    from recidiviz_data_spark.operators.dedup import x_span_dedup

    shared = "one two three four five six seven eight nine"  # 9 words: 2 spans
    docs = spark.createDataFrame(
        [
            (1, shared + " aa bb cc"),
            (2, "xx yy " + shared),
            (3, "totally unrelated words that never repeat anywhere else at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in x_span_dedup(spark, "", docs=docs).collect()}
    assert set(rows) == {1, 2}
    # 9-word shared run = 2 sliding 8-word spans, covering 9 word positions
    assert rows[1]["n_dup_spans"] == 2 and rows[1]["dup_words"] == 9
    assert rows[2]["n_dup_spans"] == 2 and rows[2]["dup_words"] == 9


def test_span_scrub_planted(spark):
    """The scrub stage cuts exactly the masked positions: docs sharing a
    9-word run lose those 9 words, unique tails survive, untouched docs
    come back whitespace-normalized with n_removed=0."""
    from recidiviz_data_spark.operators.dedup import x_span_scrub

    shared = "one two three four five six seven eight nine"
    docs = spark.createDataFrame(
        [
            (1, shared + " aa bb cc"),
            (2, "xx yy " + shared),
            (3, "unique  words   with\todd spacing"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in x_span_scrub(spark, "", docs=docs).collect()}
    assert rows[1]["clean_text"] == "aa bb cc" and rows[1]["n_removed"] == 9
    assert rows[2]["clean_text"] == "xx yy" and rows[2]["n_removed"] == 9
    assert rows[3]["clean_text"] == "unique words with odd spacing"
    assert rows[3]["n_removed"] == 0


def test_compact_sized_files_disjoint_key_ranges(spark, tmp_path):
    """compact(max_records_per_file=N, sort=True) splits a bucket into
    size-capped files whose key ranges are DISJOINT — a point lookup then
    opens exactly one file of the bucket."""
    from recidiviz_data_spark.cdc.apply import apply_batch, create_empty_table
    from recidiviz_data_spark.tables.maintenance import compact
    from recidiviz_data_spark.tables.miniberg import Miniberg

    table = create_empty_table(str(tmp_path / "t_sized"), _v1_payload(), num_buckets=2)
    batch = spark.createDataFrame(
        [(i, "I", f"doc_{i:08d}", [1], 1, "web") for i in range(1200)],
        "event_seq long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )
    apply_batch(spark, table, batch, 0)
    assert compact(spark, table, min_files=1, max_records_per_file=200) is not None
    by_bucket: dict[int, list] = {}
    for f in table.files():
        by_bucket.setdefault(f["bucket"], []).append(f)
    for b, fs in by_bucket.items():
        assert len(fs) >= 2, (b, fs)  # the size cap actually split
        ranges = sorted((f["key_min"], f["key_max"]) for f in fs)
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, (b, ranges)  # disjoint
    # point lookup prunes to ONE file of the key's bucket
    key = "doc_00000042"
    m = table.manifest()
    bucket = spark.createDataFrame([(key,)], "doc_id string").selectExpr(
        f"CAST(pmod(xxhash64(doc_id), {m['num_buckets']}) AS INT) b"
    ).collect()[0]["b"]
    kept = Miniberg.files_for_keys(table.files(buckets=[bucket]), [key])
    assert len(kept) == 1
    assert table.read_keys(spark, [key]).count() == 1


def test_band_cap_bounds_identical_signature_flood(spark):
    """A flood of identical docs makes every band bucket quadratic; the
    band cap must bound candidate pairs (dropped bucket => zero pairs from
    it), while an uncapped run explodes to n*(n-1)/2."""
    from recidiviz_data_spark.operators.dedup import d_simhash_banded

    docs = spark.createDataFrame(
        [(i, "same exact words repeated in every single flooded document") for i in range(300)],
        "doc_id long, text string",
    )
    import recidiviz_data_spark.operators.dedup as dd
    import recidiviz_data_spark.operators.relational as rel

    orig = rel.load
    try:
        # route the documents table to the planted corpus
        dd.load = rel.load = lambda spark_, sf_, t: docs
        uncapped = d_simhash_banded(spark, "", band_cap=1 << 30).count()
        capped = d_simhash_banded(spark, "", band_cap=50).count()
    finally:
        dd.load = rel.load = orig
    assert uncapped == 300 * 299 // 2
    assert capped == 0


def test_minhash_band_cap_bounds_flood(spark):
    """100 exact copies (below the shingle DF cap threshold in a 1000-doc
    corpus) share every minhash band; band_cap=50 drops those buckets, the
    default cap keeps them."""
    from recidiviz_data_spark.operators.dedup import d_minhash_lsh

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(100)]
    rows += [(1000 + i, f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(900)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = d_minhash_lsh(spark, "", docs=docs).count()
    capped = d_minhash_lsh(spark, "", docs=docs, band_cap=50).count()
    assert uncapped == 100 * 99 // 2
    assert capped == 0


def test_connected_components_planted_chain(spark):
    """A~B, B~C must land in ONE cluster (transitive closure, not just
    pairs), keeper = min id; disjoint D~E stays separate; long chains
    converge through the pointer-jumping iterations."""
    from recidiviz_data_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(100, 120)],
        "d1 long, d2 long",
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(spark, edges).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    # 21-node chain: all collapse to the min label despite diameter 20
    assert all(got[i] == 100 for i in range(100, 121))


def test_connected_components_matches_union_find(spark):
    """Randomized equivalence: the DataFrame label-propagation result must
    equal a driver-side union-find on seeded random graphs (cycles, stars,
    chains, isolated pairs all arise at these densities)."""
    import random

    from recidiviz_data_spark.operators.dedup import connected_components

    for seed, n, m in ((1, 60, 40), (2, 80, 120), (3, 50, 25)):
        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for e in edges for x in e}
        expected = {x: find(x) for x in nodes}
        # canonical: min node per component
        comp_min: dict[int, int] = {}
        for x, r in expected.items():
            comp_min[r] = min(comp_min.get(r, x), x)
        expected = {x: comp_min[find(x)] for x in nodes}

        df = spark.createDataFrame(edges, "d1 long, d2 long")
        got = {r["node"]: r["cluster_id"] for r in connected_components(spark, df).collect()}
        assert got == expected, (seed, {k: (got.get(k), expected[k]) for k in expected if got.get(k) != expected[k]})


def test_neardup_clusters_planted(spark):
    """End-to-end pair->cluster->keeper on planted near-dup docs: A~B and
    B~C are each similar enough to pair, A and C less so — all three must
    still form one cluster with keeper A."""
    from recidiviz_data_spark.operators.dedup import x_neardup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()
    # 36 unique filler docs so the hot-shingle DF cap (df > nd/10) does not
    # swallow the planted trio's shared shingles (df=3 needs nd >= 30)
    filler = [
        (i, f"filler{i}a filler{i}b filler{i}c filler{i}d filler{i}e")
        for i in range(4, 40)
    ]
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, " ".join(words[:9] + ["mu"])),      # ~A: 8 shared shingles
            (2, " ".join(words[:8] + ["mu", "nu"])),  # ~B more than ~A
            (3, "totally different content with many unrelated words here"),
        ]
        + filler,
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in x_neardup_clusters(spark, "", docs=docs).collect()}
    assert rows[0]["cluster_id"] == rows[1]["cluster_id"] == rows[2]["cluster_id"] == 0
    assert rows[0]["is_keeper"] and not rows[1]["is_keeper"] and not rows[2]["is_keeper"]
    assert rows[3]["cluster_id"] == 3 and rows[3]["is_keeper"]
    assert rows[0]["cluster_size"] == 3 and rows[3]["cluster_size"] == 1
