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
