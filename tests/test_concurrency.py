"""Concurrent-writer safety of the miniberg CAS commit: many threads racing
commits must serialize into a gap-free version chain with no lost updates
(the optimistic-concurrency story Iceberg's HadoopTableOperations gives —
here via os.link create-if-absent)."""

from __future__ import annotations

import threading

from pyspark.sql import types as T

from recidiviz_data_spark.tables.miniberg import CommitConflict, Miniberg

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("_seq", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


def test_racing_commits_serialize_without_lost_updates(tmp_path):
    table = Miniberg.create(str(tmp_path / "t"), SCHEMA, num_buckets=4)
    n_threads, commits_each = 8, 5
    errors: list[Exception] = []

    def writer(tid: int):
        for i in range(commits_each):
            entry = {
                "path": f"data/t{tid}-{i}.parquet",
                "bucket": tid % 4,
                "rows": 1,
                "bytes": 1,
                "schema_id": 0,
            }
            for _ in range(200):  # optimistic retry on CAS conflict
                try:
                    table.commit(added_files=[entry],
                                 expected_parent=table.current_version())
                    break
                except CommitConflict:
                    continue
            else:
                errors.append(RuntimeError(f"writer {tid} starved"))
                return

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    total = n_threads * commits_each
    m = table.manifest()
    # every commit landed exactly once: version count and file-list size both
    # equal the number of commits (no bucket was replaced, only appends)
    assert m["version"] == total
    files = table.files(manifest=m)
    assert len(files) == total
    paths = {f["path"] for f in files}
    assert len(paths) == total  # no lost updates, no duplicates
    # the chain is gap-free and parent-linked
    for v in range(1, total + 1):
        mv = table.manifest(v)
        assert mv["parent"] == v - 1
