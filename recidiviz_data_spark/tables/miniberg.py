"""miniberg — an Iceberg-style snapshot-committed table format over Parquet.

Built from scratch (no Iceberg/Delta jars exist in this environment — SURVEY.md
§0) to provide exactly what the CDC sink needs, mirroring the transactional
commit the reference performs per scrape session
(``persistence/update_historical_snapshots`` commits master+history rows in one
DB transaction — SURVEY.md §3.1):

- **Atomic commit**: a snapshot is one JSON manifest ``meta/v{N}.json``; the
  commit *is* the atomic creation of that file (``os.link`` of a fully-written
  temp file -> fails if the version already exists, i.e. optimistic CAS, the
  same HadoopTableOperations trick Iceberg uses on HDFS).
- **Exactly-once / idempotent replay**: each manifest carries
  ``last_applied_batch``; re-applying a batch <= watermark is a no-op.
- **Time travel**: every ``v{N}.json`` is immutable; read any version.
- **Schema evolution**: field-id'd schema per snapshot; per-file ``schema_id``;
  readers align old files to the current schema (add-column -> null fill,
  int32->int64 / float->double widening -> cast on read).
- **Bucket pruning**: every data file belongs to one ``pmod(xxhash64(doc_id),
  num_buckets)`` bucket recorded in the manifest; MERGE reads only the buckets
  a batch touches (Iceberg partition-pruned copy-on-write, re-expressed).
- **Lineage**: per-commit metrics rows under ``meta/lineage/``.
- **Key-range file skipping**: every file entry records the key column's
  footer min/max (free — the footer is already read at stage time);
  ``read_keys`` prunes a point lookup to the key's hash bucket(s) AND to
  the files whose range can contain it (Iceberg data-skipping re-expressed).

Orphan data files (written but never committed — e.g. a crash between the
staging write and the manifest link) are invisible: the manifest is the sole
source of truth. ``gc_orphans`` removes them (with a grace window so a racing
writer's just-staged files survive until its CAS resolves).

TWO-LEVEL MANIFEST (the Iceberg manifest-list analog): ``v{N}.json`` holds
one summary row per bucket (sidecar path + n_files/rows/bytes) and the file
entries live in content-addressed, immutable per-bucket sidecars under
``meta/fm/<md5>.json``. Consequences at lake scale:

- commit is O(buckets): carried buckets re-reference their existing sidecar
  verbatim (same content -> same hash -> no write); only replaced buckets
  get new sidecars. The driver never parses the full file list to commit.
- read is O(touched buckets): bucket pruning prunes the manifest parse too.
- legacy single-level manifests (a top-level ``files`` list) remain
  readable; the first commit on top of one migrates it to sidecars.

THIRD LEVEL — BUCKET-RANGE MANIFESTS (gated on ``num_buckets >
RANGE_LAYOUT_MIN_BUCKETS``): past ~10^4 buckets the O(buckets) inline
``buckets`` map makes ``v{N}.json`` itself the commit bottleneck (13 MiB /
0.85 s per incremental commit at 10^5 — measured, BENCH/BASELINE.md
"Manifest metadata scale"). Above the gate the root instead holds ~sqrt(B)
entries ``bucket_ranges.ranges[lo] = {path, n_files, rows, bytes,
n_buckets}``, each pointing at an immutable content-addressed RANGE manifest
(``meta/fm/``, same CAS rules as sidecars) holding that range's per-bucket
summaries. A commit touching k buckets rewrites k range manifests + a
KiB-scale root; untouched ranges are carried verbatim (same hash -> zero
writes). Reads resolve bucket -> range -> sidecar with one extra hop.
Below the gate nothing changes — the inline two-level layout stays, and a
``split_buckets`` crossing the gate migrates the layout in that one commit.

LIMITS (documented scale envelope; see maintenance.py for the mitigations):

- **inline v{N}.json is O(buckets)** (~90 bytes/bucket): 10^5 buckets ≈
  13 MiB per snapshot and 0.85 s per incremental commit (measured —
  tools/manifest_scale_bench.py) — which is exactly why the third level
  above kicks in past RANGE_LAYOUT_MIN_BUCKETS. Compaction
  (``compact``, or ``compact='auto'`` in apply) bounds files at
  ~``compact_files_per_bucket`` per bucket, so sidecars stay tiny.
- **num_buckets is chosen at creation**, and a COW rewrite touches whole
  buckets — at 100 TB a 16-bucket table would make every merge rewrite
  multi-TB. ``maintenance.split_buckets`` re-buckets N -> factor*N in one
  atomic commit and is SHUFFLE-FREE (pmod(h, 2N) keeps each row within its
  old bucket's residue class), so the envelope is: create with a sane bucket
  count for the bootstrap size, split as the table grows (each split halves
  per-bucket rewrite cost; run it like compaction, as a ride-along commit).
"""

from __future__ import annotations

import glob
import hashlib
import json
import math
import os
import re
import shutil
import uuid
from time import time as _now

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMAT = "miniberg/1"
# _seq: last-applied event_seq (staleness watermark per row)
# _deleted: tombstone flag — deletes keep the row (payload nulled) so a
#   later-arriving STALE update cannot resurrect the doc; reads filter these.
INTERNAL_COLS = ("_seq", "_deleted")

# third-level gate: tables with more buckets than this store per-bucket
# summaries in bucket-RANGE manifests instead of inline in v{N}.json (see the
# module docstring; tests monkeypatch this to exercise the layout cheaply)
RANGE_LAYOUT_MIN_BUCKETS = 10_000

# read_keys: largest key list rendered as an `isin` literal (parquet In
# pushdown); bigger lists switch to a broadcast semi-join (a 10^5-literal In
# bloats the plan/task binaries faster than it helps the scan)
READ_KEYS_ISIN_MAX = 1_000
_BRANCH_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")

# type-widening lattice (Iceberg's promotion rules subset)
_WIDEN = {
    ("integer", "long"): True,
    ("float", "double"): True,
    ("integer", "double"): True,
}


class CommitConflict(Exception):
    """Another writer committed this version first (CAS failure)."""


def keys_from_entries(entries: list[dict]) -> dict[int, int]:
    """bucket -> summed file row counts — the exact logical key-count stamp
    for writers whose output holds ONE row per key by construction (bulk
    bootstrap, compaction, bucket split). Pass the result as ``commit``'s
    ``bucket_keys``. NOT valid for merge-on-read delta writes (delta rows
    supersede base rows rather than adding to them)."""
    out: dict[int, int] = {}
    for e in entries:
        out[e["bucket"]] = out.get(e["bucket"], 0) + e.get("rows", 0)
    return out


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df onto schema: missing column -> null, narrower physical type
    -> widen-cast. THE single alignment rule — shared by the snapshot reader
    and the merge writer so evolution semantics cannot drift apart."""
    cols = [
        (
            F.col(f.name).cast(f.dataType)
            if f.name in df.columns
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in schema.fields
    ]
    return df.select(cols)


class Miniberg:
    def __init__(self, root: str, *, branch: str | None = None):
        """``branch`` opens the table AT A BRANCH: an isolated manifest chain
        under ``meta/branches/<name>/`` that shares the table's immutable
        data files and content-addressed sidecars (``meta/fm/``) with main.
        Every DATA operation on a branch handle — read, time travel, commit
        with CAS + rebase, compact, apply — works unchanged, scoped to the
        branch's chain; main never observes branch commits until
        ``publish_branch``. Lineage rows written on a branch live under the
        branch too (they merge into main's at publish). The exceptions are
        the shared-storage maintenance ops — ``gc_orphans`` and
        ``expire_snapshots`` — which must run from the MAIN handle (they
        raise on a branch handle: a branch's chain alone does not pin
        main's or sibling branches' files in the shared data/ and fm/
        dirs, so collecting from it would delete live data)."""
        self.root = root
        self.branch = branch
        base_meta = os.path.join(root, "meta")
        self.meta_dir = (
            base_meta if branch is None
            else os.path.join(base_meta, "branches", branch)
        )
        self.data_dir = os.path.join(root, "data")
        self.lineage_dir = os.path.join(self.meta_dir, "lineage")
        self.fm_dir = os.path.join(base_meta, "fm")

    # ------------------------------------------------------------- creation
    @classmethod
    def create(
        cls,
        root: str,
        schema: T.StructType,
        *,
        num_buckets: int = 16,
        key_col: str = "doc_id",
        props: dict | None = None,
    ) -> "Miniberg":
        t = cls(root)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.lineage_dir, exist_ok=True)
        os.makedirs(t.fm_dir, exist_ok=True)
        fields = [
            {"id": i + 1, "name": f.name, "type": f.dataType.jsonValue(), "nullable": f.nullable}
            for i, f in enumerate(schema.fields)
        ]
        manifest = {
            "format": FORMAT,
            "table_uuid": str(uuid.uuid4()),
            "version": 0,
            "parent": None,
            "schema_id": 0,
            "schemas": {"0": {"fields": fields}},
            "num_buckets": num_buckets,
            "key_col": key_col,
            "bucket_expr": f"pmod(xxhash64({key_col}), {num_buckets})",
            "last_applied_batch": -1,
            "props": props or {},
        }
        if num_buckets > RANGE_LAYOUT_MIN_BUCKETS:
            # third level: root holds bucket-RANGE manifest refs, not buckets
            manifest["bucket_ranges"] = {"size": cls._range_size(num_buckets),
                                         "ranges": {}}
        else:
            manifest["buckets"] = {}  # two-level: bucket -> sidecar summary
        t._write_manifest(0, manifest)
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return bool(glob.glob(os.path.join(root, "meta", "v*.json")))

    # ------------------------------------------------------------- manifests
    def _vpath(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version:06d}.json")

    def current_version(self) -> int:
        versions = [
            int(os.path.basename(p)[1:-5]) for p in glob.glob(os.path.join(self.meta_dir, "v*.json"))
        ]
        if not versions:
            raise FileNotFoundError(f"no miniberg table at {self.root}")
        return max(versions)

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(self._vpath(v)) as f:
            return json.load(f)

    def versions(self) -> list[int]:
        """Existing (non-expired) snapshot versions, ascending."""
        return sorted(
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self.meta_dir, "v*.json"))
        )

    def snapshots(self) -> list[dict]:
        return [self.manifest(v) for v in self.versions()]

    def history(self) -> list[dict]:
        """The snapshot log (Iceberg history/snapshots-table analog): one row
        per surviving manifest, ascending — version, parent, commit wall
        time, watermark, schema, bucket function, props. O(versions) root
        reads, never touches sidecars; expired versions are simply absent
        (their rows live only in backups/time-travel no longer possible)."""
        out = []
        for v in self.versions():
            m = self.manifest(v)
            out.append({
                "version": m["version"],
                "parent": m.get("parent"),
                "committed_at": m.get("committed_at"),
                "last_applied_batch": m.get("last_applied_batch"),
                "schema_id": m.get("schema_id"),
                "num_buckets": m.get("num_buckets"),
                "props": m.get("props", {}),
            })
        return out

    def _write_manifest(self, version: int, manifest: dict) -> None:
        """Atomic CAS: link a fully-written temp file to the version path.
        Every manifest gets a ``committed_at`` wall-clock stamp here — the
        single write chokepoint (create/commit/rollback/branch/publish all
        pass through), feeding ``history()`` and age-based expiry."""
        manifest = {**manifest, "committed_at": round(_now(), 3)}
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._vpath(version))
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed") from e
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------- two-level files
    @staticmethod
    def _sidecar_payload(entries: list[dict]) -> str:
        return json.dumps(sorted(entries, key=lambda e: e["path"]), sort_keys=True)

    def _write_sidecar(self, entries: list[dict]) -> str:
        """Write one bucket's file-entry list as a content-addressed sidecar
        (``meta/fm/<md5>.json``). Immutable + idempotent: an unchanged bucket
        re-derives the same hash, so carrying it across snapshots writes
        nothing; two racing writers of the same content are both correct."""
        return self._write_blob(self._sidecar_payload(entries))

    def _write_blob(self, payload: str) -> str:
        """Content-addressed immutable JSON blob under ``meta/fm/`` — THE
        single write rule shared by bucket sidecars and bucket-range
        manifests (same hashing, CAS, and GC-grace-refresh semantics)."""
        os.makedirs(self.fm_dir, exist_ok=True)
        h = hashlib.md5(payload.encode()).hexdigest()
        rel = os.path.join("meta", "fm", f"{h}.json")
        dest = os.path.join(self.root, rel)
        if not os.path.exists(dest):
            tmp = dest + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, dest)
            except FileExistsError:
                pass  # same content-addressed blob already exists
            finally:
                os.unlink(tmp)
        else:
            # refresh mtime: reusing an existing (possibly orphaned) blob
            # must restart its GC grace window, or a concurrent gc_orphans
            # could unlink it between this write and our manifest CAS
            try:
                os.utime(dest)
            except OSError:
                pass  # racing GC removed it — recreate
            if not os.path.exists(dest):
                return self._write_blob(payload)
        return rel

    # ---------------------------------------------- third-level range layout
    @staticmethod
    def _range_size(num_buckets: int) -> int:
        """Buckets per range manifest: ~sqrt(B) balances root size against
        per-commit range rewrites (10^5 buckets -> 316-entry root)."""
        return max(1, math.isqrt(num_buckets))

    @staticmethod
    def _range_lo(bucket: int, size: int) -> str:
        return str((bucket // size) * size)

    def _load_range(self, rel_path: str) -> dict[str, dict]:
        """A range manifest's {bucket_str: summary-with-path} map."""
        with open(os.path.join(self.root, rel_path)) as f:
            return json.load(f)

    def _bucket_map(self, m: dict) -> dict[str, dict]:
        """Full {bucket_str: summary-with-path} map regardless of layout —
        O(buckets); pruned access goes through files()/_iter_bucket_summaries."""
        if "bucket_ranges" in m:
            out: dict[str, dict] = {}
            for rs in m["bucket_ranges"]["ranges"].values():
                out.update(self._load_range(rs["path"]))
            return out
        return dict(m.get("buckets", {}))

    def _iter_bucket_summaries(self, m: dict, buckets: list[int] | None = None):
        """(bucket_str, summary) pairs, loading ONLY the requested buckets'
        range manifests under the third-level layout (the read-side hop:
        bucket -> range -> sidecar)."""
        if "bucket_ranges" in m:
            size = m["bucket_ranges"]["size"]
            ranges = m["bucket_ranges"]["ranges"]
            if buckets is None:
                for lo in sorted(ranges, key=int):
                    yield from sorted(
                        self._load_range(ranges[lo]["path"]).items(),
                        key=lambda kv: int(kv[0]),
                    )
                return
            want = {str(b) for b in buckets}
            for lo in sorted({self._range_lo(int(b), size) for b in want}, key=int):
                rs = ranges.get(lo)
                if rs is None:
                    continue
                rm = self._load_range(rs["path"])
                for bk in sorted(want, key=int):
                    if bk in rm and self._range_lo(int(bk), size) == lo:
                        yield bk, rm[bk]
            return
        bset = None if buckets is None else {str(b) for b in buckets}
        for bk, s in m.get("buckets", {}).items():
            if bset is None or bk in bset:
                yield bk, s

    def _load_sidecar(self, rel_path: str) -> list[dict]:
        with open(os.path.join(self.root, rel_path)) as f:
            return json.load(f)

    def bucket_summaries(self_or_m, m: dict | None = None) -> dict[int, dict]:
        """Per-bucket {n_files, rows, bytes[, path]} — never touches
        sidecars. Callable both ways: ``table.bucket_summaries(m)`` (works
        for every layout, including the third-level range layout, which
        needs filesystem access to load range manifests) and the legacy
        static form ``Miniberg.bucket_summaries(m)`` (inline layouts only).
        Legacy single-level manifests are summarized from their inline file
        list."""
        table = self_or_m if isinstance(self_or_m, Miniberg) else None
        if m is None:
            m = table.manifest() if table is not None else self_or_m
        if "bucket_ranges" in m:
            if table is None:
                raise ValueError(
                    "range-layout manifest: call table.bucket_summaries(m) "
                    "(loading range manifests needs the table root)"
                )
            return {int(bk): dict(s) for bk, s in table._bucket_map(m).items()}
        if "buckets" in m:
            return {int(bk): dict(s) for bk, s in m["buckets"].items()}
        out: dict[int, dict] = {}
        for f in m.get("files", []):
            s = out.setdefault(f["bucket"], {"n_files": 0, "rows": 0, "bytes": 0})
            s["n_files"] += 1
            s["rows"] += f.get("rows", 0)
            s["bytes"] += f.get("bytes", 0)
        return out

    def files(
        self, version: int | None = None, *, buckets: list[int] | None = None,
        manifest: dict | None = None,
    ) -> list[dict]:
        """File entries for a snapshot, loading ONLY the sidecars (and, on
        the range layout, range manifests) of the requested buckets — bucket
        pruning prunes the manifest parse too."""
        m = manifest if manifest is not None else self.manifest(version)
        if "buckets" not in m and "bucket_ranges" not in m:  # legacy layout
            fs = m.get("files", [])
            if buckets is None:
                return list(fs)
            bset = set(buckets)
            return [f for f in fs if f["bucket"] in bset]
        out: list[dict] = []
        for _bk, s in self._iter_bucket_summaries(m, buckets):
            out.extend(self._load_sidecar(s["path"]))
        return out

    def _bucket_entries_migrated(
        self, m: dict, exclude: set[int], record: dict | None = None
    ) -> dict[str, dict]:
        """Parent manifest's buckets OUTSIDE ``exclude`` as {bucket_str:
        summary-with-path}. A legacy parent is migrated here: its inline list
        is grouped per bucket and written out as sidecars ONCE (the first
        commit on top of a single-level manifest upgrades the layout);
        excluded (replaced) buckets are never written — their sidecar would
        be dead on arrival. ``record`` collects {rel: payload} of every blob
        written, for the post-CAS GC-race re-check."""
        if "buckets" in m or "bucket_ranges" in m:
            return {
                bk: s
                for bk, s in self._bucket_map(m).items()
                if int(bk) not in exclude
            }
        grouped: dict[str, list[dict]] = {}
        for f in m.get("files", []):
            if f["bucket"] in exclude:
                continue
            grouped.setdefault(str(f["bucket"]), []).append(f)
        out: dict[str, dict] = {}
        for bk, entries in grouped.items():
            out[bk] = self._bucket_summary(entries, record)
        return out

    def _bucket_summary(
        self, entries: list[dict], record: dict | None, keys: int | None = None
    ) -> dict:
        """Write one bucket's sidecar + return its summary row — THE single
        add/merge rule shared by the inline and range commit paths. ``keys``
        stamps the bucket's exact logical key count when the writer knows it
        (see ``commit``)."""
        payload = self._sidecar_payload(entries)
        rel = self._write_blob(payload)
        if record is not None:
            record[rel] = payload
        out = {
            "path": rel,
            "n_files": len(entries),
            "rows": sum(e.get("rows", 0) for e in entries),
            "bytes": sum(e.get("bytes", 0) for e in entries),
        }
        if keys is not None:
            out["keys"] = keys
        return out

    # ------------------------------------------------------------- schema
    def spark_schema(self, version: int | None = None, *, include_internal: bool = True) -> T.StructType:
        m = self.manifest(version)
        return self._schema_struct(m, m["schema_id"], include_internal=include_internal)

    @staticmethod
    def _schema_struct(m: dict, schema_id: int, *, include_internal: bool = True) -> T.StructType:
        fields = m["schemas"][str(schema_id)]["fields"]
        return T.StructType(
            [
                T.StructField(f["name"], _type_from_json(f["type"]), f["nullable"])
                for f in fields
                if include_internal or f["name"] not in INTERNAL_COLS
            ]
        )

    def evolve_schema(self, new_schema: T.StructType) -> tuple[dict, bool]:
        """Merge new_schema into the current one (adds + widens). Returns
        (fields-json, changed). Drops/renames are rejected — same rules the
        reference implicitly follows (columns only ever added / widened,
        SURVEY.md §1.1(2))."""
        m = self.manifest()
        cur = {f["name"]: dict(f) for f in m["schemas"][str(m["schema_id"])]["fields"]}
        next_id = max(f["id"] for f in cur.values()) + 1 if cur else 1
        changed = False
        for f in new_schema.fields:
            j = f.dataType.jsonValue()
            if f.name not in cur:
                cur[f.name] = {"id": next_id, "name": f.name, "type": j, "nullable": True}
                next_id += 1
                changed = True
            else:
                old = cur[f.name]["type"]
                if old != j:
                    if _WIDEN.get((old, j)):
                        cur[f.name]["type"] = j
                        changed = True
                    elif _WIDEN.get((j, old)):
                        pass  # incoming is narrower; current schema already covers it
                    else:
                        raise ValueError(f"incompatible type change for {f.name}: {old} -> {j}")
        ordered = sorted(cur.values(), key=lambda x: x["id"])
        return {"fields": ordered}, changed

    # ------------------------------------------------------------- read path
    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        *,
        buckets: list[int] | None = None,
        include_internal: bool = False,
        stats_filter: dict | None = None,
    ) -> DataFrame:
        """Read a snapshot, aligning every file group to the snapshot schema
        (null-fill added columns, widen-cast old physical types). Default
        reads hide internal columns AND filter tombstone rows.

        ``stats_filter`` = {column: (lo, hi)} (inclusive; None = unbounded):
        files whose recorded footer min/max prove no row can match are
        skipped (secondary-column data skipping — the Iceberg per-file
        column-stats prune), and the exact residual filter is applied to the
        surviving rows. At lake scale a ``ts``-range or ``source`` predicate
        then opens only the files that can match instead of the bucket's
        whole history. The residual filter runs BEFORE internal columns are
        dropped, so a stats_filter on ``_seq`` (which IS recorded in the
        per-file stats) works under the default include_internal=False."""
        m = self.manifest(version)
        files = self.files(buckets=buckets, manifest=m)
        if stats_filter:
            files = self.files_for_stats(files, stats_filter)
        out = self._read_files(spark, m, files, include_internal=True)
        if stats_filter:
            out = _residual_filter(out, stats_filter)
        return out if include_internal else self._public_view(m, out)

    @staticmethod
    def files_for_stats(files: list[dict], stats_filter: dict) -> list[dict]:
        """Drop files whose recorded per-column min/max exclude every value
        in the requested ranges. Conservative on every uncertainty: missing
        stats, type-mismatched bounds, and — crucially — any bucket that has
        DELTA files keeps ALL its files (pruning a base file there could
        resurrect a superseded row, since merge-on-read resolution needs the
        base row present to anti-join it away)."""
        delta_buckets = {f["bucket"] for f in files if f.get("kind") == "delta"}

        def keep(f: dict) -> bool:
            if f["bucket"] in delta_buckets:
                return True
            for col, (lo, hi) in stats_filter.items():
                s = f.get("stats", {}).get(col)
                if not s:
                    continue
                smin, smax = s
                if lo is not None and isinstance(lo, str) == isinstance(smax, str):
                    if smax < lo:
                        return False
                if hi is not None and isinstance(hi, str) == isinstance(smin, str):
                    if smin > hi:
                        return False
            return True

        return [f for f in files if keep(f)]

    def _union_aligned(
        self, spark: SparkSession, m: dict, files: list[dict], full: T.StructType
    ) -> DataFrame:
        """Union the given file entries, aligning each schema-id group onto
        ``full`` (null-fill added columns, widen-cast old physical types)."""
        if not files:
            return spark.createDataFrame([], full)
        by_schema: dict[int, list[str]] = {}
        for f in files:
            by_schema.setdefault(f["schema_id"], []).append(os.path.join(self.root, f["path"]))
        parts: list[DataFrame] = []
        for sid, paths in by_schema.items():
            file_schema = self._schema_struct(m, sid, include_internal=True)
            df = spark.read.schema(file_schema).parquet(*paths)
            parts.append(align_to_schema(df, full))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _read_files(
        self, spark: SparkSession, m: dict, files: list[dict], *, include_internal: bool
    ) -> DataFrame:
        """Merge-on-read resolution: ``kind == "delta"`` entries hold upsert/
        tombstone rows written WITHOUT rewriting their bucket's base files
        (Iceberg v2 delete-file analog, upsert-flavored). A key's newest delta
        row (max ``_seq`` — the apply path's stale filter guarantees deltas
        strictly supersede base and each other) wins over any base row via a
        LEFT ANTI join on the delta key set; at lake scale the delta side is
        the small dribble batch, so AQE broadcasts it and base rows stream
        through unshuffled. Buckets with no deltas read exactly as before
        (compaction folds deltas back into base files)."""
        full = self._schema_struct(m, m["schema_id"], include_internal=True)
        user = self._schema_struct(m, m["schema_id"], include_internal=False)
        if not files:
            return spark.createDataFrame([], full if include_internal else user)
        base = [f for f in files if f.get("kind") != "delta"]
        deltas = [f for f in files if f.get("kind") == "delta"]
        out = self._union_aligned(spark, m, base, full)
        if deltas:
            key = m.get("key_col", "doc_id")
            d = self._union_aligned(spark, m, deltas, full)
            others = [f.name for f in full.fields if f.name not in (key, "_seq")]
            latest = (
                d.groupBy(key)
                .agg(F.max(F.struct(F.col("_seq"), *[F.col(c) for c in others])).alias("_w"))
                .select(key, "_w.*")
                .select([f.name for f in full.fields])
            )
            out = out.join(latest.select(key), key, "left_anti").unionByName(latest)
        if include_internal:
            return out
        return self._public_view(m, out)

    def _public_view(self, m: dict, out: DataFrame) -> DataFrame:
        """Internal-resolved rows -> the user-facing view: drop tombstones,
        project away internal columns. THE single drop rule (read /
        read_keys / _read_files share it so residual stats filters can run
        on internal columns first)."""
        user = self._schema_struct(m, m["schema_id"], include_internal=False)
        if "_deleted" in out.columns:
            out = out.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        return out.select([f.name for f in user.fields])

    # --------------------------------------------------- point-lookup path
    @staticmethod
    def files_for_keys(files: list[dict], keys: list) -> list[dict]:
        """Data skipping: drop files whose footer key-range (recorded at
        write time in the manifest entry) cannot contain ANY of the keys.
        Files without recorded stats are conservatively kept. A key whose
        Python type does not match the recorded stat type (str key on an int
        key column or vice versa) raises a clear error instead of a
        TypeError mid-comparison. Keys are sorted once and each file's range
        is tested by bisection — O(F log K), so a mega-batch key list does
        not turn metadata pruning into an F×K scan."""
        import bisect

        if keys and any(isinstance(k, str) != isinstance(keys[0], str) for k in keys):
            raise ValueError("read_keys requires keys of one type (str or numeric)")
        skeys = sorted(keys)

        def may_contain(f: dict) -> bool:
            if "key_min" not in f:
                return True
            kmin = f["key_min"]
            if skeys and isinstance(skeys[0], str) != isinstance(kmin, str):
                raise ValueError(
                    f"key {skeys[0]!r} ({type(skeys[0]).__name__}) does not "
                    f"match the key column's recorded stats type "
                    f"({type(kmin).__name__})"
                )
            i = bisect.bisect_left(skeys, kmin)  # first key >= key_min
            return i < len(skeys) and skeys[i] <= f["key_max"]

        return [f for f in files if may_contain(f)]

    def read_keys(
        self,
        spark: SparkSession,
        keys: list,
        version: int | None = None,
        *,
        include_internal: bool = False,
        stats_filter: dict | None = None,
    ) -> DataFrame:
        """Point/multi-key lookup with two-stage FILE skipping: hash the
        keys to their buckets (reads only those buckets' sidecars), then
        drop files whose key-range stats exclude every key, then filter
        exactly. At lake scale a point lookup touches one bucket's sidecar
        and, on a batch-appended table, only the files whose key range
        covers the key — not the bucket's whole history.

        The exact filter adapts to the list size: up to
        ``READ_KEYS_ISIN_MAX`` keys it is an ``isin`` literal (pushed into
        the parquet scan as an In filter); past it, a broadcast LEFT SEMI
        join against the key DataFrame — an isin with 10^5+ literals bloats
        the plan and the task binary, while the semi-join ships one hashed
        build side (file skipping has already pruned the scan either way)."""
        if not keys:
            raise ValueError("read_keys requires at least one key")
        m = self.manifest(version)
        key_col = m["key_col"]
        key_field = [
            f for f in self._schema_struct(m, m["schema_id"]).fields if f.name == key_col
        ][0]
        kdf = spark.createDataFrame([(k,) for k in keys], T.StructType([key_field]))
        buckets = sorted(
            r[0]
            for r in kdf.select(
                F.pmod(F.xxhash64(key_col), F.lit(m["num_buckets"])).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )
        files = self.files_for_keys(self.files(buckets=buckets, manifest=m), keys)
        if stats_filter:
            # secondary-predicate pruning composes with key skipping (the
            # delta-bucket conservatism in files_for_stats still applies)
            files = self.files_for_stats(files, stats_filter)
        out = self._read_files(spark, m, files, include_internal=True)
        if len(keys) <= READ_KEYS_ISIN_MAX:
            out = out.filter(F.col(key_col).isin(keys))
        else:
            out = out.join(F.broadcast(kdf.distinct()), key_col, "left_semi")
        if stats_filter:
            out = _residual_filter(out, stats_filter)
        return out if include_internal else self._public_view(m, out)

    def data_files(self, version: int | None = None, buckets: list[int] | None = None) -> list[str]:
        fs = self.files(version, buckets=buckets)
        return [os.path.join(self.root, f["path"]) for f in fs]

    # ------------------------------------------------------------- write path
    def staging_dir(self) -> str:
        os.makedirs(os.path.join(self.root, "tmp"), exist_ok=True)
        return os.path.join(self.root, "tmp", f"stage-{uuid.uuid4().hex}")

    def collect_staged_files(self, staging_dir: str, schema_id: int) -> list[dict]:
        """Move ``staging/_bucket=N/part-*.parquet`` into data/, return file
        entries (bucket parsed from the partition dir, rows + key-range
        stats from the footer already being read — no extra I/O)."""
        m = self.manifest()
        key_col = m.get("key_col", "doc_id")
        entries = []
        for path in sorted(glob.glob(os.path.join(staging_dir, "_bucket=*", "*.parquet"))):
            bucket = int(os.path.basename(os.path.dirname(path)).split("=")[1])
            meta = pq.ParquetFile(path).metadata
            name = f"{uuid.uuid4().hex}-b{bucket:05d}.parquet"
            dest_rel = os.path.join("data", name)
            os.rename(path, os.path.join(self.root, dest_rel))
            entry = {
                "path": dest_rel,
                "bucket": bucket,
                "rows": meta.num_rows,
                "bytes": os.path.getsize(os.path.join(self.root, dest_rel)),
                "schema_id": schema_id,
            }
            ranges = _footer_col_ranges(meta)
            if key_col in ranges:
                entry["key_min"], entry["key_max"] = ranges[key_col]
            # per-column stats: min/max for every scalar str/int leaf
            # (source, n_tok, _seq, and the key again for uniform access) —
            # free, the footer is already parsed; read(stats_filter=...)
            # prunes files on them
            if ranges:
                entry["stats"] = {c: list(r) for c, r in ranges.items()}
            entries.append(entry)
        shutil.rmtree(staging_dir, ignore_errors=True)
        return entries

    def commit(
        self,
        *,
        added_files: list[dict],
        replaced_buckets: set[int] | None = None,
        schema_fields: dict | None = None,
        last_applied_batch: int | None = None,
        lineage_rows: list[dict] | None = None,
        expected_parent: int | None = None,
        props: dict | None = None,
        props_fn=None,
        num_buckets: int | None = None,
        rebase_retries: int = 3,
        bucket_keys: dict[int, int] | None = None,
    ) -> int:
        """Create snapshot N+1: carry over buckets outside
        ``replaced_buckets`` (their sidecars are re-referenced verbatim — an
        O(buckets) commit that never parses the full file list), add
        ``added_files`` as fresh per-bucket sidecars. Atomic; raises
        CommitConflict if raced.

        DISJOINT-BUCKET REBASE (Iceberg's optimistic-concurrency retry): when
        a racing writer wins the CAS but touched only buckets disjoint from
        ours — and neither schema, bucket count, nor the batch watermark
        conflicts — the commit automatically re-reads the new parent and
        retries (up to ``rebase_retries``), so partitioned writers ingesting
        disjoint key ranges never replay their whole apply. Any overlap or
        watermark/schema movement still raises, because the caller's
        decisions were computed against state that actually changed.
        Callers that need STRICT CAS (no rebase even for disjoint buckets)
        pass ``rebase_retries=0``.

        ``props_fn(version) -> dict`` computes props from the version this
        commit ACTUALLY lands at — use it for version-stamped props (e.g.
        ``last_compaction_version``) that a rebase would otherwise make
        stale. Merged on top of ``props``.

        ``num_buckets`` re-declares the table's bucket function atomically with
        this commit (bucket-split maintenance): EVERY pre-existing bucket must
        be in ``replaced_buckets`` — a manifest may never mix bucket functions.

        ``bucket_keys[bucket] = n`` stamps the bucket's summary with its exact
        LOGICAL key count (distinct doc_ids incl. tombstones) — not derivable
        from file entries once merge-on-read deltas add new keys, so writers
        that know it (apply: keys_before + brand-new winners; compact/split:
        one row per key by construction) pass it through. Untouched buckets
        carry their stamp verbatim; a bucket rewritten WITHOUT a stamp loses
        it (readers fall back to base-file rows, the pre-stamp behavior)."""
        parent_v = self.current_version() if expected_parent is None else expected_parent
        our_buckets = set(replaced_buckets or set()) | {f["bucket"] for f in added_files}
        for _ in range(max(rebase_retries, 0) + 1):
            try:
                return self._commit_once(
                    parent_v,
                    added_files=added_files,
                    replaced_buckets=replaced_buckets,
                    schema_fields=schema_fields,
                    last_applied_batch=last_applied_batch,
                    lineage_rows=lineage_rows,
                    props=props,
                    props_fn=props_fn,
                    num_buckets=num_buckets,
                    bucket_keys=bucket_keys,
                )
            except CommitConflict:
                new_parent = self._rebase_parent(
                    parent_v, our_buckets, last_applied_batch, num_buckets
                )
                if new_parent is None:
                    raise
                parent_v = new_parent
        raise CommitConflict(f"could not commit after {rebase_retries} rebases")

    def _rebase_parent(
        self,
        parent_v: int,
        our_buckets: set[int],
        last_applied_batch: int | None,
        num_buckets: int | None,
    ) -> int | None:
        """The rebase admissibility check: None = the conflict is real
        (overlapping buckets / schema or bucket-function change / watermark
        already advanced past ours), else the new parent version to retry
        against. O(buckets) — compares the two manifests' summary maps."""
        try:
            cur_v = self.current_version()
        except FileNotFoundError:
            return None
        if cur_v <= parent_v:
            return None  # not a parent race (e.g. a watermark conflict)
        old_m, cur_m = self.manifest(parent_v), self.manifest(cur_v)
        if (
            cur_m["schema_id"] != old_m["schema_id"]
            or cur_m["num_buckets"] != old_m["num_buckets"]
            or num_buckets is not None
        ):
            return None
        if (
            last_applied_batch is not None
            and cur_m["last_applied_batch"] >= last_applied_batch
        ):
            return None
        if ("bucket_ranges" in old_m) != ("bucket_ranges" in cur_m):
            return None  # layout migrated mid-race — replay
        if "bucket_ranges" in old_m:
            obr, cbr = old_m["bucket_ranges"], cur_m["bucket_ranges"]
            if obr["size"] != cbr["size"]:
                return None
            # O(ranges) root diff; only DIFFERING ranges load their manifests
            touched: set[int] = set()
            for lo in set(obr["ranges"]) | set(cbr["ranges"]):
                op = obr["ranges"].get(lo, {}).get("path")
                cp = cbr["ranges"].get(lo, {}).get("path")
                if op == cp:
                    continue
                om = self._load_range(op) if op else {}
                cm = self._load_range(cp) if cp else {}
                touched |= {
                    int(bk)
                    for bk in set(om) | set(cm)
                    if om.get(bk, {}).get("path") != cm.get(bk, {}).get("path")
                }
            if touched & our_buckets:
                return None
            return cur_v
        ob = old_m.get("buckets", {})
        cb = cur_m.get("buckets", {})
        if "buckets" not in old_m or "buckets" not in cur_m:
            return None  # legacy layout: no cheap per-bucket diff — replay
        touched = {
            int(bk)
            for bk in set(ob) | set(cb)
            if ob.get(bk, {}).get("path") != cb.get(bk, {}).get("path")
        }
        if touched & our_buckets:
            return None
        return cur_v

    def _commit_once(
        self,
        parent_v: int,
        *,
        added_files: list[dict],
        replaced_buckets: set[int] | None,
        schema_fields: dict | None,
        last_applied_batch: int | None,
        lineage_rows: list[dict] | None,
        props: dict | None,
        num_buckets: int | None,
        props_fn=None,
        bucket_keys: dict[int, int] | None = None,
    ) -> int:
        if self.current_version() != parent_v:
            raise CommitConflict(f"parent moved: != {parent_v}")
        m = self.manifest(parent_v)
        new = dict(m)
        new["version"] = parent_v + 1
        new["parent"] = parent_v
        replaced = replaced_buckets or set()
        written_blobs: dict[str, str] = {}
        added_by_bucket: dict[str, list[dict]] = {}
        for f in added_files:
            added_by_bucket.setdefault(str(f["bucket"]), []).append(f)
        target_buckets = num_buckets if num_buckets is not None else m["num_buckets"]
        if num_buckets is not None and num_buckets != m["num_buckets"]:
            # a manifest may never mix bucket functions: EVERY pre-existing
            # bucket must be replaced in the same commit
            leftover = [
                bk for bk, _s in self._iter_bucket_summaries(m)
                if int(bk) not in replaced
            ]
            if leftover:
                raise CommitConflict(
                    "num_buckets change requires replacing every existing "
                    f"bucket in the same commit ({len(leftover)} buckets carried)"
                )
        keys = {str(b): k for b, k in (bucket_keys or {}).items()}
        if target_buckets > RANGE_LAYOUT_MIN_BUCKETS:
            new["bucket_ranges"] = self._commit_ranges(
                m, replaced, added_by_bucket, written_blobs, target_buckets, keys
            )
            new.pop("buckets", None)
        else:
            carried = self._bucket_entries_migrated(m, exclude=replaced, record=written_blobs)
            new_buckets = dict(carried)
            for bk, entries in added_by_bucket.items():
                if bk in new_buckets:  # append into a carried bucket (delta path)
                    entries = self._load_sidecar(new_buckets[bk]["path"]) + entries
                new_buckets[bk] = self._bucket_summary(entries, written_blobs, keys.get(bk))
            new["buckets"] = new_buckets
            new.pop("bucket_ranges", None)
        new.pop("files", None)  # layout migration: inline list never carried
        if schema_fields is not None:
            old_fields = m["schemas"][str(m["schema_id"])]["fields"]
            if schema_fields["fields"] != old_fields:
                # max(ids)+1, NOT schema_id+1: after a rollback the current
                # schema_id can be lower than ids already allocated, and a
                # historical id must never be redefined (files reference it)
                new_sid = max(int(k) for k in m["schemas"]) + 1
                new["schemas"] = dict(m["schemas"])
                new["schemas"][str(new_sid)] = schema_fields
                new["schema_id"] = new_sid
        if last_applied_batch is not None:
            if last_applied_batch <= m["last_applied_batch"]:
                raise CommitConflict(
                    f"batch {last_applied_batch} already applied "
                    f"(watermark={m['last_applied_batch']})"
                )
            new["last_applied_batch"] = last_applied_batch
        if props or props_fn:
            late = props_fn(new["version"]) if props_fn else {}
            new["props"] = {**m.get("props", {}), **(props or {}), **late}
        if num_buckets is not None and num_buckets != m["num_buckets"]:
            new["num_buckets"] = num_buckets
            new["bucket_expr"] = f"pmod(xxhash64({m['key_col']}), {num_buckets})"
        self._write_manifest(new["version"], new)
        # close the blob-reuse/GC race: a concurrent gc_orphans that read
        # a stale mtime just before _write_blob's utime refresh can unlink
        # a REUSED (previously orphaned) sidecar/range manifest before this
        # CAS landed. Re-check now that the manifest is durable and recreate
        # from the in-memory payloads (content-addressed -> same path).
        # Carried blobs are pinned by the parent manifest, so GC never eats
        # them.
        for rel, payload in written_blobs.items():
            if not os.path.exists(os.path.join(self.root, rel)):
                self._write_blob(payload)
        if lineage_rows:
            lid = last_applied_batch if last_applied_batch is not None else new["version"]
            with open(os.path.join(self.lineage_dir, f"batch-{lid}.json"), "w") as f:
                json.dump(lineage_rows, f, indent=1)
        return new["version"]

    def _commit_ranges(
        self,
        m: dict,
        replaced: set[int],
        added_by_bucket: dict[str, list[dict]],
        written_blobs: dict[str, str],
        target_buckets: int,
        keys: dict[str, int] | None = None,
    ) -> dict:
        """Build the new ``bucket_ranges`` block: a same-size parent carries
        untouched range manifests verbatim (content-addressed — zero writes;
        the commit round-trips a ~sqrt(B)-entry root plus only the touched
        ranges) and rewrites only ranges containing replaced/added buckets.
        A layout migration (inline/legacy parent crossing the gate, or a
        bucket-function change) rebuilds the range set from the full map
        once."""
        size = self._range_size(target_buckets)
        same = (
            "bucket_ranges" in m
            and m["bucket_ranges"]["size"] == size
            and target_buckets == m["num_buckets"]
        )

        def _range_summary(rmap: dict[str, dict]) -> dict:
            payload = json.dumps(rmap, sort_keys=True)
            rel = self._write_blob(payload)
            written_blobs[rel] = payload
            return {
                "path": rel,
                "n_buckets": len(rmap),
                "n_files": sum(s["n_files"] for s in rmap.values()),
                "rows": sum(s.get("rows", 0) for s in rmap.values()),
                "bytes": sum(s.get("bytes", 0) for s in rmap.values()),
            }

        if same:
            old_ranges = m["bucket_ranges"]["ranges"]
            touched = {
                self._range_lo(int(bk), size)
                for bk in ({str(b) for b in replaced} | set(added_by_bucket))
            }
            new_ranges = {
                lo: dict(rs) for lo, rs in old_ranges.items() if lo not in touched
            }
            for lo in sorted(touched, key=int):
                rmap = (
                    dict(self._load_range(old_ranges[lo]["path"]))
                    if lo in old_ranges
                    else {}
                )
                for bk in list(rmap):
                    if int(bk) in replaced:
                        del rmap[bk]
                for bk, entries in added_by_bucket.items():
                    if self._range_lo(int(bk), size) != lo:
                        continue
                    if bk in rmap:  # append into a carried bucket (delta path)
                        entries = self._load_sidecar(rmap[bk]["path"]) + entries
                    rmap[bk] = self._bucket_summary(
                        entries, written_blobs, (keys or {}).get(bk)
                    )
                if rmap:
                    new_ranges[lo] = _range_summary(rmap)
            return {"size": size, "ranges": new_ranges}
        # migration / bucket-function change: full parent map minus replaced,
        # plus added, regrouped into fresh ranges (one-time O(buckets))
        full = self._bucket_entries_migrated(m, exclude=replaced, record=written_blobs)
        for bk, entries in added_by_bucket.items():
            if bk in full:
                entries = self._load_sidecar(full[bk]["path"]) + entries
            full[bk] = self._bucket_summary(
                entries, written_blobs, (keys or {}).get(bk)
            )
        grouped: dict[str, dict] = {}
        for bk, s in full.items():
            grouped.setdefault(self._range_lo(int(bk), size), {})[bk] = s
        return {
            "size": size,
            "ranges": {
                lo: _range_summary(rmap)
                for lo, rmap in sorted(grouped.items(), key=lambda kv: int(kv[0]))
            },
        }

    def rollback(self, to_version: int) -> int:
        """Restore an earlier snapshot's contents as a NEW version (Iceberg's
        rollback semantics: history is never rewritten — the rollback is one
        more commit whose buckets re-reference the old version's sidecars,
        an O(buckets) metadata operation that moves zero data bytes).

        ``last_applied_batch`` reverts too, so re-tailing the changelog
        replays everything after the restored watermark (the time-travel +
        reprocess workflow). Raced writers CAS-conflict as usual."""
        parent_v = self.current_version()
        old = self.manifest(to_version)
        cur = self.manifest(parent_v)
        new = dict(cur)
        new["version"] = parent_v + 1
        new["parent"] = parent_v
        if "bucket_ranges" in old:
            # range manifests are content-addressed + immutable: the restored
            # snapshot re-references them verbatim (still O(ranges) metadata)
            new["bucket_ranges"] = old["bucket_ranges"]
            new.pop("buckets", None)
        else:
            new["buckets"] = self._bucket_entries_migrated(old, exclude=set())
            new.pop("bucket_ranges", None)
        new.pop("files", None)
        # restored state must be read under the schema it was written with
        new["schema_id"] = old["schema_id"]
        new["num_buckets"] = old["num_buckets"]
        new["bucket_expr"] = old["bucket_expr"]
        new["last_applied_batch"] = old["last_applied_batch"]
        new["props"] = {**cur.get("props", {}), "rolled_back_from": parent_v,
                        "rolled_back_to": to_version}
        self._write_manifest(new["version"], new)
        return new["version"]

    # ----------------------------------------------------------------- tags
    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under an immutable name (Iceberg tag): the tagged
        version survives ``expire_snapshots`` until untagged, and
        ``read(version=table.ref(name))`` time-travels to it by name. Tags
        are create-once (O_EXCL — racing taggers: one wins, the rest raise);
        re-pointing a name means untag + tag."""
        if not _BRANCH_NAME_RE.match(name):
            raise ValueError(f"invalid tag name: {name!r}")
        v = self.current_version() if version is None else version
        self.manifest(v)  # raises for a nonexistent version
        d = os.path.join(self.meta_dir, "tags")
        os.makedirs(d, exist_ok=True)
        try:
            with open(os.path.join(d, f"{name}.json"), "x") as f:
                json.dump({"version": v}, f)
        except FileExistsError as e:
            raise CommitConflict(f"tag {name!r} already exists") from e
        return v

    def tags(self) -> dict[str, int]:
        d = os.path.join(self.meta_dir, "tags")
        out: dict[str, int] = {}
        for p in glob.glob(os.path.join(d, "*.json")):
            try:
                with open(p) as f:
                    out[os.path.basename(p)[:-5]] = json.load(f)["version"]
            except (OSError, ValueError, KeyError):
                continue  # racing untag / partial write: skip
        return out

    def ref(self, name: str) -> int:
        """Resolve a tag name to its pinned snapshot version."""
        t = self.tags()
        if name not in t:
            raise FileNotFoundError(f"no tag {name!r} on {self.root}")
        return t[name]

    def untag(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self.meta_dir, "tags", f"{name}.json"))
        except FileNotFoundError:
            pass

    # ------------------------------------------------------------- branches
    def create_branch(self, name: str, from_version: int | None = None) -> "Miniberg":
        """Fork an isolated manifest chain at a snapshot (Iceberg's branch;
        the staging surface for write-audit-publish). O(1) metadata: the
        branch's first manifest re-references the fork snapshot's sidecars
        verbatim — zero data bytes move. Returns the branch handle; commit
        to it like any table. Two racing creators of the same name: one
        wins the CAS, the other gets CommitConflict."""
        if self.branch is not None:
            raise ValueError("branches fork from main, not from a branch")
        if not _BRANCH_NAME_RE.match(name):
            raise ValueError(f"invalid branch name: {name!r}")
        v = self.current_version() if from_version is None else from_version
        b = Miniberg(self.root, branch=name)
        if glob.glob(os.path.join(b.meta_dir, "v*.json")):
            raise CommitConflict(f"branch {name!r} already exists")
        os.makedirs(b.lineage_dir, exist_ok=True)
        m = dict(self.manifest(v))
        m["branch"] = name
        m["fork_version"] = v
        b._write_manifest(v, m)
        return b

    def branch_handle(self, name: str) -> "Miniberg":
        b = Miniberg(self.root, branch=name)
        b.current_version()  # raises FileNotFoundError for an unknown branch
        return b

    def branches(self) -> list[str]:
        d = os.path.join(self.root, "meta", "branches")
        if not os.path.isdir(d):
            return []
        return sorted(
            n for n in os.listdir(d)
            if glob.glob(os.path.join(d, n, "v*.json"))
        )

    def drop_branch(self, name: str) -> None:
        """Delete a branch's manifest chain. Data files only it referenced
        become orphans and are reclaimed by ``gc_orphans`` after the grace
        window — the abandon half of write-audit-publish."""
        d = os.path.join(self.root, "meta", "branches", name)
        shutil.rmtree(d, ignore_errors=True)

    def _layout_from_summaries(self, new: dict, summaries: dict[str, dict],
                               record: dict[str, str] | None = None) -> None:
        """Install a full {bucket_str: summary-with-path} map into manifest
        ``new`` under whatever layout its num_buckets calls for. Range
        manifests are content-addressed, so regrouping rewrites nothing for
        ranges whose contents did not change. ``record`` collects
        {rel_path: payload} for every blob written, so the caller can re-check
        them after its manifest CAS (the blob-reuse/GC race _commit_once
        closes the same way)."""
        nb = new["num_buckets"]
        if nb > RANGE_LAYOUT_MIN_BUCKETS:
            size = self._range_size(nb)
            grouped: dict[str, dict] = {}
            for bk, s in summaries.items():
                grouped.setdefault(self._range_lo(int(bk), size), {})[bk] = s
            ranges: dict[str, dict] = {}
            for lo, rmap in sorted(grouped.items(), key=lambda kv: int(kv[0])):
                payload = json.dumps(rmap, sort_keys=True)
                rel = self._write_blob(payload)
                if record is not None:
                    record[rel] = payload
                ranges[lo] = {
                    "path": rel,
                    "n_buckets": len(rmap),
                    "n_files": sum(s["n_files"] for s in rmap.values()),
                    "rows": sum(s.get("rows", 0) for s in rmap.values()),
                    "bytes": sum(s.get("bytes", 0) for s in rmap.values()),
                }
            new["bucket_ranges"] = {"size": size, "ranges": ranges}
            new.pop("buckets", None)
        else:
            new["buckets"] = dict(summaries)
            new.pop("bucket_ranges", None)

    def publish_branch(self, name: str, *, drop: bool = True,
                       rebase_retries: int = 3) -> int:
        """Merge a branch's state into main as ONE atomic commit — the
        publish half of write-audit-publish. O(buckets) metadata: buckets
        the branch touched (vs its fork snapshot) adopt the branch's sidecar
        references verbatim; everything else carries from main's CURRENT
        head, so main commits that landed since the fork on DISJOINT buckets
        merge cleanly (same admissibility rule as commit()'s rebase). Real
        conflicts raise CommitConflict: overlapping bucket rewrites,
        both sides evolving schema, both sides advancing the changelog
        watermark, or a bucket-function change racing any main movement.

        Readers never see an intermediate state: the merge is a single
        manifest CAS. Branch lineage rows merge into main's log. ``drop``
        deletes the branch after publishing (its manifests are superseded;
        its data files are now pinned by main)."""
        b = self.branch_handle(name)
        bv = b.current_version()
        bm = b.manifest(bv)
        fork = bm.get("fork_version")
        if fork is None:
            raise CommitConflict(f"branch {name!r} has no fork point recorded")
        if bv == fork:
            if drop:
                self.drop_branch(name)
            return self.current_version()  # nothing committed on the branch
        fm = self.manifest(fork)
        b_sum = self._bucket_map(bm)
        f_sum = self._bucket_map(fm)
        b_touched = {
            bk for bk in set(b_sum) | set(f_sum)
            if b_sum.get(bk, {}).get("path") != f_sum.get(bk, {}).get("path")
        }
        branch_schema = bm["schema_id"] != fm["schema_id"]
        branch_fn = bm["num_buckets"] != fm["num_buckets"]
        branch_wm = bm["last_applied_batch"] != fm["last_applied_batch"]
        for _ in range(max(rebase_retries, 0) + 1):
            hv = self.current_version()
            hm = self.manifest(hv)
            if hv != fork:
                if branch_fn or hm["num_buckets"] != fm["num_buckets"]:
                    raise CommitConflict(
                        "bucket-function change cannot merge past a moved main"
                    )
                if branch_schema and hm["schema_id"] != fm["schema_id"]:
                    raise CommitConflict(
                        "both main and branch evolved the schema since the fork"
                    )
                if branch_wm and hm["last_applied_batch"] != fm["last_applied_batch"]:
                    raise CommitConflict(
                        "both main and branch advanced the changelog watermark "
                        "since the fork"
                    )
                h_sum = self._bucket_map(hm)
                m_touched = {
                    bk for bk in set(h_sum) | set(f_sum)
                    if h_sum.get(bk, {}).get("path") != f_sum.get(bk, {}).get("path")
                }
                if b_touched & m_touched:
                    raise CommitConflict(
                        f"branch {name!r} and main both rewrote buckets "
                        f"{sorted(int(x) for x in (b_touched & m_touched))[:8]}"
                    )
            else:
                h_sum = dict(f_sum)
            merged = dict(h_sum)
            for bk in b_touched:
                if bk in b_sum:
                    merged[bk] = b_sum[bk]
                else:
                    merged.pop(bk, None)
            new = dict(hm)
            new["version"] = hv + 1
            new["parent"] = hv
            if branch_schema:
                new["schemas"] = bm["schemas"]
                new["schema_id"] = bm["schema_id"]
            if branch_fn:
                new["num_buckets"] = bm["num_buckets"]
                new["bucket_expr"] = bm["bucket_expr"]
            if branch_wm:
                new["last_applied_batch"] = max(
                    bm["last_applied_batch"], hm["last_applied_batch"]
                )
            new["props"] = {
                **hm.get("props", {}),
                # branch prop CHANGES win (a carried prop stays main's)
                **{k: v for k, v in bm.get("props", {}).items()
                   if fm.get("props", {}).get(k) != v},
                "published_branch": name,
                "published_fork_version": fork,
            }
            new.pop("branch", None)
            new.pop("fork_version", None)
            written_blobs: dict[str, str] = {}
            self._layout_from_summaries(new, merged, record=written_blobs)
            new.pop("files", None)
            try:
                self._write_manifest(new["version"], new)
            except CommitConflict:
                continue  # main moved: re-read the head and re-merge
            # close the blob-reuse/GC race exactly as _commit_once does: a
            # REUSED (previously orphaned) range-manifest blob could have
            # been unlinked by a concurrent gc_orphans between _write_blob's
            # mtime refresh and the manifest CAS — recreate from the
            # in-memory payloads now that the manifest is durable
            for rel, payload in written_blobs.items():
                if not os.path.exists(os.path.join(self.root, rel)):
                    self._write_blob(payload)
            for p in glob.glob(os.path.join(b.lineage_dir, "batch-*.json")):
                dst = os.path.join(self.lineage_dir, os.path.basename(p))
                if not os.path.exists(dst):
                    shutil.copyfile(p, dst)
            if drop:
                self.drop_branch(name)
            return new["version"]
        raise CommitConflict(
            f"could not publish branch {name!r} after {rebase_retries} rebases"
        )

    def changed_buckets(self, from_version: int, to_version: int) -> list[int] | None:
        """Buckets whose FILE SETS differ between two snapshots — pure
        metadata (sidecar-path comparison, no data read). Under the
        third-level range layout only ranges whose content hash differs are
        loaded, so the diff is O(ranges + changed buckets). Returns None when
        bucket identity is not comparable (the bucket function changed
        between the versions) — i.e. "treat every bucket as changed".

        This is the prune ``table_changes`` feeds on: rows in a bucket whose
        file set is identical in both snapshots cannot differ, so a CDF read
        over a small commit (a WAP audit delta, an index sync) reads only the
        touched buckets instead of two full snapshots."""
        fm_ = self.manifest(from_version)
        tm_ = self.manifest(to_version)
        if fm_["num_buckets"] != tm_["num_buckets"]:
            return None  # bucket function changed: no stable bucket identity
        if any(
            "buckets" not in m and "bucket_ranges" not in m for m in (fm_, tm_)
        ):
            # legacy single-level manifest: no per-bucket file sets to
            # compare — _bucket_map would yield {} for BOTH sides and the
            # diff would read as "nothing changed", silently stamping
            # downstream index/view syncs current while stale (ADVICE r7).
            # None = "treat every bucket as changed", the conservative
            # answer (mirrors the legacy guard in _try_rebase).
            return None
        if (
            "bucket_ranges" in fm_
            and "bucket_ranges" in tm_
            and fm_["bucket_ranges"]["size"] == tm_["bucket_ranges"]["size"]
        ):
            fr = fm_["bucket_ranges"]["ranges"]
            tr = tm_["bucket_ranges"]["ranges"]
            a: dict[str, dict] = {}
            b: dict[str, dict] = {}
            for lo in set(fr) | set(tr):
                if fr.get(lo, {}).get("path") != tr.get(lo, {}).get("path"):
                    if lo in fr:
                        a.update(self._load_range(fr[lo]["path"]))
                    if lo in tr:
                        b.update(self._load_range(tr[lo]["path"]))
        else:
            a = self._bucket_map(fm_)
            b = self._bucket_map(tm_)
        return sorted(
            int(bk) for bk in set(a) | set(b)
            if a.get(bk, {}).get("path") != b.get(bk, {}).get("path")
        )

    def table_changes(
        self, spark: SparkSession, from_version: int, to_version: int,
        *, snapshot_seq: int | None = None, buckets: list[int] | None = None,
    ) -> DataFrame:
        """Change-data-feed read: the I/U/D events that turn snapshot
        ``from_version`` into ``to_version`` (Delta's table_changes /
        Iceberg's changelog scan, re-expressed through the snapshot differ —
        ``differ ∘ apply = identity`` is the tested contract).

        ``buckets`` restricts BOTH snapshot reads — pass
        ``changed_buckets(from_version, to_version)`` to scan only buckets
        whose file sets moved (identical buckets yield no events by
        definition); at lake scale that turns the delta of a small commit
        from two table scans into a few bucket reads."""
        from recidiviz_data_spark.cdc.differ import snapshot_diff

        # the old snapshot is read under ITS schema, then aligned to
        # to_version's user schema (null-filling later-added columns) — a
        # CDF read spanning a schema-evolution boundary must not fail on
        # the old side lacking the added column
        new_m = self.manifest(to_version)
        new_user = self._schema_struct(new_m, new_m["schema_id"], include_internal=False)
        old = align_to_schema(
            self.read(spark, version=from_version, buckets=buckets), new_user
        )
        new = self.read(spark, version=to_version, buckets=buckets)
        key = new_m["key_col"]
        payload = [c for c in new.columns if c != key]
        return snapshot_diff(
            old, new, key=key, payload_cols=payload,
            snapshot_seq=to_version if snapshot_seq is None else snapshot_seq,
        )

    # ------------------------------------------------------------- utilities
    def bucket_col(self) -> F.Column:
        m = self.manifest()
        return F.pmod(F.xxhash64(F.col(m["key_col"])), F.lit(m["num_buckets"])).cast("int")

    def lineage(self) -> list[dict]:
        rows: list[dict] = []
        for p in sorted(glob.glob(os.path.join(self.lineage_dir, "batch-*.json"))):
            with open(p) as f:
                rows.extend(json.load(f))
        return rows

    def gc_orphans(self, *, grace_seconds: float = 3600.0) -> list[str]:
        """Delete data files not referenced by ANY existing snapshot + stale
        staging (expired snapshots no longer pin their files).

        ``grace_seconds``: files/staging dirs younger than this are SKIPPED —
        a concurrent writer moves staged files into data/ (collect_staged_
        files) BEFORE its manifest CAS, so a just-written unreferenced file
        may belong to an in-flight commit. The grace window makes GC safe to
        run alongside writers; pass 0 only when no writer can be in flight.

        Runs from the MAIN handle only: data/ and meta/fm/ are shared with
        every branch, and a branch handle's own chain pins neither main's
        files nor its siblings' — collecting references from it would
        silently delete live data (raises instead)."""
        import time as _time

        if self.branch is not None:
            raise ValueError(
                "gc_orphans must run from the main handle: a branch's chain "
                "does not pin main's or sibling branches' files in the "
                "shared data/ and meta/fm/ dirs"
            )
        referenced, referenced_sidecars = collect_references(self, self.versions())
        for name in (self.branches() if self.branch is None else []):
            # live branches pin their files/sidecars exactly like snapshots
            bt = Miniberg(self.root, branch=name)
            bf, bs = collect_references(bt, bt.versions())
            referenced |= bf
            referenced_sidecars |= bs
        now = _time.time()
        removed = gc_unreferenced(
            os.path.join(self.data_dir, "*.parquet"), referenced, grace_seconds, now
        )
        # orphaned sidecars (written by a commit whose CAS lost, or left by
        # expired snapshots) — same grace rule as data files
        removed += gc_unreferenced(
            os.path.join(self.fm_dir, "*.json"), referenced_sidecars, grace_seconds, now
        )
        for d in glob.glob(os.path.join(self.root, "tmp", "stage-*")):
            try:
                young = now - os.path.getmtime(d) < grace_seconds
            except OSError:
                continue  # racing writer already moved/removed it
            if not young:
                shutil.rmtree(d, ignore_errors=True)
        return removed


def _residual_filter(out: DataFrame, stats_filter: dict) -> DataFrame:
    """Apply the exact {col: (lo, hi)} range predicate a stats-based file
    prune was derived from (file skipping is necessary-not-sufficient)."""
    for col, (lo, hi) in stats_filter.items():
        if lo is not None:
            out = out.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col(col) <= F.lit(hi))
    return out


def collect_references(table: "Miniberg", versions: list[int]) -> tuple[set, set]:
    """(data-file paths, sidecar paths) referenced by ``versions``,
    tolerating versions EXPIRED by a concurrent maintenance run (their
    manifest/sidecars vanish mid-scan — nothing of theirs needs keeping).
    A sidecar missing while its manifest still exists is real corruption
    and raises: GC'ing with an incomplete keep-set could delete live data."""
    keep_files: set = set()
    keep_sidecars: set = set()
    for v in versions:
        try:
            m = table.manifest(v)
            for s in m.get("buckets", {}).values():
                keep_sidecars.add(os.path.join(table.root, s["path"]))
            for rs in m.get("bucket_ranges", {}).get("ranges", {}).values():
                # third level: keep the range manifest AND the sidecars it
                # references (both live under meta/fm/)
                keep_sidecars.add(os.path.join(table.root, rs["path"]))
                for s in table._load_range(rs["path"]).values():
                    keep_sidecars.add(os.path.join(table.root, s["path"]))
            for f in table.files(manifest=m):
                keep_files.add(os.path.join(table.root, f["path"]))
        except FileNotFoundError:
            if os.path.exists(table._vpath(v)):
                raise
            continue  # version expired concurrently
    return keep_files, keep_sidecars


def gc_unreferenced(
    pattern: str, keep: set, grace_seconds: float, now: float
) -> list[str]:
    """Unlink files matching ``pattern`` that are not in ``keep`` and are
    older than the grace window — THE single glob+grace+unlink rule shared
    by gc_orphans and expire_snapshots (OSError = a concurrent GC won)."""
    removed: list[str] = []
    for p in glob.glob(pattern):
        if p in keep:
            continue
        try:
            if now - os.path.getmtime(p) >= grace_seconds:
                os.unlink(p)
                removed.append(p)
        except OSError:
            continue
    return removed


def _footer_col_ranges(meta) -> dict[str, tuple]:
    """{column: (min, max)} across a parquet file's row groups, from the
    footer statistics alone, for every TOP-LEVEL scalar column whose stats
    decode to str/int (JSON-portable, total-ordered; bools and nested paths
    like ``tokens.list.element`` are skipped). A column missing stats in any
    row group is omitted — file skipping then conservatively keeps the
    file for predicates on it."""
    if not meta.num_row_groups:
        return {}
    out: dict[str, tuple] = {}
    for i in range(meta.num_columns):
        col = meta.row_group(0).column(i).path_in_schema
        if "." in col:
            continue
        kmin = kmax = None
        ok = True
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    ok = False
                    break
            if isinstance(mn, bool) or not isinstance(mn, (str, int)):
                ok = False
                break
            kmin = mn if kmin is None else min(kmin, mn)
            kmax = mx if kmax is None else max(kmax, mx)
        if ok and kmin is not None:
            out[col] = (kmin, kmax)
    return out


def _type_from_json(j) -> T.DataType:
    if isinstance(j, str):
        return {
            "string": T.StringType(),
            "integer": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "boolean": T.BooleanType(),
            "date": T.DateType(),
            "timestamp": T.TimestampType(),
            "binary": T.BinaryType(),
        }[j]
    if j.get("type") == "array":
        return T.ArrayType(_type_from_json(j["elementType"]), j.get("containsNull", True))
    if j.get("type") == "struct":
        return T.StructType(
            [T.StructField(f["name"], _type_from_json(f["type"]), f.get("nullable", True)) for f in j["fields"]]
        )
    raise ValueError(f"unsupported type json: {j}")
