"""Deterministic changelog / base-table generator (FIXTURES.md §A, SURVEY §7 M0).

Models the reference's ingest as a change-event stream: each scrape-session
snapshot diff becomes an insert/update/delete event (the reference's
``persistence/update_historical_snapshots`` SCD2 rows are exactly such a log —
see SURVEY.md §1.1(3)).  No wall-clock, no global RNG: every payload is a pure
function of ``event_seq`` via a splitmix64-style counter hash, so

- duplicate events (same ``(doc_id, event_seq)``) are bit-identical,
- late/stale copies injected into later batches match their originals,
- any batch can be regenerated independently at any scale (10^7+ events
  locally; the same construction streams to 10^10 on a cluster).

Layout: ``out_dir/batch_id=N/part-0.parquet`` (hive-partitioned so Spark's
partition pruning gives O(1) "binlog seek" per batch).

Schema evolution: events with ``schema_ver == 2`` carry an extra ``lang``
column and write ``n_tok`` as int64 (v1: int32) — per-batch files genuinely
differ in physical schema, exercising the sink's add-column + widen rules.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50257
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z, fixed (no wall-clock)
_LANGS = np.array(["en", "fr", "de", "es"], dtype=object)
_SOURCES = np.array(["web", "books", "code"], dtype=object)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the counter-based PRF for payloads."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash2(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    return _splitmix64(
        a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ (np.asarray(b, dtype=np.uint64) + np.uint64(0x94D049BB133111EB))
    )


def doc_id_strings(n_docs: int) -> np.ndarray:
    return np.array([f"doc_{i:08d}" for i in range(n_docs)], dtype=object)


def tokens_for_seqs(
    seqs: np.ndarray, min_len: int = 4, max_len: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """(values:int32 flat, offsets:int64) token lists, pure function of seq.

    Per-element cost is kept to one multiply-add-shift-mod: the full splitmix
    runs once per EVENT (for the length + a per-event seed); token values are
    a cheap counter stream off that seed. Still bit-stable for identical seqs.
    """
    seqs = seqs.astype(np.uint64)
    span = np.uint64(max_len - min_len + 1)
    seed = _hash2(seqs, 1)
    lengths = (min_len + (seed % span)).astype(np.int64)
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    flat_seed = np.repeat(seed, lengths)
    pos = np.arange(total, dtype=np.uint64) - np.repeat(
        offsets[:-1].astype(np.uint64), lengths
    )
    mixed = (flat_seed + (pos + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(13)
    values = (mixed % np.uint64(VOCAB_SIZE)).astype(np.int32)
    return values, offsets


@dataclass
class ChangelogSpec:
    """Knobs per FIXTURES.md §A2."""

    n_docs: int = 1_000
    n_events: int = 10_000
    n_batches: int = 4
    seed: int = 42
    zipf_a: float = 0.0  # 0 = uniform doc choice; >1 = Zipf hot keys
    delete_rate: float = 0.05
    dup_rate: float = 0.0  # exact in-batch duplicate events
    stale_rate: float = 0.0  # copies of old events replayed into a later batch
    schema_bump_frac: float | None = None  # fraction of log where schema_ver->2
    min_len: int = 4
    max_len: int = 64
    extra: dict = field(default_factory=dict)


def _base_events(spec: ChangelogSpec) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    if spec.zipf_a > 0:
        ranks = np.arange(1, spec.n_docs + 1, dtype=np.float64)
        p = ranks**-spec.zipf_a
        p /= p.sum()
        doc_idx = rng.choice(spec.n_docs, size=n, p=p)
    else:
        doc_idx = rng.integers(0, spec.n_docs, size=n)

    seq = np.arange(n, dtype=np.int64)  # strictly increasing globally => per doc
    op = np.full(n, "U", dtype=object)
    _, first_pos = np.unique(doc_idx, return_index=True)
    is_first = np.zeros(n, dtype=bool)
    is_first[first_pos] = True
    op[is_first] = "I"
    if spec.delete_rate > 0:
        del_mask = (rng.random(n) < spec.delete_rate) & ~is_first
        op[del_mask] = "D"

    batch = (seq * spec.n_batches) // n
    schema_ver = np.ones(n, dtype=np.int32)
    if spec.schema_bump_frac is not None:
        schema_ver[seq >= int(n * spec.schema_bump_frac)] = 2
    return {"seq": seq, "doc_idx": doc_idx, "op": op, "batch": batch, "sv": schema_ver}


def _inject_copies(spec: ChangelogSpec, ev: dict[str, np.ndarray]) -> dict:
    """Append exact dups (same batch) and stale replays (later batch)."""
    rng = np.random.default_rng(spec.seed + 1)
    n = len(ev["seq"])
    parts = [ev]
    if spec.dup_rate > 0:
        idx = rng.choice(n, size=int(n * spec.dup_rate), replace=False)
        parts.append({k: v[idx] for k, v in ev.items()})
    if spec.stale_rate > 0:
        idx = rng.choice(n, size=int(n * spec.stale_rate), replace=False)
        stale = {k: v[idx].copy() for k, v in ev.items()}
        stale["batch"] = np.minimum(stale["batch"] + 1, spec.n_batches - 1)
        parts.append(stale)
    if len(parts) == 1:
        return ev
    return {k: np.concatenate([p[k] for p in parts]) for k in ev}


def _batch_table(spec: ChangelogSpec, ev: dict, mask: np.ndarray | None, docs: np.ndarray,
                 force_v2: bool | None = None) -> pa.Table:
    sel = ev if mask is None else {k: v[mask] for k, v in ev.items()}
    seq = sel["seq"]
    # shuffle within the batch (out-of-order arrival; order must not matter)
    order = np.argsort(_hash2(seq.astype(np.uint64), 7), kind="stable")
    seq = seq[order]
    doc_idx = sel["doc_idx"][order]
    op = sel["op"][order]
    sv = sel["sv"][order]

    values, offsets = tokens_for_seqs(seq, spec.min_len, spec.max_len)
    n_tok = np.diff(offsets).astype(np.int64)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
    )
    is_del = op == "D"
    tok_col = pa.compute.if_else(pa.array(~is_del), tokens, pa.nulls(len(seq), tokens.type))
    # schema is decided per BATCH (not per chunk file) so every file in one
    # batch_id directory agrees physically (int64 n_tok + lang when any v2)
    v2 = bool((sv == 2).any()) if force_v2 is None else force_v2
    ntok_type = pa.int64() if v2 else pa.int32()
    ntok_col = pa.compute.if_else(
        pa.array(~is_del), pa.array(n_tok, type=ntok_type), pa.nulls(len(seq), ntok_type)
    )
    src = (_hash2(doc_idx.astype(np.uint64), 11) % np.uint64(3)).astype(np.int64)
    doc_col = pa.DictionaryArray.from_arrays(
        pa.array(doc_idx, type=pa.int32()), pa.array(docs, type=pa.string())
    )
    cols: dict[str, pa.Array] = {
        "event_seq": pa.array(seq, type=pa.int64()),
        "op": pa.array(op, type=pa.string()),
        "doc_id": doc_col,
        "tokens": tok_col,
        "n_tok": ntok_col,
        "source": pa.array(_SOURCES[src], type=pa.string()),
        "ts": pa.array(EPOCH_US + seq * 1_000_000, type=pa.timestamp("us")),
        "schema_ver": pa.array(sv, type=pa.int32()),
    }
    if v2:
        lang_idx = (_hash2(doc_idx.astype(np.uint64), 13) % np.uint64(4)).astype(np.int64)
        lang = _LANGS[lang_idx]
        lang[(sv != 2) | is_del] = None
        cols["lang"] = pa.array(lang, type=pa.string())
    return pa.table(cols)


def gen_changelog(out_dir: str, spec: ChangelogSpec | None = None, **kw) -> ChangelogSpec:
    """Write the hive-partitioned changelog; returns the spec used."""
    spec = spec or ChangelogSpec(**kw)
    ev = _inject_copies(spec, _base_events(spec))
    docs = doc_id_strings(spec.n_docs)
    os.makedirs(out_dir, exist_ok=True)
    # multiple files per batch: a real WAL ships many segment files, and the
    # scan stage must parallelize — one fat file caps it at len/128MB splits
    rows_per_file = int(spec.extra.get("rows_per_file", 200_000))

    def _write_chunk(b: int, i: int, chunk: np.ndarray, batch_v2: bool) -> None:
        # pre-slice the chunk's rows once (fancy index) instead of rebuilding
        # an O(total-events) boolean mask per chunk; mkdir happens here (not
        # up front) so an interrupted generation never leaves empty batch
        # dirs that look complete to presence checks
        bdir = os.path.join(out_dir, f"batch_id={b}")
        os.makedirs(bdir, exist_ok=True)
        sub = {k: v[chunk] for k, v in ev.items()}
        pq.write_table(
            _batch_table(spec, sub, None, docs, force_v2=batch_v2),
            os.path.join(bdir, f"part-{i:04d}.parquet"),
        )

    jobs: list[tuple[int, int, np.ndarray, bool]] = []
    for b in range(spec.n_batches):
        mask_idx = np.nonzero(ev["batch"] == b)[0]
        if len(mask_idx) == 0:
            continue
        n_files = max(1, (len(mask_idx) + rows_per_file - 1) // rows_per_file)
        batch_v2 = bool((ev["sv"][mask_idx] == 2).any())
        for i, chunk in enumerate(np.array_split(mask_idx, n_files)):
            jobs.append((b, i, chunk, batch_v2))
    # chunk synthesis is numpy/arrow work that releases the GIL — thread it
    # (each chunk is an independent pure function of its event slice)
    workers = min(int(spec.extra.get("gen_threads", os.cpu_count() or 8)), len(jobs)) or 1
    if workers <= 1:
        for job in jobs:
            _write_chunk(*job)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(lambda j: _write_chunk(*j), jobs))
    # completion sentinel, written LAST: consumers that cache generated
    # changelogs (bench.py) check this instead of directory presence, so an
    # interrupted generation is never mistaken for a finished one. Spark
    # ignores underscore-prefixed files; the DuckDB batch_id=*/ glob too.
    with open(os.path.join(out_dir, "_GEN_SUCCESS"), "w") as f:
        f.write("ok\n")
    return spec


def gen_base_table(out_path: str, n_docs: int = 1_000, seed: int = 42,
                   min_len: int = 4, max_len: int = 64) -> None:
    """A standalone `tokenized_sequences` table (FIXTURES.md §A1) as one parquet."""
    docs = doc_id_strings(n_docs)
    seqs = np.arange(n_docs, dtype=np.int64) + np.int64(seed) * np.int64(1_000_003)
    values, offsets = tokens_for_seqs(seqs, min_len, max_len)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
    )
    src = (_hash2(np.arange(n_docs, dtype=np.uint64), 11) % np.uint64(3)).astype(np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(docs, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(np.diff(offsets), type=pa.int32()),
            "source": pa.array(_SOURCES[src], type=pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pq.write_table(tbl, out_path)
