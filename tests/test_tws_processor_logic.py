"""Validates the transformWithStateInPandas vocabulary processor's
LOGIC end-to-end against the fully-tested applyInPandasWithState path
(`_apply_shard_batch` / ShardDict), using in-memory fakes of Spark's
StatefulProcessorHandle state primitives.

Why fakes: Spark's TWS python worker requires google.protobuf, which
is not installed in this sandbox (and installs are disallowed), so the
wire path is cluster-only (see streaming/vocabulary_tws.py SANDBOX
NOTE and the skipped test_vocabulary_tws_matches_v1). Everything the
processor does between the handle API calls — the reference
PositionAssignmentAggregate semantics (arrival-order assignment, hole
reuse, x1.5/0.66 sizing, compress renumbering; reference
src/types/integer_assignment_aggregate.rs:43-95) — is exercised here
under the same hypothesis-style interleavings as the v1 suite, plus
handle-persisted restart. The fakes implement exactly the five state
methods the processor uses (MapState contains/get/update/iterator,
ValueState exists/get/update, ListState get/put/clear)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from diffdataflowmlpipelines_spark.streaming.vocabulary import (
    ShardDict,
    _apply_shard_batch,
)
from diffdataflowmlpipelines_spark.streaming.vocabulary_tws import (
    VocabularyProcessor,
)

# ---------------------------------------------------------------- fakes


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeMapState:
    def __init__(self):
        self._m: dict[tuple, tuple] = {}

    def containsKey(self, key):
        return tuple(key) in self._m

    def getValue(self, key):
        return self._m[tuple(key)]

    def updateValue(self, key, value):
        self._m[tuple(key)] = tuple(value)

    def iterator(self):
        return iter(list(self._m.items()))


class FakeListState:
    def __init__(self):
        self._l: list[tuple] = []

    def get(self):
        return iter(list(self._l))

    def put(self, rows):
        self._l = [tuple(r) for r in rows]

    def clear(self):
        self._l = []


class FakeHandle:
    """Persists state across processor instances, like a state store."""

    def __init__(self):
        self.states: dict[str, object] = {}

    def getMapState(self, name, *a, **k):
        return self.states.setdefault(name, FakeMapState())

    def getValueState(self, name, *a, **k):
        return self.states.setdefault(name, FakeValueState())

    def getListState(self, name, *a, **k):
        return self.states.setdefault(name, FakeListState())


# ------------------------------------------------------------- harness

T0 = datetime(2024, 1, 1)


def _pdf(items, base_s=0):
    return pd.DataFrame(
        {
            "token": [t for t, _ in items],
            "diff": [d for _, d in items],
            "event_time": [
                T0 + timedelta(seconds=base_s + j) for j in range(len(items))
            ],
        }
    )


def _run_tws(epochs, n_shards=1, shard=0, handle=None, restart_each=False):
    """Drive VocabularyProcessor through fake handles; returns per-epoch
    output row-sets. restart_each simulates a checkpoint resume before
    every micro-batch (fresh processor object, persisted handle).

    Each batch is delivered as MULTIPLE Arrow chunks split so the
    later chunk holds EARLIER event_times — the processor must
    concatenate before its global sort exactly like the v1 path (a
    per-chunk sort gives a different arrival order)."""
    handle = handle or FakeHandle()
    proc = VocabularyProcessor(n_shards)
    proc.init(handle)
    outs = []
    for i, items in enumerate(epochs):
        if restart_each:
            proc = VocabularyProcessor(n_shards)
            proc.init(handle)
        pdf = _pdf(items, i * 1000)
        mid = len(pdf) // 2
        batch = (
            # out-of-order chunking: second-half times first
            [pdf.iloc[mid:].reset_index(drop=True), pdf.iloc[:mid].reset_index(drop=True)]
            if mid
            else [pdf]
        )
        chunks = list(proc.handleInputRows((shard,), iter(batch), None))
        out = pd.concat(chunks, ignore_index=True)
        outs.append(
            sorted(
                zip(out["shard"], out["token"], out["idx"], out["count"], out["vec_len"])
            )
        )
    return outs


def _run_v1(epochs, n_shards=1, shard=0):
    d = ShardDict()
    outs = []
    for i, items in enumerate(epochs):
        out = _apply_shard_batch(d, shard, _pdf(items, i * 1000), n_shards)
        outs.append(
            sorted(
                zip(out["shard"], out["token"], out["idx"], out["count"], out["vec_len"])
            )
        )
    return outs, d


GOLDEN_EPOCHS = [
    [("apple", 1), ("pear", 1), ("plum", 1)],
    [("pear", -1), ("kiwi", 1)],  # free pear's idx; kiwi reuses it
    [("pear", 1), ("apple", 1)],  # pear returns with a fresh idx
]


def test_tws_golden_trace_matches_v1():
    want, _ = _run_v1(GOLDEN_EPOCHS)
    assert _run_tws(GOLDEN_EPOCHS) == want


def test_tws_compress_renumber_emits_untouched_tokens():
    # batch 2 deletes enough to trigger compress: tokens the batch never
    # touched get renumbered and MUST be re-emitted (v1 rule)
    epochs = [
        [(f"t{i}", 1) for i in range(8)],
        [(f"t{i}", -1) for i in range(6)],
    ]
    want, d = _run_v1(epochs)
    got = _run_tws(epochs)
    assert got == want
    # the compress really happened and the survivors were re-emitted
    surviving = {t for _, t, i, _, _ in got[1] if i >= 0}
    assert surviving == {"t6", "t7"}
    assert d.val_to_index == {"t6": 0, "t7": 1}


def test_tws_mid_batch_compress_matches_per_update_sizing():
    # delete-heavy then re-insert INSIDE one batch: per-update sizing
    # compresses mid-batch and renumbers; batch-end sizing would not.
    epochs = [
        [(f"t{i}", 1) for i in range(8)],
        [(f"t{i}", -1) for i in range(6)] + [("new1", 1), ("new2", 1)],
        [("t6", -1), ("probe", 1)],
    ]
    assert _run_tws(epochs) == _run_v1(epochs)[0]


def test_tws_compress_survivor_with_unchanged_idx_not_reemitted():
    """Regression (ADVICE r3, medium): compress() seeded the cache
    overlay from MapState without recording pre-batch indices, so
    every compress survivor emitted even when renumbering left its
    index unchanged — while v1 emits changed indices only. Trace:
    insert t0..t3, then retract t2,t3 in a later epoch (compress fires;
    t0/t1 keep idx 0/1)."""
    epochs = [
        [(f"t{i}", 1) for i in range(4)],
        [("t2", -1), ("t3", -1)],
    ]
    want, _ = _run_v1(epochs)
    got = _run_tws(epochs)
    assert got == want
    # the discriminating assertion: epoch-2 emissions are exactly the
    # two retracted tokens; the unchanged survivors t0/t1 stay silent
    assert {t for _, t, *_ in got[1]} == {"t2", "t3"}


def test_tws_restart_between_batches_is_transparent():
    epochs = [
        [(f"t{i}", 1) for i in range(8)],
        [(f"t{i}", -1) for i in range(6)],
        [("t6", -1), ("x", 1), ("y", 1)],
    ]
    want, _ = _run_v1(epochs)
    assert _run_tws(epochs, restart_each=True) == want


ops = st.lists(
    st.tuples(
        st.sampled_from([f"t{i}" for i in range(12)]), st.sampled_from([1, -1])
    ),
    min_size=0,
    max_size=120,
)
cuts = st.lists(st.integers(min_value=0, max_value=120), max_size=6)


@settings(max_examples=150, deadline=None)
@given(ops, cuts, st.booleans())
def test_tws_matches_v1_on_any_interleaving(sequence, cut_points, restart):
    """Any op sequence, any epoch boundaries, with or without restarts:
    per-epoch emissions must be identical to the v1 operator's."""
    bounds = sorted({c for c in cut_points if c < len(sequence)})
    edges = [0, *bounds, len(sequence)]
    epochs = [
        sequence[a:b] for a, b in zip(edges, edges[1:])
    ] or [[]]
    want, d = _run_v1(epochs)
    handle = FakeHandle()
    got = _run_tws(epochs, handle=handle, restart_each=restart)
    assert got == want
    # final state equivalence: entries/meta mirror the ShardDict
    entries = handle.states["entries"]._m
    got_counts = {k[0]: v[1] for k, v in entries.items()}
    got_idx = {k[0]: v[0] for k, v in entries.items() if v[0] >= 0}
    assert got_counts == d.val_to_count
    assert got_idx == d.val_to_index
    meta = handle.states["meta"].get()
    assert meta is None or (
        int(meta[1]) == d.length and int(meta[0]) == d.next_index
    )


@settings(max_examples=60, deadline=None)
@given(ops)
def test_tws_sharded_global_indices_consistent(sequence):
    """Across shards, the global index scheme (local*n_shards+shard)
    must match v1 for the same per-shard routing."""
    n_shards = 3
    by_shard: dict[int, list] = {0: [], 1: [], 2: []}
    for tok, diff in sequence:
        # deterministic routing (python str hash is seed-randomized)
        by_shard[sum(map(ord, tok)) % n_shards].append((tok, diff))
    for shard, items in by_shard.items():
        if not items:
            continue
        epochs = [items[: len(items) // 2], items[len(items) // 2 :]]
        want, _ = _run_v1(epochs, n_shards=n_shards, shard=shard)
        assert _run_tws(epochs, n_shards=n_shards, shard=shard) == want
