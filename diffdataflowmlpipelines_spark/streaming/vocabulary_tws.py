"""Incremental vocabulary on the Spark 4 ``transformWithStateInPandas``
API — same semantics as streaming/vocabulary.py (the reference's
PositionAssignmentAggregate: arrival-order assignment, hole reuse,
x1.5 / 0.66 sizing), but with per-token ``MapState`` entries instead of
one serialized blob per shard.

Why it matters at scale: applyInPandasWithState rewrites the ENTIRE
shard state every batch (O(|shard vocab|) serialization per batch even
for a one-token update); MapState touches only the entries a batch
changes (O(batch)), and RocksDB holds the map off-heap. Same sharding
and interleaved global-index scheme as the v1 implementation.

SANDBOX NOTE: Spark's transformWithState Python worker requires
``google.protobuf``, which is not installed in this container (and
installs are disallowed), so this module is the CLUSTER-path
implementation: validated for import/plan construction here, exercised
end-to-end where protobuf is available. streaming/vocabulary.py is the
fully-tested sandbox path with identical semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

VOCAB_TWS_OUTPUT_SCHEMA = (
    "shard int, token string, idx long, count long, vec_len long"
)


def tws_available() -> bool:
    """transformWithState's Python worker needs google.protobuf."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class VocabularyProcessor(StatefulProcessor):
    def __init__(self, n_shards: int):
        self.n_shards = n_shards

    def init(self, handle: StatefulProcessorHandle) -> None:
        # token -> (local idx or -1, signed count)
        self.entries = handle.getMapState(
            "entries", "token string", "idx long, count long"
        )
        # (next_local, length, n_free, live)
        self.meta = handle.getValueState(
            "meta", "next_local long, length long, n_free long, live long"
        )
        self.free = handle.getListState("free", "idx long")

    # -- helpers mirroring ShardDict ------------------------------------------

    def _load_meta(self) -> tuple[int, int, int, int]:
        if self.meta.exists():
            m = self.meta.get()
            return int(m[0]), int(m[1]), int(m[2]), int(m[3])
        return 0, 1, 0, 0

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        """Per-row ShardDict-exact replay over a (cache overlay, MapState)
        view: only the batch's tokens touch state — O(batch) MapState
        traffic — except when a mid-batch compress fires, which is
        inherently O(live) (it renumbers every live token, exactly as
        the reference's compress does,
        ``src/types/integer_assignment_aggregate.rs:70-95``). Sizing
        runs after EVERY update, not at batch end, so emissions are
        bit-identical to the applyInPandasWithState path
        (``_apply_shard_batch``) for any interleaving — pinned by
        tests/test_tws_processor_logic.py's hypothesis suite."""
        shard = int(key[0])
        next_local, length, n_free, live = self._load_meta()
        free = [int(x[0]) for x in self.free.get()] if n_free else []
        cache: dict[str, list | None] = {}  # overlay; None = not in state
        before: dict[str, int] = {}  # pre-batch live idx per loaded token
        in_batch: dict[str, None] = {}

        def load(token: str):
            if token not in cache:
                if self.entries.containsKey((token,)):
                    idx, cnt = self.entries.getValue((token,))
                    cache[token] = [int(idx), int(cnt)]
                    if int(idx) >= 0:
                        before[token] = int(idx)
                else:
                    cache[token] = None
            return cache[token]

        def assign() -> int:
            nonlocal next_local
            if free:
                return free.pop()
            next_local += 1
            return next_local - 1

        def compress() -> None:
            nonlocal next_local, free
            stored = [
                (k[0], (int(v[0]), int(v[1])))
                for k, v in self.entries.iterator()
                if k[0] not in cache
            ]
            # seed the overlay from the values the iterator just
            # materialized: load() would otherwise issue a fresh
            # containsKey+getValue per live token (~2x state-store round
            # trips per compress on the RocksDB path). Record the
            # pre-batch index too (exactly what load() does): the
            # emission rule compares against `before`, and without it
            # every compress survivor would emit even when renumbering
            # left its index unchanged — diverging from v1's
            # changed-indices-only emission (_apply_shard_batch).
            for t, (i, c) in stored:
                cache[t] = [i, c]
                if i >= 0:
                    before[t] = i
            merged = stored + [
                (t, (e[0], e[1])) for t, e in cache.items() if e is not None
            ]
            live_toks = sorted({t for t, (i, _c) in merged if i >= 0})
            for i, tok in enumerate(live_toks):
                cache[tok][0] = i
            free = []
            next_local = len(live_toks)

        def update(token: str, diff: int) -> None:
            nonlocal live, length
            e = load(token)
            if e is None:
                cache[token] = [assign() if diff > 0 else -1, diff]
                if diff > 0:
                    live += 1
            else:
                old = e[1]
                new = old + diff
                e[1] = new
                if old > 0 and new <= 0:
                    free.append(e[0])
                    e[0] = -1
                    live -= 1
                elif old <= 0 and new > 0:
                    e[0] = assign()
                    live += 1
            # sizing after every update (ShardDict.update parity)
            if live > length:
                while live > length:
                    length = int(length * 1.5 + 0.5)
            elif live < int(length * 0.66):
                compress()
                while live < int(length * 0.66) and length > 1:
                    new_len = -int(-length * 0.66 // 1)  # ceil(len*0.66)
                    length = new_len if new_len < length else length - 1

        # concatenate ALL Arrow chunks before the one global sort — the
        # v1 path (_vocab_fn) sorts the whole micro-batch, and a
        # multi-chunk batch sorted per-chunk would apply updates in a
        # different arrival order (different index assignment)
        chunks = list(rows)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["event_time", "token"], kind="stable"
            )
            for token, diff in zip(pdf["token"], pdf["diff"]):
                update(str(token), int(diff))
                in_batch[str(token)] = None

        # write back the overlay and the meta/free state
        for tok, e in cache.items():
            if e is not None:
                self.entries.updateValue((tok,), (int(e[0]), int(e[1])))
        self.meta.update((next_local, length, len(free), live))
        self.free.clear()
        if free:
            self.free.put([(int(i),) for i in free])

        # emission rule (identical to _apply_shard_batch): every batch
        # token, plus any token whose live index changed (compress)
        touched = dict(in_batch)
        for tok, e in cache.items():
            if e is not None and e[0] >= 0 and before.get(tok) != e[0]:
                touched[tok] = None
        out_rows = []
        for tok in touched:
            e = cache[tok]
            idx, cnt = (e[0], e[1]) if e is not None else (-1, 0)
            g = idx * self.n_shards + shard if idx >= 0 else -1
            out_rows.append((shard, tok, g, cnt, length * self.n_shards))
        yield pd.DataFrame(
            out_rows, columns=["shard", "token", "idx", "count", "vec_len"]
        )

    def close(self) -> None:
        pass


def incremental_vocabulary_tws(
    df: DataFrame, n_shards: int = 16, token_col: str = "token"
) -> DataFrame:
    # NULL tokens/diffs are not updates: str(None) would silently merge
    # with a real token spelled 'None', and int(None) aborts the batch
    keyed = df.filter(
        F.col(token_col).isNotNull() & F.col("diff").isNotNull()
    ).select(
        F.pmod(F.xxhash64(F.col(token_col).cast("string")), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(token_col).cast("string").alias("token"),
        F.col("diff").cast("long").alias("diff"),
        F.col("event_time"),
    )
    return keyed.groupBy("shard").transformWithStateInPandas(
        statefulProcessor=VocabularyProcessor(n_shards),
        outputStructType=VOCAB_TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
