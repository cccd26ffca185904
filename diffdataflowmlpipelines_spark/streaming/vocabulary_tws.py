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
        # (next_local, length, n_free) + free-list as its own map
        self.meta = handle.getValueState(
            "meta", "next_local long, length long, n_free long"
        )
        self.free = handle.getListState("free", "idx long")

    # -- helpers mirroring ShardDict ------------------------------------------

    def _load_meta(self) -> tuple[int, int, int]:
        if self.meta.exists():
            m = self.meta.get()
            return int(m[0]), int(m[1]), int(m[2])
        return 0, 1, 0

    def _live_count(self) -> int:
        n = 0
        for _ in self.entries.iterator():
            pass
        # cheap live count: assigned entries = all entries with idx >= 0
        for _k, v in self.entries.iterator():
            if v[0] >= 0:
                n += 1
        return n

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        next_local, length, n_free = self._load_meta()
        free = [int(x[0]) for x in self.free.get()] if n_free else []
        touched: dict[str, None] = {}

        def assign() -> int:
            nonlocal next_local
            if free:
                return free.pop()
            next_local += 1
            return next_local - 1

        for pdf in rows:
            pdf = pdf.sort_values(["event_time", "token"], kind="stable")
            for token, diff in zip(pdf["token"], pdf["diff"]):
                token, diff = str(token), int(diff)
                if self.entries.containsKey((token,)):
                    idx, cnt = self.entries.getValue((token,))
                    idx, cnt = int(idx), int(cnt)
                    new = cnt + diff
                    if cnt > 0 and new <= 0 and idx >= 0:
                        free.append(idx)
                        idx = -1
                    elif cnt <= 0 and new > 0:
                        idx = assign()
                    self.entries.updateValue((token,), (idx, new))
                else:
                    idx = assign() if diff > 0 else -1
                    self.entries.updateValue((token,), (idx, diff))
                touched[token] = None

        # sizing policy (reference x1.5 grow / 0.66 compress-shrink)
        live = self._live_count()
        if live > length:
            while live > length:
                length = int(length * 1.5 + 0.5)
        elif live < int(length * 0.66):
            # compress: renumber live tokens densely in sorted order
            live_tokens = sorted(
                k[0] for k, v in self.entries.iterator() if v[0] >= 0
            )
            for i, tok in enumerate(live_tokens):
                _idx, cnt = self.entries.getValue((tok,))
                self.entries.updateValue((tok,), (i, int(cnt)))
                touched[tok] = None
            free = []
            next_local = len(live_tokens)
            while live < int(length * 0.66) and length > 1:
                new_len = -int(-length * 0.66 // 1)
                length = new_len if new_len < length else length - 1

        self.meta.update((next_local, length, len(free)))
        self.free.clear()
        if free:
            self.free.put([(int(i),) for i in free])

        out_rows = []
        for tok in touched:
            idx, cnt = self.entries.getValue((tok,))
            g = int(idx) * self.n_shards + shard if int(idx) >= 0 else -1
            out_rows.append((shard, tok, g, int(cnt), length * self.n_shards))
        yield pd.DataFrame(
            out_rows, columns=["shard", "token", "idx", "count", "vec_len"]
        )

    def close(self) -> None:
        pass


def incremental_vocabulary_tws(
    df: DataFrame, n_shards: int = 16, token_col: str = "token"
) -> DataFrame:
    keyed = df.select(
        F.pmod(F.xxhash64(F.col(token_col)), F.lit(n_shards)).cast("int").alias("shard"),
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
