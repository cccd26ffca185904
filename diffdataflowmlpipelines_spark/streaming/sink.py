"""Exactly-once sink keyed by (partition, epoch).

Spark's built-in file sinks are append-only; update-mode consolidation
needs upsert. In production this is an Iceberg MERGE / dynamic-partition
overwrite; this sandbox has no Iceberg jars, so the same contract is
implemented as a parquet-directory sink with an atomic-rename commit
protocol (the reference's only sink is stdout `inspect`,
``src/main.rs:59,71`` — exactly-once is part of the north rule, not the
reference).

Protocol per micro-batch (inside ``foreachBatch``):
  1. write the batch result to ``<root>/_staging/epoch=<id>.<attempt>``
  2. atomically rename to ``<root>/epoch=<id>`` — the commit point
  3. if ``epoch=<id>`` already exists (failure replay), step 2 is a
     no-op: idempotent under at-least-once delivery, hence exactly-once
     effect.

Reader semantics: for update-mode keyed output, the row for a key in the
HIGHEST committed epoch wins (later epochs supersede earlier ones);
``read_current`` resolves that with one window. Per-epoch lineage
(row counts per Spark partition, watermark, wall time) is recorded under
``_lineage/``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _parquet_files(directory: str):
    import pyarrow.parquet as pq

    for name in os.listdir(directory):
        if name.endswith(".parquet"):
            yield pq.ParquetFile(os.path.join(directory, name))


class ExactlyOnceParquetSink:
    """lineage: 'partitions' (rows per Spark partition — one extra
    aggregate per epoch), 'rows' (row count only), or 'off' (no extra
    job — for latency-critical small epochs)."""

    def __init__(self, root: str, key_cols: list[str], lineage: str = "partitions"):
        self.root = root
        self.key_cols = list(key_cols)
        self.lineage_mode = lineage
        os.makedirs(os.path.join(root, "_staging"), exist_ok=True)
        os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)

    # -- write side ---------------------------------------------------------

    def epoch_dir(self, epoch_id: int) -> str:
        return os.path.join(self.root, f"epoch={epoch_id}")

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_compacted.json")

    def _manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def is_committed(self, epoch_id: int) -> bool:
        if os.path.isdir(self.epoch_dir(epoch_id)):
            return True
        # a compacted epoch's directory is gone but its commit must
        # survive: the replay contract (drop re-delivered epochs) is
        # what makes the sink exactly-once
        m = self._manifest()
        return m is not None and epoch_id in set(m["epochs"])

    def write_batch(self, df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body. Safe to call again with the same epoch_id."""
        if self.is_committed(epoch_id):
            return  # replay after failure: already committed, drop it
        staging = os.path.join(
            self.root, "_staging", f"epoch={epoch_id}.{uuid.uuid4().hex[:8]}"
        )
        part_counts = None
        if self.lineage_mode == "partitions":
            # per-partition lineage before the write (single pass,
            # cached). try/finally: a failed staging write must not
            # leak the cached blocks for the session lifetime (the
            # persist-leak class CLAUDE.md warns about)
            df = df.persist()
            try:
                part_counts = (
                    df.groupBy(F.spark_partition_id().alias("partition"))
                    .count()
                    .collect()
                )
                df.write.mode("overwrite").parquet(staging)
            finally:
                df.unpersist()
        else:
            df.write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, self.epoch_dir(epoch_id))  # atomic commit
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
            if self.is_committed(epoch_id):
                return  # concurrent/replayed commit won the rename
            # anything else (EACCES, EXDEV, ...) is DATA LOSS if
            # swallowed: the checkpoint would advance past an epoch that
            # was never committed
            raise
        if self.lineage_mode == "off":
            return
        lineage = {"epoch": epoch_id, "committed_at": time.time()}
        if part_counts is not None:
            lineage["rows"] = int(sum(r["count"] for r in part_counts))
            lineage["partitions"] = {
                str(r["partition"]): int(r["count"]) for r in part_counts
            }
        else:  # 'rows': cheap count from the committed parquet footers
            lineage["rows"] = int(
                sum(
                    pf.metadata.num_rows
                    for pf in _parquet_files(self.epoch_dir(epoch_id))
                )
            )
        with open(
            os.path.join(self.root, "_lineage", f"epoch={epoch_id}.json"), "w"
        ) as f:
            json.dump(lineage, f)

    def write_batch_local(self, pdf, epoch_id: int) -> None:
        """Driver-local exactly-once commit for TINY epochs: identical
        staging + atomic-rename protocol, but the parquet file is
        written in-process by pyarrow — zero Spark jobs. This is the
        single-row-update fast path (the reference's per-row epochs,
        ``src/main.rs:306-374``): a 1-row delta does not need a
        distributed write job, and the commit layout/readers are
        unchanged, so replay idempotence and read_current behave
        exactly as for Spark-written epochs.

        ``pdf`` is a pandas frame whose column order matches the
        Spark-written epochs. Timestamp columns must already be
        tz-aware UTC (Spark-written epochs store isAdjustedToUTC
        micros; a naive pandas column would read back TIMESTAMP_NTZ
        and break the cross-epoch schema merge).
        """
        if self.is_committed(epoch_id):
            return
        staging = os.path.join(
            self.root, "_staging", f"epoch={epoch_id}.{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(staging, exist_ok=True)
        pdf.to_parquet(
            os.path.join(staging, "part-00000.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        try:
            os.rename(staging, self.epoch_dir(epoch_id))  # atomic commit
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
            if self.is_committed(epoch_id):
                return  # see write_batch: only a won race may be dropped
            raise
        if self.lineage_mode == "off":
            return
        lineage = {
            "epoch": epoch_id,
            "committed_at": time.time(),
            "rows": int(len(pdf)),
            "local": True,
        }
        with open(
            os.path.join(self.root, "_lineage", f"epoch={epoch_id}.json"), "w"
        ) as f:
            json.dump(lineage, f)

    def foreach_batch(self):
        return lambda df, epoch_id: self.write_batch(df, epoch_id)

    # -- read side ------------------------------------------------------------

    def committed_epochs(self) -> list[int]:
        self._recover_compaction()
        dirs = {
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("epoch=")
        }
        m = self._manifest()
        if m is not None:
            dirs |= set(m["epochs"])
        return sorted(dirs)

    def _live_epoch_dirs(self) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("epoch=")
        )

    # -- compaction ----------------------------------------------------------

    def compact(self, spark: SparkSession, up_to: int | None = None) -> int | None:
        """Fold every committed epoch <= ``up_to`` (default: all) into
        ONE snapshot directory at the highest folded epoch, preserving
        read_current semantics exactly (the snapshot holds the winning
        row per key, including net-0 tombstones, so later epochs and
        key filters behave unchanged). After compaction, ``read_all``
        reports the folded history at the snapshot epoch — per-epoch
        history is intentionally discarded; ``_lineage/`` keeps the
        audit record.

        Crash-safe with the sink's own discipline: the snapshot is
        staged, then a manifest write is the atomic commit point
        (watermark + the full list of folded epoch ids + a pending
        marker), then the folded directories are dropped and the
        staging dir renamed into place. A crash anywhere in the last
        step is finished by ``_recover_compaction`` on the next read —
        and ``is_committed`` answers from the manifest, so replayed
        deliveries of folded epochs are still dropped (the exactly-once
        contract survives its own garbage collection).

        Returns the snapshot epoch, or None if there is nothing to fold.
        """
        self._recover_compaction()
        live = self._live_epoch_dirs()
        fold = [e for e in live if up_to is None or e <= up_to]
        if len(fold) < 2:
            return None
        target = max(fold)
        df = spark.read.option("basePath", self.root).parquet(
            *[self.epoch_dir(e) for e in fold]
        )
        order = [F.col("epoch").desc()]
        if "diff" in df.columns:
            order.append(F.col("diff").desc())
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        snap = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "epoch")
        )
        staging = os.path.join(
            self.root, "_staging", f"compact.{uuid.uuid4().hex[:8]}"
        )
        snap.write.mode("overwrite").parquet(staging)
        prev = self._manifest()
        epochs = sorted(set(fold) | (set(prev["epochs"]) if prev else set()))
        manifest = {
            "watermark": target,
            "epochs": epochs,
            "pending": {"staging": staging, "target": target, "drop": fold},
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, self._manifest_path())  # atomic commit point
        self._finish_compaction(manifest)
        return target

    def _recover_compaction(self) -> None:
        m = self._manifest()
        if m is not None and "pending" in m:
            self._finish_compaction(m)

    def vacuum_staging(self) -> int:
        """Remove orphaned ``_staging`` entries left by crashed writes
        (a write that died before its atomic rename leaves its staging
        dir forever — harmless for correctness, but they accumulate).
        Safe between writes in the sink's single-driver model: the only
        staging entry that may be live across calls is a pending
        compaction snapshot, which is preserved. Returns the number of
        entries removed."""
        m = self._manifest()
        keep = (
            {os.path.basename(m["pending"]["staging"])}
            if m is not None and "pending" in m
            else set()
        )
        sdir = os.path.join(self.root, "_staging")
        removed = 0
        for name in os.listdir(sdir):
            if name not in keep:
                shutil.rmtree(os.path.join(sdir, name), ignore_errors=True)
                removed += 1
        return removed

    def _finish_compaction(self, manifest: dict) -> None:
        p = manifest["pending"]
        if os.path.isdir(p["staging"]):
            for e in p["drop"]:
                shutil.rmtree(self.epoch_dir(e), ignore_errors=True)
            os.rename(p["staging"], self.epoch_dir(p["target"]))
        # staging already renamed (crash after the move): just clear
        done = {k: v for k, v in manifest.items() if k != "pending"}
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f)
        os.rename(tmp, self._manifest_path())

    def read_all(self, spark: SparkSession) -> DataFrame:
        """Every committed row, tagged with its epoch (compacted
        history appears folded at its snapshot epoch)."""
        self._recover_compaction()
        epochs = self._live_epoch_dirs()
        if not epochs:
            raise FileNotFoundError(f"no committed epochs under {self.root}")
        return (
            spark.read.option("basePath", self.root)
            .parquet(*[self.epoch_dir(e) for e in epochs])
        )

    def read_current(self, spark: SparkSession) -> DataFrame:
        """Latest value per key across committed epochs (upsert view).

        Ties WITHIN an epoch are broken by net multiplicity descending
        when the payload carries a ``diff`` column: a value-update epoch
        (retract old value + insert new) emits BOTH a net-0 tombstone
        row and a net-positive row for the same key in the same epoch,
        and the live row must deterministically win over the tombstone.
        """
        df = self.read_all(spark)
        order = [F.col("epoch").desc()]
        if "diff" in df.columns:
            order.append(F.col("diff").desc())
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "epoch")
        )

    def lineage(self) -> list[dict]:
        out = []
        ldir = os.path.join(self.root, "_lineage")
        # numeric epoch order (lexicographic puts epoch=10 before epoch=2)
        names = sorted(
            os.listdir(ldir),
            key=lambda n: int(n.split("=", 1)[1].split(".", 1)[0]),
        )
        for name in names:
            with open(os.path.join(ldir, name)) as f:
                out.append(json.load(f))
        return out
