"""Incremental fit+transform maintenance — the reference's core loop
(``pipeline_3_diabetes.rs:12-60``): a continuously-maintained statistic
(scaler meta) and a transform whose OUTPUTS are maintained under
updates. In DD, a changed statistic retracts and re-emits every
transformed row; rounding (``standard_scaler.rs:73-76``) suppresses
that cascade unless the statistic crosses a 10^n boundary.

Spark re-expression (driven per micro-batch from ``foreachBatch``):

  epoch k: append batch rows to the input snapshot (exactly-once sink)
           recompute (mean, var) over the consolidated snapshot —
             signed aggregate, retraction-correct, map-side combined
           round; compare with the previous epoch's rounded statistic
           changed   -> re-encode the WHOLE snapshot (the DD cascade)
           unchanged -> encode only this batch's rows with current meta

The parity invariant (tested): at every epoch, the output sink equals
a from-scratch batch fit_transform over the consolidated input prefix —
the reference's incremental-update trace oracle (FIXTURES.md F3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.collection import (
    DIFF,
    consolidate,
    with_diff,
)
from diffdataflowmlpipelines_spark.operators.encoders import standard_scale_expr
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink


def _rows_to_pdf(rows, schema):
    """Collected Rows -> pandas frame with parquet-stable dtypes.
    Timestamps are localized to UTC (the session tz is pinned UTC) so
    pyarrow writes isAdjustedToUTC micros, matching Spark-written
    epochs."""
    import pandas as pd

    pdf = pd.DataFrame({f.name: [r[f.name] for r in rows] for f in schema.fields})
    for f in schema.fields:
        t = f.dataType.simpleString()
        if t == "timestamp":
            pdf[f.name] = pd.to_datetime(pdf[f.name]).dt.tz_localize("UTC")
        elif t in ("bigint", "int"):
            # nullable pandas dtypes: a NULL int cell must not crash the
            # fast path (plain astype('int64') raises on None) and must
            # round-trip through parquet as a typed null like
            # Spark-written epochs do
            pdf[f.name] = pdf[f.name].astype("Int64" if t == "bigint" else "Int32")
        elif t == "double":
            pdf[f.name] = pdf[f.name].astype("float64")
        elif t == "float":
            pdf[f.name] = pdf[f.name].astype("float32")
        elif t == "string":
            # an empty/all-null object column would be INFERRED by
            # pyarrow (as double/null), writing a conflicting parquet
            # schema into the epoch directory — pin it
            pdf[f.name] = pdf[f.name].astype("string")
    return pdf


class IncrementalScalerPipeline:
    """StandardScaler fit+transform maintained across epochs.

    Rows are keyed by ``key_cols``; ``value_col`` is scaled by the
    reference formula (x - mean)/variance. ``round_to`` enables the
    reference's update suppression.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        key_cols: list[str],
        value_col: str,
        round_to: tuple[int, int] | None = None,
        small_epoch_rows: int = 64,
    ):
        self.spark = spark
        self.key_cols = list(key_cols)
        self.value_col = value_col
        self.round_to = round_to
        # epochs at or under this row count take the driver-local fast
        # path: ONE Spark job (the collect probe) + pyarrow commits,
        # instead of 3-4 distributed jobs. 0 disables.
        self.small_epoch_rows = small_epoch_rows
        # 'rows' lineage: row counts from parquet footers, no extra job
        self.input_sink = ExactlyOnceParquetSink(
            f"{workdir}/input", key_cols, lineage="rows"
        )
        self.output_sink = ExactlyOnceParquetSink(
            f"{workdir}/output", key_cols, lineage="rows"
        )
        self.last_meta: tuple | None = None
        self.full_reencodes = 0
        self.epochs = 0
        # running abelian statistic (n, sum, sumsq) — DD's incremental
        # aggregate: each epoch folds in the BATCH's partial sums, so a
        # single-row update costs O(batch), not O(snapshot)
        self._n, self._s1, self._s2 = 0, 0.0, 0.0
        # epochs whose partial sums THIS object has folded (restored
        # prefix counts as folded): distinguishes the two crash windows
        # on replay — before the fold (re-fold it) vs after (repair the
        # missing output only)
        self._folded_epochs: set[int] = set()
        self._restore_from_sink()

    def _restore_from_sink(self) -> None:
        """Driver-restart recovery: the running statistic lives in driver
        memory, so after a restart ``process_epoch`` would skip committed
        epochs without folding them. Rebuild (n, s1, s2) and last_meta
        from the committed input prefix (one aggregate job, once)."""
        self._folded_epochs = set(self.input_sink.committed_epochs())
        if not self.input_sink.committed_epochs():
            return
        x = F.col(self.value_col).cast("double")
        nd = F.when(x.isNotNull(), F.col(DIFF)).otherwise(F.lit(0))
        df = with_diff(self.input_sink.read_all(self.spark))
        row = df.agg(
            F.sum(nd).alias("n"),
            F.sum(x * F.col(DIFF)).alias("s1"),
            F.sum(x * x * F.col(DIFF)).alias("s2"),
        ).first()
        self._n = int(row["n"] or 0)
        self._s1 = float(row["s1"] or 0.0)
        self._s2 = float(row["s2"] or 0.0)
        self.epochs = len(self.input_sink.committed_epochs())
        self.last_meta = self._current_meta()

    def _current_meta(self) -> tuple:
        if self._n <= 0:
            return (float("nan"), float("nan"))
        mean = self._s1 / self._n
        var = self._s2 / self._n - mean * mean
        if self.round_to:
            f1, f2 = 10.0 ** self.round_to[0], 10.0 ** self.round_to[1]
            rnd = lambda v, f: (int(v / f + 0.5) if v >= 0 else -int(-v / f + 0.5)) * f  # noqa: E731
            mean, var = rnd(mean, f1), rnd(var, f2)
        return (mean, var)

    # -- statistic over the consolidated snapshot ---------------------------

    def _consolidated(self) -> DataFrame:
        """Net multiplicity per row INCLUDING net-zero rows (which
        ``consolidate`` drops but we keep — they tombstone the outputs
        of fully-retracted inputs)."""
        df = with_diff(self.input_sink.read_all(self.spark).drop("epoch"))
        return df.groupBy(*self.key_cols, self.value_col).agg(
            F.sum(DIFF).alias(DIFF)
        )

    def _snapshot(self) -> DataFrame:
        return self._consolidated().filter(F.col(DIFF) > 0)

    def _fold_batch(self, batch_df: DataFrame) -> tuple:
        """Fold the batch's signed partial sums into the running
        statistic and return the current (rounded) (mean, var). n counts
        OBSERVATIONS (null values excluded, SQL AVG semantics — F.sum
        skips them from s1/s2 regardless, so counting them in n would
        shrink the mean)."""
        x = F.col(self.value_col).cast("double")
        nd = F.when(x.isNotNull(), F.col(DIFF)).otherwise(F.lit(0))
        row = with_diff(batch_df).agg(
            F.sum(nd).alias("n"),
            F.sum(x * F.col(DIFF)).alias("s1"),
            F.sum(x * x * F.col(DIFF)).alias("s2"),
            F.min(F.col(DIFF)).alias("min_diff"),
        ).first()
        self._last_batch_insert_only = (row["min_diff"] or 1) > 0
        self._n += int(row["n"] or 0)
        self._s1 += float(row["s1"] or 0.0)
        self._s2 += float(row["s2"] or 0.0)
        return self._current_meta()

    def _encode(self, df: DataFrame, meta: tuple) -> DataFrame:
        """Pin the output projection to (key_cols, value_col, diff,
        scaled): the cascade paths encode _consolidated() (which has
        exactly these columns) while the insert-only paths encode the
        raw batch — without the select, output epochs would carry
        path-dependent extra columns (e.g. event_time) and
        read_current's schema would depend on which epoch's parquet
        footer Spark samples (review r4d)."""
        mean, var = meta
        return df.select(*self.key_cols, self.value_col, DIFF).withColumn(
            "scaled", standard_scale_expr(F.col(self.value_col), mean, var)
        )

    # -- small-epoch fast path --------------------------------------------------

    def _fold_pdf(self, pdf) -> tuple:
        """Driver-side twin of _fold_batch: fold the tiny batch's signed
        partial sums without a Spark job (same null-exclusion rule)."""
        if len(pdf) == 1:
            # scalar lane for the per-row-update hot path: the pandas
            # filter/astype/sum chain below costs ~3 ms per call, most
            # of the remaining gap to the reference's in-process number
            import pandas as pd

            d = int(pdf[DIFF].iloc[0])
            v = pdf[self.value_col].iloc[0]
            self._last_batch_insert_only = d > 0
            if not pd.isna(v):  # None/NaN/pd.NA are all non-observations
                x = float(v)
                self._n += d
                self._s1 += x * d
                self._s2 += x * x * d
            return self._current_meta()
        self._last_batch_insert_only = len(pdf) == 0 or int(pdf[DIFF].min()) > 0
        obs = pdf[pdf[self.value_col].notna()]
        x = obs[self.value_col].astype("float64")
        d = obs[DIFF].astype("float64")
        self._n += int(obs[DIFF].sum())
        self._s1 += float((x * d).sum())
        self._s2 += float((x * x * d).sum())
        return self._current_meta()

    def _encode_pdf(self, pdf, meta):
        """Driver-side twin of _encode over a consolidated tiny batch.
        Nullable Float64 arithmetic: a NULL value must encode to a
        parquet NULL like the distributed path (plain float64 would
        write NaN instead), while a COMPUTED NaN (zero-variance IEEE
        0/0, standard_scale_expr's x == mean case) must stay a NaN
        VALUE — Float64 arithmetic keeps it (mask stays False) but
        pd.array construction would collapse it to NULL, hence the
        FloatingArray in the scalar lane. Known twin-side edge: a NaN
        INPUT is indistinguishable from NULL here (_rows_to_pdf's
        float64 cast collapsed them), so it encodes to NULL where the
        distributed path would emit NaN."""
        import numpy as np
        import pandas as pd

        mean, var = meta
        cols = [*self.key_cols, self.value_col, DIFF]  # pinned, see _encode
        if len(pdf) == 1:
            # scalar lane (see the multi-column twin): one-row Float64
            # Series construction dominates the single-row re-encode
            v = pdf[self.value_col].iloc[0]
            out = pdf[cols].copy()
            if pd.isna(v):
                out["scaled"] = pd.array([None], dtype="Float64")
            else:
                with np.errstate(divide="ignore", invalid="ignore"):
                    rv = float(
                        (np.float64(v) - np.float64(mean)) / np.float64(var)
                    )
                out["scaled"] = pd.arrays.FloatingArray(
                    np.array([rv], dtype="float64"), np.array([False])
                )
            return out
        out = pdf[cols].copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            out["scaled"] = (out[self.value_col].astype("Float64") - mean) / var
        return out

    def _process_small_epoch(self, rows, schema, epoch_id: int) -> None:
        """The reference's per-row-update shape (``src/main.rs:306-374``:
        single-row epochs at 1.45 ms in-process). A tiny delta needs no
        distributed jobs: input commit, statistic fold, consolidation,
        and (when the rounded statistic is unchanged) the output commit
        all happen driver-side — the exactly-once layout is identical.
        Only a statistic CHANGE (the DD cascade, O(snapshot) by design)
        or a retraction-bearing batch (needs key history) goes
        distributed."""
        self._process_small_epoch_pdf(_rows_to_pdf(rows, schema), epoch_id)

    def process_epoch_local(self, pdf, epoch_id: int) -> None:
        """Driver-local ingestion for callers that already hold the
        delta in-process as pandas (the reference's per-row shape) —
        skips ``process_epoch``'s size probe (``limit(n).collect()``),
        whose job launch alone costs ~30 ms on local[32] and dominates
        the single-row latency. Exactly-once layout, replay, and
        crash-window repair are identical to ``process_epoch``. The pdf
        must carry parquet-stable dtypes (what ``_rows_to_pdf`` pins);
        deltas larger than ``small_epoch_rows`` are routed through the
        distributed path via ``createDataFrame``."""
        if self.input_sink.is_committed(epoch_id):
            if epoch_id not in self._folded_epochs:
                self._replay_unfolded(epoch_id)
            elif not self.output_sink.is_committed(epoch_id):
                self._repair_output(epoch_id)
            else:
                # both committed: the only same-process replay that
                # lands here with stale driver state is a crash between
                # the output rename and the last_meta assignment (e.g.
                # the lineage write threw). Post-fold, last_meta ==
                # _current_meta() invariantly, so restore it — else the
                # NEXT epoch's fast path could encode new rows with a
                # meta older than the committed snapshot (review r4d).
                self.last_meta = self._current_meta()
            return  # replay: input (and now output) committed
        if self.small_epoch_rows and len(pdf) <= self.small_epoch_rows:
            self._process_small_epoch_pdf(pdf.copy(), epoch_id)
            return
        self.process_epoch(self.spark.createDataFrame(pdf), epoch_id)

    def _process_small_epoch_pdf(self, pdf, epoch_id: int) -> None:
        if DIFF not in pdf.columns:
            pdf[DIFF] = 1
        pdf[DIFF] = pdf[DIFF].astype("int64")
        self.input_sink.write_batch_local(pdf, epoch_id)
        self.epochs += 1
        meta = self._fold_pdf(pdf)
        self._folded_epochs.add(epoch_id)
        insert_only = self._last_batch_insert_only
        if meta != self.last_meta:
            out = self._encode(self._consolidated(), meta)
            self.output_sink.write_batch(out, epoch_id)
            self.full_reencodes += 1
        elif insert_only:
            if len(pdf) == 1:
                # a single insert row IS its own net (no group to merge)
                net = pdf
            else:
                cols = [*self.key_cols, self.value_col]  # pinned grain
                # dropna=False: Spark's groupBy keeps null keys; pandas'
                # default silently drops the whole null-bearing row
                net = pdf.groupby(cols, as_index=False, sort=False, dropna=False)[
                    DIFF
                ].sum()
                net = net[net[DIFF] != 0]
            self.output_sink.write_batch_local(self._encode_pdf(net, meta), epoch_id)
        else:
            batch_keys = self.spark.createDataFrame(
                pdf[self.key_cols].drop_duplicates()
            )
            affected = self._consolidated().join(
                batch_keys, on=self.key_cols, how="left_semi"
            )
            self.output_sink.write_batch(self._encode(affected, meta), epoch_id)
        self.last_meta = meta

    def _replay_unfolded(self, epoch_id: int) -> None:
        """Same-process crash window BEFORE the statistic fold: the
        input epoch committed but this object's statistic never saw it
        (a restart would re-fold it via _restore_from_sink, but a
        replay on the same long-lived object must fold it here — the
        old repair path assumed the fold had happened and silently
        corrupted every later statistic)."""
        ep = with_diff(
            self.spark.read.parquet(self.input_sink.epoch_dir(epoch_id))
        ).persist()
        try:
            meta = self._fold_batch(ep)
            self._folded_epochs.add(epoch_id)
            self.epochs = len(self.input_sink.committed_epochs())
            insert_only = self._last_batch_insert_only
            if meta != self.last_meta:
                out = self._encode(self._consolidated(), meta)
                self.full_reencodes += 1
            elif insert_only:
                out = self._encode(
                    consolidate(ep, [*self.key_cols, self.value_col]), meta
                )
            else:
                keys = ep.select(*self.key_cols).dropDuplicates()
                out = self._encode(
                    self._consolidated().join(keys, on=self.key_cols, how="left_semi"),
                    meta,
                )
            self.output_sink.write_batch(out, epoch_id)
            self.last_meta = meta
        finally:
            ep.unpersist()

    def _repair_output(self, epoch_id: int) -> None:
        """Crash-window repair: the input epoch committed AND was folded
        into the statistic, but the output didn't commit. Cascade-vs-
        affected is re-decided by recomputing the PRE-epoch meta from
        the input history EXCLUDING this epoch — an exact recomputation,
        not a float subtraction (a-b+b != a can misclassify the branch
        when round_to is None)."""
        ep = with_diff(self.spark.read.parquet(self.input_sink.epoch_dir(epoch_id)))
        x = F.col(self.value_col).cast("double")
        nd = F.when(x.isNotNull(), F.col(DIFF)).otherwise(F.lit(0))
        base = with_diff(
            self.input_sink.read_all(self.spark)
            .filter(F.col("epoch") != epoch_id)
            .drop("epoch")
        )
        row = base.agg(
            F.sum(nd).alias("n"),
            F.sum(x * F.col(DIFF)).alias("s1"),
            F.sum(x * x * F.col(DIFF)).alias("s2"),
        ).first()
        saved = (self._n, self._s1, self._s2)
        self._n = int(row["n"] or 0)
        self._s1 = float(row["s1"] or 0.0)
        self._s2 = float(row["s2"] or 0.0)
        meta_before = self._current_meta()
        self._n, self._s1, self._s2 = saved
        meta = self._current_meta()
        if meta != meta_before:
            out = self._encode(self._consolidated(), meta)
            self.full_reencodes += 1
        else:  # affected-keys re-encode is correct for any batch shape
            keys = ep.select(*self.key_cols).dropDuplicates()
            affected = self._consolidated().join(
                keys, on=self.key_cols, how="left_semi"
            )
            out = self._encode(affected, meta)
        self.output_sink.write_batch(out, epoch_id)
        # the crash skipped the post-output assignment: a stale last_meta
        # would let the NEXT epoch encode new rows with a different meta
        # than the rows just emitted
        self.last_meta = meta

    # -- foreachBatch body ----------------------------------------------------

    def process_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.input_sink.is_committed(epoch_id):
            if epoch_id not in self._folded_epochs:
                self._replay_unfolded(epoch_id)
            elif not self.output_sink.is_committed(epoch_id):
                self._repair_output(epoch_id)
            else:
                # both committed: the only same-process replay that
                # lands here with stale driver state is a crash between
                # the output rename and the last_meta assignment (e.g.
                # the lineage write threw). Post-fold, last_meta ==
                # _current_meta() invariantly, so restore it — else the
                # NEXT epoch's fast path could encode new rows with a
                # meta older than the committed snapshot (review r4d).
                self.last_meta = self._current_meta()
            return  # replay: input (and now output) committed
        if self.small_epoch_rows:
            rows = batch_df.limit(self.small_epoch_rows + 1).collect()
            if len(rows) <= self.small_epoch_rows:
                self._process_small_epoch(rows, batch_df.schema, epoch_id)
                return
        batch_df = with_diff(batch_df).persist()
        try:
            self.input_sink.write_batch(batch_df, epoch_id)
            self.epochs += 1

            meta = self._fold_batch(batch_df)  # O(batch), one aggregate job
            self._folded_epochs.add(epoch_id)
            insert_only = self._last_batch_insert_only
            if meta != self.last_meta:
                # DD cascade: statistic changed -> every live output row is
                # re-emitted; dead keys get their <=0 net rows as tombstones
                # (the upsert view drops them). O(snapshot) — by design, as
                # in the reference's full re-transform on meta change.
                if insert_only and self.input_sink.committed_epochs() == [epoch_id]:
                    # first-ever epoch: the snapshot IS this batch — encode
                    # from the in-memory cache instead of re-scanning the
                    # parquet snapshot (saves a full input re-read at init,
                    # the reference's dominant init phase)
                    net = consolidate(batch_df, [*self.key_cols, self.value_col])
                else:
                    net = self._consolidated()
                out = self._encode(net, meta)
                self.full_reencodes += 1
            elif insert_only:
                # fast path: inserts of (key, value) rows only touch their
                # own keys; their net state is the batch itself. O(batch).
                out = self._encode(
                    consolidate(batch_df, [*self.key_cols, self.value_col]), meta
                )
            else:
                # retraction-bearing batch with unchanged statistic: the
                # touched keys' net state needs the history. O(snapshot).
                batch_keys = batch_df.select(*self.key_cols).dropDuplicates()
                affected = self._consolidated().join(
                    batch_keys, on=self.key_cols, how="left_semi"
                )
                out = self._encode(affected, meta)
            self.output_sink.write_batch(out, epoch_id)
            self.last_meta = meta
        finally:
            batch_df.unpersist()

    def foreach_batch(self):
        return lambda df, eid: self.process_epoch(df, eid)

    def current_output(self) -> DataFrame:
        """Live outputs: latest row per key, tombstones dropped."""
        cur = self.output_sink.read_current(self.spark)
        return cur.filter(F.col(DIFF) > 0).drop(DIFF)


class IncrementalMultiScalerPipeline:
    """k StandardScalers maintained per-epoch with columnar assembly —
    the reference's headline experiment (``pipeline_3_diabetes.rs:12-60``:
    21 scalers with rounding (−2, −1) over the diabetes table, init at
    99.99% then per-row update epochs; paper Figure 3).

    Architectural differences from the reference, both deliberate:

    - the reference maintains one dataflow per encoder and assembles the
      feature vector through a left-deep chain of k−1 row-id joins (its
      paper names that chain the end-to-end bottleneck). Here ALL k
      statistics fold in ONE aggregate job per epoch (3k+1 signed partial
      sums in a single pass) and assembly is one ``F.array`` projection —
      zero joins at any k.
    - re-encode granularity is the row: if ANY column's rounded (mean,
      var) moved, the assembled feature row changes, so the snapshot is
      re-encoded once (the reference re-emits per changed column; same
      output, k× less bookkeeping). With the reference's rounding config
      almost all single-row epochs leave every rounded statistic
      unchanged -> O(batch) work, which is the experiment's point.

    Parity invariant (tested): at every epoch the output sink equals a
    from-scratch batch MultiColumnEncoder of StandardScalers over the
    consolidated input prefix.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        key_cols: list[str],
        value_cols: list[str],
        round_to: tuple[int, int] | None = None,
        small_epoch_rows: int = 64,
    ):
        self.spark = spark
        self.key_cols = list(key_cols)
        self.value_cols = list(value_cols)
        self.round_to = round_to
        self.small_epoch_rows = small_epoch_rows
        self.input_sink = ExactlyOnceParquetSink(
            f"{workdir}/input", key_cols, lineage="rows"
        )
        self.output_sink = ExactlyOnceParquetSink(
            f"{workdir}/output", key_cols, lineage="rows"
        )
        self.last_meta: tuple | None = None
        self.full_reencodes = 0
        self.epochs = 0
        k = len(self.value_cols)
        self._n = [0] * k  # per-column observation counts
        self._s1 = [0.0] * k
        self._s2 = [0.0] * k
        self._folded_epochs: set[int] = set()  # see single-column twin
        self._restore_from_sink()

    # -- statistics -----------------------------------------------------------

    def _sum_exprs(self):
        # per-column observation counts (null values excluded — SQL AVG
        # semantics; a single shared n would shrink the mean of any
        # column with nulls, since F.sum skips them from s1/s2)
        exprs = [F.min(F.col(DIFF)).alias("min_diff")]
        for i, c in enumerate(self.value_cols):
            x = F.col(c).cast("double")
            nd = F.when(x.isNotNull(), F.col(DIFF)).otherwise(F.lit(0))
            exprs.append(F.sum(nd).alias(f"n_{i}"))
            exprs.append(F.sum(x * F.col(DIFF)).alias(f"s1_{i}"))
            exprs.append(F.sum(x * x * F.col(DIFF)).alias(f"s2_{i}"))
        return exprs

    def _current_meta(self) -> tuple:
        metas = []
        for i in range(len(self.value_cols)):
            if self._n[i] <= 0:
                metas.append((float("nan"), float("nan")))
                continue
            mean = self._s1[i] / self._n[i]
            var = self._s2[i] / self._n[i] - mean * mean
            if self.round_to:
                f1, f2 = 10.0 ** self.round_to[0], 10.0 ** self.round_to[1]
                rnd = lambda v, f: (int(v / f + 0.5) if v >= 0 else -int(-v / f + 0.5)) * f  # noqa: E731
                mean, var = rnd(mean, f1), rnd(var, f2)
            metas.append((mean, var))
        return tuple(metas)

    def _restore_from_sink(self) -> None:
        self._folded_epochs = set(self.input_sink.committed_epochs())
        if not self.input_sink.committed_epochs():
            return
        df = with_diff(self.input_sink.read_all(self.spark))
        row = df.agg(*self._sum_exprs()).first()
        for i in range(len(self.value_cols)):
            self._n[i] = int(row[f"n_{i}"] or 0)
            self._s1[i] = float(row[f"s1_{i}"] or 0.0)
            self._s2[i] = float(row[f"s2_{i}"] or 0.0)
        self.epochs = len(self.input_sink.committed_epochs())
        self.last_meta = self._current_meta()

    def _fold_batch(self, batch_df: DataFrame) -> tuple:
        """ONE aggregate job folds all k columns' signed partial sums."""
        row = with_diff(batch_df).agg(*self._sum_exprs()).first()
        self._last_batch_insert_only = (row["min_diff"] or 1) > 0
        for i in range(len(self.value_cols)):
            self._n[i] += int(row[f"n_{i}"] or 0)
            self._s1[i] += float(row[f"s1_{i}"] or 0.0)
            self._s2[i] += float(row[f"s2_{i}"] or 0.0)
        return self._current_meta()

    # -- encode: columnar assembly, zero joins ---------------------------------

    def _encode(self, df: DataFrame, meta: tuple) -> DataFrame:
        feats = F.array(
            *[
                standard_scale_expr(F.col(c), m, v)
                for c, (m, v) in zip(self.value_cols, meta)
            ]
        )
        return df.withColumn("features", feats)

    # -- foreachBatch body ------------------------------------------------------

    def _consolidated(self) -> DataFrame:
        df = with_diff(self.input_sink.read_all(self.spark).drop("epoch"))
        return df.groupBy(*self.key_cols, *self.value_cols).agg(
            F.sum(DIFF).alias(DIFF)
        )

    def _fold_pdf(self, pdf) -> tuple:
        """Driver-side twin of _fold_batch: all k columns' signed partial
        sums folded without a Spark job."""
        if len(pdf) == 1:
            # scalar lane (see single-column twin): the per-column
            # filter/astype/sum chain costs ~2 ms x k columns per call
            import pandas as pd

            row = pdf.iloc[0]
            d = int(row[DIFF])
            self._last_batch_insert_only = d > 0
            for i, c in enumerate(self.value_cols):
                v = row[c]
                if not pd.isna(v):
                    x = float(v)
                    self._n[i] += d
                    self._s1[i] += x * d
                    self._s2[i] += x * x * d
            return self._current_meta()
        self._last_batch_insert_only = len(pdf) == 0 or int(pdf[DIFF].min()) > 0
        for i, c in enumerate(self.value_cols):
            obs = pdf[pdf[c].notna()]
            x = obs[c].astype("float64")
            d = obs[DIFF].astype("float64")
            self._n[i] += int(obs[DIFF].sum())
            self._s1[i] += float((x * d).sum())
            self._s2[i] += float((x * x * d).sum())
        return self._current_meta()

    @staticmethod
    def _feature_series(lists, index):
        """list-of-lists -> arrow-backed pandas column that PRESERVES the
        IEEE NaN elements through to_parquet: the default pandas->arrow
        conversion of an object list column runs with from_pandas
        semantics, silently collapsing every NaN ELEMENT to NULL (found
        by the zero-variance regression test — the distributed F.array
        epochs carried NaN where the driver-local epochs carried NULL)."""
        import pandas as pd
        import pyarrow as pa

        arr = pa.array(lists, type=pa.list_(pa.float64()), from_pandas=False)
        return pd.Series(pd.arrays.ArrowExtensionArray(arr), index=index)

    def _encode_pdf(self, pdf, meta):
        """See the single-column twin. A NULL value yields a NULL array
        element (the distributed F.array does the same); float(row[c])
        would crash on None now that the fast-path consolidation keeps
        null-bearing rows."""
        import numpy as np
        import pandas as pd

        if len(pdf) == 1:
            # scalar lane (the single-row-update hot path): the k-column
            # Float64-Series chain below costs ~0.3 ms x k per call —
            # ~6 ms of the 21-column fold-only lane. numpy scalar
            # division mirrors the Series semantics on zero variance
            # (inf / nan, never ZeroDivisionError). A computed NaN (IEEE
            # 0/0 at x == mean) stays a NaN ELEMENT like the distributed
            # F.array of standard_scale_expr; only NULL inputs map to a
            # NULL element (see the single-column twin's docstring).
            row = pdf.iloc[0]
            feats = []
            with np.errstate(divide="ignore", invalid="ignore"):
                for c, (m, v) in zip(self.value_cols, meta):
                    if pd.isna(row[c]):
                        feats.append(None)
                        continue
                    feats.append(
                        float((np.float64(row[c]) - np.float64(m)) / np.float64(v))
                    )
            out = pdf.copy()
            out["features"] = self._feature_series([feats], out.index)
            return out

        out = pdf.copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled_cols = [
                (out[c].astype("Float64") - m) / v
                for c, (m, v) in zip(self.value_cols, meta)
            ]
        if scaled_cols:
            # values + mask extraction: Float64 keeps a computed NaN as a
            # value (isna False), so NULL elements come from the MASK
            # only — tolist()+pd.isna would collapse IEEE NaN to NULL
            vals = [s.to_numpy(dtype="float64", na_value=np.nan) for s in scaled_cols]
            masks = [s.isna().to_numpy() for s in scaled_cols]
            k = len(scaled_cols)
            out["features"] = self._feature_series(
                [
                    [None if masks[j][i] else float(vals[j][i]) for j in range(k)]
                    for i in range(len(out))
                ],
                out.index,
            )
        else:
            out["features"] = self._feature_series(
                [[] for _ in range(len(out))], out.index
            )
        return out

    def _process_small_epoch(self, rows, schema, epoch_id: int) -> None:
        """Single-row-update fast path — see the single-column twin."""
        self._process_small_epoch_pdf(_rows_to_pdf(rows, schema), epoch_id)

    def process_epoch_local(self, pdf, epoch_id: int) -> None:
        """Driver-local ingestion — see the single-column twin's
        docstring (same contract: exactly-once layout, replay/repair,
        large deltas routed distributed; skips the ~30 ms size-probe
        job)."""
        if self.input_sink.is_committed(epoch_id):
            if epoch_id not in self._folded_epochs:
                self._replay_unfolded(epoch_id)
            elif not self.output_sink.is_committed(epoch_id):
                self._repair_output(epoch_id)
            else:
                # both committed: the only same-process replay that
                # lands here with stale driver state is a crash between
                # the output rename and the last_meta assignment (e.g.
                # the lineage write threw). Post-fold, last_meta ==
                # _current_meta() invariantly, so restore it — else the
                # NEXT epoch's fast path could encode new rows with a
                # meta older than the committed snapshot (review r4d).
                self.last_meta = self._current_meta()
            return  # replay: input (and now output) committed
        if self.small_epoch_rows and len(pdf) <= self.small_epoch_rows:
            self._process_small_epoch_pdf(pdf.copy(), epoch_id)
            return
        self.process_epoch(self.spark.createDataFrame(pdf), epoch_id)

    def _process_small_epoch_pdf(self, pdf, epoch_id: int) -> None:
        if DIFF not in pdf.columns:
            pdf[DIFF] = 1
        pdf[DIFF] = pdf[DIFF].astype("int64")
        self.input_sink.write_batch_local(pdf, epoch_id)
        self.epochs += 1
        meta = self._fold_pdf(pdf)
        self._folded_epochs.add(epoch_id)
        insert_only = self._last_batch_insert_only
        if meta != self.last_meta:
            out = self._encode(self._consolidated(), meta)
            self.output_sink.write_batch(out, epoch_id)
            self.full_reencodes += 1
        elif insert_only:
            if len(pdf) == 1:
                # a single insert row IS its own net (see single twin)
                net = pdf
            else:
                cols = [*self.key_cols, *self.value_cols]  # pinned grain
                # dropna=False: see single-column twin
                net = pdf.groupby(cols, as_index=False, sort=False, dropna=False)[
                    DIFF
                ].sum()
                net = net[net[DIFF] != 0]
            self.output_sink.write_batch_local(self._encode_pdf(net, meta), epoch_id)
        else:
            batch_keys = self.spark.createDataFrame(
                pdf[self.key_cols].drop_duplicates()
            )
            affected = self._consolidated().join(
                batch_keys, on=self.key_cols, how="left_semi"
            )
            self.output_sink.write_batch(self._encode(affected, meta), epoch_id)
        self.last_meta = meta

    def _replay_unfolded(self, epoch_id: int) -> None:
        """See the single-column twin: same-process replay of an epoch
        whose input committed before the statistic fold ran."""
        ep = with_diff(
            self.spark.read.parquet(self.input_sink.epoch_dir(epoch_id))
        ).persist()
        try:
            meta = self._fold_batch(ep)
            self._folded_epochs.add(epoch_id)
            self.epochs = len(self.input_sink.committed_epochs())
            insert_only = self._last_batch_insert_only
            if meta != self.last_meta:
                out = self._encode(self._consolidated(), meta)
                self.full_reencodes += 1
            elif insert_only:
                out = self._encode(
                    consolidate(ep, [*self.key_cols, *self.value_cols]), meta
                )
            else:
                keys = ep.select(*self.key_cols).dropDuplicates()
                out = self._encode(
                    self._consolidated().join(keys, on=self.key_cols, how="left_semi"),
                    meta,
                )
            self.output_sink.write_batch(out, epoch_id)
            self.last_meta = meta
        finally:
            ep.unpersist()

    def _repair_output(self, epoch_id: int) -> None:
        """See the single-column twin: input committed AND folded, output
        missing; pre-epoch meta recomputed exactly from the input
        history excluding this epoch (no float subtraction)."""
        ep = with_diff(self.spark.read.parquet(self.input_sink.epoch_dir(epoch_id)))
        base = with_diff(
            self.input_sink.read_all(self.spark)
            .filter(F.col("epoch") != epoch_id)
            .drop("epoch")
        )
        row = base.agg(*self._sum_exprs()).first()
        saved = (list(self._n), list(self._s1), list(self._s2))
        for i in range(len(self.value_cols)):
            self._n[i] = int(row[f"n_{i}"] or 0)
            self._s1[i] = float(row[f"s1_{i}"] or 0.0)
            self._s2[i] = float(row[f"s2_{i}"] or 0.0)
        meta_before = self._current_meta()
        self._n, self._s1, self._s2 = saved[0], saved[1], saved[2]
        meta = self._current_meta()
        if meta != meta_before:
            out = self._encode(self._consolidated(), meta)
            self.full_reencodes += 1
        else:
            keys = ep.select(*self.key_cols).dropDuplicates()
            affected = self._consolidated().join(
                keys, on=self.key_cols, how="left_semi"
            )
            out = self._encode(affected, meta)
        self.output_sink.write_batch(out, epoch_id)
        self.last_meta = meta

    def process_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.input_sink.is_committed(epoch_id):
            if epoch_id not in self._folded_epochs:
                self._replay_unfolded(epoch_id)
            elif not self.output_sink.is_committed(epoch_id):
                self._repair_output(epoch_id)
            else:
                # both committed: the only same-process replay that
                # lands here with stale driver state is a crash between
                # the output rename and the last_meta assignment (e.g.
                # the lineage write threw). Post-fold, last_meta ==
                # _current_meta() invariantly, so restore it — else the
                # NEXT epoch's fast path could encode new rows with a
                # meta older than the committed snapshot (review r4d).
                self.last_meta = self._current_meta()
            return  # replay: input (and now output) committed
        if self.small_epoch_rows:
            rows = batch_df.limit(self.small_epoch_rows + 1).collect()
            if len(rows) <= self.small_epoch_rows:
                self._process_small_epoch(rows, batch_df.schema, epoch_id)
                return
        batch_df = with_diff(batch_df).persist()
        try:
            self.input_sink.write_batch(batch_df, epoch_id)
            self.epochs += 1

            meta = self._fold_batch(batch_df)
            self._folded_epochs.add(epoch_id)
            insert_only = self._last_batch_insert_only
            if meta != self.last_meta:
                if insert_only and self.input_sink.committed_epochs() == [epoch_id]:
                    # first-ever epoch: snapshot == batch (see single-column twin)
                    net = consolidate(
                        batch_df, [*self.key_cols, *self.value_cols]
                    )
                else:
                    net = self._consolidated()
                out = self._encode(net, meta)
                self.full_reencodes += 1
            elif insert_only:
                out = self._encode(
                    consolidate(batch_df, [*self.key_cols, *self.value_cols]), meta
                )
            else:
                batch_keys = batch_df.select(*self.key_cols).dropDuplicates()
                affected = self._consolidated().join(
                    batch_keys, on=self.key_cols, how="left_semi"
                )
                out = self._encode(affected, meta)
            self.output_sink.write_batch(out, epoch_id)
            self.last_meta = meta
        finally:
            batch_df.unpersist()

    def foreach_batch(self):
        return lambda df, eid: self.process_epoch(df, eid)

    def current_output(self) -> DataFrame:
        cur = self.output_sink.read_current(self.spark)
        return cur.filter(F.col(DIFF) > 0).drop(DIFF)
