"""Row-wise MinHash (zero-shuffle projection) parity with the
explode+groupBy form, and streaming near-dup candidate detection parity
with the batch recompute."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.functions.dedup import (
    minhash_signatures,
    minhash_signatures_rowwise,
)
from diffdataflowmlpipelines_spark.functions.text import tokenize
from diffdataflowmlpipelines_spark.streaming.dedup import (
    streaming_near_dup_candidates,
)
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource

T0 = datetime(2024, 1, 1)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType(), False), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)


def test_rowwise_signature_bit_identical(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("toks", tokenize("text"))
    )
    a = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(
            docs, "doc_id", "toks", n_hashes=8, shingle_n=3
        ).collect()
    }
    b = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures_rowwise(
            docs, "doc_id", "toks", n_hashes=8, shingle_n=3
        ).collect()
    }
    assert a == b


def _doc_rows():
    base = [
        ("d0", ["the", "quick", "brown", "fox", "jumps", "over", "dogs"], 0),
        # d1 = exact dup of d0, arrives 5s later (all bands collide)
        ("d1", ["the", "quick", "brown", "fox", "jumps", "over", "dogs"], 5),
        ("d2", ["completely", "different", "text", "about", "spark", "joins"], 8),
        # d3 = exact dup of d2, arrives within tolerance
        ("d3", ["completely", "different", "text", "about", "spark", "joins"], 12),
        # d4 = exact dup of d0 but arrives FAR outside the 30s tolerance
        ("d4", ["the", "quick", "brown", "fox", "jumps", "over", "dogs"], 300),
        ("d5", ["yet", "another", "unrelated", "document", "entirely", "here"], 302),
        # d6 = near-dup of d5 (last token changed) — candidate or not per
        # the banding; the streaming/batch parity assertion covers it
        ("d6", ["yet", "another", "unrelated", "document", "entirely", "now"], 305),
    ]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in base],
            "tokens": [r[1] for r in base],
            "event_time": [T0 + timedelta(seconds=r[2]) for r in base],
        }
    )


def test_streaming_near_dup_candidates_parity(spark, tmp_path):
    pdf = _doc_rows()
    src = EpochFileSource(spark, str(tmp_path / "src"), DOC_SCHEMA)
    src.add_epoch(pdf.iloc[:4])
    src.add_epoch(pdf.iloc[4:])

    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["a", "b"])
    q = (
        streaming_near_dup_candidates(
            src.stream(), n_hashes=8, bands=4, tolerance_s=30
        )
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["a"], r["b"]) for r in sink.read_all(spark).collect()
    }
    batch = spark.createDataFrame(pdf, DOC_SCHEMA)
    want = {
        (r["a"], r["b"])
        for r in streaming_near_dup_candidates(
            batch, n_hashes=8, bands=4, tolerance_s=30, streaming=False
        ).collect()
    }
    assert got == want
    # planted semantics: exact dups inside tolerance found; far-away
    # exact dup (d0, d4) correctly NOT matched (outside the window)
    assert ("d2", "d3") in got
    assert ("d0", "d1") in got
    assert ("d0", "d4") not in got and ("d1", "d4") not in got


def test_streaming_signatures_is_rowwise_parity(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import (
        minhash_signatures_rowwise,
    )
    from diffdataflowmlpipelines_spark.streaming.dedup import streaming_signatures

    df = spark.createDataFrame(
        [(0, ["a", "b", "c", "d"]), (1, ["b", "c", "d", "e"])],
        "doc_id long, tokens array<string>",
    )
    # NB: defaults differ (streaming n_hashes=8, matching
    # streaming_near_dup_candidates; batch rowwise defaults to 16) —
    # pin explicitly
    got = streaming_signatures(df, n_hashes=8).collect()
    want = minhash_signatures_rowwise(df, "doc_id", "tokens", n_hashes=8).collect()
    assert sorted(map(str, got)) == sorted(map(str, want))


def _run_semantic_stream(spark, tmp_path, pdf, n_epochs, tag, **kw):
    from diffdataflowmlpipelines_spark.streaming.dedup import (
        streaming_semantic_dedup,
    )
    from diffdataflowmlpipelines_spark.streaming.sink import (
        ExactlyOnceParquetSink,
    )
    from diffdataflowmlpipelines_spark.streaming.sources import (
        write_epoch_files,
    )

    src = str(tmp_path / f"src_{tag}")
    write_epoch_files(pdf, src, n_epochs, sort_col=None)  # keep given order
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / f"out_{tag}"), ["vec_id"])
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_semantic_dedup(stream, cents, threshold=0.9, **kw)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in sink.read_current(spark).collect()
    }


def test_streaming_semantic_dedup_parity_chain_free(spark, tmp_path):
    import pandas as pd

    from diffdataflowmlpipelines_spark.functions.similarity import semantic_dedup

    # chain-free planted cells (near-copies are mutually similar), ids
    # delivered in ascending order across epochs -> online greedy must
    # equal the batch lower-id-wins rule exactly
    rows = [
        (10, [1.0, 0.05, 0.0, 0.0]),
        (11, [1.0, 0.06, 0.0, 0.0]),
        (12, [0.7, 0.3, 0.6, 0.0]),
        (20, [0.05, 1.0, 0.0, 0.0]),
        (21, [0.06, 1.0, 0.0, 0.0]),
        (30, [0.74, 0.67, 0.0, 0.0]),
        (31, [0.67, 0.74, 0.0, 0.0]),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    got = _run_semantic_stream(spark, tmp_path, pdf, 3, "parity")

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            df, "vec_id", "embedding", threshold=0.9, centroids=cents
        ).collect()
    }
    assert got == want
    assert got[11] == (0, 0) and got[21] == (1, 0)  # dups really dropped


def test_streaming_semantic_dedup_chain_keeps_far_end(spark, tmp_path):
    import math

    import pandas as pd

    # a-b-c chain in ONE cell: cos(a,b) and cos(b,c) clear 0.9 but
    # cos(a,c) does not. Batch drops b AND c (any lower id matches);
    # online drops b only (c is compared against kept reps {a}) — the
    # online-greedy epsilon-net semantics, pinned here.
    def unit(deg):
        t = math.radians(deg)
        return [math.cos(t), math.sin(t), 0.0, 0.0]

    # true plane angles: cos(20deg)=0.94 >= 0.9 for both adjacent
    # pairs, cos(40deg)=0.77 < 0.9 for the far pair
    a, b, c = unit(0.0), unit(20.0), unit(40.0)
    rows = [(1, a), (2, b), (3, c)]
    # sanity on the planted geometry
    def cos(u, v):
        du = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return du / (nu * nv)

    assert cos(a, b) >= 0.9 and cos(b, c) >= 0.9 and cos(a, c) < 0.9

    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    got = _run_semantic_stream(spark, tmp_path, pdf, 1, "chain")
    assert got[1][1] == 1 and got[2][1] == 0 and got[3][1] == 1

    from diffdataflowmlpipelines_spark.functions.similarity import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    batch = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", threshold=0.9, centroids=cents
        ).collect()
    }
    assert batch == {1: 1, 2: 0, 3: 0}  # the documented divergence


def test_streaming_semantic_dedup_replay_idempotent(spark, tmp_path):
    import pandas as pd

    # second epoch re-delivers every row of the first (at-least-once):
    # verdicts must be reproduced from surviving state alone
    rows = [
        (10, [1.0, 0.05, 0.0, 0.0]),
        (11, [1.0, 0.06, 0.0, 0.0]),
        (20, [0.05, 1.0, 0.0, 0.0]),
    ]
    pdf = pd.DataFrame(rows + rows, columns=["vec_id", "embedding"])
    got = _run_semantic_stream(spark, tmp_path, pdf, 2, "replay")
    assert got == {10: (0, 1), 11: (0, 0), 20: (1, 1)}


def test_streaming_semantic_dedup_resumes_from_checkpoint(spark, tmp_path):
    """The representative state must round-trip through the state store
    across SEPARATE query runs: a second availableNow run on the same
    checkpoint sees run 1's representatives, so a near-copy of a run-1
    keeper arriving in run 2 is dropped."""
    import pandas as pd

    from diffdataflowmlpipelines_spark.streaming.dedup import (
        streaming_semantic_dedup,
    )
    from diffdataflowmlpipelines_spark.streaming.sink import (
        ExactlyOnceParquetSink,
    )
    from diffdataflowmlpipelines_spark.streaming.sources import (
        write_epoch_files,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    src = str(tmp_path / "src")
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["vec_id"])
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_semantic_dedup(stream, cents, threshold=0.9)
            .writeStream.foreachBatch(sink.foreach_batch())
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    write_epoch_files(
        pd.DataFrame(
            [(10, [1.0, 0.05, 0.0, 0.0]), (20, [0.05, 1.0, 0.0, 0.0])],
            columns=["vec_id", "embedding"],
        ),
        src,
        1,
        sort_col=None,
    )
    run()
    # second run, NEW epoch file on the SAME checkpoint: a near-copy of
    # kept 10 must be dropped, a new direction kept
    import os

    pd2 = pd.DataFrame(
        [(11, [1.0, 0.06, 0.0, 0.0]), (12, [0.7, 0.3, 0.6, 0.0])],
        columns=["vec_id", "embedding"],
    )
    path2 = os.path.join(src, "epoch-99999.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pd2, preserve_index=False), path2)
    run()

    got = {
        r["vec_id"]: r["keep"] for r in sink.read_current(spark).collect()
    }
    assert got == {10: 1, 20: 1, 11: 0, 12: 1}


def test_streaming_exact_dedup_parity_and_min_id_update(spark, tmp_path):
    """Exact dedup runs UNCHANGED as an unwatermarked update-mode
    streaming agg (min(key) and count are both streaming-aggregable) —
    the streaming twin of d1. Cross-epoch duplicates consolidate; a
    SMALLER representative id arriving in a LATER epoch re-emits the
    group and overwrites the sink row (deterministic min-id rule, no
    arrival-order dependence)."""
    from diffdataflowmlpipelines_spark.functions.dedup import exact_dedup
    from diffdataflowmlpipelines_spark.streaming.sources import (
        write_epoch_files,
    )

    rows = [
        # epoch 1
        ("z9", "alpha beta"),
        ("m3", "gamma"),
        ("m4", "delta"),
        # epoch 2: duplicate of 'alpha beta' with a SMALLER id, plus a
        # same-epoch duplicate pair
        ("a0", "alpha beta"),
        ("b1", "gamma"),
        ("b2", "epsilon"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = str(tmp_path / "src")
    write_epoch_files(pdf, src, 2, sort_col=None)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["content_hash"])
    q = (
        exact_dedup(stream, "doc_id", ["text"])
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["content_hash"]: (r["keep_id"], r["n_dups"])
        for r in sink.read_current(spark).collect()
    }
    batch = spark.createDataFrame(pdf, schema)
    want = {
        r["content_hash"]: (r["keep_id"], r["n_dups"])
        for r in exact_dedup(batch, "doc_id", ["text"]).collect()
    }
    assert got == want
    # the late-arriving smaller id won deterministically
    alpha = [v for v in got.values() if v[1] == 2 and v[0] == "a0"]
    assert len(alpha) == 1


def test_streaming_semantic_dedup_chunk_boundary_order(spark, tmp_path):
    """Review r4d: _semantic_fn sorted each Arrow CHUNK separately, so a
    group bigger than arrow.maxRecordsPerBatch delivered as several
    chunks made the greedy keep/drop verdicts depend on chunk
    boundaries. The batch is now concatenated and sorted ONCE — a
    reverse-order delivery cut into 2-row chunks must match the batch
    twin exactly."""
    import pandas as pd

    from diffdataflowmlpipelines_spark.functions.similarity import (
        semantic_dedup,
    )

    # three mutually-dissimilar directions in cell 0 (cos ~0.6/0.36
    # pairwise, all nearest centroid 0), each with one near-copy;
    # chain-free, so batch lower-id-wins == online greedy in id order
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.6, 0.0, 0.8, 0.0]),
        (2, [0.6, 0.0, 0.0, 0.8]),
        (3, [1.0, 0.01, 0.0, 0.0]),   # dup of 0
        (4, [0.6, 0.01, 0.8, 0.0]),   # dup of 1
        (5, [0.6, 0.01, 0.0, 0.8]),   # dup of 2
    ]
    pdf = pd.DataFrame(rows[::-1], columns=["vec_id", "embedding"])
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        # ONE epoch: the whole reversed group arrives as 3 chunks
        got = _run_semantic_stream(spark, tmp_path, pdf, 1, "chunks")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            df, "vec_id", "embedding", threshold=0.9, centroids=cents
        ).collect()
    }
    assert got == want
    assert [got[i][1] for i in range(6)] == [1, 1, 1, 0, 0, 0]


def test_streaming_semantic_dedup_hot_cell_subsplit(spark, tmp_path):
    """verdict r4 #2 streaming face: subsplit_planes bounds per-group
    representative state on a planted hot cell while exact duplicates
    (identical sign signatures by construction) still drop."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):  # hot cell 0: spread directions
        v = rng.standard_normal(4) * 0.5
        v[0] = abs(v[0]) + 2.0
        rows.append((i, [float(x) for x in v]))
    for j, src in enumerate((2, 9, 17)):  # exact dup copies, higher ids
        rows.append((100 + j, list(rows[src][1])))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])

    got_split = _run_semantic_stream(
        spark, tmp_path, pdf, 2, "hotsplit", subsplit_planes=4
    )
    got_plain = _run_semantic_stream(spark, tmp_path, pdf, 2, "hotplain")
    # threshold 0.9 on this spread: verify via the plain run which pairs
    # matter, then pin that the split run agrees on every EXACT dup (the
    # duplicates it exists to catch) and never keeps extra state rows
    for j in range(3):
        assert got_split[100 + j][1] == 0, j
        assert got_plain[100 + j][1] == 0, j
    assert set(got_split) == set(got_plain)
    # sub-splitting only removes comparisons: anything the split run
    # drops, the plain run (strictly more comparisons online) dropped
    # too on this in-order, duplicate-only-similar input
    dropped_split = {k for k, v in got_split.items() if v[1] == 0}
    dropped_plain = {k for k, v in got_plain.items() if v[1] == 0}
    assert dropped_split <= dropped_plain
