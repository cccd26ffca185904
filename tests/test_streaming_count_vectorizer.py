"""M3+M5 composition: incremental vocabulary -> streaming dense count
vectors. Semantic parity: decoding each vector back through the final
vocabulary must reproduce the batch token counts per document."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.streaming.count_vectorizer import (
    StreamingCountVectorizer,
)
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType(), False), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("diff", T.LongType(), False),
    ]
)

T0 = datetime(2024, 1, 1)


def _docs_epochs():
    rows = [
        # epoch 0
        [("d0", ["apple", "pear", "apple"]), ("d1", ["pear", "plum"])],
        # epoch 1: new token arrives
        [("d2", ["kiwi", "apple"]), ("d3", ["plum", "plum", "kiwi"])],
        # epoch 2: doc with entirely new + old mix
        [("d4", ["fig", "apple", "fig", "pear"])],
    ]
    out = []
    for i, eprows in enumerate(rows):
        out.append(
            pd.DataFrame(
                {
                    "doc_id": [r[0] for r in eprows],
                    "tokens": [r[1] for r in eprows],
                    "event_time": [
                        T0 + timedelta(seconds=i * 10 + j) for j in range(len(eprows))
                    ],
                    "diff": [1] * len(eprows),
                }
            )
        )
    return out


def test_streaming_count_vectorizer_composition(spark, tmp_path):
    epochs = _docs_epochs()
    doc_src = EpochFileSource(spark, str(tmp_path / "docs"), DOC_SCHEMA)
    cv = StreamingCountVectorizer(spark, str(tmp_path / "cv"), n_shards=2)

    for ep in epochs:
        doc_src.add_epoch(ep)
        # query A: vocabulary over the exploded token stream
        tok_stream = doc_src.stream().select(
            F.explode("tokens").alias("token"), "diff", "event_time"
        )
        qa = cv.start_vocab_query(tok_stream, str(tmp_path / "ckpt_vocab"))
        qa.awaitTermination(300)
        # query B: encode the same epochs against the current vocabulary
        qb = (
            doc_src.stream()
            .writeStream.foreachBatch(cv.foreach_batch())
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_enc"))
            .trigger(availableNow=True)
            .start()
        )
        qb.awaitTermination(300)

    vocab = {r["token"]: r["idx"] for r in cv.current_vocab().collect()}
    vectors = {r["doc_id"]: (r["vec"], r["vec_len"]) for r in cv.current_vectors().collect()}

    _check_decode(vocab, vectors)


def test_encode_outrunning_vocab_multiple_unseen(spark, tmp_path):
    """B outruns A with >=2 distinct unseen tokens in one doc: both
    coalesce to the overflow slot — must aggregate, not crash with
    DUPLICATED_MAP_KEY (ADVICE r1), and dense slots stay correct."""
    doc_src = EpochFileSource(spark, str(tmp_path / "docs"), DOC_SCHEMA)
    cv = StreamingCountVectorizer(spark, str(tmp_path / "cv"), n_shards=2)

    ep0 = pd.DataFrame(
        {
            "doc_id": ["d0"],
            "tokens": [["apple", "pear"]],
            "event_time": [T0],
            "diff": [1],
        }
    )
    doc_src.add_epoch(ep0)
    qa = cv.start_vocab_query(
        doc_src.stream().select(
            F.explode("tokens").alias("token"), "diff", "event_time"
        ),
        str(tmp_path / "ckpt_vocab"),
    )
    qa.awaitTermination(300)

    # epoch 1 is encoded WITHOUT updating the vocabulary first: kiwi,
    # fig, plum are all unseen -> 3 entries on the overflow slot
    ep1 = pd.DataFrame(
        {
            "doc_id": ["d1"],
            "tokens": [["kiwi", "fig", "plum", "apple", "apple"]],
            "event_time": [T0 + timedelta(seconds=10)],
            "diff": [1],
        }
    )
    doc_src.add_epoch(ep1)
    qb = (
        doc_src.stream()
        .writeStream.foreachBatch(cv.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enc"))
        .trigger(availableNow=True)
        .start()
    )
    qb.awaitTermination(300)

    vocab = {r["token"]: r["idx"] for r in cv.current_vocab().collect()}
    vectors = {
        r["doc_id"]: (r["vec"], r["vec_len"])
        for r in cv.current_vectors().collect()
    }
    vec, vlen = vectors["d1"]
    assert vec[vocab["apple"]] == 2.0  # seen token still counted densely
    used = {vocab["apple"]}
    assert all(v == 0.0 for i, v in enumerate(vec) if i not in used)


def _check_decode(vocab, vectors):
    # all 5 distinct tokens assigned unique indices
    assert len(vocab) == 5
    assert len(set(vocab.values())) == 5

    # decode each doc's vector back through the vocabulary it was encoded
    # with: early docs used a smaller vec_len, but index STABILITY means
    # the prefix they hold is still correct under the final vocabulary
    all_rows = pd.concat(_docs_epochs(), ignore_index=True)
    for _, row in all_rows.iterrows():
        want = pd.Series(row["tokens"]).value_counts().to_dict()
        vec, vlen = vectors[row["doc_id"]]
        for tok, cnt in want.items():
            idx = vocab[tok]
            if idx < vlen:
                assert vec[idx] == float(cnt), (row["doc_id"], tok)
        # no counts anywhere else
        used = {vocab[t] for t in want if vocab[t] < vlen}
        for i, v in enumerate(vec):
            if i not in used:
                assert v == 0.0, (row["doc_id"], i)
