"""Streaming tokenizer pipeline (streaming/tokenizer.py): fixed BPE
merges + incremental vocabulary over a document stream, emitting the
north-rule (doc_id, tokens array<int>, n_tok, source) shape per epoch.

Parity standard: decode-back — every emitted id sequence, mapped back
through the final vocabulary, must reproduce the pure-python
``encode_local`` unit sequence byte-for-byte (the north rule's
token-array-equality invariant), across epochs and replays.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.functions.bpe import (
    encode_local,
    learn_bpe_local,
)
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource
from diffdataflowmlpipelines_spark.streaming.tokenizer import (
    StreamingTokenizerPipeline,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("diff", T.LongType(), False),
    ]
)

T0 = datetime(2024, 1, 1)

EPOCH_TEXTS = [
    # epoch 0: the Sennrich-style corpus seed
    [("d0", "low lower low", "web"), ("d1", "newest low", "web")],
    # epoch 1: new words extend the unit vocabulary incrementally
    [("d2", "lowest newest widest", "books"), ("d3", "low wide", "web")],
    # epoch 2: an empty doc and a repeat
    [("d4", "", "books"), ("d5", "wider lower newest", "web")],
]


def _epoch_pdf(i: int, rows) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
            "event_time": [
                T0 + timedelta(seconds=i * 10 + j) for j in range(len(rows))
            ],
            "diff": [1] * len(rows),
        }
    )


def _merges():
    wf: dict[str, int] = {}
    for rows in EPOCH_TEXTS:
        for _, text, _ in rows:
            for w in text.split():
                wf[w] = wf.get(w, 0) + 1
    return [(l, r) for _, l, r, _, _ in learn_bpe_local(wf, 8)]


def _run_epochs(spark, tmp_path, merges, n_epochs=None):
    doc_src = EpochFileSource(spark, str(tmp_path / "docs"), DOC_SCHEMA)
    tp = StreamingTokenizerPipeline(
        spark, str(tmp_path / "tok"), merges, n_shards=2
    )
    use = EPOCH_TEXTS if n_epochs is None else EPOCH_TEXTS[:n_epochs]
    for i, rows in enumerate(use):
        doc_src.add_epoch(_epoch_pdf(i, rows))
        qa = tp.start_vocab_query(
            doc_src.stream(), str(tmp_path / "ckpt_vocab")
        )
        qa.awaitTermination(300)
        qb = (
            doc_src.stream()
            .writeStream.foreachBatch(tp.foreach_batch())
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_enc"))
            .trigger(availableNow=True)
            .start()
        )
        qb.awaitTermination(300)
    return doc_src, tp


def _decode_check(tp, merges):
    inv = {
        r["__uid"]: r["unit"] for r in tp.current_units().collect()
    }
    got = {
        r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
        for r in tp.current_tokens().collect()
    }
    texts = {r[0]: (r[1], r[2]) for rows in EPOCH_TEXTS for r in rows}
    assert set(got) == set(texts)
    for doc_id, (text, source) in texts.items():
        ids, n_tok, src = got[doc_id]
        assert src == source, doc_id
        assert n_tok == len(ids), doc_id
        assert all(i >= 0 for i in ids), (doc_id, ids)  # B never outran A
        units = [inv[i] for i in ids]
        assert units == encode_local(text, merges), doc_id
    return got


def test_streaming_tokenizer_decode_back_parity(spark, tmp_path):
    merges = _merges()
    _, tp = _run_epochs(spark, tmp_path, merges)
    got = _decode_check(tp, merges)
    assert got["d4"][0] == [] and got["d4"][1] == 0  # empty doc contract

    # id stability: the same unit carries ONE id everywhere (insert-only
    # vocabularies never renumber), so identical texts encode equal
    toks = {d: ids for d, (ids, _, _) in got.items()}
    # d0 "low lower low" and d5 "wider lower newest" share the unit
    # stream of "lower": the id subsequence for that word must be equal
    low_er = encode_local("lower", merges)
    inv = {r["__uid"]: r["unit"] for r in tp.current_units().collect()}
    for d in ("d0", "d5"):
        units = [inv[i] for i in toks[d]]
        s = "".join(low_er)
        assert s in "".join(units), d


def test_streaming_tokenizer_replay_is_dropped(spark, tmp_path):
    merges = _merges()
    doc_src, tp = _run_epochs(spark, tmp_path, merges)
    before = sorted(
        (r["doc_id"], list(r["tokens"]))
        for r in tp.current_tokens().collect()
    )
    # replay every epoch through a FRESH checkpoint: the sink's
    # committed-epoch manifest must drop all of them
    qb = (
        doc_src.stream()
        .writeStream.foreachBatch(tp.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enc_replay"))
        .trigger(availableNow=True)
        .start()
    )
    qb.awaitTermination(300)
    after = sorted(
        (r["doc_id"], list(r["tokens"]))
        for r in tp.current_tokens().collect()
    )
    assert before == after


def test_streaming_tokenizer_encode_outruns_vocab(spark, tmp_path):
    """Query B running before any vocabulary epoch commits: units
    encode as -1 (the OrdinalEncoder unseen convention), never dropped
    — sequence LENGTH still matches the unit sequence."""
    merges = _merges()
    doc_src = EpochFileSource(spark, str(tmp_path / "docs"), DOC_SCHEMA)
    tp = StreamingTokenizerPipeline(
        spark, str(tmp_path / "tok"), merges, n_shards=2
    )
    doc_src.add_epoch(_epoch_pdf(0, EPOCH_TEXTS[0]))
    qb = (
        doc_src.stream()
        .writeStream.foreachBatch(tp.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enc"))
        .trigger(availableNow=True)
        .start()
    )
    qb.awaitTermination(300)
    got = {
        r["doc_id"]: list(r["tokens"]) for r in tp.current_tokens().collect()
    }
    for doc_id, text, _ in EPOCH_TEXTS[0]:
        want_len = len(encode_local(text, merges))
        assert got[doc_id] == [-1] * want_len, doc_id


def test_streaming_tokenizer_update_pair_and_retraction(spark, tmp_path):
    """Diff-aware encode (round-5 review): an update pair (-1 old text,
    +1 new text) encodes ONLY the new text — never an interleaved mix;
    a pure retraction epoch emits nothing (the last committed row
    stands, documented append-mode semantics)."""
    merges = _merges()
    doc_src = EpochFileSource(spark, str(tmp_path / "docs"), DOC_SCHEMA)
    tp = StreamingTokenizerPipeline(
        spark, str(tmp_path / "tok"), merges, n_shards=2
    )

    def run_ab():
        qa = tp.start_vocab_query(
            doc_src.stream(), str(tmp_path / "ckpt_vocab")
        )
        qa.awaitTermination(300)
        qb = (
            doc_src.stream()
            .writeStream.foreachBatch(tp.foreach_batch())
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_enc"))
            .trigger(availableNow=True)
            .start()
        )
        qb.awaitTermination(300)

    doc_src.add_epoch(
        pd.DataFrame(
            {
                "doc_id": ["d0", "d1"],
                "text": ["low lower", "newest low"],
                "source": ["web", "web"],
                "event_time": [T0, T0 + timedelta(seconds=1)],
                "diff": [1, 1],
            }
        )
    )
    run_ab()

    # epoch 1: update d0 via a retraction pair
    doc_src.add_epoch(
        pd.DataFrame(
            {
                "doc_id": ["d0", "d0"],
                "text": ["low lower", "newest wide"],
                "source": ["web", "web"],
                "event_time": [T0 + timedelta(seconds=10)] * 2,
                "diff": [-1, 1],
            }
        )
    )
    run_ab()
    inv = {r["__uid"]: r["unit"] for r in tp.current_units().collect()}
    got = {
        r["doc_id"]: list(r["tokens"]) for r in tp.current_tokens().collect()
    }
    assert [inv[i] for i in got["d0"]] == encode_local("newest wide", merges)
    d1_before = got["d1"]

    # epoch 2: pure retraction of d1 — nothing re-emits, the committed
    # row stands
    doc_src.add_epoch(
        pd.DataFrame(
            {
                "doc_id": ["d1"],
                "text": ["newest low"],
                "source": ["web"],
                "event_time": [T0 + timedelta(seconds=20)],
                "diff": [-1],
            }
        )
    )
    run_ab()
    got2 = {
        r["doc_id"]: list(r["tokens"]) for r in tp.current_tokens().collect()
    }
    assert got2["d1"] == d1_before
    assert [inv[i] for i in got2["d0"]] == encode_local("newest wide", merges)


def test_streaming_tokenizer_two_live_texts_raises(spark, tmp_path):
    """Two DIFFERENT net-positive texts for one doc in one epoch is a
    loud contract violation, not an interleaved token array."""
    import pytest

    merges = _merges()
    tp = StreamingTokenizerPipeline(
        spark, str(tmp_path / "tok"), merges, n_shards=2
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["d0", "d0"],
                "text": ["low lower", "newest wide"],
                "source": ["web", "web"],
                "event_time": [T0, T0],
                "diff": [1, 1],
            }
        ),
        DOC_SCHEMA,
    )
    with pytest.raises(ValueError, match="multiple live texts"):
        tp.encode_batch(batch, 0)
