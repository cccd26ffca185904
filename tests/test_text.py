"""Vectorizer unit tests with closed-form expectations, including the
reference's inverted-presence tf-idf behavior
(tfidf_transformer.rs:36-38) behind the parity flag."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.text import (
    bpe_ish_token_count,
    quality_features,
    tokenize,
    word_fingerprint,
)
from diffdataflowmlpipelines_spark.functions.vectorizers import (
    CountVectorizer,
    HashVectorizer,
    TfidfTransformer,
)


@pytest.fixture(scope="module")
def docs(spark):
    # vocab: a b c d; doc structure chosen so counts are obvious
    return spark.createDataFrame(
        [
            (0, ["a", "b", "a"]),
            (1, ["b", "c"]),
            (2, ["c", "c", "d"]),
        ],
        "doc_id long, toks array<string>",
    )


def test_count_vectorizer_dense(spark, docs):
    cv = CountVectorizer()
    out = cv.fit_transform(docs, "doc_id", "toks", "vec")
    got = {r["doc_id"]: r["vec"] for r in out.collect()}
    # sorted dict: a=0 b=1 c=2 d=3; overprovisioned_len(4) = 5
    assert cv.vec_len_ == 5
    assert got[0] == [2.0, 1.0, 0.0, 0.0, 0.0]
    assert got[1] == [0.0, 1.0, 1.0, 0.0, 0.0]
    assert got[2] == [0.0, 0.0, 2.0, 1.0, 0.0]


def test_count_vectorizer_binary(spark, docs):
    cv = CountVectorizer(binary=True)
    got = {
        r["doc_id"]: r["vec"]
        for r in cv.fit_transform(docs, "doc_id", "toks", "vec").collect()
    }
    assert got[0] == [1.0, 1.0, 0.0, 0.0, 0.0]
    assert got[2] == [0.0, 0.0, 1.0, 1.0, 0.0]


def test_tfidf_transformer_correct_presence(spark, docs):
    cv = CountVectorizer()
    vecs = cv.fit_transform(docs, "doc_id", "toks", "vec")
    tt = TfidfTransformer()
    out = tt.fit(vecs, "vec").transform(vecs, "doc_id", "vec", "w")
    got = {r["doc_id"]: r["w"] for r in out.collect()}
    # df: a=1, b=2, c=2, d=1 over N=3 docs
    assert got[0][0] == pytest.approx(2 * math.log(3 / 1))
    assert got[0][1] == pytest.approx(1 * math.log(3 / 2))
    assert got[1][2] == pytest.approx(1 * math.log(3 / 2))
    assert got[2][3] == pytest.approx(1 * math.log(3 / 1))
    # tf = 0 -> weight 0; df = 0 (position 4, never present) -> 0
    assert got[1][0] == 0.0 and got[0][4] == 0.0


def test_tfidf_transformer_reference_inverted_presence(spark, docs):
    """Reference bug replication: presence counts documents where the
    value IS zero (tfidf_transformer.rs:36-38)."""
    cv = CountVectorizer()
    vecs = cv.fit_transform(docs, "doc_id", "toks", "vec")
    tt = TfidfTransformer(invert_presence=True)
    out = tt.fit(vecs, "vec").transform(vecs, "doc_id", "vec", "w")
    got = {r["doc_id"]: r["w"] for r in out.collect()}
    # inverted df: a: zero in docs 1,2 -> df=2; weight(doc0, a) = 2*ln(3/2)
    assert got[0][0] == pytest.approx(2 * math.log(3 / 2))
    # position 4 zero in all docs -> df=3 -> but tf=0 everywhere -> 0
    assert got[0][4] == 0.0


def test_tfidf_pairs_round_to_is_decimal_places(spark, docs):
    """round_to follows the decimal-places convention (ADVICE r1: the
    sign was inverted, so round_to=6 rounded idf to the nearest 10^6 and
    zeroed every weight)."""
    from diffdataflowmlpipelines_spark.functions.vectorizers import tfidf_pairs

    out = tfidf_pairs(docs, "doc_id", "toks", round_to=6)
    got = {(r["doc_id"], r["token"]): r["weight"] for r in out.collect()}
    # token 'a': tf=2 in doc 0, df=1, N=3 -> round(2 * ln 3, 6dp) — the
    # WEIGHT is rounded (streaming tfidf_from_counts convention), not
    # the idf (tf * round(idf) diverged in the last decimal for tf >= 2)
    assert got[(0, "a")] == pytest.approx(round(2 * math.log(3), 6), abs=1e-12)
    assert all(w != 0.0 for w in got.values())


def test_hash_vectorizer_semantics(spark, docs):
    hv = HashVectorizer(n_features=8)
    got = {
        r["doc_id"]: r["vec"]
        for r in hv.fit_transform(docs, "doc_id", "toks", "vec").collect()
    }
    # total counts preserved; same token always same bucket
    assert sum(got[0]) == 3.0 and sum(got[1]) == 2.0 and sum(got[2]) == 3.0
    b_a = [i for i, v in enumerate(got[0]) if v >= 2.0]  # bucket of 'a'
    assert len(b_a) == 1
    binary = HashVectorizer(n_features=8, binary=True)
    gb = {
        r["doc_id"]: r["vec"]
        for r in binary.fit_transform(docs, "doc_id", "toks", "vec").collect()
    }
    assert set(gb[0]) <= {0.0, 1.0}


def test_tokenizer_and_fingerprint(spark):
    df = spark.createDataFrame([("  the fast  key \t order ",)], "text string")
    toks = df.select(tokenize("text").alias("t")).head()["t"]
    assert toks == ["the", "fast", "key", "order"]
    # fingerprint closed form
    fp = df.select(word_fingerprint(tokenize("text")).alias("f")).head()["f"]
    acc = 0
    for w in toks:
        acc = (acc * 31 + (97 * len(w) + ord(w[0]))) % 1_000_000_007
    assert fp == acc
    # bpe-ish splits letter/digit boundaries
    n = spark.createDataFrame([("abc123 def!",)], "text string").select(
        bpe_ish_token_count("text").alias("n")
    ).head()["n"]
    assert n == 4  # abc | 123 | def | !


def test_quality_features_closed_form(spark):
    df = spark.createDataFrame([("the cat, a hat!",)], "text string")
    feats = quality_features("text")
    row = df.select(*[v.alias(k) for k, v in feats.items()]).head()
    assert row["n_chars"] == 15
    assert row["n_tokens"] == 4
    assert row["punct_ratio"] == pytest.approx(2 / 15)
    assert row["stopword_ratio"] == pytest.approx(2 / 4)  # 'the', 'a'
    assert row["alpha_ratio"] == pytest.approx(10 / 15)


def test_gopher_filter_closed_form(spark):
    from diffdataflowmlpipelines_spark.functions.text import gopher_quality_filter

    rows = [
        # 0: passes every rule (5 tokens incl. 2 stopwords, clean words)
        (0, "the quick brown fox is"),
        # 1: too short (min_tokens=2 here, this has 1)
        (1, "word"),
        # 2: mean token length too high (>10)
        (2, "supercalifragilistically extraordinarily the is"),
        # 3: symbol-heavy: '#' + '...' push symbol ratio over 0.1
        (3, "the tag is ## trailing..."),
        # 4: numeric words: alpha-word ratio below 0.8
        (4, "the 12 34 56 is"),
        # 5: no stopwords at all
        (5, "quick brown fox jumps high"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = gopher_quality_filter(
        "text", min_tokens=2, min_mean_token_len=1.0, min_stopword_hits=2
    )
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[c.alias(k) for k, c in g.items()]).collect()
    }
    assert out[0]["keep"] == 1
    assert out[1]["keep"] == 0 and out[1]["f_len"] == 0
    assert out[2]["keep"] == 0 and out[2]["f_mean_len"] == 0
    assert out[3]["keep"] == 0 and out[3]["f_symbol"] == 0
    # doc 3: 2 '#' chars + 1 non-overlapping '...' over 5 tokens = 0.6
    assert out[3]["symbol_ratio"] == pytest.approx(0.6)
    assert out[4]["keep"] == 0 and out[4]["f_alpha"] == 0
    assert out[4]["alpha_word_ratio"] == pytest.approx(2 / 5)
    assert out[5]["keep"] == 0 and out[5]["f_stopword"] == 0
    # stopword hits are DISTINCT ('the ... the' counts once per word)
    one = spark.createDataFrame([(9, "the the the")], "doc_id long, text string")
    g2 = gopher_quality_filter("text", min_tokens=1, min_mean_token_len=1.0)
    assert one.select(*[c.alias(k) for k, c in g2.items()]).head()[
        "stopword_hits"
    ] == 1


def test_gopher_filter_empty_doc(spark):
    from diffdataflowmlpipelines_spark.functions.text import gopher_quality_filter

    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None)], "doc_id long, text string"
    )
    g = gopher_quality_filter("text")
    rows = df.select("doc_id", *[c.alias(k) for k, c in g.items()]).collect()
    for r in rows:
        assert r["n_tokens"] == 0
        assert r["mean_token_len"] == 0.0
        assert r["keep"] == 0


def test_bigram_lm_score_closed_form(spark):
    import math

    from diffdataflowmlpipelines_spark.functions.lm import bigram_lm_score

    # cu: a=3 b=3 c=1, V=3; cb: (a,b)=2 (b,a)=2
    # every bigram scores ln((2+1)/(3+3)) = ln(0.5)
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a"), (2, "c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_logprob"] == pytest.approx(math.log(0.5), abs=1e-6)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_logprob"] == pytest.approx(math.log(0.5), abs=1e-6)
    # <2 tokens: zero bigrams, NULL score, doc still present
    assert out[2]["n_bigrams"] == 0 and out[2]["avg_logprob"] is None


def test_oov_stats_closed_form(spark):
    from diffdataflowmlpipelines_spark.functions.text import oov_stats

    df = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b d d"), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    # counts: a:4 b:3 d:2 c:1 -> vocab_size=2 keeps {a, b}
    out = oov_stats(df, vocab_size=2)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in out.collect()
    }
    assert got == {
        0: (6, 1, 0.166667),
        1: (4, 2, 0.5),
        2: (0, 0, 0.0),
        3: (0, 0, 0.0),
    }


def test_oov_stats_tie_breaks_token_ascending(spark):
    from diffdataflowmlpipelines_spark.functions.text import oov_stats

    # a and b both appear twice; vocab_size=1 must pick "a" (token asc)
    df = spark.createDataFrame(
        [(0, "a b"), (1, "b a")], "doc_id long, text string"
    )
    out = oov_stats(df, vocab_size=1)
    got = {r["doc_id"]: r["n_oov"] for r in out.collect()}
    assert got == {0: 1, 1: 1}


def test_chunk_documents_closed_form(spark):
    from diffdataflowmlpipelines_spark.functions.text import chunk_documents

    # 10 tokens, max=4, overlap=2 -> stride 2, ceil(max(10-2,1)/2)=4
    # chunks: [0:4], [2:6], [4:8], [6:10]
    toks = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [(0, toks), (1, "x y"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, max_tokens=4, overlap=2)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    assert got == {
        (0, 0): ("a b c d", 4),
        (0, 1): ("c d e f", 4),
        (0, 2): ("e f g h", 4),
        (0, 3): ("g h i j", 4),
        (1, 0): ("x y", 2),  # short doc: exactly one chunk
        # empty and NULL docs yield zero chunks
    }


def test_chunk_documents_tail_and_validation(spark):
    import pytest as _pytest

    from diffdataflowmlpipelines_spark.functions.text import chunk_documents

    # 7 tokens, max=4, overlap=1 -> stride 3, ceil(max(6,1)/3)=2 chunks,
    # second chunk is the short tail [3:7]
    df = spark.createDataFrame(
        [(0, "a b c d e f g")], "doc_id long, text string"
    )
    got = {
        r["chunk_id"]: (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
    }
    assert got == {0: ("a b c d", 4), 1: ("d e f g", 4)}

    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_pmi_collocations_closed_form(spark):
    import math

    from diffdataflowmlpipelines_spark.functions.text import pmi_collocations

    # unigrams: a=3 b=2 c=1 (N1=6); bigrams: (a,b)=2 (a,c)=1 (N2=3)
    # PMI(a,b) = ln((2*36)/(3*3*2)) = ln 4; PMI(a,c) = ln((1*36)/(3*3*1)) = ln 4
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c"), (3, None)],
        "doc_id long, text string",
    )
    rows = pmi_collocations(df, min_count=1, top_k=10).collect()
    got = [(r["w1"], r["w2"], r["n_pair"], r["pmi"]) for r in rows]
    ln4 = round(math.log(4.0), 6)
    # equal PMI -> tie broken (w1, w2) ascending
    assert got == [("a", "b", 2, ln4), ("a", "c", 1, ln4)]

    # min_count prunes the hapax pair; top_k truncates
    rows = pmi_collocations(df, min_count=2, top_k=10).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]
    rows = pmi_collocations(df, min_count=1, top_k=1).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]


def test_source_ngram_overlap_closed_form(spark):
    from diffdataflowmlpipelines_spark.functions.text import (
        source_ngram_overlap,
    )

    # A: {x y z, y z w}; B: {x y z}; C: {p q r}; short/NULL contribute
    # nothing; the NULL source is excluded (documented)
    df = spark.createDataFrame(
        [
            (0, "x y z w", "A"),
            (1, "x y z", "B"),
            (2, "x y z", "A"),  # duplicate gram within A: distinct set
            (3, "p q r", "C"),
            (4, "x y", "A"),  # shorter than n: no grams
            (5, "x y z", None),  # NULL source excluded
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"],
            r["n_b"],
            r["n_common"],
            r["jaccard"],
        )
        for r in source_ngram_overlap(df, n=3).collect()
    }
    # zero-overlap pairs are absent (inner join), so C pairs don't appear
    assert got == {("A", "B"): (2, 1, 1, 0.5)}
