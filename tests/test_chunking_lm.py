"""Unit tests for document chunking and unigram-LM quality scoring."""

import pytest
from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark.operators.chunking import (
    chunk_documents,
)
from cloud_native_medical_data_etl_pipeline_spark.operators.lm import (
    build_unigram_model,
    unigram_logprob_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_no_overlap_exact_windows(spark):
    df = _docs(spark, [(1, "a b c d e f g")])  # 7 tokens
    got = {
        r["chunk_id"]: (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=3).collect()
    }
    assert got == {0: ("a b c", 3), 1: ("d e f", 3), 2: ("g", 1)}


def test_chunk_with_stride_overlap(spark):
    df = _docs(spark, [(1, "t0 t1 t2 t3 t4 t5")])  # 6 tokens
    got = {
        r["chunk_id"]: r["chunk_text"]
        for r in chunk_documents(df, chunk_tokens=4, stride=2).collect()
    }
    # starts at token 0, 2, 4 — each 4 wide, last truncated
    assert got == {0: "t0 t1 t2 t3", 1: "t2 t3 t4 t5", 2: "t4 t5"}


def test_chunk_empty_and_null_docs_emit_nothing(spark):
    df = _docs(spark, [(1, ""), (2, None), (3, "   "), (4, "one")])
    rows = chunk_documents(df, chunk_tokens=8).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(4, "one")]


def test_chunk_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=-1)


def test_chunk_reassembles_document_when_stride_equals_width(spark):
    text = " ".join(f"w{i}" for i in range(101))
    df = _docs(spark, [(1, text)])
    chunks = (
        chunk_documents(df, chunk_tokens=16)
        .orderBy("chunk_id")
        .collect()
    )
    assert " ".join(c["chunk_text"] for c in chunks) == text
    assert sum(c["n_tokens"] for c in chunks) == 101


def test_unigram_model_probabilities(spark):
    df = _docs(spark, [(1, "the the the cat"), (2, "the dog")])
    model = {r["token"]: r["p"] for r in build_unigram_model(df).collect()}
    assert model["the"] == pytest.approx(4 / 6)
    assert model["cat"] == pytest.approx(1 / 6)
    assert set(model) == {"the", "cat", "dog"}


def test_unigram_vocab_truncation_keeps_most_frequent(spark):
    df = _docs(spark, [(1, "a a a b b c")])
    model = {r["token"] for r in build_unigram_model(df, vocab=2).collect()}
    assert model == {"a", "b"}


def test_gibberish_scores_worse_than_typical_text(spark):
    corpus = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
        + [(99, "zxqv9 qq7jk lmw0p zzetao9 qv9zzz")],
    )
    scores = {
        r["doc_id"]: r["bits_per_token"]
        for r in unigram_logprob_score(corpus, vocab=50).collect()
    }
    typical = scores[0]
    gibberish = scores[99]
    assert gibberish > typical


def test_score_against_external_model(spark):
    ref = _docs(spark, [(1, "alpha beta beta")])
    model = build_unigram_model(ref)
    probe = _docs(spark, [(10, "beta beta"), (11, "unseen")])
    got = {
        r["doc_id"]: r.asDict()
        for r in unigram_logprob_score(probe, model=model, oov_p=0.5).collect()
    }
    # p(beta)=2/3 -> bits = -log2(2/3); OOV floor 0.5 -> exactly 1 bit
    assert got[10]["bits_per_token"] == pytest.approx(0.584963, abs=1e-6)
    assert got[11]["bits_per_token"] == pytest.approx(1.0)
    assert got[10]["n_scored"] == 2


def test_repetition_ratios(spark):
    from cloud_native_medical_data_etl_pipeline_spark.functions.text import (
        dup_ngram_ratio,
        dup_token_ratio,
    )

    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),     # 1 distinct of 4 tokens
            (2, "all tokens are unique"),
            (3, ""),
            (4, "ab ab"),                    # 1 distinct bigram of 1
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            F.round(dup_token_ratio("text"), 6).alias("t"),
            F.round(dup_ngram_ratio("text", 2), 6).alias("g2"),
        ).collect()
    }
    assert got[1]["t"] == pytest.approx(0.75)
    assert got[1]["g2"] == pytest.approx(2 / 3)  # 'spam spam' x3 -> 1 distinct of 3
    assert got[2]["t"] == 0.0 and got[2]["g2"] == 0.0
    assert got[3]["t"] == 0.0 and got[3]["g2"] == 0.0
    assert got[4]["g2"] == 0.0  # single bigram, nothing repeated


def test_bigram_score_hand_computed(spark):
    import math

    from cloud_native_medical_data_etl_pipeline_spark.operators.lm import (
        bigram_logprob_score,
    )

    # corpus: "a b a" and "a b"; vocab V = {a, b} -> 2
    # C(a)=3, C(b)=2; C(a,b)=2, C(b,a)=1
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob_score(df, alpha=0.5).collect()}
    V = 3  # {a, b, x}
    p_ab = (2 + 0.5) / (3 + 0.5 * V)
    p_ba = (1 + 0.5) / (2 + 0.5 * V)
    exp1 = round((-math.log2(p_ab) - math.log2(p_ba)) / 2, 6)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["bits_per_bigram"] == pytest.approx(exp1, abs=1e-6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["bits_per_bigram"] == pytest.approx(round(-math.log2(p_ab), 6), abs=1e-6)
    assert 3 not in out  # single-token doc emits no bigrams


def test_bigram_unseen_history_scores_one_over_v(spark):
    import math

    from cloud_native_medical_data_etl_pipeline_spark.operators.lm import (
        bigram_logprob_score,
    )

    # score a target doc against a model built from a reference corpus
    # by unioning: "z q" appears once, so C(z)=1, C(z,q)=1; with
    # min_count=2 the bigram is pruned -> p = 0.5/(1+0.5V)
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "z q")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in bigram_logprob_score(df, alpha=0.5, min_count=2).collect()
    }
    V = 4  # {a, b, z, q}
    p_pruned = 0.5 / (1 + 0.5 * V)
    assert out[2]["bits_per_bigram"] == pytest.approx(
        round(-math.log2(p_pruned), 6), abs=1e-6
    )


def test_lexical_diversity_hand_computed(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.lm import (
        lexical_diversity,
    )

    df = spark.createDataFrame(
        [
            ("web", "a a b c"),   # tokens=4 types={a,b,c} hapax={b,c}
            ("web", "a d"),       # +2 tokens, d new hapax
            ("books", "x x x"),   # tokens=3 types={x} hapax={}
            ("empty", "   "),     # no tokens -> group omitted
        ],
        "source string, text string",
    )
    out = {r["source"]: r for r in lexical_diversity(df).collect()}
    assert set(out) == {"web", "books"}
    w = out["web"]
    assert (w["n_tokens"], w["n_types"]) == (6, 4)
    assert w["type_token_ratio"] == pytest.approx(round(4 / 6, 6))
    assert w["hapax_ratio"] == pytest.approx(0.75)  # b, c, d of {a,b,c,d}
    b = out["books"]
    assert (b["n_tokens"], b["n_types"]) == (3, 1)
    assert b["hapax_ratio"] == 0.0


def test_char_entropy_hand_computed(spark):
    import math

    from cloud_native_medical_data_etl_pipeline_spark.operators.lm import (
        char_entropy,
    )

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(out) == {1, 2, 3}  # empty/null omitted
    assert out[1]["char_entropy"] == 0.0  # single symbol
    assert out[2]["char_entropy"] == pytest.approx(1.0)  # two equiprobable
    assert out[3]["char_entropy"] == pytest.approx(2.0)  # four equiprobable
    assert out[3]["n_chars"] == 4
    # monotone: more uniform distribution -> higher entropy
    assert out[1]["char_entropy"] < out[2]["char_entropy"] < out[3]["char_entropy"]


def test_vocab_coverage_hand_computed(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.lm import (
        vocab_coverage,
    )

    # corpus counts: a=5, b=3, c=1, d=1 -> top-2 vocab {a, b}
    df = spark.createDataFrame(
        [("s1", "a a a b b"), ("s2", "a a b c d")],
        "source string, text string",
    )
    out = {r["source"]: r for r in vocab_coverage(df, vocab=2).collect()}
    assert out["s1"]["oov_tokens"] == 0 and out["s1"]["oov_rate"] == 0.0
    assert out["s2"]["n_tokens"] == 5 and out["s2"]["oov_tokens"] == 2  # c, d
    assert out["s2"]["oov_rate"] == pytest.approx(0.4)


def test_mix_plan_budget_and_epochs(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.curate import (
        mix_plan,
    )

    df = spark.createDataFrame(
        [("big", "w " * 900), ("small", "w " * 100)],
        "source string, text string",
    )
    out = {r["source"]: r for r in mix_plan(df, token_budget=1000, tau=0.5).collect()}
    # shares: sqrt(900)=30, sqrt(100)=10 -> 0.75 / 0.25
    assert out["big"]["share"] == pytest.approx(0.75)
    assert out["small"]["share"] == pytest.approx(0.25)
    assert out["big"]["tokens_target"] == 750
    assert out["small"]["tokens_target"] == 250
    # small source must be oversampled 2.5 epochs; big undersampled
    assert out["small"]["epochs"] == pytest.approx(2.5)
    assert out["big"]["epochs"] == pytest.approx(750 / 900, abs=1e-6)
    # targets never exceed the budget
    assert sum(r["tokens_target"] for r in out.values()) <= 1000
