"""WordPiece tokenization: greedy semantics, UNK paths, detokenize
roundtrip, vocab induction, plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

from feast_spark.pipeline.tokenize import (
    DEFAULT_VOCAB,
    build_wordpiece_vocab,
    wordpiece_detokenize,
    wordpiece_tokenize,
)


def _tok_one(spark, text, **kw):
    df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
    row = wordpiece_tokenize(df, **kw).first()
    return list(row["tokens"]), row["n_unk"]


# ------------------------------------------------------------- greedy
def test_golden_subword_splits(spark):
    toks, n_unk = _tok_one(spark, "the table window customer ordering")
    assert toks == [
        "the", "tab", "##le", "win", "##dow", "custom", "##er",
        "or", "##der", "##ing",
    ]
    assert n_unk == 0


def test_greedy_prefers_longest_match(spark):
    # 'custom' (6) beats 'cust' (4) beats 'c' (1) at word start
    toks, _ = _tok_one(spark, "customer")
    assert toks[0] == "custom"
    # continuation longest: 'ordering' tail is ##der + ##ing, not chars
    toks, _ = _tok_one(spark, "ordering")
    assert toks == ["or", "##der", "##ing"]


def test_char_fallback_never_unks_ascii(spark):
    toks, n_unk = _tok_one(spark, "zqxj kwv")
    assert n_unk == 0
    assert toks == ["z", "##q", "##x", "##j", "k", "##w", "##v"]


def test_punctuation_and_case(spark):
    toks, n_unk = _tok_one(spark, "The FAST, (table)!")
    assert toks == ["the", "fast", ",", "(", "tab", "##le", ")", "!"]
    assert n_unk == 0


def test_unk_on_uncovered_char_and_long_word(spark):
    # the pre-tokenizer is ASCII-alnum runs + single other chars, so
    # 'café' splits as 'caf' + 'é'; the uncovered 'é' token UNKs
    toks, n_unk = _tok_one(spark, "café table")
    assert toks == ["c", "##a", "##f", "[UNK]", "tab", "##le"]
    assert n_unk == 1
    # word longer than max_word_len -> UNK up front
    toks, n_unk = _tok_one(spark, "a" * 17 + " the")
    assert toks == ["[UNK]", "the"]
    assert n_unk == 1
    toks, n_unk = _tok_one(spark, "a" * 16)
    assert n_unk == 0 and len(toks) == 16


def test_restricted_vocab_unk(spark):
    toks, n_unk = _tok_one(spark, "ab ba", vocab=["a", "b", "##b"])
    # 'ab' = a + ##b; 'ba' has no ##a continuation -> UNK
    assert toks == ["a", "##b", "[UNK]"]
    assert n_unk == 1


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": pd.Series([None, "", "   "], dtype="object")})
    )
    rows = wordpiece_tokenize(df).select("tokens", "n_unk").collect()
    # NULL text coalesces to ([], 0) — the DuckDB oracle's convention
    # (ADVICE r04 pinned this; previously NULL -> NULL diverged latently)
    assert list(rows[0]["tokens"]) == [] and rows[0]["n_unk"] == 0
    assert list(rows[1]["tokens"]) == [] and rows[1]["n_unk"] == 0
    assert list(rows[2]["tokens"]) == [] and rows[2]["n_unk"] == 0


def test_vocab_guards(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["x"]}))
    with pytest.raises(ValueError, match="unk_token"):
        wordpiece_tokenize(df, vocab=["a", "[UNK]"])
    with pytest.raises(ValueError, match="no start pieces"):
        wordpiece_tokenize(df, vocab=["##a", "##b"])


# --------------------------------------------------------- detokenize
def test_detokenize_roundtrip_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = wordpiece_tokenize(docs).select(
        wordpiece_detokenize(F.col("tokens")).alias("rt"),
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("norm"),
        "n_unk",
    )
    bad = out.filter((F.col("n_unk") == 0) & (F.col("rt") != F.col("norm")))
    assert bad.count() == 0


# ----------------------------------------------------- vocab induction
def test_induced_vocab_covers_training_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = build_wordpiece_vocab(docs, vocab_size=80, max_piece_len=8, min_freq=1)
    assert len(vocab) <= 80
    # chars always in: no word seen at induction time can UNK
    out = wordpiece_tokenize(docs, vocab=vocab)
    assert out.agg(F.sum("n_unk")).first()[0] == 0


def test_induced_vocab_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["aa ab aa b", "aa ab c"]})
    )
    v1 = build_wordpiece_vocab(df, vocab_size=6, max_piece_len=4, min_freq=1)
    v2 = build_wordpiece_vocab(df, vocab_size=6, max_piece_len=4, min_freq=1)
    assert v1 == v2
    # single chars always present even past the budget
    assert {"a", "b", "c"} <= set(v1)
    with pytest.raises(ValueError):
        build_wordpiece_vocab(df, vocab_size=0)


# ----------------------------------------------------------- plan shape
def test_tokenize_plan_has_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = wordpiece_tokenize(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "Python" in plan
