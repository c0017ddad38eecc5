"""Property-based tests: the distributed WordPiece apply must agree
with an independent in-process reference implementation on arbitrary
ASCII inputs, and detokenize must invert it for UNK-free output."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from feast_spark.pipeline.tokenize import (
    DEFAULT_VOCAB,
    PRETOKEN_PATTERN,
    UNK_TOKEN,
    wordpiece_detokenize,
    wordpiece_tokenize,
)

_PAT = re.compile(PRETOKEN_PATTERN)
_START = frozenset(p for p in DEFAULT_VOCAB if not p.startswith("##"))
_CONT = frozenset(p[2:] for p in DEFAULT_VOCAB if p.startswith("##"))


def _ref_tokenize(text: str, max_word_len: int = 16) -> tuple[list[str], int]:
    """Straight-line reference: no memoization, no vectorization."""
    toks, n_unk = [], 0
    for word in _PAT.findall(text.lower()):
        if len(word) > max_word_len:
            toks.append(UNK_TOKEN)
            n_unk += 1
            continue
        pos, out, dead = 0, [], False
        while pos < len(word):
            for end in range(len(word), pos, -1):
                sub = word[pos:end]
                if (sub in _START) if pos == 0 else (sub in _CONT):
                    out.append(sub if pos == 0 else "##" + sub)
                    pos = end
                    break
            else:
                dead = True
                break
        if dead:
            toks.append(UNK_TOKEN)
            n_unk += 1
        else:
            toks.extend(out)
    return toks, n_unk


# printable ASCII + whitespace, skewed toward word-like content
_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("abcdefghijklmnop0123 .,!?-_#éAB\t"),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(_texts)
def test_spark_matches_reference_on_random_text(spark, texts):
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(texts)), "text": texts}))
    rows = (
        wordpiece_tokenize(df).orderBy("i").select("tokens", "n_unk").collect()
    )
    for text, row in zip(texts, rows):
        exp_toks, exp_unk = _ref_tokenize(text)
        assert list(row["tokens"]) == exp_toks, text
        assert row["n_unk"] == exp_unk, text


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(_texts)
def test_detokenize_inverts_for_unk_free_rows(spark, texts):
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(texts)), "text": texts}))
    out = (
        wordpiece_tokenize(df)
        .withColumn("rt", wordpiece_detokenize(F.col("tokens")))
        .orderBy("i")
        .collect()
    )
    for text, row in zip(texts, out):
        if row["n_unk"] == 0:
            assert row["rt"] == " ".join(_PAT.findall(text.lower())), text
