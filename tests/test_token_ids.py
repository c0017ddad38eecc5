"""pieces_to_ids / ids_to_pieces: round trip, UNK/out-of-range
handling, and the full text -> ids -> text composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feast_spark.pipeline.tokenize import (
    DEFAULT_VOCAB,
    UNK_TOKEN,
    ids_to_pieces,
    pieces_to_ids,
    vocab_with_ids,
    wordpiece_detokenize,
    wordpiece_tokenize,
)


def test_vocab_with_ids_is_deterministic_and_dense():
    table = vocab_with_ids()
    assert table[0] == (UNK_TOKEN, 0)
    assert [i for _, i in table] == list(range(len(DEFAULT_VOCAB) + 1))
    assert [p for p, _ in table[1:]] == list(DEFAULT_VOCAB)
    with pytest.raises(ValueError, match="unk_token"):
        vocab_with_ids(vocab=["a", "[UNK]"])


def test_round_trip_and_unk(spark):
    df = spark.createDataFrame(
        [(["the", "##ing", UNK_TOKEN, "not-a-piece"],)], "tokens array<string>"
    )
    out = df.select(
        pieces_to_ids(F.col("tokens")).alias("ids")
    ).select(
        "ids", ids_to_pieces(F.col("ids")).alias("back")
    ).head()
    assert out["ids"][0] > 0 and out["ids"][1] > 0
    assert out["ids"][2] == 0 and out["ids"][3] == 0  # UNK + OOV both -> 0
    assert list(out["back"]) == ["the", "##ing", UNK_TOKEN, UNK_TOKEN]


def test_out_of_range_ids_decode_to_unk(spark):
    df = spark.createDataFrame([([-1, 0, 10 ** 6],)], "ids array<int>")
    back = df.select(ids_to_pieces(F.col("ids")).alias("p")).head()["p"]
    assert list(back) == [UNK_TOKEN, UNK_TOKEN, UNK_TOKEN]


def test_text_to_ids_to_text_composition(spark):
    texts = ["the big data table was sorted fast", "merge and join, 2019!"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = (
        wordpiece_tokenize(df)
        .withColumn("ids", pieces_to_ids(F.col("tokens")))
        .withColumn("back", ids_to_pieces(F.col("ids")))
        .withColumn("rt", wordpiece_detokenize(F.col("back")))
        .collect()
    )
    for row in out:
        assert row["n_unk"] == 0
        assert list(row["back"]) == list(row["tokens"])
    assert out[0]["rt"] == texts[0]


def test_ids_plan_is_udf_free(spark):
    """The mapping itself must stay codegen-side: no BatchEvalPython /
    ArrowEvalPython node may appear for pieces_to_ids over a plain
    token array (the tokenizer's UDF is upstream and not involved)."""
    df = spark.createDataFrame([(["the"],)], "tokens array<string>")
    plan = df.select(
        pieces_to_ids(F.col("tokens")).alias("ids")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
