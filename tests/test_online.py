"""Online snapshot store: push latest + bucket-pruned point lookups."""

import pandas as pd

from feast_spark import datagen
from feast_spark.online import LocalOnlineStore


def test_push_and_get_online(spark, tmp_path):
    store = LocalOnlineStore(str(tmp_path / "online"))
    pdf = datagen.token_sequences(n_docs=30, versions_per_doc=4, seed=6)
    df = datagen.to_spark(spark, pdf)
    n = store.push_online(df, ["doc_id"], created_col="created")
    assert n == pdf["doc_id"].nunique()

    req = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["doc_00000001", "doc_00000002", "nope"]})
    )
    got = store.get_online_features(spark, req, ["doc_id"], ["n_tok", "source"]).toPandas()
    assert len(got) == 3
    assert got.set_index("doc_id")["n_tok"].isna()["nope"]
    # served value equals the pandas latest-row oracle
    exp = (
        pdf.sort_values(["event_timestamp", "created"], kind="mergesort")
        .groupby("doc_id")
        .tail(1)
        .set_index("doc_id")["n_tok"]
    )
    for d in ("doc_00000001", "doc_00000002"):
        assert got.set_index("doc_id")["n_tok"][d] == exp[d]
