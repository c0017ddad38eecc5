"""Windowed feature engineering vs pandas oracles: lag/lead, tumbling and
sliding aggregation (slide honored, unlike reference nodes.py:126-133),
rolling trailing frames, sessionization."""

import numpy as np
import pandas as pd
import pytest

from feast_spark import datagen
from feast_spark.operators.windows import (
    lag_lead_features,
    rolling_agg,
    session_stats,
    sessionize,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(3)
    n = 2000
    pdf = pd.DataFrame(
        {
            "doc_id": [f"doc_{i % 37:04d}" for i in range(n)],
            "event_timestamp": [
                datagen.EPOCH + pd.Timedelta(seconds=int(x))
                for x in np.sort(rng.integers(0, 14 * 86400, size=n))
            ],
            "n_tok": rng.integers(1, 512, size=n).astype(np.int64),
            "event_id": np.arange(n),
        }
    )
    # unique (doc_id, ts) to make lag/lead deterministic without tiebreaks
    pdf = pdf.drop_duplicates(["doc_id", "event_timestamp"]).reset_index(drop=True)
    return datagen.to_spark(spark, pdf), pdf


def test_lag_lead(spark, events):
    df, pdf = events
    got = (
        lag_lead_features(df, ["doc_id"], "event_timestamp", ["n_tok"], offsets=[1, 2])
        .toPandas()
        .sort_values(["doc_id", "event_timestamp"])
        .reset_index(drop=True)
    )
    exp = pdf.sort_values(["doc_id", "event_timestamp"]).reset_index(drop=True)
    g = exp.groupby("doc_id")["n_tok"]
    for n in (1, 2):
        assert np.allclose(
            got[f"n_tok_lag{n}"].fillna(-1), g.shift(n).fillna(-1).values
        )
        assert np.allclose(
            got[f"n_tok_lead{n}"].fillna(-1), g.shift(-n).fillna(-1).values
        )


def test_tumbling_agg(spark, events):
    df, pdf = events
    w = 6 * 3600
    got = (
        tumbling_agg(df, ["doc_id"], "event_timestamp", [("sum", "n_tok"), ("count", "n_tok")], w)
        .toPandas()
        .sort_values(["doc_id", "window_start"])
        .reset_index(drop=True)
    )
    p = pdf.copy()
    p["bucket"] = p["event_timestamp"].map(
        lambda t: int(t.timestamp()) // w * w
    )
    exp = (
        p.groupby(["doc_id", "bucket"])["n_tok"]
        .agg(["sum", "count"])
        .reset_index()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.array_equal(got[f"sum_n_tok_{w}s"].values, exp["sum"].values)
    assert np.array_equal(got[f"count_n_tok_{w}s"].values, exp["count"].values)
    # window_start aligns with the epoch bucket
    assert (
        got["window_start"].map(lambda t: int(t.timestamp())).values == exp["bucket"].values
    ).all()


def test_sliding_agg(spark, events):
    df, pdf = events
    w, s = 4 * 3600, 3600
    got = tumbling_agg(
        df, ["doc_id"], "event_timestamp", [("count", "n_tok")], w, slide_seconds=s
    ).toPandas()
    # every row lands in exactly w/s windows → total count preserved
    assert got[f"count_n_tok_{w}s"].sum() == len(pdf) * (w // s)
    # spot-check one (doc, window)
    row = got.iloc[0]
    lo = row["window_start"]
    hi = row["window_end"]
    mask = (
        (pdf["doc_id"] == row["doc_id"])
        & (pdf["event_timestamp"] >= lo.tz_localize("UTC") if lo.tzinfo is None else pdf["event_timestamp"] >= lo)
    )
    sub = pdf[(pdf["doc_id"] == row["doc_id"])]
    cnt = (
        (sub["event_timestamp"] >= pd.Timestamp(lo, tz="UTC"))
        & (sub["event_timestamp"] < pd.Timestamp(hi, tz="UTC"))
    ).sum()
    assert cnt == row[f"count_n_tok_{w}s"]


def test_rolling_agg(spark, events):
    df, pdf = events
    lb = 2 * 3600
    got = (
        rolling_agg(df, ["doc_id"], "event_timestamp", [("sum", "n_tok")], lb)
        .toPandas()
        .sort_values(["doc_id", "event_timestamp"])
        .reset_index(drop=True)
    )
    exp_vals = []
    p = pdf.sort_values(["doc_id", "event_timestamp"])
    for _, r in p.iterrows():
        m = (
            (p["doc_id"] == r["doc_id"])
            & (p["event_timestamp"] >= r["event_timestamp"] - pd.Timedelta(seconds=lb))
            & (p["event_timestamp"] <= r["event_timestamp"])
        )
        exp_vals.append(p.loc[m, "n_tok"].sum())
    assert np.array_equal(got[f"sum_n_tok_trailing{lb}s"].values, np.array(exp_vals))


def test_sessionize(spark):
    ts0 = pd.Timestamp("2024-01-01", tz="UTC")
    pdf = pd.DataFrame(
        {
            "doc_id": ["a"] * 5 + ["b"] * 3,
            "event_timestamp": [
                ts0,
                ts0 + pd.Timedelta(minutes=5),
                ts0 + pd.Timedelta(minutes=50),  # gap 45m > 30m → new session
                ts0 + pd.Timedelta(minutes=55),
                ts0 + pd.Timedelta(hours=3),  # new session
                ts0,
                ts0 + pd.Timedelta(minutes=29),  # within gap
                ts0 + pd.Timedelta(minutes=61),  # gap 32m → new session
            ],
            "v": range(8),
        }
    )
    df = datagen.to_spark(spark, pdf)
    got = (
        sessionize(df, ["doc_id"], "event_timestamp", gap_seconds=1800)
        .toPandas()
        .sort_values(["doc_id", "event_timestamp"])
    )
    assert got[got.doc_id == "a"]["session_id"].tolist() == [0, 0, 1, 1, 2]
    assert got[got.doc_id == "b"]["session_id"].tolist() == [0, 0, 1]

    stats = (
        session_stats(df, ["doc_id"], "event_timestamp", 1800, aggs=[("sum", "v")])
        .toPandas()
        .sort_values(["doc_id", "session_id"])
    )
    a0 = stats[(stats.doc_id == "a") & (stats.session_id == 0)].iloc[0]
    assert a0["n_events"] == 2 and a0["duration_s"] == 300.0 and a0["sum_v"] == 1
