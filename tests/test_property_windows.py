"""Property-based checks for the window operators: sessionization and
trailing rolling aggregation against brute-force pandas references over
randomized event sets (ties, duplicates, gaps at the boundary).
"""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from feast_spark import datagen
from feast_spark.operators.windows import rolling_agg, sessionize

TS0 = pd.Timestamp("2024-01-01")

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),          # key
        st.integers(min_value=0, max_value=50),  # offset in 100s units
        st.integers(min_value=0, max_value=999),  # value
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, events):
    pdf = pd.DataFrame(
        {
            "k": [e[0] for e in events],
            "ts": [TS0 + pd.Timedelta(seconds=100 * e[1]) for e in events],
            "v": [float(e[2]) for e in events],
            "eid": list(range(len(events))),
        }
    )
    return pdf, datagen.to_spark(spark, pdf.rename(columns={"ts": "event_timestamp"})).withColumnRenamed(
        "event_timestamp", "ts"
    )


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(events=events_strategy, gap_units=st.integers(min_value=1, max_value=10))
def test_sessionize_matches_bruteforce(spark, events, gap_units):
    gap = 100 * gap_units
    pdf, df = _df(spark, events)
    got = (
        sessionize(df, ["k"], "ts", gap, order_tiebreak=["eid"])
        .toPandas()
        .sort_values(["k", "ts", "eid"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp_rows = []
    for k, g in pdf.sort_values(["ts", "eid"], kind="mergesort").groupby("k"):
        sid = -1
        prev = None
        for _, r in g.iterrows():
            if prev is None or (r["ts"] - prev).total_seconds() > gap:
                sid += 1
            prev = r["ts"]
            exp_rows.append((k, r["ts"], r["eid"], sid))
    exp = (
        pd.DataFrame(exp_rows, columns=["k", "ts", "eid", "session_id"])
        .sort_values(["k", "ts", "eid"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert got["session_id"].astype(int).tolist() == exp["session_id"].tolist()


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(events=events_strategy, lookback_units=st.integers(min_value=1, max_value=10))
def test_rolling_trailing_matches_bruteforce(spark, events, lookback_units):
    lookback = 100 * lookback_units
    pdf, df = _df(spark, events)
    got = (
        rolling_agg(df, ["k"], "ts", [("sum", "v")], lookback)
        .toPandas()
        .sort_values(["k", "ts", "eid", "v"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp_vals = []
    base = pdf.sort_values(["k", "ts", "eid", "v"], kind="mergesort").reset_index(drop=True)
    for _, r in base.iterrows():
        mask = (
            (pdf["k"] == r["k"])
            & (pdf["ts"] >= r["ts"] - pd.Timedelta(seconds=lookback))
            & (pdf["ts"] <= r["ts"])
        )
        exp_vals.append(pdf.loc[mask, "v"].sum())
    assert got["sum_v_trailing%ds" % lookback].tolist() == exp_vals
