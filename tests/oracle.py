"""Brute-force pandas oracle for point-in-time correctness.

Port of the reference's test oracle semantics
(sdk/python/tests/utils/feature_records.py:23-47 ``find_latest_record``):
linear scan for the latest record in ``[ts - ttl, ts]`` (inclusive both
ends; upper bound inclusive ⇒ no temporal leakage check is
``record.ts <= entity.ts``), filtered by entity keys, tie-broken by the
created timestamp. O(spine × rows) — test-scale only.
"""

from __future__ import annotations

import pandas as pd


def find_latest_record(
    records: pd.DataFrame,
    entity_row: dict,
    keys: list[str],
    ts_col: str = "event_timestamp",
    created_col: str | None = None,
    ttl_seconds: int | None = None,
    feature_cols: list[str] | None = None,
) -> dict:
    ets = entity_row["event_timestamp"]
    mask = records[ts_col] <= ets
    if ttl_seconds:
        mask &= records[ts_col] >= ets - pd.Timedelta(seconds=ttl_seconds)
    for k in keys:
        mask &= records[k] == entity_row[k]
    cand = records[mask]
    if cand.empty:
        return {}
    sort_cols = [ts_col] + ([created_col] if created_col else [])
    best = cand.sort_values(sort_cols, kind="mergesort").iloc[-1]
    cols = feature_cols or [c for c in records.columns if c not in set(keys) | {ts_col, created_col}]
    return {c: best[c] for c in cols}


def expected_pit_df(
    spine: pd.DataFrame,
    features: pd.DataFrame,
    keys: list[str],
    ts_col: str = "event_timestamp",
    created_col: str | None = None,
    ttl_seconds: int | None = None,
    feature_cols: list[str] | None = None,
) -> pd.DataFrame:
    rows = []
    fcols = feature_cols or [
        c for c in features.columns if c not in set(keys) | {ts_col, created_col}
    ]
    for _, er in spine.iterrows():
        rec = find_latest_record(
            features, er, keys, ts_col, created_col, ttl_seconds, fcols
        )
        out = dict(er)
        for c in fcols:
            out[c] = rec.get(c)
        rows.append(out)
    return pd.DataFrame(rows)
