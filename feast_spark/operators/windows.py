"""Windowed feature engineering: lag/lead, tumbling/sliding aggregation,
sessionization by inactivity gap, rolling frames.

The reference's Aggregation spec (aggregation.py:11-58) declares
``(column, function, time_window, slide_interval)`` but its Spark node
ignores ``slide_interval`` (nodes.py:126-133); we implement slide
correctly. lag/lead and sessionization are new surface mandated by the
north rule (absent in the reference).

Scale notes: every operator here is a single hash shuffle on the
partition keys followed by a linear per-key pass (window sort or
map-side-combinable aggregation). Tumbling aggregation uses
``F.window`` which is map-side combinable (partial aggregation before
the shuffle) — at 100 TB the shuffle carries only partial aggregates,
not raw rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "count": F.count,
    "avg": F.avg,
    "mean": F.avg,
    "stddev": F.stddev,
    "approx_count_distinct": F.approx_count_distinct,
    "first": F.first,
    "last": F.last,
    "collect_list": F.collect_list,
}


def agg_fn(name: str) -> Column:
    try:
        return _AGG_FNS[name]
    except KeyError:
        raise ValueError(f"unsupported aggregation function {name!r}") from None


def _ts_seconds(col: str | Column) -> Column:
    """Whole epoch seconds (floor) of a timestamp column; routes
    TIMESTAMP_NTZ through TimestampType (UTC session) since Spark 4
    forbids direct ntz→numeric casts."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")


def _ts_fractional(col: str | Column) -> Column:
    """Microsecond-precision epoch seconds as double (for gap
    comparisons where sub-second precision matters)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def lag_lead_features(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    cols: Sequence[str],
    offsets: Sequence[int] = (1,),
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add ``{col}_lag{n}`` / ``{col}_lead{n}`` columns per entity key,
    ordered by event time (deterministic with ``order_tiebreak``)."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_tiebreak)
    out = df
    for c in cols:
        for n in offsets:
            out = out.withColumn(f"{c}_lag{n}", F.lag(c, n).over(w))
            out = out.withColumn(f"{c}_lead{n}", F.lead(c, n).over(w))
    return out


def tumbling_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    aggs: Sequence[tuple[str, str]],
    window_seconds: int,
    slide_seconds: int | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide_seconds`` set) window aggregation.

    Output: keys + ``window_start``/``window_end`` + ``{fn}_{col}_{w}s``
    columns (naming per reference nodes.py:134-138). Uses ``F.window``:
    tumbling windows are map-side combinable; sliding windows replicate
    each row into window/slide buckets before the partial aggregation.
    """
    wspec = (
        F.window(
            F.col(ts_col), f"{window_seconds} seconds", f"{slide_seconds} seconds"
        )
        if slide_seconds
        else F.window(F.col(ts_col), f"{window_seconds} seconds")
    )
    exprs = [
        agg_fn(fn)(col).alias(f"{fn}_{col}_{window_seconds}s") for fn, col in aggs
    ]
    out = df.groupBy(*keys, wspec.alias("__w")).agg(*exprs)
    return out.select(
        *keys,
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[f"{fn}_{col}_{window_seconds}s" for fn, col in aggs],
    )


def rolling_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    aggs: Sequence[tuple[str, str]],
    lookback_seconds: int,
    include_current: bool = True,
) -> DataFrame:
    """Per-ROW trailing aggregation over ``[ts - lookback, ts]`` — the
    "feature value as of each event" shape used for training-data
    point-in-time features. ``rangeBetween`` on the epoch keeps it a
    single window pass (no self-join).

    ``include_current=False`` means "strictly earlier events only": the
    range runs over epoch MICROseconds with upper bound -1µs, so only
    rows with the *identical* timestamp are excluded (a same-second but
    strictly-earlier 10:00:00.2 event still counts for a 10:00:00.8 row
    — an upper bound of -1 whole second dropped it). The inclusive path
    keeps whole-second flooring, which the cross-engine oracle pins."""
    if include_current:
        w = (
            Window.partitionBy(*keys)
            .orderBy(_ts_seconds(ts_col))
            .rangeBetween(-int(lookback_seconds), Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
            .rangeBetween(-int(lookback_seconds) * 1_000_000, -1)
        )
    out = df
    for fn, col in aggs:
        out = out.withColumn(
            f"{fn}_{col}_trailing{lookback_seconds}s", agg_fn(fn)(col).over(w)
        )
    return out


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign inactivity-gap session ids per entity key.

    A new session starts when the gap to the previous event for the same
    key strictly exceeds ``gap_seconds``. ``session_id`` is a 0-based
    per-key counter (cumulative sum of boundary flags) — two ordered
    window passes over one shuffle, no join.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_tiebreak)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((_ts_fractional(ts_col) - _ts_fractional(prev_ts)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("__new_s", new_session).withColumn(
        session_col,
        F.sum("__new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    ).drop("__new_s")


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    aggs: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Sessionize then aggregate one row per session (start/end/duration/
    n_events + requested aggs)."""
    s = sessionize(df, keys, ts_col, gap_seconds)
    exprs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(_ts_fractional(ts_col)) - F.min(_ts_fractional(ts_col))).alias(
            "duration_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
    ] + [agg_fn(fn)(col).alias(f"{fn}_{col}") for fn, col in aggs]
    return s.groupBy(*keys, "session_id").agg(*exprs)
