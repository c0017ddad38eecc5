"""Explicit skew handling for hot entity keys.

The reference has no skew handling (Ray does a blind random_shuffle,
ray.py:484-495). At 10^12-sequence scale a Zipf-heavy doc_id
distribution makes the PIT shuffle and per-key aggregations lopsided:
one reducer gets the hot key's entire history. Tools here:

* ``salted_repartition`` — spread each key over S salt shards
  (``pmod(hash(ts), S)`` keeps a row's shard deterministic);
* ``salted_agg`` — two-phase aggregation: partial per (key, salt),
  merge per key. The classic sum/count/min/max decomposition; the
  second shuffle carries S rows per key instead of the raw history;
* ``detect_hot_keys`` — sampled frequency probe to pick keys worth
  salting (broadcast the hot set, salt only those rows — cold keys keep
  the single-shuffle path).

AQE's skew-join splitting (on in session defaults) already handles the
join case at runtime; these utilities cover aggregations and writes,
which AQE does not split.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial_fn, merge_fn) per supported aggregate — merge runs over the
# per-salt partials
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(
    df: DataFrame,
    salt_col: str = "__salt",
    shards: int = 16,
    on: str | None = None,
    deterministic: bool = False,
) -> DataFrame:
    """Salt column in ``[0, shards)``.

    With ``on`` set: deterministic ``pmod(hash(on), shards)`` — use a
    high-cardinality column (the recommended form for every use).
    Default (no ``on``): row-content hash PLUS a per-row position
    component, because a hot key's rows are often byte-identical
    (replayed logs, idempotent re-ingestion) and a pure content hash
    would send every copy to ONE shard — the exact skew salting exists
    to break.

    SAFETY: the positional default is NONDETERMINISTIC under stage
    retry (a recomputed task can assign different salts) and is only
    safe when the salt feeds an AGGREGATION (``salted_agg`` — correct
    for any shard assignment). Feeding it to a repartition/write risks
    row duplication/loss on fetch-failure retries, the same hazard
    class as round-robin ``repartition()``. ``deterministic=True``
    drops the positional component (pure content hash — retry-stable;
    byte-identical copies of a row share a shard, which only costs
    spreading, never correctness); ``salted_repartition`` uses it."""
    if on:
        src = F.hash(F.col(on))
    else:
        src = F.hash(
            F.concat_ws("\x00", *[F.col(c).cast("string") for c in df.columns])
        )
        if not deterministic:
            src = src + F.monotonically_increasing_id()
    return df.withColumn(salt_col, F.pmod(src, F.lit(shards)))


def salted_repartition(
    df: DataFrame,
    keys: Sequence[str],
    shards: int = 16,
    salt_on: str | None = None,
    salt_mode: str = "content",
) -> DataFrame:
    """Repartition on (keys..., salt) so a hot key spreads over
    ``shards`` partitions instead of one.

    Salt choice (a real three-way trade-off — pick consciously):

    * ``salt_on=<column>`` (RECOMMENDED): deterministic
      ``pmod(hash(col), shards)`` over a high-cardinality column
      (ingestion offset, event id). Retry-stable AND spreads
      byte-identical rows that differ in that column.
    * ``salt_mode="content"`` (default): deterministic full-row hash.
      Retry-stable, but byte-IDENTICAL copies of a row share a shard —
      for replayed-log workloads where a hot key's rows are exact
      duplicates this does NOT spread them; pass ``salt_on`` instead
      (truly indistinguishable rows cannot be deterministically told
      apart, so there is no salt that both spreads them and survives a
      shuffle-stage retry).
    * ``salt_mode="positional"``: content hash + per-row position.
      Spreads everything, but the position is NONDETERMINISTIC under
      fetch-failure stage retries (the round-robin-repartition hazard:
      recomputed tasks can re-salt rows, duplicating/losing them in
      committed reducer output). Safe ONLY when the input is a
      checkpointed/persisted deterministic dataset or the job is
      at-most-once.
    """
    if salt_mode not in ("content", "positional"):
        raise ValueError(f"salt_mode must be 'content' or 'positional', got {salt_mode!r}")
    if salt_on is not None and salt_mode == "positional":
        # with_salt's `on` branch would silently win and the caller's
        # explicit positional request (e.g. because salt_on is known
        # low-cardinality) would be ignored
        raise ValueError(
            "salt_on and salt_mode='positional' are contradictory — "
            "positional salting ignores the column; pass one or the other"
        )
    salted = with_salt(
        df, shards=shards, on=salt_on, deterministic=(salt_mode == "content")
    )
    return salted.repartition(*keys, "__salt").drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str]],
    shards: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: ``groupBy(keys, salt)`` partials
    then ``groupBy(keys)`` merge. Supports decomposable fns
    (sum/count/min/max; avg derived as sum/count)."""
    wants_avg = [(fn, col) for fn, col in aggs if fn in ("avg", "mean")]
    phase1_fns: list[tuple[str, str]] = []
    for fn, col in aggs:
        if fn in ("avg", "mean"):
            phase1_fns += [("sum", col), ("count", col)]
        elif fn in _DECOMPOSABLE:
            phase1_fns.append((fn, col))
        else:
            raise ValueError(f"{fn!r} is not decomposable for salted aggregation")
    phase1_fns = list(dict.fromkeys(phase1_fns))

    salted = with_salt(df, shards=shards, on=salt_on)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _DECOMPOSABLE[fn][0](col).alias(f"__p_{fn}_{col}")
            for fn, col in phase1_fns
        ]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](f"__p_{fn}_{col}").alias(f"{fn}_{col}")
            for fn, col in phase1_fns
        ]
    )
    for fn, col in wants_avg:
        # name by the fn the CALLER asked for ('mean_v' when requested
        # as mean) — the f"{fn}_{col}" convention every other path uses
        merged = merged.withColumn(
            f"{fn}_{col}", F.col(f"sum_{col}") / F.col(f"count_{col}")
        )
    keep = [*keys] + [
        f"{fn}_{col}" for fn, col in aggs if fn not in ("avg", "mean")
    ] + [f"{fn}_{col}" for fn, col in wants_avg]
    return merged.select(*dict.fromkeys(keep))


def detect_hot_keys(
    df: DataFrame,
    keys: Sequence[str],
    threshold_rows: int = 100_000,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """Sampled hot-key probe: keys whose estimated row count exceeds
    ``threshold_rows``. Returns a small DataFrame of hot keys suitable
    for ``F.broadcast``."""
    est = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*keys)
        .agg((F.count(F.lit(1)) / sample_fraction).alias("est_rows"))
        .filter(F.col("est_rows") >= threshold_rows)
    )
    return est.select(*keys, "est_rows")
