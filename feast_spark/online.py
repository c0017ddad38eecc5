"""Minimal online store: latest-feature serving from a materialized
key-value snapshot.

The reference serves online features from Redis/DynamoDB/etc. via
``get_online_features`` (feature_store.py online path). This engine's
deployment target is the offline/training side, but the loop is
completed with a file-backed online snapshot:

* ``push_online`` — latest-per-key dedup + bucketed parquet snapshot
  (bucket by key hash → a lookup touches one bucket);
* ``LocalOnlineStore.get_online_features`` — broadcast the (small)
  request keys against the snapshot, one bucket-pruned scan.

On a cluster, swap the parquet snapshot for a real KV store by passing
a ``write_fn`` to ``materialize.writers.write_online_batch`` — the
engine-side plumbing (executor-side pushes, row accounting) is
identical (reference SparkWriteNode, compute_engines/spark/nodes.py:304-352).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.dedup import latest_row_dedup

N_BUCKETS = 32


@dataclass
class LocalOnlineStore:
    path: str

    def push_online(
        self,
        df: DataFrame,
        join_keys: Sequence[str],
        ts_col: str = "event_timestamp",
        created_col: str | None = None,
        mode: str = "overwrite",
    ) -> int:
        """Materialize the latest row per entity into the online
        snapshot, bucketed by key hash for pruned point lookups."""
        latest = latest_row_dedup(df, list(join_keys), ts_col, created_col)
        bucketed = latest.withColumn(
            "__bucket", F.pmod(F.hash(*join_keys), F.lit(N_BUCKETS))
        )
        (
            bucketed.repartition(N_BUCKETS, "__bucket")
            .write.mode(mode)
            .partitionBy("__bucket")
            .parquet(self.path)
        )
        return latest.count()

    def get_online_features(
        self,
        spark: SparkSession,
        entity_rows: DataFrame,
        join_keys: Sequence[str],
        feature_cols: Sequence[str] | None = None,
    ) -> DataFrame:
        """Latest features for the requested entities (left join — missing
        entities keep NULLs, mirroring offline semantics)."""
        snap = spark.read.parquet(self.path)
        keys = list(join_keys)
        sel = (
            keys + list(feature_cols)
            if feature_cols
            else [c for c in snap.columns if c != "__bucket"]
        )
        req = entity_rows.withColumn(
            "__bucket", F.pmod(F.hash(*keys), F.lit(N_BUCKETS))
        )
        # bucket-pruned join: requested buckets only (partition pruning
        # on the snapshot's __bucket directory column)
        buckets = [r["__bucket"] for r in req.select("__bucket").distinct().collect()]
        snap = snap.filter(F.col("__bucket").isin(buckets)).select("__bucket", *sel)
        return req.join(snap, on=["__bucket", *keys], how="left").drop("__bucket")

    def exists(self) -> bool:
        return os.path.isdir(self.path)
