"""Feature logging: a schema-contracted, date-partitioned log of served
features.

Reference parity (feature_logging.py:1-176, feature_store.py:3038
``write_logged_features``): every batch of served features is appended
under a declared log schema — feature columns + request context +
``__log_timestamp`` / ``__log_date`` partitions — so training-serving
skew analysis can replay exactly what was served when. Round 1 had the
partitioned append only; this adds the schema/metadata contract.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_spark.materialize.writers import align_schema

LOG_TIMESTAMP = "__log_timestamp"
LOG_DATE = "__log_date"
_SCHEMA_FILE = "_log_schema.json"


@dataclass
class FeatureLogger:
    """Appends served-feature batches under a fixed contract.

    The first ``log()`` freezes the schema (feature + context columns)
    into ``_log_schema.json``; later batches are cast-aligned to it and
    extra/missing columns are an error — silent drift is exactly what a
    serving log must not allow. Writes partition by ``__log_date`` so a
    skew investigation scans one day, not the whole log."""

    path: str
    service_name: str = ""

    def _schema_path(self) -> str:
        return os.path.join(self.path, _SCHEMA_FILE)

    def _load_schema(self) -> T.StructType | None:
        if os.path.exists(self._schema_path()):
            with open(self._schema_path()) as f:
                return T.StructType.fromJson(json.load(f))
        return None

    def _store_schema(self, schema: T.StructType) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self._schema_path(), "w") as f:
            json.dump(schema.jsonValue(), f)

    def log(self, df: DataFrame, log_timestamp=None) -> int:
        """Append one served batch; returns rows logged (counted from the
        cached frame — the input DAG executes once, not once for the
        write and again for the count)."""
        df = df.persist()
        try:
            stamped = df.withColumn(
                LOG_TIMESTAMP,
                F.lit(log_timestamp).cast("timestamp") if log_timestamp is not None
                else F.current_timestamp(),
            )
            contract = self._load_schema()
            if contract is None:
                contract = T.StructType(list(stamped.schema.fields))
                self._store_schema(contract)
            else:
                stamped = align_schema(stamped, contract)
            out = stamped.withColumn(
                LOG_DATE, F.to_date(F.col(LOG_TIMESTAMP)).cast("string")
            )
            out.write.mode("append").partitionBy(LOG_DATE).parquet(self.path)
            return df.count()
        finally:
            df.unpersist()

    def read(self, spark: SparkSession, date: str | None = None) -> DataFrame:
        df = spark.read.option("basePath", self.path).parquet(
            os.path.join(self.path, f"{LOG_DATE}={date or '*'}")
        )
        return df
