"""Data sources: where feature rows come from.

Reference: SparkSource (spark_offline_store/spark_source.py:31-135)
supports table / SQL query / file path in {csv,json,parquet,delta,avro,
iceberg}; DataSource carries ``timestamp_field``,
``created_timestamp_column``, ``field_mapping`` (source→feature rename),
``date_partition_column`` (data_source.py ctor args). We keep that
contract but load lazily through ``spark.read`` so Catalyst sees the
whole plan (predicate pushdown + partition pruning reach the scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FILE_FORMATS = {"csv", "json", "parquet", "delta", "avro", "orc"}


def apply_field_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename source columns to feature names, REJECTING mappings that
    would produce duplicate column names (two sources mapped to one
    target, or a target colliding with an unmapped column) — otherwise
    the failure surfaces later as an AMBIGUOUS_REFERENCE deep inside a
    join, far from the misconfigured source."""
    out_names = [mapping.get(c, c) for c in df.columns]
    dupes = sorted({n for n in out_names if out_names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"field_mapping produces duplicate column names {dupes} "
            f"(mapping={mapping})"
        )
    return df.select(*[F.col(c).alias(mapping.get(c, c)) for c in df.columns])


@dataclass
class SparkSource:
    """Base source. Exactly one of ``path``, ``table``, ``query`` set."""

    name: str = ""
    path: str | None = None
    file_format: str = "parquet"
    table: str | None = None
    query: str | None = None
    timestamp_field: str = "event_timestamp"
    created_timestamp_column: str | None = None
    field_mapping: dict[str, str] = field(default_factory=dict)
    date_partition_column: str | None = None
    read_options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        set_count = sum(x is not None for x in (self.path, self.table, self.query))
        if set_count != 1:
            raise ValueError("exactly one of path/table/query must be set")
        if self.path is not None and self.file_format not in _FILE_FORMATS | {"iceberg"}:
            raise ValueError(f"unsupported format {self.file_format!r}")

    def load(self, spark: SparkSession) -> DataFrame:
        """Read and apply ``field_mapping`` renames (source col → feature
        name; reference reverse-maps in utils.py:145-207)."""
        if self.path is not None:
            reader = spark.read.format(self.file_format)
            for k, v in self.read_options.items():
                reader = reader.option(k, v)
            df = reader.load(self.path)
        elif self.table is not None:
            # Iceberg path: ``catalog.db.table`` resolved by the session's
            # SparkCatalog conf (reference repo_config.py:261-268); on a
            # cluster this gives hidden-partition pruning + snapshot reads.
            df = spark.table(self.table)
        else:
            df = spark.sql(self.query)
        if self.field_mapping:
            df = apply_field_mapping(df, self.field_mapping)
        return df


def ParquetSource(path: str, **kw) -> SparkSource:
    return SparkSource(path=path, file_format="parquet", **kw)


def TableSource(table: str, **kw) -> SparkSource:
    return SparkSource(table=table, **kw)


def QuerySource(query: str, **kw) -> SparkSource:
    return SparkSource(query=query, **kw)


@dataclass
class DataFrameSource:
    """In-memory source wrapping an existing DataFrame (tests, derived
    views)."""

    df: DataFrame
    timestamp_field: str = "event_timestamp"
    created_timestamp_column: str | None = None
    field_mapping: dict[str, str] = field(default_factory=dict)
    date_partition_column: str | None = None
    name: str = ""

    def load(self, spark: SparkSession) -> DataFrame:
        df = self.df
        if self.field_mapping:
            df = apply_field_mapping(df, self.field_mapping)
        return df
