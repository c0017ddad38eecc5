"""feast_spark — a from-scratch PySpark-native feature-engineering engine.

Re-implements the query semantics of the ExpediaGroup/feast offline store
(point-in-time / as-of join with TTL cutoff, latest-before dedup with
created-timestamp tie-break, windowed aggregation, multi-view retrieval,
materialization with idempotent resume) as idiomatic Spark DataFrame ops
plus vectorized pandas/Arrow UDFs — NOT a port of the reference's SQL
templates (reference: sdk/python/feast/infra/offline_stores/contrib/
spark_offline_store/spark.py:674-848).

Also provides the large-scale training-data pipeline surface: text dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity
search, text analysis, and multimodal column plumbing.
"""

from feast_spark.core.feature_view import (
    Aggregation,
    Entity,
    FeatureService,
    FeatureView,
    Field,
    OnDemandFeatureView,
    SortedFeatureView,
    StreamFeatureView,
)
from feast_spark.core.registry import FileRegistry
from feast_spark.core.saved_dataset import SavedDataset, load_saved_dataset, save_dataset
from feast_spark.core.source import ParquetSource, QuerySource, SparkSource, TableSource
from feast_spark.core.store import FeatureStore
from feast_spark.materialize.feature_logging import FeatureLogger
from feast_spark.online import LocalOnlineStore
from feast_spark.operators.asof_join import point_in_time_join
from feast_spark.operators.dedup import latest_row_dedup
from feast_spark.session import get_spark
from feast_spark.validation import (
    DatasetProfiler,
    Expect,
    ValidationProfile,
    ValidationReference,
    validate_or_raise,
)

__all__ = [
    "DatasetProfiler",
    "Expect",
    "ValidationProfile",
    "ValidationReference",
    "validate_or_raise",
    "FeatureLogger",
    "FileRegistry",
    "LocalOnlineStore",
    "SavedDataset",
    "load_saved_dataset",
    "save_dataset",
    "Aggregation",
    "Entity",
    "FeatureService",
    "FeatureStore",
    "FeatureView",
    "Field",
    "OnDemandFeatureView",
    "ParquetSource",
    "QuerySource",
    "SortedFeatureView",
    "SparkSource",
    "StreamFeatureView",
    "TableSource",
    "get_spark",
    "latest_row_dedup",
    "point_in_time_join",
]

__version__ = "0.1.0"
