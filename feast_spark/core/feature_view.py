"""Feature view metadata model.

Mirrors the reference's abstractions (entity.py:28-99, field.py:27,
feature_view.py:69-280, batch_feature_view.py:31-125,
sorted_feature_view.py:29-67, on_demand_feature_view.py:46-212,
aggregation.py:11-58) as plain dataclasses — views are metadata; all
execution lives in operators/ and core/store.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import timedelta
from typing import Callable, Sequence

import pandas as pd


@dataclass(frozen=True)
class Entity:
    """Named join key (reference entity.py:28-99)."""

    name: str
    join_key: str | None = None

    @property
    def key(self) -> str:
        return self.join_key or self.name


@dataclass(frozen=True)
class Field:
    """(name, dtype) schema element; dtype is a Spark SQL type string
    ("int", "array<int>", "float", ...)."""

    name: str
    dtype: str = "string"


@dataclass(frozen=True)
class Aggregation:
    """(column, function, time_window, slide_interval) spec
    (reference aggregation.py:11-58). Unlike the reference Spark node
    (nodes.py:126-133), ``slide_interval`` is honored."""

    column: str
    function: str
    time_window: timedelta | None = None
    slide_interval: timedelta | None = None

    @property
    def output_name(self) -> str:
        if self.time_window is not None:
            return f"{self.function}_{self.column}_{int(self.time_window.total_seconds())}s"
        return f"{self.function}_{self.column}"


@dataclass
class FeatureView:
    """Logical feature group over one source (reference
    feature_view.py:69-280). ``ttl`` of 0/None means infinite
    (feature_view.py:155)."""

    name: str
    source: object  # SparkSource | DataFrameSource
    entities: Sequence[Entity] = ()
    schema: Sequence[Field] = ()
    ttl: timedelta | None = None
    online: bool = True
    offline: bool = True
    # DataFrame-level transformation applied after load (reference
    # BatchFeatureView.udf, spark_transformation.py:95-122)
    udf: Callable | None = None
    aggregations: Sequence[Aggregation] = ()
    # derived-view DAG: source_views are upstream FeatureViews
    # (feature_view.py:166-205, feature_resolver.py:28-95)
    source_views: Sequence["FeatureView"] = ()
    filter_expr: str | None = None

    @property
    def join_keys(self) -> list[str]:
        return [e.key for e in self.entities]

    @property
    def ttl_seconds(self) -> int:
        if self.ttl is None:
            return 0
        return int(self.ttl.total_seconds())

    @property
    def feature_cols(self) -> list[str] | None:
        if self.aggregations:
            return [a.output_name for a in self.aggregations]
        if self.schema:
            # exclude keys AND the timestamp columns — a Feast-style
            # schema routinely declares them, but they are join
            # machinery, not features (the inferred path and the online
            # fallback already exclude them)
            excl = set(self.join_keys) | {
                self.timestamp_field,
                self.created_timestamp_column,
            }
            return [f.name for f in self.schema if f.name not in excl]
        return None  # infer from source at build time

    @property
    def timestamp_field(self) -> str:
        return getattr(self.source, "timestamp_field", "event_timestamp")

    @property
    def created_timestamp_column(self) -> str | None:
        return getattr(self.source, "created_timestamp_column", None)


@dataclass
class BatchFeatureView(FeatureView):
    pass


@dataclass
class SortedFeatureView(FeatureView):
    """Range-query view: materialization skips dedup/agg and preserves
    sort-key order (reference sorted_feature_view.py:29-67,
    feature_builder.py:69-83)."""

    sort_keys: Sequence[tuple[str, str]] = ()  # (column, "ASC"|"DESC")


@dataclass
class StreamFeatureView(FeatureView):
    """FeatureView over a streaming source (reference
    stream_feature_view.py:43-140): same retrieval semantics, plus a
    stream ingest pipeline (udf + aggregations honored in the stream).
    ``stream_source`` describes the live feed; ``source`` remains the
    offline batch table the stream lands into (and retrieval reads)."""

    stream_source: object | None = None  # dict/conf consumed by StreamProcessor
    watermark_delay: str | None = None


@dataclass
class OnDemandFeatureView:
    """Row-level post-retrieval transformation (reference
    on_demand_feature_view.py:46-212; transformation modes
    transformation/mode.py:1-10). Executed distributed — not
    driver-side like the reference (offline_store.py:155-167).

    ``mode``:
    * ``"pandas"`` — ``udf(pd.DataFrame) -> pd.DataFrame`` of the new
      columns (reference pandas_transformation.py:19-99), via
      mapInPandas;
    * ``"python"`` — ``udf(dict[str, list]) -> dict[str, list]``
      (reference python_transformation.py:18-91's dict contract),
      executed over the same Arrow batches;
    * ``"sql"`` — ``udf`` is an ANSI-SQL string with an ``{input}``
      placeholder for the retrieved frame's temp view; it must SELECT
      the new columns alongside ``{input}.*`` (reference
      spark_transformation.py:104-119 SQL mode)."""

    name: str
    udf: Callable[[pd.DataFrame], pd.DataFrame] | str
    schema: Sequence[Field] = ()  # output columns this ODFV adds
    request_schema: Sequence[Field] = ()  # required entity_df columns
    mode: str = "pandas"

    @property
    def output_fields(self) -> list[Field]:
        return list(self.schema)


@dataclass
class FeatureService:
    """Named bundle of feature refs (reference feature_service.py)."""

    name: str
    features: Sequence[str] = dc_field(default_factory=list)
