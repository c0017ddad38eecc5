from feast_spark.materialize.jobs import (
    MaterializationManifest,
    materialize_view,
    pull_latest,
)

__all__ = ["MaterializationManifest", "materialize_view", "pull_latest"]
