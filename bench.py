"""Benchmark harness (driver contract).

Runs the headline as-of-join + window-feature materialization job on the
BASELINE.json-shaped synthetic token-sequence table, plus the operator
queries at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, and prints ONE JSON line::

    {"metric": "asof_window_materialization_throughput",
     "value": <sequences/sec>, "unit": "seq/sec",
     "queries": {...per-query seconds...}, "sf": ...}

The headline metric matches BASELINE.json: sequences/sec through the
full PIT-join + windowed-feature pipeline (lag/lead + trailing windows +
sessionization materialized per spine row). Scaling-efficiency evidence
(N vs 4N cores) is produced by ``tools/bench_scaling.py`` →
``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# headline scale: ~SEQ_DOCS*SEQ_VERSIONS feature rows, SPINE_ROWS spine rows
SEQ_DOCS = int(os.environ.get("BENCH_SEQ_DOCS", "100000"))
SEQ_VERSIONS = int(os.environ.get("BENCH_SEQ_VERSIONS", "6"))
SPINE_ROWS = int(os.environ.get("BENCH_SPINE_ROWS", "400000"))
# join_dedup (Catalyst-native) A/B-measured faster than merge_asof on
# this box AND scales 0.94 from 2->8 cores; merge_asof remains the
# per-query benchmark entry and the hot-key-fan-out scale path
STRATEGY = os.environ.get("BENCH_STRATEGY", "join_dedup")


def _noop_write(df) -> None:
    """Force full materialization of every column (noop sink)."""
    df.write.format("noop").mode("overwrite").save()


def headline_job(spark) -> tuple[float, int]:
    """PIT as-of join (strategy $BENCH_STRATEGY, default join_dedup —
    the Catalyst conditional-join path; merge_asof is the opt-in
    hot-key-fan-out variant) of the spine against the token-sequence
    table + windowed feature engineering, materialized. Returns
    (seconds, spine_rows)."""
    from pyspark.sql import functions as F

    from feast_spark.datagen import spark_entity_spine, spark_token_sequences
    from feast_spark.operators.asof_join import point_in_time_join
    from feast_spark.operators.windows import lag_lead_features, rolling_agg, sessionize

    seqs = spark_token_sequences(spark, SEQ_DOCS, SEQ_VERSIONS)
    spine = spark_entity_spine(spark, SPINE_ROWS, SEQ_DOCS)

    t0 = time.monotonic()
    joined = point_in_time_join(
        spine,
        seqs,
        ["doc_id"],
        ["tokens", "n_tok", "source"],
        created_col="created",
        ttl_seconds=3 * 86400,
        strategy=STRATEGY,
    )
    feats = lag_lead_features(
        joined.filter(F.col("n_tok").isNotNull()),
        ["doc_id"],
        "event_timestamp",
        ["n_tok"],
        offsets=[1],
    )
    feats = rolling_agg(feats, ["doc_id"], "event_timestamp", [("sum", "n_tok")], 86400)
    feats = sessionize(feats, ["doc_id"], "event_timestamp", 6 * 3600)
    _noop_write(feats)
    return time.monotonic() - t0, SPINE_ROWS


def main() -> None:
    import statistics

    from feast_spark.session import get_spark

    spark = get_spark("feast_spark_bench", parallelism=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # Ambient VM load moves single-run timings ±15-25% (measured across
    # rounds 1-3) — single-run deltas are unactionable, so every number
    # reported is a MEDIAN of BENCH_RUNS runs (default 3) with the raw
    # runs preserved in "queries_detail".
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}

    def record(name: str, samples: list) -> None:
        med = statistics.median(samples)
        timings[name] = round(med, 3)
        detail[name] = {
            "median": round(med, 3),
            "min": round(min(samples), 3),
            "runs": [round(s, 3) for s in samples],
        }

    # headline: one warmup (JIT/codegen), then BENCH_RUNS timed runs
    headline_job(spark)
    samples, rows = [], 0
    for _ in range(runs):
        secs, rows = headline_job(spark)
        samples.append(secs)
    record("headline_asof_window_materialization", samples)
    throughput = rows / timings["headline_asof_window_materialization"]

    for name, fn in entrymod.queries().items():
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            _noop_write(fn(spark, SF_DIR))
            samples.append(time.monotonic() - t0)
            # queries persist() reusable intermediates; drop them between
            # runs so 40+ cached lineages don't squeeze the executor heap
            # (also keeps every run cache-cold — comparable)
            spark.catalog.clearCache()
        record(name, samples)

    print(
        json.dumps(
            {
                "metric": "asof_window_materialization_throughput",
                "value": round(throughput, 1),
                "unit": "seq/sec",
                "queries": timings,
                "queries_detail": detail,
                "bench_runs": runs,
                "sf": 0.1 if SF_DIR.rstrip("/").endswith("sf0.1") else SF_DIR,
                "headline_rows": rows,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
