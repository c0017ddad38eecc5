"""Deterministic synthetic data matching the BASELINE.json input shape.

Generates the Iceberg-shaped table of pre-tokenized training sequences
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string,
event_timestamp, created)`` plus the retrieval spine and secondary
feature views described in FIXTURES.md. Mirrors the reference's seeded
test-corpus approach (sdk/python/feast/driver_test_data.py:37-330,
np.random.seed(0) at test_universal_historical_retrieval.py:44) —
including backfill rows (duplicate event_ts with different created) and
Zipf-skewed doc_ids for skew tests.

Everything is a pure function of (seed, size) — no wall-clock, no
external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EPOCH = pd.Timestamp("2024-01-01 00:00:00", tz="UTC")
VOCAB = 50257
SOURCES = np.array(["web", "book", "code", "wiki"])


def _doc_ids(n_docs: int) -> np.ndarray:
    return np.array([f"doc_{i:08d}" for i in range(n_docs)])


def token_sequences(
    n_docs: int = 200,
    versions_per_doc: int = 6,
    seed: int = 7,
    zipf_a: float = 1.3,
    backfill_frac: float = 0.15,
) -> pd.DataFrame:
    """Feature table: several timestamped versions per doc_id, hourly-ish
    cadence, Zipf-skewed extra versions for hot docs, and a backfill slice
    (same event_ts, later created) exercising the created tie-break."""
    rng = np.random.default_rng(seed)
    ids = _doc_ids(n_docs)
    rows = []
    # base versions: hourly cadence with jitter
    extra = np.minimum(rng.zipf(zipf_a, size=n_docs), 50)  # hot docs get more versions
    for d in range(n_docs):
        nv = versions_per_doc + int(extra[d]) - 1
        offs = np.sort(rng.choice(np.arange(0, 24 * 14), size=nv, replace=False))
        for v, off_h in enumerate(offs):
            ets = EPOCH + pd.Timedelta(hours=int(off_h), minutes=int(rng.integers(0, 60)))
            created = ets + pd.Timedelta(minutes=int(rng.integers(1, 120)))
            n_tok = int(rng.integers(1, 129))
            toks = rng.integers(0, VOCAB, size=n_tok).astype(np.int32)
            rows.append((ids[d], toks, n_tok, str(rng.choice(SOURCES)), ets, created))
    df = pd.DataFrame(
        rows, columns=["doc_id", "tokens", "n_tok", "source", "event_timestamp", "created"]
    )
    # backfill rows: duplicate event_ts, strictly later created, new tokens
    n_bf = int(len(df) * backfill_frac)
    bf_idx = rng.choice(len(df), size=n_bf, replace=False)
    bf = df.iloc[bf_idx].copy()
    bf["created"] = bf["created"] + pd.Timedelta(days=3)
    bf["tokens"] = [
        rng.integers(0, VOCAB, size=n).astype(np.int32) for n in bf["n_tok"]
    ]
    out = pd.concat([df, bf], ignore_index=True)
    out["n_tok"] = out["n_tok"].astype(np.int32)
    return out.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def entity_spine(
    features: pd.DataFrame,
    n_rows: int = 400,
    seed: int = 11,
    unknown_frac: float = 0.1,
) -> pd.DataFrame:
    """Retrieval spine: sampled doc_ids (plus unknown ones → NULL path),
    timestamps spread across and beyond the feature range, including
    before-any-feature (NULL), exact-boundary (ts == feature ts,
    inclusive), and post-TTL-expiry timestamps."""
    rng = np.random.default_rng(seed)
    known = features["doc_id"].unique()
    n_unknown = int(n_rows * unknown_frac)
    ids = np.concatenate(
        [
            rng.choice(known, size=n_rows - n_unknown),
            np.array([f"ghost_{i:04d}" for i in range(n_unknown)]),
        ]
    )
    lo = features["event_timestamp"].min() - pd.Timedelta(days=1)
    hi = features["event_timestamp"].max() + pd.Timedelta(days=10)
    span_s = int((hi - lo).total_seconds())
    ts = [lo + pd.Timedelta(seconds=int(rng.integers(0, span_s))) for _ in range(len(ids))]
    df = pd.DataFrame({"doc_id": ids, "event_timestamp": ts})
    # exact-boundary rows: spine ts equals a feature ts (inclusive <=)
    exact = features.sample(n=min(20, len(features)), random_state=seed)[
        ["doc_id", "event_timestamp"]
    ]
    out = pd.concat([df, exact], ignore_index=True)
    return out.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def doc_stats(
    n_docs: int = 200, hours: int = 72, seed: int = 13, late_dup_frac: float = 0.05
) -> pd.DataFrame:
    """Secondary numeric feature view (driver-hourly-stats style,
    driver_test_data.py:88-151), with injected duplicate late rows."""
    rng = np.random.default_rng(seed)
    ids = _doc_ids(n_docs)
    recs = []
    for d in range(0, n_docs, 2):  # half the docs have stats
        for h in range(0, hours, 4):
            ets = EPOCH + pd.Timedelta(hours=h)
            recs.append(
                (
                    ids[d],
                    np.float32(rng.random()),
                    np.float32(rng.random()),
                    np.int32(rng.integers(0, 1000)),
                    ets,
                    EPOCH + pd.Timedelta(days=30),
                )
            )
    df = pd.DataFrame(
        recs,
        columns=[
            "doc_id",
            "quality_score",
            "lang_conf",
            "view_count",
            "event_timestamp",
            "created",
        ],
    )
    dup = df.sample(frac=late_dup_frac, random_state=seed).copy()
    dup["created"] = dup["created"] + pd.Timedelta(hours=1)
    dup["quality_score"] = dup["quality_score"] + np.float32(0.5)
    out = pd.concat([df, dup], ignore_index=True)
    return out.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def global_stats(days: int = 14, seed: int = 17) -> pd.DataFrame:
    """Entityless (DUMMY_ENTITY) daily view."""
    rng = np.random.default_rng(seed)
    recs = [
        (
            int(rng.integers(1000, 5000)),
            float(rng.random()),
            EPOCH + pd.Timedelta(days=d),
            EPOCH + pd.Timedelta(days=d, hours=1),
        )
        for d in range(days)
    ]
    return pd.DataFrame(
        recs, columns=["total_docs", "avg_quality", "event_timestamp", "created"]
    )


def to_spark(spark, pdf: pd.DataFrame):
    """Create a Spark DataFrame with the canonical schema (tokens as
    array<int>, tz-aware UTC timestamps → TimestampType).

    NOTE: timestamps are handed to Spark as naive wall-times meaning
    UTC — the receiving session MUST have
    ``spark.sql.session.timeZone=UTC`` (engine sessions from
    ``get_spark`` do; ``__spark_entry__._prep`` pins driver sessions).
    A non-UTC session would reinterpret the wall-times and shift every
    instant."""
    from pyspark.sql import types as T

    fields = []
    for c in pdf.columns:
        if c == "tokens":
            fields.append(T.StructField(c, T.ArrayType(T.IntegerType(), False), True))
        elif c in ("event_timestamp", "created"):
            fields.append(T.StructField(c, T.TimestampType(), True))
        elif c == "n_tok" or c == "view_count":
            fields.append(T.StructField(c, T.IntegerType(), True))
        elif c == "total_docs":
            fields.append(T.StructField(c, T.LongType(), True))
        elif pdf[c].dtype == np.float32:
            fields.append(T.StructField(c, T.FloatType(), True))
        elif pdf[c].dtype == np.float64:
            fields.append(T.StructField(c, T.DoubleType(), True))
        elif pdf[c].dtype == np.int64:
            fields.append(T.StructField(c, T.LongType(), True))
        else:
            fields.append(T.StructField(c, T.StringType(), True))
    pdf2 = pdf.copy()
    if "tokens" in pdf2.columns:
        pdf2["tokens"] = pdf2["tokens"].map(lambda a: [int(x) for x in a])
    for c in ("event_timestamp", "created"):
        if c in pdf2.columns:
            pdf2[c] = pd.to_datetime(pdf2[c], utc=True).dt.tz_localize(None)
    return spark.createDataFrame(pdf2, schema=T.StructType(fields))


# ---------------------------------------------------------------------------
# Distributed (Spark-native) generator for benchmark scale — no driver-side
# pandas. Pure hash-based determinism: every cell is a function of
# (doc_id, version [, position]), so any executor count / partitioning
# produces identical data (resume- and cluster-size-independent).
# ---------------------------------------------------------------------------

def spark_token_sequences(spark, n_docs: int, versions: int = 6, partitions: int | None = None):
    """BASELINE.json-shaped feature table generated distributed:
    (doc_id string, tokens array<int>, n_tok int, source string,
    event_timestamp, created). ~`n_docs*versions` rows."""
    from pyspark.sql import functions as F

    base = spark.range(0, n_docs * versions, 1, partitions or spark.sparkContext.defaultParallelism)
    df = (
        base.withColumn("doc", (F.col("id") / versions).cast("long"))
        .withColumn("version", F.pmod(F.col("id"), F.lit(versions)))
        .withColumn("doc_id", F.format_string("doc_%08d", F.col("doc")))
        .withColumn("n_tok", (F.pmod(F.hash("doc_id", "version"), F.lit(128)) + 1).cast("int"))
        .withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(1), F.col("n_tok")),
                lambda j: F.pmod(F.hash(F.col("doc_id"), F.col("version"), j), F.lit(50257)),
            ),
        )
        .withColumn(
            "source",
            F.element_at(
                F.array(F.lit("web"), F.lit("book"), F.lit("code"), F.lit("wiki")),
                (F.pmod(F.hash("doc_id", F.lit(1), "version"), F.lit(4)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "event_timestamp",
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(
                F.col("version") * 86400
                + F.pmod(F.hash("doc_id", F.lit(2), "version"), F.lit(86400))
            ).cast("double")),
        )
        .withColumn(
            "created",
            F.col("event_timestamp")
            + F.make_interval(secs=F.pmod(F.hash("doc_id", F.lit(3), "version"), F.lit(7200)).cast("double")),
        )
    )
    return df.select("doc_id", "tokens", "n_tok", "source", "event_timestamp", "created")


def spark_entity_spine(spark, n_rows: int, n_docs: int, span_days: int = 10, partitions: int | None = None):
    """Deterministic retrieval spine over the generated doc_id space
    (~5% unknown ghost ids for the NULL path)."""
    from pyspark.sql import functions as F

    base = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    return (
        base.withColumn("pick", F.pmod(F.hash(F.col("id"), F.lit(7)), F.lit(int(n_docs * 1.05))))
        .withColumn(
            "doc_id",
            F.when(
                F.col("pick") < n_docs, F.format_string("doc_%08d", F.col("pick"))
            ).otherwise(F.format_string("ghost_%08d", F.col("pick"))),
        )
        .withColumn(
            "event_timestamp",
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.pmod(
                F.hash(F.col("id"), F.lit(8)), F.lit(span_days * 86400)
            ).cast("double")),
        )
        .select("doc_id", "event_timestamp")
    )
