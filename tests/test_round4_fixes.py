"""Round-4 regression tests: the five ADVICE r03 fixes.

* _path_has_output ignores crashed-write debris under `_temporary/`
  (any underscore-prefixed directory is pruned, not just `_manifest`),
* ValidationProfile rejects mean_between with value_hi=None up front
  with a descriptive error (not a TypeError deep in validate()),
* pack_sequences raises when the input already carries a 'shard'
  column instead of silently overwriting it,
* chunk_sequences tail-chunk behavior (doc fix — the property that the
  tail may be shorter than max_len is pinned here),
* lsh_topk quantized-path precondition raise (documented in README) is
  already covered in tests/test_pipeline_similarity.py.
"""

import pandas as pd
import pytest

from feast_spark.core.store import _path_has_output
from feast_spark.pipeline.sampling import chunk_sequences, pack_sequences
from feast_spark.validation import DatasetProfiler, Expect, ValidationProfile


# ------------------------------------------------------- _path_has_output
def test_path_has_output_ignores_temporary_debris(tmp_path):
    """part files under _temporary/ (a crashed Spark write) must NOT count
    as real output — otherwise materialize_incremental would adopt the
    registry interval of another path and leave a silent hole."""
    out = tmp_path / "out"
    debris = out / "_temporary" / "0" / "task_202601_0001_m_000000"
    debris.mkdir(parents=True)
    (debris / "part-00000-attempt.snappy.parquet").write_bytes(b"x")
    assert not _path_has_output(str(out))

    # a real committed part file at any depth still counts
    part_dir = out / "event_date=2024-01-01"
    part_dir.mkdir(parents=True)
    (part_dir / "part-00000-c000.snappy.parquet").write_bytes(b"x")
    assert _path_has_output(str(out))


def test_path_has_output_still_ignores_manifest_and_hidden(tmp_path):
    out = tmp_path / "out"
    (out / "_manifest").mkdir(parents=True)
    (out / "_manifest" / "000001.json").write_text("{}")
    (out / "_SUCCESS").write_bytes(b"")
    (out / ".hidden.crc").write_bytes(b"")
    assert not _path_has_output(str(out))


# ------------------------------------------------------------- validation
def test_mean_between_without_upper_bound_raises_clearly(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0]}))
    prof = ValidationProfile([Expect("mean_between", column="x", value=0.0)])
    with pytest.raises(ValueError, match="mean_between requires value_hi"):
        prof.validate(df)


# ----------------------------------------------------- quantile_between
def test_quantile_between_catches_bimodal_drift(spark):
    """VERDICT r03 #7: a symmetric bimodal shift keeps mean/min/max/
    stddev/null-ratio inside their profiled bands but moves every
    quartile — the drifted frame must fail EXACTLY the quantile
    expectations."""
    ref = spark.createDataFrame(pd.DataFrame({"x": [float(i) for i in range(101)]}))
    prof = DatasetProfiler(columns=["x"]).analyze(ref)
    kinds = {e.kind for e in prof.expectations}
    assert "quantile_between" in kinds
    assert prof.run(ref).is_success  # reference validates against itself

    drifted = spark.createDataFrame(
        pd.DataFrame({"x": [10.0] * 50 + [90.0] * 51})
    )
    report = prof.run(drifted)
    assert not report.is_success
    assert {e.check_name for e in report.errors} == {"quantile_between"}
    assert len(report.errors) == 3  # all three quartiles drifted


def test_quantile_between_json_roundtrip_and_guards(spark):
    prof = ValidationProfile(
        [Expect("quantile_between", column="x", quantile=0.5, value=1.0, value_hi=3.0)]
    )
    back = ValidationProfile.from_json(prof.to_json())
    assert back.expectations[0].quantile == 0.5
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 2.5]}))
    assert back.run(df).is_success

    with pytest.raises(ValueError, match="quantile_between requires value_hi"):
        ValidationProfile(
            [Expect("quantile_between", column="x", quantile=0.5, value=1.0)]
        ).validate(df)
    with pytest.raises(ValueError, match="quantile in \\[0, 1\\]"):
        ValidationProfile(
            [Expect("quantile_between", column="x", quantile=1.5, value=0.0, value_hi=1.0)]
        ).validate(df)

    # all-NULL column: the reference observed bounds, so an unobservable
    # quantile is drift (fails, not vacuous)
    nulls = spark.createDataFrame(pd.DataFrame({"x": [None, None]}), "x double")
    assert not back.run(nulls).is_success


# ---------------------------------------------------------- pack_sequences
def test_pack_sequences_rejects_preexisting_shard_column(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a"],
                "event_timestamp": pd.to_datetime(["2024-01-01"]),
                "tokens": [[1, 2]],
                "n_tok": [2],
                "source": ["web"],
                "shard": ["user-owned"],
            }
        )
    )
    with pytest.raises(ValueError, match="'shard' column"):
        pack_sequences(df, block_tokens=4)
    # max_stream_rows=None never injects the column, so user 'shard' is fine
    out = pack_sequences(df, block_tokens=4, max_stream_rows=None)
    assert "shard" not in out.columns


# ------------------------------------------- adaptive pack_sequences shard
def _mk_stream(spark, n, ts_fn):
    import numpy as np

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "event_timestamp": [ts_fn(i) for i in range(n)],
            "tokens": [[i % 7, (i + 1) % 7] for i in range(n)],
            "n_tok": np.full(n, 2, dtype="int64"),
            "source": "hot",
        }
    )
    return pdf, spark.createDataFrame(pdf)


def test_pack_shard_refines_inside_single_week(spark):
    """VERDICT r03 #3: a stream whose rows all land in ONE week must not
    pack on one task — the week cell refines to day shards."""
    t0 = pd.Timestamp("2024-01-01")  # Monday: days 0-5 share one ISO week
    pdf, df = _mk_stream(spark, 240, lambda i: t0 + pd.Timedelta(hours=i % 144))
    out = pack_sequences(df, block_tokens=8, max_stream_rows=50).toPandas()
    shards = set(out["shard"])
    assert len(shards) > 1, "single-week hot stream still packs on one shard"
    # day labels (YYYY-MM-DD), not the single week label
    assert all(len(s) == 10 for s in shards), shards
    assert len(shards) == 6
    assert out["n_tokens"].sum() == pdf["n_tok"].sum()
    assert out["n_docs"].sum() == len(pdf)
    for _, grp in out.groupby(["source", "shard"]):
        assert sorted(grp["block_id"]) == list(range(len(grp)))


def test_pack_shard_hash_splits_inside_single_hour(spark):
    """The bottom of the ladder: everything in one hour → deterministic
    hash split, block space reset per split."""
    t0 = pd.Timestamp("2024-01-01 03:00:00")
    pdf, df = _mk_stream(spark, 200, lambda i: t0 + pd.Timedelta(seconds=i % 60))
    out = pack_sequences(df, block_tokens=8, max_stream_rows=40).toPandas()
    shards = sorted(set(out["shard"]))
    assert len(shards) == 5  # ceil(200/40)
    assert all("#" in s and s.startswith("2024-01-01 03:00:00") for s in shards)
    assert out["n_tokens"].sum() == pdf["n_tok"].sum()
    assert out["n_docs"].sum() == len(pdf)
    for _, grp in out.groupby(["source", "shard"]):
        assert sorted(grp["block_id"]) == list(range(len(grp)))
    # deterministic: a rerun assigns identical shards
    again = pack_sequences(df, block_tokens=8, max_stream_rows=40).toPandas()
    a = out.sort_values(["shard", "block_id"]).reset_index(drop=True)
    b = again.sort_values(["shard", "block_id"]).reset_index(drop=True)
    assert a[["shard", "block_id", "n_docs", "n_tokens"]].equals(
        b[["shard", "block_id", "n_docs", "n_tokens"]]
    )


def test_pack_shard_mixed_ladder_levels(spark):
    """Streams under the threshold keep the coarse week label while an
    over-threshold week refines — the ladder is per-cell, not global."""
    t0 = pd.Timestamp("2024-01-01")
    # week 1: 20 rows (under max=50 → week label); week 2: 120 rows
    # spread over 6 days (over → day labels)
    def ts(i):
        if i < 20:
            return t0 + pd.Timedelta(hours=i)
        return t0 + pd.Timedelta(days=7 + (i % 6), hours=i % 24)

    pdf, df = _mk_stream(spark, 140, ts)
    out = pack_sequences(df, block_tokens=8, max_stream_rows=50).toPandas()
    shards = set(out["shard"])
    assert "2024-01-01" in shards  # week-1 label stays at week granularity
    day_shards = {s for s in shards if s >= "2024-01-08"}
    assert len(day_shards) == 6
    assert out["n_tokens"].sum() == pdf["n_tok"].sum()


# --------------------------------------------------------- chunk_sequences
def test_chunk_tail_may_be_shorter_than_max_len(spark):
    """max_len=8, overlap=2, n=9 → chunks of 8 and 3 tokens (tail is NOT
    clamped back to n - max_len); total coverage, overlap tokens twice."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d"], "tokens": [list(range(9))], "n_tok": [9]})
    )
    rows = (
        chunk_sequences(df, max_len=8, overlap=2)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [list(r.chunk_tokens) for r in rows] == [
        list(range(8)),
        [6, 7, 8],
    ]
    assert [r.chunk_len for r in rows] == [8, 3]


def test_adaptive_shard_handles_null_timestamp_stream(spark):
    """A giant stream whose timestamps are all NULL must still split
    (null-safe over-cell joins + a stable 'null-ts' shard label) —
    plain equality joins would flag the cell over-threshold but never
    match it, serializing the whole stream on one task."""
    pdf, _ = _mk_stream(spark, 60, lambda i: pd.Timestamp("2024-01-01"))
    pdf["event_timestamp"] = pd.NaT
    df = spark.createDataFrame(
        pdf,
        schema="doc_id string, event_timestamp timestamp, "
        "tokens array<bigint>, n_tok bigint, source string",
    )
    out = pack_sequences(df, block_tokens=8, max_stream_rows=20).toPandas()
    # hash-split fan-out engaged: >1 distinct shard, all carrying the
    # stable null-ts label, none NULL/empty
    shards = set(out["shard"])
    assert len(shards) > 1
    assert all(s and s.startswith("null-ts#") for s in shards)
    # conservation + per-shard block reset still hold
    assert out["n_tokens"].sum() == 2 * 60
    assert out["n_docs"].sum() == 60
    for (_, _), grp in out.groupby(["source", "shard"]):
        assert sorted(grp["block_id"]) == list(range(len(grp)))
