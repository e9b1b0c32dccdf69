"""Round-10 operator tests: spine modes and chunked generation for
resample_gapfill, plus the new inference-stats / time-series /
retrieval families as they land."""

import pytest
from pyspark.sql import functions as F


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, t long, value double"
    )


def test_resample_observed_spine_is_per_key_range(spark):
    from betl_spark.operators.timeseries import resample_gapfill

    # key 1 spans buckets 0-3, key 2 spans bucket 10 only
    df = _mk_events(
        spark,
        [(1, 0, 1.0), (1, 3 * 10, 4.0), (2, 10 * 10, 9.0)],
    )
    out = resample_gapfill(
        df, "user_id", "t", "value", bucket_micros=10, spine="observed"
    ).collect()
    got = {(r["user_id"], r["bucket"]) for r in out}
    assert got == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 10)}
    # global mode fills the full rectangle 0..10 for both keys
    from betl_spark.operators.timeseries import resample_gapfill as rg

    glob = rg(df, "user_id", "t", "value", bucket_micros=10).collect()
    assert len(glob) == 2 * 11


def test_resample_observed_matches_global_on_observed_span(spark):
    """On each key's own span the two spines agree row-for-row."""
    from betl_spark.operators.timeseries import resample_gapfill

    rows = [
        (k, t * 7, float(k * 10 + t))
        for k in (1, 2, 3)
        for t in range(k, 30, k + 2)
    ]
    df = _mk_events(spark, rows)
    obs = {
        (r["user_id"], r["bucket"]): (
            r["n_events"], r["sum_value"], r["ffill_avg"]
        )
        for r in resample_gapfill(
            df, "user_id", "t", "value", bucket_micros=5, spine="observed"
        ).collect()
    }
    glob = {
        (r["user_id"], r["bucket"]): (
            r["n_events"], r["sum_value"], r["ffill_avg"]
        )
        for r in resample_gapfill(
            df, "user_id", "t", "value", bucket_micros=5
        ).collect()
    }
    assert obs == {k: v for k, v in glob.items() if k in obs}


def test_resample_spine_guard_raises_and_passes(spark):
    from betl_spark.operators.timeseries import resample_gapfill

    df = _mk_events(spark, [(1, 0, 1.0), (1, 100, 2.0)])
    with pytest.raises(ValueError, match="spine would be"):
        resample_gapfill(
            df, "user_id", "t", "value", bucket_micros=1,
            spine="observed", max_spine_rows=10,
        ).collect()
    ok = resample_gapfill(
        df, "user_id", "t", "value", bucket_micros=1,
        spine="observed", max_spine_rows=1000,
    )
    assert ok.count() == 101


def test_resample_rejects_unknown_spine(spark):
    from betl_spark.operators.timeseries import resample_gapfill

    df = _mk_events(spark, [(1, 0, 1.0)])
    with pytest.raises(ValueError, match="spine must be"):
        resample_gapfill(df, "user_id", "t", "value", spine="dense")


def test_resample_chunked_spine_crosses_chunk_boundaries(spark):
    """A span wider than one 8192-bucket chunk must still be dense,
    and negative (pre-epoch) buckets must not skip chunks (floor vs
    truncating division)."""
    from betl_spark.operators import timeseries as ts

    # span [-3, 8195]: crosses chunk -1 -> 0 -> 1 at _SPINE_CHUNK=8192
    df = _mk_events(spark, [(1, -3, 1.0), (1, 8195, 2.0)])
    out = ts.resample_gapfill(
        df, "user_id", "t", "value", bucket_micros=1, spine="observed"
    )
    buckets = sorted(r["bucket"] for r in out.collect())
    assert buckets == list(range(-3, 8196))
