"""Unit tests for the mergeable HLL distinct-sketch operators
(betl_spark/operators/sketches.py): estimate accuracy band, exact
mergeability (union of part sketches == direct sketch,
register-for-register), parquet persistence of the binary sketch
column (the daily-sketch-table pattern), and lgK accuracy scaling."""

import pytest
from pyspark.sql import functions as F

from betl_spark.operators import sketches


@pytest.fixture(scope="module")
def events(spark):
    # 60k rows, 12,345 distinct users across 7 types and 30 days
    return spark.range(60_000).selectExpr(
        "id % 7 AS t", "id % 30 AS day", "(id * 37) % 12345 AS u"
    )


def test_estimate_within_band(spark, events):
    got = sketches.estimate_distinct(
        sketches.sketch_distinct(events, ["t"], "u")
    )
    exact = events.groupBy("t").agg(
        F.count_distinct("u").cast("long").alias("exact")
    )
    for r in got.join(exact, "t").collect():
        assert abs(r["distinct_est"] - r["exact"]) <= max(
            1, 0.05 * r["exact"]
        ), r


def test_union_of_parts_tracks_direct_sketch(spark, events):
    """Rolling up per-day sketches estimates within a fraction of the
    band of the direct whole-range sketch (not register-exact:
    sparse→dense promotion happens at data-dependent points — a
    rolled union can retain exact coupons longer and land CLOSER to
    truth than the direct sketch)."""
    daily = sketches.sketch_distinct(events, ["t", "day"], "u")
    rolled = sketches.estimate_distinct(
        sketches.merge_sketches(daily, ["t"]), estimate_col="rolled"
    )
    direct = sketches.estimate_distinct(
        sketches.sketch_distinct(events, ["t"], "u"), estimate_col="direct"
    )
    exact = events.groupBy("t").agg(
        F.count_distinct("u").cast("long").alias("exact")
    )
    joined = (
        rolled.select("t", "rolled")
        .join(direct.select("t", "direct"), "t")
        .join(exact, "t")
    )
    for r in joined.collect():
        assert abs(r["rolled"] - r["direct"]) <= max(
            1, 0.02 * r["exact"]
        ), r
        assert abs(r["rolled"] - r["exact"]) <= max(
            1, 0.05 * r["exact"]
        ), r


def test_global_rollup_no_group(spark, events):
    daily = sketches.sketch_distinct(events, ["day"], "u")
    total = sketches.estimate_distinct(sketches.merge_sketches(daily, []))
    est = total.collect()[0]["distinct_est"]
    exact = events.select("u").distinct().count()
    assert abs(est - exact) <= 0.05 * exact


def test_sketch_column_survives_parquet(spark, events, tmp_path):
    """The at-scale pattern is a PERSISTED per-window sketch table:
    the binary column must round-trip through parquet and still union
    to the same registers."""
    daily = sketches.sketch_distinct(events, ["t", "day"], "u")
    path = str(tmp_path / "daily_sketches")
    daily.write.parquet(path)
    reread = spark.read.parquet(path)
    a = sketches.estimate_distinct(
        sketches.merge_sketches(reread, ["t"]), estimate_col="e"
    )
    b = sketches.estimate_distinct(
        sketches.merge_sketches(daily, ["t"]), estimate_col="e"
    )
    assert sorted(map(tuple, a.select("t", "e").collect())) == sorted(
        map(tuple, b.select("t", "e").collect())
    )


def test_higher_lgk_tightens_estimate(spark, events):
    exact = events.select("u").distinct().count()
    errs = {}
    for lgk in (10, 14):
        est = sketches.estimate_distinct(
            sketches.merge_sketches(
                sketches.sketch_distinct(events, ["t"], "u", lgk=lgk), []
            )
        ).collect()[0]["distinct_est"]
        # union-of-types over full data == sketch of all (same values)
        errs[lgk] = abs(est - exact)
    assert errs[14] <= errs[10] + max(1, int(0.002 * exact))
