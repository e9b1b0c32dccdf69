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


# ---- family 2: mergeable fixed-bin histogram sketches ----


@pytest.fixture(scope="module")
def valued(spark):
    # 40k rows over 5 types and 20 days; deterministic long-tail-ish
    # values in [0, ~120) plus exact edge/out-of-range witnesses
    return spark.range(40_000).selectExpr(
        "id % 5 AS t",
        "id % 20 AS day",
        "CAST(CASE WHEN id % 997 = 0 THEN -1.5 "  # underflow witness
        "WHEN id % 499 = 0 THEN 150.0 "  # overflow witness
        "WHEN id % 101 = 0 THEN 100.0 "  # hi edge EXACTLY (overflow)
        "WHEN id % 103 = 0 THEN 0.0 "  # lo edge exactly (bin 1)
        "ELSE ((id * 73) % 1000) / 10.0 END AS DOUBLE) AS v",
    )


LO, HI, B = 0.0, 100.0, 25  # width 4.0


def _exact_bins(rows):
    """Python reference: dense bin-count vector per group."""
    import collections, math

    out = collections.defaultdict(lambda: [0] * (B + 2))
    for t, v in rows:
        if v is None:
            continue
        if v < LO:
            b = 0
        elif v >= HI:
            b = B + 1
        else:
            b = min(B - 1, max(0, math.floor((v - LO) * B / (HI - LO)))) + 1
        out[t][b] += 1
    return dict(out)


def test_histogram_counts_match_python_reference(spark, valued):
    got = {
        r["t"]: list(r["hist_bins"])
        for r in sketches.histogram_sketch(
            valued, ["t"], "v", LO, HI, B
        ).collect()
    }
    want = _exact_bins(
        [(r["t"], r["v"]) for r in valued.select("t", "v").collect()]
    )
    assert got == want
    # edge witnesses actually landed where the spec says
    any_vec = got[0]
    assert any_vec[0] > 0, "underflow bin empty — witness missing"
    assert any_vec[B + 1] > 0, "overflow bin empty — witness missing"


def test_histogram_rollup_is_bit_exact(spark, valued):
    """Vector-sum mergeability is EXACT (unlike HLL): daily sketches
    rolled up == direct histogram, element for element, and the
    global (no-group) rollup matches too."""
    daily = sketches.histogram_sketch(valued, ["t", "day"], "v", LO, HI, B)
    rolled = {
        r["t"]: list(r["hist_bins"])
        for r in sketches.merge_histograms(daily, ["t"], B).collect()
    }
    direct = {
        r["t"]: list(r["hist_bins"])
        for r in sketches.histogram_sketch(
            valued, ["t"], "v", LO, HI, B
        ).collect()
    }
    assert rolled == direct
    total = sketches.merge_histograms(daily, [], B).collect()
    assert len(total) == 1
    assert list(total[0]["hist_bins"]) == [
        sum(v[i] for v in direct.values()) for i in range(B + 2)
    ]


def test_histogram_nulls_excluded(spark):
    df = spark.range(100).selectExpr(
        "id % 2 AS t", "CASE WHEN id % 10 = 0 THEN NULL ELSE 50.0 END AS v"
    )
    got = {
        r["t"]: sum(r["hist_bins"])
        for r in sketches.histogram_sketch(df, ["t"], "v", LO, HI, B).collect()
    }
    assert got == {0: 40, 1: 50}  # the 10 NULLs (id%10==0) are all even → t=0


def test_histogram_quantiles_rank_guarantee(spark, valued):
    """For every (group, p): the chosen bin's edges straddle the exact
    target rank — count(v < bin_lo) < target <= count(v <= bin_hi) in
    exact integers — and the value error is bounded by one bin width."""
    rows = [(r["t"], r["v"]) for r in valued.select("t", "v").collect()]
    sk = sketches.histogram_sketch(valued, ["t"], "v", LO, HI, B)
    got = sketches.histogram_quantiles(
        sk, ["t"], [50, 90, 99], LO, HI, B
    ).collect()
    assert len(got) == 15
    for r in got:
        vals = sorted(v for t, v in rows if t == r["t"] and v is not None)
        n, p = len(vals), r["p_pct"]
        assert r["n_values"] == n
        lo_e = r["bin_lo"] if r["bin_lo"] is not None else float("-inf")
        hi_e = r["bin_hi"] if r["bin_hi"] is not None else float("inf")
        n_lt = sum(1 for v in vals if v < lo_e)
        n_le = sum(1 for v in vals if v <= hi_e)
        assert 100 * n_lt < p * n <= 100 * n_le, r
        # true quantile value inside the bin
        import math

        t_rank = math.ceil(p * n / 100)
        assert lo_e <= vals[t_rank - 1] <= hi_e, r


def test_histogram_quantile_overflow_bin(spark):
    """p99 of a corpus whose tail is out of range lands in the
    overflow bin honestly: bin = B+1, bin_hi NULL ("above hi")."""
    df = spark.range(1000).selectExpr(
        "0 AS t", "CASE WHEN id < 980 THEN 10.0 ELSE 500.0 END AS v"
    )
    sk = sketches.histogram_sketch(df, ["t"], "v", LO, HI, B)
    got = {
        r["p_pct"]: r
        for r in sketches.histogram_quantiles(
            sk, ["t"], [50, 99], LO, HI, B
        ).collect()
    }
    assert got[50]["bin"] == 3 and got[50]["bin_lo"] == 8.0
    assert got[99]["bin"] == B + 1
    assert got[99]["bin_lo"] == HI and got[99]["bin_hi"] is None


def test_histogram_survives_parquet(spark, valued, tmp_path):
    """The persisted-daily-table pattern: array<long> round-trips and
    rolls up identically after re-read."""
    daily = sketches.histogram_sketch(valued, ["t", "day"], "v", LO, HI, B)
    path = str(tmp_path / "daily_hist")
    daily.write.parquet(path)
    a = sketches.merge_histograms(
        spark.read.parquet(path), ["t"], B
    ).collect()
    b = sketches.merge_histograms(daily, ["t"], B).collect()
    key = lambda r: r["t"]  # noqa: E731
    assert sorted(
        [(r["t"], list(r["hist_bins"])) for r in a], key=lambda x: x[0]
    ) == sorted([(r["t"], list(r["hist_bins"])) for r in b], key=lambda x: x[0])


# ---- family 3: mergeable heavy-hitter (offline Misra-Gries) ----


def _mg_reference(rows, m):
    """Python reference: per group, the offline MG summary
    {item: residual} plus threshold t."""
    import collections

    by_group = collections.defaultdict(collections.Counter)
    for g, item in rows:
        if item is not None:
            by_group[g][item] += 1
    out = {}
    for g, counts in by_group.items():
        ordered = sorted(counts.values(), reverse=True)
        t = ordered[m] if len(ordered) > m else 0
        out[g] = (
            {i: c - t for i, c in counts.items() if c > t},
            t,
        )
    return out


@pytest.fixture(scope="module")
def skewed_items(spark):
    # 3 groups x 2 shards; zipf-ish: item j appears ~600/(j+1) times
    return spark.range(6000).selectExpr(
        "id % 3 AS g",
        "id % 2 AS shard",
        "CAST(CAST(floor(sqrt(id % 2000)) AS BIGINT) % 40 AS STRING) AS item",
    )


def test_topk_sketch_matches_python_reference(spark, skewed_items):
    m = 5
    got = sketches.topk_sketch(skewed_items, ["g", "shard"], "item", m)
    rows = got.collect()
    want = _mg_reference(
        [((r["g"], r["shard"]), r["item"])
         for r in skewed_items.select("g", "shard", "item").collect()],
        m,
    )
    for key, (summary, t) in want.items():
        kept = {
            r["item"]: r["residual"]
            for r in rows
            if (r["g"], r["shard"]) == key and r["item"] is not None
        }
        metas = [
            r for r in rows
            if (r["g"], r["shard"]) == key and r["item"] is None
        ]
        assert kept == summary, key
        assert len(metas) == 1 and metas[0]["t"] == t, key
        assert len(kept) <= m
        assert all(r > 0 for r in kept.values())


def test_topk_small_group_is_exact_census(spark):
    df = spark.range(30).selectExpr(
        "0 AS g", "CAST(id % 3 AS STRING) AS item"
    )
    rows = sketches.topk_sketch(df, ["g"], "item", m=16).collect()
    kept = {r["item"]: r["residual"] for r in rows if r["item"] is not None}
    assert kept == {"0": 10, "1": 10, "2": 10}
    assert all(r["t"] == 0 for r in rows)


def test_topk_merge_bounds_contain_exact(spark, skewed_items):
    m = 5
    sk = sketches.topk_sketch(skewed_items, ["g", "shard"], "item", m)
    merged = sketches.merge_topk_sketches(sk, ["g"])
    exact = {
        (r["g"], r["item"]): r["n"]
        for r in skewed_items.groupBy("g", "item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = merged.collect()
    assert got, "merged summary empty"
    t_total = {
        r["g"]: r["tt"]
        for r in sk.where(F.col("item").isNull())
        .groupBy("g")
        .agg(F.sum("t").alias("tt"))
        .collect()
    }
    for r in got:
        true = exact[(r["g"], r["item"])]
        assert r["est_lo"] <= true <= r["est_hi"], r
    # heavy-hitter guarantee: any item with true count > sum of
    # thresholds must appear in the merged summary
    present = {(r["g"], r["item"]) for r in got}
    for (g, item), n in exact.items():
        if n > t_total[g]:
            assert (g, item) in present, (g, item, n, t_total[g])


def test_topk_merge_of_single_partition_is_exact(spark):
    """Merging a one-partition sketch collapses the bounds to the
    summary's exact counts (t_present == t_total)."""
    df = spark.range(1000).selectExpr(
        "0 AS g", "CAST(CAST(floor(sqrt(id)) AS BIGINT) % 10 AS STRING) AS item"
    )
    sk = sketches.topk_sketch(df, ["g"], "item", m=3)
    merged = sketches.merge_topk_sketches(sk, ["g"]).collect()
    exact = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in merged:
        assert r["est_lo"] == r["est_hi"] == exact[r["item"]], r


def test_topk_threshold_is_tie_stable(spark):
    """t is the (m+1)-th VALUE of the sorted count multiset — stable
    under count ties however row_number breaks them."""
    # 6 items, all count 4 -> with m=3, t = 4 and the summary is EMPTY
    df = spark.range(24).selectExpr(
        "0 AS g", "CAST(id % 6 AS STRING) AS item"
    )
    rows = sketches.topk_sketch(df, ["g"], "item", m=3).collect()
    assert [r for r in rows if r["item"] is not None] == []
    assert [r["t"] for r in rows if r["item"] is None] == [4]


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


# ---- family 4: bottom-k (KMV) ----


@pytest.fixture(scope="module")
def kmv_events(spark):
    # 40k rows, 9,876 distinct users across 5 types and 8 shards
    return spark.range(40_000).selectExpr(
        "id % 5 AS t", "id % 8 AS shard", "(id * 31) % 9876 AS u"
    )


def test_kmv_hash_parity_with_duckdb(spark):
    import duckdb

    vals = ["42", "hello", "1:42", "", "Ünïcode"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], ["v"])
        .select("v", sketches.kmv_hash(F.col("v")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        (want,) = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 12) AS BIGINT)", [v]
        ).fetchone()
        assert got[v] == want, v


def test_kmv_merge_is_bit_exact(spark, kmv_events):
    """Sharded build + merge == direct global build, row for row —
    the lossless-merge property the contract's oracle strategy rests
    on (the k smallest hashes of a union are among the union of each
    shard's k smallest)."""
    k = 32
    sharded = sketches.kmv_sketch(kmv_events, ["t", "shard"], "u", k)
    merged = sketches.merge_kmv_sketches(sharded, ["t"], k)
    direct = sketches.kmv_sketch(kmv_events, ["t"], "u", k)
    a = {tuple(r) for r in merged.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b and len(a) == 5 * k


def test_kmv_small_group_is_exact_census(spark):
    df = spark.range(10).selectExpr("0 AS g", "id AS v")
    sk = sketches.kmv_sketch(df, ["g"], "v", 64)
    est = sketches.kmv_estimate(sk, ["g"], 64).collect()[0]
    assert est["n_kept"] == 10 and est["distinct_est"] == 10
    items = {r["item"] for r in sk.collect()}
    assert items == {str(i) for i in range(10)}


def test_kmv_estimate_within_band(spark, kmv_events):
    """(k-1)/u_(k) estimator at k=256: rse ~ 1/sqrt(254) ~= 6.3%;
    assert within 4 rse of the exact distinct count."""
    k = 256
    sk = sketches.kmv_sketch(kmv_events, ["t"], "u", k)
    est = sketches.kmv_estimate(sk, ["t"], k)
    exact = kmv_events.groupBy("t").agg(
        F.count_distinct("u").cast("long").alias("exact")
    )
    for r in est.join(exact, "t").collect():
        assert abs(r["distinct_est"] - r["exact"]) <= 0.25 * r["exact"], dict(
            r.asDict()
        )


def test_kmv_sample_items_are_real_and_hash_ordered(spark, kmv_events):
    k = 16
    sk = sketches.kmv_sketch(kmv_events, ["t"], "u", k)
    rows = sk.collect()
    assert all(r["h"] >= 0 for r in rows)
    by_t = {}
    for r in rows:
        by_t.setdefault(r["t"], []).append(r["h"])
    universe = {
        (r["t"], r["u"]) for r in kmv_events.select("t", "u").distinct().collect()
    }
    got = {(r["t"], int(r["item"])) for r in rows}
    assert got <= universe
    for t, hs in by_t.items():
        assert len(hs) == k == len(set(hs))


# ---- family 5: Bloom membership ----


@pytest.fixture(scope="module")
def bloom_keys(spark):
    # 3 groups x 800 member keys, disjoint probe space
    return spark.range(2_400).selectExpr(
        "id % 3 AS g", "CAST(id AS STRING) AS key", "id % 6 AS shard"
    )


def test_bloom_no_false_negatives(spark, bloom_keys):
    flt = sketches.bloom_sketch(bloom_keys, ["g"], "key", 64, 3)
    probed = sketches.bloom_probe(bloom_keys, flt, ["g"], "key", 64, 3)
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_bloom_merge_is_bit_exact(spark, bloom_keys):
    sharded = sketches.bloom_sketch(bloom_keys, ["g", "shard"], "key", 32, 3)
    merged = sketches.merge_bloom_sketches(sharded, ["g"], 32)
    direct = sketches.bloom_sketch(bloom_keys, ["g"], "key", 32, 3)
    a = {r["g"]: r["bloom_bits"] for r in merged.collect()}
    b = {r["g"]: r["bloom_bits"] for r in direct.collect()}
    assert a == b and len(a) == 3
    assert all(len(v) == 32 for v in a.values())


def test_bloom_fpr_within_expected(spark, bloom_keys):
    """800 keys/group in a 64*64=4096-bit filter with j=3:
    theoretical FPR ~ (1-e^(-3*800/4096))^3 ~= 0.087; allow 2.5x."""
    flt = sketches.bloom_sketch(bloom_keys, ["g"], "key", 64, 3)
    probes = spark.range(10_000, 13_000).selectExpr(
        "id % 3 AS g", "CAST(id AS STRING) AS key"
    )
    probed = sketches.bloom_probe(probes, flt, ["g"], "key", 64, 3)
    fp = probed.where(F.col("bloom_hit")).count()
    assert fp / 3000 < 0.22, fp


def test_bloom_probe_unknown_group_is_negative(spark, bloom_keys):
    flt = sketches.bloom_sketch(bloom_keys, ["g"], "key", 64, 3)
    probes = spark.createDataFrame([(99, "5")], ["g", "key"])
    rows = sketches.bloom_probe(probes, flt, ["g"], "key", 64, 3).collect()
    assert rows[0]["bloom_hit"] is False


def test_bloom_survives_parquet(spark, bloom_keys, tmp_path):
    flt = sketches.bloom_sketch(bloom_keys, ["g"], "key", 64, 3)
    path = str(tmp_path / "bloom")
    flt.write.parquet(path)
    back = spark.read.parquet(path)
    probed = sketches.bloom_probe(bloom_keys, back, ["g"], "key", 64, 3)
    assert probed.where(~F.col("bloom_hit")).count() == 0
