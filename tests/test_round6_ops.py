"""Round-6 operators: bloom-prefiltered incremental exact dedup, DSIR
importance scoring, quantile bucketing, document chunking."""

import math

import pytest
from pyspark.sql import Row, functions as F

SF = "/root/testdata/sf0.001"


# ---- exact_dedup_against ----
def _mk_corpora(spark):
    ref = spark.createDataFrame(
        [Row(doc_id=i, text=f"ref text {i}") for i in range(20)]
    )
    batch = spark.createDataFrame(
        # 5 exact copies of ref texts under new ids + 10 fresh docs
        [Row(doc_id=100 + i, text=f"ref text {i}") for i in range(5)]
        + [Row(doc_id=200 + i, text=f"fresh text {i}") for i in range(10)]
    )
    return batch, ref


def test_exact_dedup_against_matches_plain_anti_join(spark):
    from betl_spark.operators import dedup

    batch, ref = _mk_corpora(spark)
    got = dedup.exact_dedup_against(batch, ref, "doc_id", ["text"])
    expected = batch.join(
        ref.select(F.md5("text").alias("__h")).distinct(),
        F.md5(batch["text"]) == F.col("__h"),
        "left_anti",
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in expected.collect()
    )
    # survivors keep the original schema
    assert got.columns == batch.columns


def test_exact_dedup_against_tiny_bitset_still_exact(spark):
    """With a 4-bit bitset nearly everything is a false positive — the
    exact confirm join must still produce the exact answer."""
    from betl_spark.operators import dedup

    batch, ref = _mk_corpora(spark)
    got = dedup.exact_dedup_against(
        batch, ref, "doc_id", ["text"], prefilter_bits=4, prefilter_hashes=1
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        range(200, 210)
    )


def test_exact_dedup_against_prefilter_is_broadcast(spark):
    from tests.test_plans import plan

    from betl_spark.operators import dedup

    batch, ref = _mk_corpora(spark)
    p = plan(dedup.exact_dedup_against(batch, ref, "doc_id", ["text"]))
    # every bucket-membership join ships as a broadcast hash join, and
    # exactly one anti-join NODE (the exact confirm) exists in the plan
    # (the "Join type:" detail line appears once per join node)
    assert p.count("BroadcastHashJoin") >= 2
    assert p.count("Join type: LeftAnti") == 1


# ---- quantile_buckets ----
def test_quantile_buckets_grouped(spark):
    from betl_spark.operators.stats import quantile_buckets

    rows = [Row(g="a", v=float(i)) for i in range(1, 9)] + [
        Row(g="b", v=float(10 * i)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r.g, r.v): r.bucket
        for r in quantile_buckets(df, "v", group_cols=["g"]).collect()
    }
    # group a: p25 of 1..8 = 2.75, p75 = 6.25
    assert out[("a", 1.0)] == "head" and out[("a", 2.0)] == "head"
    assert out[("a", 3.0)] == "middle" and out[("a", 6.0)] == "middle"
    assert out[("a", 7.0)] == "tail" and out[("a", 8.0)] == "tail"
    # group b: p25 of 10..40 = 17.5, p75 = 32.5
    assert out[("b", 10.0)] == "head" and out[("b", 40.0)] == "tail"


def test_quantile_buckets_null_value_and_null_group(spark):
    from betl_spark.operators.stats import quantile_buckets

    df = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="a", v=None), Row(g=None, v=5.0), Row(g=None, v=6.0)]
    )
    rows = quantile_buckets(df, "v", group_cols=["g"]).collect()
    # all four rows survive (NULL group is a legitimate stratum)
    assert len(rows) == 4
    by_key = {(r.g, r.v): r.bucket for r in rows}
    assert by_key[("a", None)] is None
    assert by_key[(None, 5.0)] == "head"
    assert by_key[(None, 6.0)] == "tail"


def test_quantile_buckets_has_no_window(spark):
    from tests.test_plans import plan
    from betl_spark.operators.stats import quantile_buckets

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(quantile_buckets(docs, "n_chars", group_cols=["lang"]))
    assert "Window" not in p


def test_quantile_buckets_label_validation(spark):
    from betl_spark.operators.stats import quantile_buckets

    df = spark.createDataFrame([Row(v=1.0)])
    with pytest.raises(ValueError):
        quantile_buckets(df, "v", qs=[0.5], labels=["only-one"])


# ---- chunk_documents ----
def test_chunk_documents_covers_text_with_overlap(spark):
    from betl_spark.operators.text import chunk_documents

    text = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    chunks = sorted(
        chunk_documents(df, "doc_id", "text", 100, 20).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 80: ceil((260-20)/80) = 3 chunks
    assert [c.chunk_idx for c in chunks] == [0, 1, 2]
    assert chunks[0].chunk_text == text[0:100]
    assert chunks[1].chunk_text == text[80:180]
    assert chunks[2].chunk_text == text[160:260]
    # neighbors share exactly the overlap
    assert chunks[0].chunk_text[-20:] == chunks[1].chunk_text[:20]
    # reassembly of stride-prefixes reconstructs the document
    assert chunks[0].chunk_text[:80] + chunks[1].chunk_text[:80] + chunks[2].chunk_text == text


def test_chunk_documents_edge_cases(spark):
    from betl_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=""),       # empty -> one empty chunk
            Row(doc_id=2, text=None),     # NULL  -> one empty chunk
            Row(doc_id=3, text="x" * 100),  # exactly size -> one chunk
            Row(doc_id=4, text="x" * 101),  # one past -> two chunks
        ]
    )
    out = chunk_documents(df, "doc_id", "text", 100, 20)
    counts = {r.doc_id: r.n for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 1, 2: 1, 3: 1, 4: 2}
    empty = {r.doc_id: r.chunk_text for r in out.filter("doc_id <= 2").collect()}
    assert empty == {1: "", 2: ""}


def test_chunk_documents_rejects_bad_overlap(spark):
    from betl_spark.operators.text import chunk_documents

    df = spark.createDataFrame([Row(doc_id=1, text="abc")])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 10, 10)


def test_chunk_documents_zero_shuffle(spark):
    from tests.test_plans import plan, n_exchanges
    from betl_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(chunk_documents(docs, "doc_id", "text", 500, 100))
    assert n_exchanges(p) == 0
    assert "pythonUDF" not in p


# ---- dsir_scores ----
def _py_dsir(rows, target_langs, buckets, alpha):
    """Plain-Python replay of the DSIR scoring spec."""
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    def feats(text):
        toks = text.split(" ")
        out = [bucket(t) for t in toks]
        out += [bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        return out

    src, tgt = {}, {}
    for did, text, lang in rows:
        for b in feats(text):
            src[b] = src.get(b, 0) + 1
            if lang in target_langs:
                tgt[b] = tgt.get(b, 0) + 1
    nq, np_ = sum(src.values()), sum(tgt.values())
    ratio = {
        b: round(
            math.log((tgt.get(b, 0) + alpha) / (np_ + alpha * buckets))
            - math.log((cq + alpha) / (nq + alpha * buckets)),
            9,
        )
        for b, cq in src.items()
    }
    out = {}
    for did, text, lang in rows:
        fs = feats(text)
        counts = {}
        for b in fs:
            counts[b] = counts.get(b, 0) + 1
        score = sum(c * ratio[b] for b, c in sorted(counts.items()))
        out[did] = (len(fs), round(score, 6))
    return out


def test_dsir_scores_match_python_reference(spark):
    from betl_spark.operators import quality

    rows = [
        (1, "the quick brown fox", "en"),
        (2, "the lazy dog sleeps", "en"),
        (3, "der schnelle braune fuchs", "de"),
        (4, "le chien paresseux dort", "fr"),
        (5, "the quick dog", "de"),  # en-looking text labeled de
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r.doc_id: (r.n_feats, r.dsir_logratio)
        for r in quality.dsir_scores(
            df, "doc_id", "text", F.col("lang") == "en", buckets=64
        ).collect()
    }
    want = _py_dsir(rows, {"en"}, 64, 1.0)
    for did in want:
        assert got[did][0] == want[did][0], did
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6), did
    # the en-looking de doc should score higher than the genuinely
    # non-English docs
    assert got[5][1] > got[3][1] and got[5][1] > got[4][1]


def test_dsir_scores_null_text_keeps_row(spark):
    from betl_spark.operators import quality

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, None, "de")], ["doc_id", "text", "lang"]
    )
    rows = {
        r.doc_id: r
        for r in quality.dsir_scores(
            df, "doc_id", "text", F.col("lang") == "en"
        ).collect()
    }
    assert rows[2].n_feats == 0 and rows[2].dsir_logratio is None
    assert rows[1].n_feats == 3  # 2 unigrams + 1 bigram


def test_dsir_ratio_table_joins_broadcast(spark):
    from tests.test_plans import plan
    from betl_spark.operators import quality

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(
        quality.dsir_scores(docs, "doc_id", "text", F.col("lang") == "en")
    )
    # the B-row ratio table must meet the per-doc counts as a broadcast
    # join, and no python UDF anywhere
    assert "BroadcastHashJoin" in p
    assert "pythonUDF" not in p


# ---- funnel + cohort retention ----
def test_funnel_users_chain_semantics(spark):
    from betl_spark.operators import funnel

    rows = [
        # u1: clean conversion
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # u2: click BEFORE the first view must not count
        (2, "click", 50), (2, "view", 100), (2, "purchase", 300),
        # u3: purchase outside the within-bound
        (3, "view", 100), (3, "click", 200), (3, "purchase", 5000),
        # u4: never clicked
        (4, "view", 100), (4, "purchase", 200),
        # u5: no funnel events at all (but present in the log)
        (5, "error", 10),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])
    out = {
        r.user_id: r
        for r in funnel.funnel_users(
            df, "user_id", "event_type", F.col("ts_us"),
            ["view", "click", "purchase"], within=1000,
        ).collect()
    }
    assert out[1].steps_completed == 3 and out[1].step3_ts == 300
    assert out[2].steps_completed == 1 and out[2].step2_ts is None
    assert out[3].steps_completed == 2  # purchase at 5000 > 100+1000
    assert out[4].steps_completed == 1
    assert out[5].steps_completed == 0 and out[5].step1_ts is None
    assert len(out) == 5


def test_funnel_users_takes_min_qualifying_not_first_seen(spark):
    from betl_spark.operators import funnel

    # two clicks after the view: the EARLIER qualifying one wins,
    # regardless of input order
    rows = [(1, "click", 900), (1, "view", 100), (1, "click", 400)]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])
    r = funnel.funnel_users(
        df, "user_id", "event_type", F.col("ts_us"), ["view", "click"]
    ).collect()[0]
    assert r.step2_ts == 400


def test_funnel_users_single_shuffle(spark):
    from tests.test_plans import plan, n_exchanges
    from betl_spark.contract.common import ts_micros
    from betl_spark.operators import funnel

    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = plan(
        funnel.funnel_users(
            ev, "user_id", "event_type", ts_micros(ev),
            ["view", "click", "purchase"], within=1000,
        )
    )
    # one exchange: the groupBy(user) — chain resolution is pure codegen
    assert n_exchanges(p) == 1
    assert "Window" not in p and "pythonUDF" not in p


def test_cohort_retention_triangle(spark):
    from betl_spark.operators import funnel

    # period = 100; u1 first in period 0, active 0 and 2; u2 first in
    # period 0, active 0 only; u3 first in period 2
    rows = [(1, 10), (1, 250), (2, 20), (3, 220), (1, 30)]
    df = spark.createDataFrame(rows, ["user_id", "ts_us"])
    out = {
        (r.cohort_period, r.period_offset): (r.n_users, r.cohort_size, r.retention_rate)
        for r in funnel.cohort_retention(df, "user_id", F.col("ts_us"), 100).collect()
    }
    assert out[(0, 0)] == (2, 2, 1.0)
    assert out[(0, 2)] == (1, 2, 0.5)
    assert out[(2, 0)] == (1, 1, 1.0)
    assert len(out) == 3


# ---- profile_columns + zorder ----
def test_profile_columns_counts_nulls_and_distincts(spark):
    from betl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], ["id", "tag"]
    )
    out = {r.column: r for r in profile_columns(df, ["id", "tag"]).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_null == 0
    assert out["id"].n_distinct == 4
    assert out["tag"].n_null == 1 and out["tag"].n_distinct == 2
    assert out["tag"].min_value == "a" and out["tag"].max_value == "b"
    # string ordering is explicit: "10" < "9" lexicographically
    df2 = spark.createDataFrame([(10,), (9,)], ["v"])
    p2 = profile_columns(df2, ["v"]).collect()[0]
    assert p2.min_value == "10" and p2.max_value == "9"


def test_profile_columns_approx_path(spark):
    from betl_spark.operators.profile import profile_columns

    df = spark.range(1000).selectExpr("id", "id % 7 as m")
    out = {
        r.column: r.n_distinct
        for r in profile_columns(df, ["m"], exact_distinct=False).collect()
    }
    assert abs(out["m"] - 7) <= 1  # HLL is exact-ish at tiny cardinality


def _py_morton(vals, bits):
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v = max(0, min(v, (1 << bits) - 1))
        for i in range(bits):
            out += ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_python_morton(spark):
    from betl_spark.operators.profile import zorder_key

    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (65535, 1), (70000, -5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key(["a", "b"]).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_morton([a, b], 16), (a, b)
    # interleave basics: (1,0) -> bit 0, (0,1) -> bit 1
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2


def test_write_zordered_clusters_and_round_trips(spark, tmp_path):
    from betl_spark.operators.profile import write_zordered, zorder_key

    df = spark.range(1000).selectExpr(
        "id", "cast(id % 97 as long) as x", "cast((id * 31) % 89 as long) as y"
    )
    path = str(tmp_path / "zordered")
    write_zordered(df, ["x", "y"], path, shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert sorted(back.columns) == ["id", "x", "y"]
    # shards hold contiguous, non-overlapping z-key ranges
    import pyspark.sql.functions as SF
    ranges = (
        back.withColumn("z", zorder_key(["x", "y"]))
        .withColumn("f", SF.input_file_name())
        .groupBy("f")
        .agg(SF.min("z").alias("lo"), SF.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert len(spans) == 4
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2


# ---- top_n_per_group ----
def test_top_n_per_group_matches_window_rank(spark):
    from betl_spark.operators.stats import top_n_per_group

    import random
    rnd = random.Random(7)
    rows = [(i, rnd.choice("abc"), rnd.randint(0, 50)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "g", "v"]).repartition(8)
    got = sorted(
        (r.g, r.rank, r.id)
        for r in top_n_per_group(df, ["g"], "v", 4, "id").collect()
    )
    # python reference: sort by (-v, id) per group, take 4
    by_g = {}
    for i, g, v in rows:
        by_g.setdefault(g, []).append((-v, i))
    want = sorted(
        (g, rank + 1, i)
        for g, vs in by_g.items()
        for rank, (_, i) in enumerate(sorted(vs)[:4])
    )
    assert got == want


def test_top_n_per_group_ascending_and_null_order(spark):
    from betl_spark.operators.stats import top_n_per_group

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 1), (3, "a", None), (4, "a", 3)],
        ["id", "g", "v"],
    )
    got = [
        (r.id, r.rank)
        for r in top_n_per_group(df, ["g"], "v", 2, "id", ascending=True)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(2, 1), (4, 2)]  # NULL never ranks


def test_top_n_per_group_has_partial_window_group_limit(spark):
    """The scale guarantee: Catalyst's WindowGroupLimit rule must prune
    top-n map-side BEFORE the exchange, so the shuffle carries
    ≤ n·partitions rows per group and the final per-group task never
    sees the whole stratum. If a Spark upgrade or refactor loses this
    rewrite, the operator needs the manual salted prune back."""
    import re
    from tests.test_plans import plan
    from betl_spark.operators.stats import top_n_per_group

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(top_n_per_group(docs, ["lang"], "n_chars", 5, "doc_id"))
    limits = re.findall(r"\(\d+\) WindowGroupLimit", p)
    assert len(limits) >= 2  # partial (pre-exchange) + final
    ex = p.index("Exchange")
    assert "WindowGroupLimit" in p[:ex] or p.index("WindowGroupLimit") < ex


def test_exact_dedup_against_null_and_multicol_content(spark):
    """NULL sentinel + unit separator: ('x', NULL), (NULL, 'x') and
    ('x', '') are DIFFERENT contents; NULL text matches NULL text."""
    from betl_spark.operators import dedup

    schema = "doc_id long, a string, b string"
    ref = spark.createDataFrame([(1, "x", None), (2, None, None)], schema)
    batch = spark.createDataFrame(
        [(10, "x", None), (11, None, "x"), (12, "x", ""), (13, None, None)],
        schema,
    )
    got = sorted(
        r.doc_id
        for r in dedup.exact_dedup_against(batch, ref, "doc_id", ["a", "b"]).collect()
    )
    # 10 duplicates ref#1, 13 duplicates ref#2; 11 and 12 are new
    assert got == [11, 12]


def test_exact_dedup_against_prefilter_disabled(spark):
    from betl_spark.operators import dedup

    batch, ref = _mk_corpora(spark)
    got = dedup.exact_dedup_against(
        batch, ref, "doc_id", ["text"], prefilter_hashes=0
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(range(200, 210))


def test_zorder_key_rejects_sign_bit_overflow(spark):
    from betl_spark.operators.profile import zorder_key

    with pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_psi_drift_identical_and_shifted(spark):
    from betl_spark.operators.profile import psi_drift

    a = spark.range(1000).selectExpr("cast(id % 100 as double) as v")
    same = psi_drift(a, a, "v", 10.0).agg(F.round(F.sum("term"), 6).alias("psi")).collect()[0].psi
    assert same == 0.0  # identical distributions -> zero drift
    b = spark.range(1000).selectExpr("cast(50 + id % 100 as double) as v")
    shifted = psi_drift(a, b, "v", 10.0).agg(F.sum("term").alias("psi")).collect()[0].psi
    assert shifted > 0.25  # half the mass moved -> major drift
    # bins unique in either side still appear with a finite term
    rows = psi_drift(a, b, "v", 10.0).collect()
    assert {r.bin for r in rows} == set(range(15))
    assert all(r.term is not None for r in rows)


def test_semantic_dedup_arrow_backend_matches_codegen(spark):
    from betl_spark.contract.round6 import SEMANTIC_THRESHOLD
    from betl_spark.contract.scale import IVF_CENTROID_IDS
    from betl_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = {
        (r.vec_id, r.cell_id)
        for r in similarity.semantic_dedup(
            emb, "vec_id", "embedding", IVF_CENTROID_IDS,
            threshold=SEMANTIC_THRESHOLD,
        ).collect()
    }
    b = {
        (r.vec_id, r.cell_id)
        for r in similarity.semantic_dedup(
            emb, "vec_id", "embedding", IVF_CENTROID_IDS,
            threshold=SEMANTIC_THRESHOLD, pair_backend="arrow",
        ).collect()
    }
    assert a == b


def test_semantic_dedup_arrow_backend_preserves_id_type(spark):
    # arrow backend derives the id field type from the input schema
    # instead of hardcoding long — int ids must come back as int and
    # match the codegen path's survivor set exactly
    from betl_spark.operators import similarity

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .filter(F.col("vec_id") < 400)
        .selectExpr("cast(vec_id as int) as vec_id", "embedding")
    )
    seeds = [100, 200, 300]
    code = similarity.semantic_dedup(
        emb, "vec_id", "embedding", seeds, threshold=0.3
    )
    arrow = similarity.semantic_dedup(
        emb, "vec_id", "embedding", seeds, threshold=0.3,
        pair_backend="arrow",
    )
    assert arrow.schema["vec_id"].dataType.simpleString() == "int"
    assert {(r.vec_id, r.cell_id) for r in code.collect()} == {
        (r.vec_id, r.cell_id) for r in arrow.collect()
    }


def test_intra_doc_line_dedup_semantics(spark):
    from betl_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb"),   # dups removed, order kept
            (2, "x"),                # single line untouched
            (3, None),               # NULL -> ''
            (4, "a\na\na"),          # all same
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.intra_doc_line_dedup(df, "doc_id", "text").collect()}
    assert out[1].text == "a\nb\nc" and out[1].n_lines_dropped == 2
    assert out[2].text == "x" and out[2].n_lines_dropped == 0
    assert out[3].text == "" and out[3].n_lines_kept == 1
    assert out[4].text == "a" and out[4].n_lines_kept == 1 and out[4].n_lines_dropped == 2


def test_intra_doc_line_dedup_zero_shuffle(spark):
    from tests.test_plans import plan, n_exchanges
    from betl_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(dedup.intra_doc_line_dedup(docs, "doc_id", "text"))
    assert n_exchanges(p) == 0 and "pythonUDF" not in p


def test_classifier_score_math(spark):
    from betl_spark.operators import quality

    # two buckets with known weights; tokens 'a' and 'b' land somewhere
    # deterministic — compute expected from the same md5 recipe
    import hashlib

    def bucket(tok, B):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    B = 4
    w = {0: 1.0, 1: -1.0, 2: 0.5, 3: 0.0}
    weights = spark.createDataFrame(
        [(k, v) for k, v in w.items()], "bucket long, w double"
    )
    df = spark.createDataFrame([(1, "a b a"), (2, None)], "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in quality.classifier_score(
            df, "doc_id", "text", weights, bias=0.25, buckets=B
        ).collect()
    }
    exp_m = round((2 * w[bucket("a", B)] + w[bucket("b", B)]) / 3, 9)
    logit = round(exp_m + 0.25, 9)
    assert out[1].n_tokens == 3
    assert out[1].logit == pytest.approx(logit, abs=1e-9)
    assert out[1].score == pytest.approx(round(1 / (1 + math.exp(-logit)), 6), abs=1e-6)
    # NULL text: no tokens, score = sigmoid(bias)
    assert out[2].n_tokens == 0
    assert out[2].score == pytest.approx(round(1 / (1 + math.exp(-0.25)), 6), abs=1e-6)


# ---- product quantization ----
def test_pq_encode_shape_and_determinism(spark):
    from betl_spark.operators.similarity import pq_codebook, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = [0, 5, 10, 15]
    out = pq_encode(emb, "vec_id", "embedding", seeds, 4, 64)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == 4 for r in rows)
    assert all(0 <= c < 4 for r in rows for c in r.codes)
    # a seed row's nearest codeword in every subspace is itself
    by_id = {r.vec_id: r.codes for r in rows}
    for i, s in enumerate(seeds):
        assert by_id[s] == [i, i, i, i], (s, by_id[s])
    with pytest.raises(ValueError):
        pq_codebook(emb, "vec_id", "embedding", seeds, 3, 64)


def test_pq_topk_recalls_clustered_neighbors(spark):
    """On data with real cluster structure (3 well-separated centers +
    small deterministic noise), a query's PQ top-k must be exactly its
    own cluster's members: quantized distances collapse within a
    cluster and explode across clusters. (The parity testdata's random
    embeddings carry no quantization signal, so recall is asserted on
    constructed geometry.)"""
    from betl_spark.operators.similarity import pq_topk

    dim, per = 16, 5
    rows = []
    for c in range(3):  # centers at 10·e_{cluster block}
        for i in range(per):
            vec = [0.0] * dim
            for j in range(dim):
                base = 10.0 if (j // (dim // 4)) == c else 0.0
                vec[j] = base + 0.01 * ((c * per + i + j) % 7)
            rows.append((c * 100 + i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = [0, 100, 200]  # one codeword per cluster
    got = pq_topk(df, "vec_id", "embedding", [1, 101, 201], seeds, 4, dim, k=per - 1)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert by_q[1] == {0, 2, 3, 4}
    assert by_q[101] == {100, 102, 103, 104}
    assert by_q[201] == {200, 202, 203, 204}


def test_check_rules_reports_violations(spark):
    from betl_spark.operators.profile import check_rules

    df = spark.createDataFrame(
        [(1, "en", 50), (2, "de", -5), (2, None, 200000), (None, "xx", 10)],
        "id long, lang string, n long",
    )
    rules = [
        {"name": "id_nn", "type": "not_null", "col": "id"},
        {"name": "id_uq", "type": "unique", "col": "id"},
        {"name": "n_rng", "type": "range", "col": "n", "lo": 0, "hi": 1000},
        {"name": "lang_set", "type": "in_set", "col": "lang", "values": ["en", "de"]},
        {"name": "lang_re", "type": "regex", "col": "lang", "pattern": "^[a-z]{2}$"},
    ]
    out = {r.rule: (r.n_violations, r.passed) for r in check_rules(df, rules).collect()}
    assert out["id_nn"] == (1, False)       # one NULL id
    assert out["id_uq"] == (1, False)       # id=2 twice
    assert out["n_rng"] == (2, False)       # -5 and 200000
    assert out["lang_set"] == (2, False)    # NULL and 'xx'
    assert out["lang_re"] == (1, False)     # NULL fails, 'xx' matches
    clean = check_rules(df.filter("id = 1"), rules)
    assert all(r.passed for r in clean.collect())
    with pytest.raises(ValueError):
        check_rules(df, [{"name": "bad", "type": "nope", "col": "id"}])


def test_check_rules_nulls_violate_knob(spark):
    from betl_spark.operators.profile import check_rules

    df = spark.createDataFrame(
        [(1, "en", 50), (2, None, None)], "id long, lang string, n long"
    )
    out = {
        r.rule: r.n_violations
        for r in check_rules(
            df,
            [
                # default: range passes NULLs, in_set/regex fail them
                {"name": "rng_dflt", "type": "range", "col": "n", "lo": 0},
                {"name": "set_dflt", "type": "in_set", "col": "lang",
                 "values": ["en"]},
                # overridden per rule
                {"name": "rng_strict", "type": "range", "col": "n",
                 "lo": 0, "nulls_violate": True},
                {"name": "set_lax", "type": "in_set", "col": "lang",
                 "values": ["en"], "nulls_violate": False},
                {"name": "re_lax", "type": "regex", "col": "lang",
                 "pattern": "^en$", "nulls_violate": False},
            ],
        ).collect()
    }
    assert out["rng_dflt"] == 0 and out["rng_strict"] == 1
    assert out["set_dflt"] == 1 and out["set_lax"] == 0
    assert out["re_lax"] == 0


def test_check_rules_single_pass(spark):
    from tests.test_plans import plan
    from betl_spark.operators.profile import check_rules

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from betl_spark.contract.round6 import DQ_RULES
    p = plan(check_rules(docs, DQ_RULES))
    # one scan NODE of the table, not one per rule (count the numbered
    # node headers; the tree echo repeats the text)
    import re
    assert len(re.findall(r"\(\d+\) Scan", p)) == 1
