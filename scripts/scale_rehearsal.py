#!/usr/bin/env python
"""Scale rehearsal: the most expensive contract queries at sf0.1 vs a
real sf1 decade (scripts/make_scale_data.py), min-of-2 timings each,
emitted as a markdown table for SCALE.md.

The claim under test: every plan's cost grows ~linearly in the data
(≤~10x for a 10x decade). Superlinear growth (quadratic candidate
generation, per-round iterative blowup, state-store explosions) shows
up immediately at one decade; plan inspection alone can't prove its
absence.
"""

from __future__ import annotations

import gc
import sys
import time

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scale/sf1"

REHEARSAL = [
    "star_schema_pipeline",
    "cube_revenue",
    "rollup_revenue",
    "dedup_cluster_assign",
    "near_dup_removal",
    "corpus_curation",
    "events_stream_session",
    "events_stream_stateful",
    "events_stream_enrich",
    "events_stream_dedupe",
    "dedup_simhash",
    "dedup_simhash_near_dups",
    "dedup_ngram_jaccard",
    "delta_load_dimension",
    "scd2_dimension",
    "tpch_q21_waiting_suppliers",
    "tpch_q18_large_volume_customer",
    "similarity_topk",
    "dedup_embedding_cosine",
    "tpch_q1_pricing_summary",
    # round-5 additions
    "events_stream_join",
    "dedup_incremental",
    "line_dedup",
    "decontaminate_docs",
    "mixture_rebalance_tokens",
    "quantile_band_filter",
    "sessionize_events",
    "vocab_coverage",
    # round-6 additions
    "semantic_dedup",
    "ngram_lm_perplexity",
    "perplexity_buckets",
    "dsir_scores",
    "dedup_bloom_incremental",
    "token_count_bpe",
    "chunk_documents",
    "funnel_users",
    "cohort_retention",
    "profile_documents",
    "zorder_key",
    "top_docs_per_lang",
    "psi_drift",
    "window_funcs_events",
    "intra_doc_line_dedup",
    "classifier_score",
    "hybrid_search",
    "pq_encode",
    "pq_topk",
    # round-7 additions
    "semantic_dedup_2level",
    "semantic_dedup_medoid",
    "dedup_bloom_bucketed",
    "boilerplate_removal",
    "mixture_repeats",
    "stratified_fixed_n",
    "semantic_decontaminate",
    "ivf_topk_indexed",
    "training_shuffle",
    "dedup_cluster_histogram",
    "bpe_train_merges",
    # round-8 additions
    "classifier_train",
    "classifier_train_score",
    "crosslingual_near_dups",
    "weighted_fixed_n",
    "repeated_substring_spans",
    "trim_repeated_spans",
    "semantic_dedup_incremental",
    "similarity_ann_lsh_multiprobe",
    "corpus_curation_v3",
    "semantic_ingest_2day",
    "similarity_ann_lsh_tables",
    "source_data_card",
    # round-9 additions
    "ivf_topk_trained",
    "resample_gapfill_daily",
    "rolling_zscore_events",
    "time_weighted_avg_events",
    "winsorized_event_stats",
    "equidepth_histogram_chars",
    "fuzzy_dedup_part_names",
    "keyword_search_and",
    "source_overlap_matrix",
    "char_diversity_filter",
    "bm25_topk_docs",
    "token_pmi_topk",
    "referential_integrity_audit",
    "events_time_rollup",
    "events_stream_anomaly",
    "json_props_stats",
    "rolling_active_users",
    "grouped_corr_events",
    "event_transitions",
    "ks_drift_sources",
    "ab_test_events",
    # round-11 additions (web/URL curation)
    "url_parse_docs",
    "url_canonical_dedup",
    "registered_domain_rollup",
    "domain_dedup_rates",
    "domain_blocklist_filter",
    "web_curation_pipeline",
    # round-10 additions
    "rolling_zscore_time_events",
    "resample_gapfill_observed",
    "mannwhitney_events",
    "auc_value_weekday",
    "assoc_source_lang",
    "benford_lineitem",
    "decile_lift_events",
    "ewma_events",
    "cusum_changepoint_events",
    "autocorr_events",
    "phrase_search_docs",
    "readability_docs",
    "ngram_novelty_docs",
    "column_drift_events",
    "embedding_norm_stats",
    "embedding_outliers",
    "kfold_orders",
    "temporal_split_events",
    "spearman_trend_events",
    "user_entropy_events",
    "funnel_latency_events",
]


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        gc.collect()
    return best


def ann_skew_rehearsal() -> None:
    """Empirical check of `ivf_topk`'s docstring claim that hot-centroid
    cell skew "is AQE's skew-join case" (operators/similarity.py):
    build a power-law cell assignment over the sf1 embeddings (u³
    quantization puts ~25% of the corpus in cell 0 — the whale-cell
    shape a trained IVF index gets from a dense region), run the probe
    equi-join on cell_id with a non-broadcastable query side, and time
    it with AQE skew-join splitting ON vs OFF.

    The skew thresholds are lowered so the mechanism engages at MB
    scale (at 100 TB the defaults — 256 MB partitions — engage on their
    own); what's under test is that the PLAN responds: the final
    adaptive plan must mark the join skew=true and wall time must not
    regress vs the unsplit whale partition.
    """
    import re as _re

    from pyspark.sql import functions as F

    from betl_spark.session import build_spark

    K = 64
    spark = build_spark(
        "betl_spark_ann_skew",
        extra_conf={
            # engage skew handling at rehearsal scale
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            # the probe side must not broadcast or there is no shuffle
            # join to skew-split (the broadcast path is ivf_topk's
            # small-query regime, already covered by the contract query)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    # the sf1 parquet is ONE file -> one mapper -> AQE cannot split a
    # skewed reduce partition below a single map output (split unit =
    # per-mapper shuffle blocks). Real 100 TB corpora have thousands of
    # mappers; 32 upstream partitions model that.
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").repartition(32)
    u = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(1_000_000)) / 1_000_000.0
    cell = F.floor(F.pow(u, 3) * K).cast("int").alias("cell_id")
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"), cell)
    queries = emb.filter(F.pmod(F.col("vec_id"), F.lit(211)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), cell
    )
    occupancy = corpus.groupBy("cell_id").count().orderBy(F.desc("count"))
    top = occupancy.first()
    n = corpus.count()
    print(f"corpus {n} rows, hottest cell {top['cell_id']} holds {top['count']} ({100*top['count']/n:.0f}%)")

    def probe():
        dot = F.aggregate(
            F.zip_with("qv", "nv", lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            corpus.join(queries, "cell_id")
            .select("query_id", "neighbor_id", dot.alias("score"))
            .groupBy("query_id")
            .agg(F.max("score").alias("best"))
        )

    results = {}
    for skew_on in (False, True):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        best = float("inf")
        last_plan = ""
        for _ in range(2):
            t0 = time.perf_counter()
            df = probe()
            # collect (tiny: one row per query) so THIS queryExecution
            # finalizes — a noop write executes a clone, leaving
            # isFinalPlan=false and no skew markers to inspect
            df.collect()
            best = min(best, time.perf_counter() - t0)
            last_plan = df._jdf.queryExecution().executedPlan().toString()
            gc.collect()
        marked = bool(_re.search(r"skew=true", last_plan))
        results[skew_on] = (best, marked)
        print(f"skewJoin={'on' if skew_on else 'off'}: {best:.2f}s  plan skew-marked: {marked}")

    off_t, _ = results[False]
    on_t, on_marked = results[True]
    print()
    print("| rehearsal | skewJoin off (s) | skewJoin on (s) | plan skew=true |")
    print("|---|---|---|---|")
    print(f"| `ann_probe_power_law_cells` (sf1) | {off_t:.2f} | {on_t:.2f} | {on_marked} |")
    assert on_marked, "AQE did not mark the whale partition as skewed"
    spark.stop()


def coarse_skew_rehearsal() -> None:
    """Empirical check of `semantic_dedup_2level` step 4's docstring
    claim that "hot coarse cells are AQE skew-split": the fine-cell
    resolution is an equi-join of corpus rows against the distributed
    fine-centroid table ON coarse_id, and a dense embedding region
    makes one coarse cell a whale. Same method as --ann-skew: power-law
    coarse assignment over the sf1 embeddings (u³ quantization, ~25% of
    the corpus in coarse cell 0), per-coarse-cell fine argmax join with
    broadcast disabled, timed with AQE skew-join ON vs OFF; the ON plan
    must carry skew=true and must not be slower than the whale.
    """
    import re as _re

    from pyspark.sql import functions as F

    from betl_spark.session import build_spark

    K_COARSE = 32
    FINE_PER_COARSE = 96
    spark = build_spark(
        "betl_spark_coarse_skew",
        extra_conf={
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            # the fine model must not broadcast or there is no shuffle
            # join to skew-split (below the guard the broadcast IS the
            # plan; this rehearses the 10^6-10^7-fine-centroid regime)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").repartition(32)
    u = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(1_000_000)) / 1_000_000.0
    coarse = F.floor(F.pow(u, 3) * K_COARSE).cast("int").alias("coarse_id")
    rows = emb.select(F.col("vec_id"), F.col("embedding").alias("v"), coarse)
    # distributed fine model: FINE_PER_COARSE centroids per coarse cell
    fine = (
        spark.range(K_COARSE * FINE_PER_COARSE)
        .select(
            F.col("id").alias("cell_id"),
            (F.col("id") % K_COARSE).cast("int").alias("coarse_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: F.sin(F.col("id") * d).cast("double"),
            ).alias("cv"),
        )
        .localCheckpoint(eager=True)
    )
    top = rows.groupBy("coarse_id").count().orderBy(F.desc("count")).first()
    n = rows.count()
    print(
        f"corpus {n} rows, hottest coarse cell {top['coarse_id']} holds "
        f"{top['count']} ({100 * top['count'] / n:.0f}%)"
    )

    def resolve():
        dot = F.aggregate(
            F.zip_with("v", "cv", lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            rows.join(fine, "coarse_id")
            .select("vec_id", "cell_id", dot.alias("s"))
            .groupBy("vec_id")
            .agg(F.max_by("cell_id", "s").alias("fine_cell"))
            .groupBy("fine_cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    results = {}
    for skew_on in (False, True):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
        )
        best = float("inf")
        last_plan = ""
        for _ in range(2):
            t0 = time.perf_counter()
            df = resolve()
            df.collect()
            best = min(best, time.perf_counter() - t0)
            last_plan = df._jdf.queryExecution().executedPlan().toString()
            gc.collect()
        marked = bool(_re.search(r"skew=true", last_plan))
        results[skew_on] = (best, marked)
        print(
            f"skewJoin={'on' if skew_on else 'off'}: {best:.2f}s  "
            f"plan skew-marked: {marked}"
        )
    off_t, _ = results[False]
    on_t, on_marked = results[True]
    print()
    print("| rehearsal | skewJoin off (s) | skewJoin on (s) | plan skew=true |")
    print("|---|---|---|---|")
    print(
        f"| `2level_fine_resolution_power_law_coarse` (sf1) | {off_t:.2f} "
        f"| {on_t:.2f} | {on_marked} |"
    )
    assert on_marked, "AQE did not mark the whale coarse cell as skewed"
    spark.stop()


def bpe_rounds_rehearsal() -> None:
    """Measure the BPE trainer's PER-ROUND cost curve at sf0.1 for both
    pair-count modes. The delta-maintenance claim under test: each
    round explodes only the words containing the just-merged pair, so
    round cost FALLS as merges consume the frequent pairs, instead of
    staying flat at O(|word table|) like the full recount — the
    property that makes a 30-50k-merge production vocabulary feasible
    (round r's timing includes materializing round r-1's lazily
    checkpointed table updates, so the fall shows net of maintenance).
    """
    from pyspark.sql import functions as F

    from betl_spark.operators import bpe
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_bpe_rounds")
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("text")
    K = 16
    learned = None
    for mode in ("full", "delta"):
        times: list[float] = []
        t0 = time.perf_counter()
        out = bpe.train_merges_distributed(
            docs, "text", n_merges=K, mode=mode, round_seconds=times
        )
        rows = out.orderBy("merge_rank").collect()
        total = time.perf_counter() - t0
        head = " ".join(f"{t:.2f}" for t in times[:4])
        tail = " ".join(f"{t:.2f}" for t in times[-4:])
        print(
            f"{mode}: {len(rows)} merges, total {total:.1f}s, rounds 1-4 "
            f"[{head}] ... rounds {K-3}-{K} [{tail}]",
            flush=True,
        )
        learned = rows
    # the quantity the delta mode bounds: words EXPLODED per round.
    # Full mode explodes the whole word table every round (flat); delta
    # explodes only words containing the just-merged pair — replay the
    # learned merges over the word table and count both per round.
    base = F.expr(bpe._encoded_expr("text", []))
    words = (
        docs.select(F.explode(F.split(base, bpe.BND)).alias("enc"))
        .filter(F.col("enc") != "")
        .groupBy("enc")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )
    vocab = words.count()
    fracs = []
    for r in learned:
        pat = bpe.SYM + r.x + bpe.SYM + bpe.SYM + r.y + bpe.SYM
        rep = bpe.SYM + r.x + r.y + bpe.SYM
        affected = words.filter(F.col("enc").contains(pat)).count()
        fracs.append(affected / vocab)
        words = words.select(
            F.expr(
                f"replace(enc, {bpe._sql_quote(pat)}, {bpe._sql_quote(rep)})"
            ).alias("enc"),
            "freq",
        ).localCheckpoint(eager=True)
    print(
        f"word table {vocab} rows; affected fraction by round: "
        + " ".join(f"{f:.3f}" for f in fracs),
        flush=True,
    )
    spark.stop()


def hot_gram_rehearsal() -> None:
    """Hot-gram skew rehearsal for `ngram_novelty` (round-10 verdict
    ask #4): a boilerplate 3-gram planted in ~30% of sf1 docs makes
    one gram key a whale.

    What the rehearsal PROVED (and why the operator was rewritten):
    the original formulation joined the doc-gram pairs back to the
    min-doc census on the gram key — and that join is structurally
    un-rescuable by AQE: OptimizeSkewedJoin only matches SMJ children
    of shape Sort(ShuffleStage), while the census side is
    Sort(HashAggregate(ShuffleStage)). Measured here: with the hot
    partition at 3.8x median bytes and every knob thrown
    (thresholds 100k/factor 2, forceOptimizeSkewedJoin, shuffle
    compression off so identical hot-gram strings can't compress the
    skew away, 512 reduce partitions so the key dominates its
    partition) the executed plan stayed skew=false in every run.

    The shipped operator (operators/corpus.py) therefore computes
    novelty JOIN-FREE: n_novel = per-__first COUNT over the census,
    n_ngrams = per-doc COUNT over the gram pairs. MIN/COUNT are
    map-side combinable, so the hot gram leaves each mapper as one
    partial row — reduce-side O(mappers), no whale by construction.
    This rehearsal keeps the OLD join formulation inline as the
    control and times both on the planted corpus.
    """
    from pyspark.sql import functions as F

    from betl_spark.operators.corpus import ngram_novelty
    from betl_spark.operators.decontam import word_ngrams
    from betl_spark.session import build_spark

    spark = build_spark(
        "betl_spark_hot_gram_skew",
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # real-scale geometry: partitions small enough that the
            # hot key dominates one (at 100 TB, 256 MB partitions vs
            # a billions-of-rows gram key)
            "spark.sql.shuffle.partitions": "512",
        },
    )
    # one parquet file -> one mapper; 32 upstream partitions model a
    # real multi-file scan (and give map-side combine 32 partials)
    docs = spark.read.parquet(f"{SF1}/documents.parquet").repartition(32)
    planted = docs.select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(10)) < 3,
            F.concat(F.col("text"), F.lit(" click here now")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).cache()
    n = planted.count()
    hot = planted.where(F.col("text").like("%click here now")).count()
    print(f"{n} docs, boilerplate 3-gram planted in {hot} ({100*hot/n:.0f}%)")

    def old_join_formulation(df):
        grams = df.select(
            F.col("doc_id").alias("__id"),
            F.explode(word_ngrams("text", 3)).alias("__g"),
        )
        first = grams.groupBy("__g").agg(F.min("__id").alias("__first"))
        joined = grams.join(first, "__g")
        return joined.groupBy("__id").agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("__first") == F.col("__id")).cast("long")).alias(
                "n_novel"
            ),
        )

    def timed(build):
        best = float("inf")
        plan = ""
        for _ in range(3):
            t0 = time.perf_counter()
            df = build().agg(
                F.sum("n_novel").alias("s"), F.count(F.lit(1)).alias("c")
            )
            df.collect()
            best = min(best, time.perf_counter() - t0)
            plan = df._jdf.queryExecution().executedPlan().toString()
            gc.collect()
        return best, plan

    t_old, plan_old = timed(lambda: old_join_formulation(planted))
    t_new, plan_new = timed(
        lambda: ngram_novelty(planted, "doc_id", "text", n=3)
    )
    old_skewed = plan_old.count("skew=true")
    gram_joins_new = plan_new.count("SortMergeJoin [__g")
    print(f"old (grams ⋈ census): {t_old:.2f}s  skew-marked joins: {old_skewed}")
    print(f"new (join-free aggs): {t_new:.2f}s  gram-key joins in plan: {gram_joins_new}")
    print()
    print("| rehearsal (sf1, 30% boilerplate gram) | wall (s) | gram-key join | AQE skew=true |")
    print("|---|---|---|---|")
    print(f"| old join formulation | {t_old:.2f} | yes (SMJ) | {old_skewed > 0} (structurally impossible) |")
    print(f"| shipped join-free formulation | {t_new:.2f} | {'no' if gram_joins_new == 0 else 'YES'} | n/a (map-side combine) |")
    assert gram_joins_new == 0, "shipped plan still joins on the gram key"
    spark.stop()


SF3 = "/root/repo/.scale/sf3"

# sf1 → sf3 breadth sweep (round-11): one representative per family
# beyond second_decade.py's top-3, so the two-point growth evidence
# covers the workload classes, not just the heaviest queries.
SF3_SWEEP = [
    "tpch_q1_pricing_summary",       # exact DECIMAL agg, 18M lineitem
    "tpch_q21_waiting_suppliers",    # full-table multi-join
    "dedup_minhash_lsh_pairs",       # banded LSH pair generation
    "dedup_simhash",                 # hamming-bucketed near-dup
    "line_dedup",                    # explode-heavy text dedup
    "token_count_bpe",               # saturated-CPU tokenization
    "events_stream_stateful",        # streaming state commits, 3M events
    "dsir_scores",                   # hashed-ngram importance scoring
    "resample_gapfill_daily",        # spine generation + ffill windows
    "web_curation_pipeline",         # round-11 flagship
]


def sf3_sweep() -> None:
    from betl_spark.contract import QUERIES
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_sf3_sweep")
    rows = []
    for n in SF3_SWEEP:
        # warm the plan at the smallest SF (same policy as main())
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
        gc.collect()
        t1 = time_query(QUERIES[n], spark, SF1)
        t3 = time_query(QUERIES[n], spark, SF3)
        ratio = t3 / t1 if t1 > 0 else float("nan")
        rows.append((n, t1, t3, ratio))
        print(f"{n}: sf1 {t1:.2f}s  sf3 {t3:.2f}s  x{ratio:.2f}", flush=True)
    print()
    print("| query | sf1 (s) | sf3 (s) | growth (3x data) |")
    print("|---|---|---|---|")
    for n, a, b, r in sorted(rows, key=lambda x: -x[3]):
        print(f"| `{n}` | {a:.2f} | {b:.2f} | x{r:.2f} |")
    spark.stop()


def main() -> None:
    from betl_spark.contract import QUERIES
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_scale_rehearsal")
    wanted = REHEARSAL
    if "--only" in sys.argv:
        wanted = sys.argv[sys.argv.index("--only") + 1].split(",")
    names = [n for n in wanted if n in QUERIES]
    missing = [n for n in REHEARSAL if n not in QUERIES]
    if missing:
        print(f"# not in registry, skipped: {missing}", file=sys.stderr)

    # warm plans at the smallest SF (same policy as bench.py)
    for n in names:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        gc.collect()

    rows = []
    for n in names:
        t_small = time_query(QUERIES[n], spark, SF01)
        t_big = time_query(QUERIES[n], spark, SF1)
        ratio = t_big / t_small if t_small > 0 else float("nan")
        rows.append((n, t_small, t_big, ratio))
        print(f"{n}: sf0.1 {t_small:.2f}s  sf1 {t_big:.2f}s  x{ratio:.1f}", flush=True)

    # semantic_dedup, k scaled with the corpus (the SemDeDup contract:
    # cost is sum(n_cell^2), so cells must stay constant-size — the
    # fixed-k contract query is the superlinear control, this is the
    # prescribed operating mode). sf1 = 10 key-shifted replicas
    # (make_scale_data.py), so 10x the centroids = one centroid set per
    # replica shift, holding n_cell at the sf0.1 value.
    from betl_spark.contract.common import table as _table
    from betl_spark.contract.round6 import SEMANTIC_THRESHOLD
    from betl_spark.contract.scale import IVF_CENTROID_IDS
    from betl_spark.operators import similarity

    if "--only" in sys.argv:
        print()
        print("| query | sf0.1 (s) | sf1 (s) | growth (10x data) |")
        print("|---|---|---|---|")
        for n, a, b, r in sorted(rows, key=lambda x: -x[3]):
            print(f"| `{n}` | {a:.2f} | {b:.2f} | x{r:.1f} |")
        spark.stop()
        return

    def sem_scaled(k_ids):
        def q(spark, sf_dir):
            emb = _table(spark, sf_dir, "embeddings")
            return similarity.semantic_dedup(
                emb, "vec_id", "embedding", k_ids, threshold=SEMANTIC_THRESHOLD
            )
        return q

    ids_sf1 = [c + i * 10**9 for i in range(10) for c in IVF_CENTROID_IDS]
    t_small = time_query(sem_scaled(IVF_CENTROID_IDS), spark, SF01)
    t_big = time_query(sem_scaled(ids_sf1), spark, SF1)
    ratio = t_big / t_small if t_small > 0 else float("nan")
    rows.append(("semantic_dedup_scaled_k", t_small, t_big, ratio))
    print(
        f"semantic_dedup_scaled_k: sf0.1 {t_small:.2f}s (k=8)  "
        f"sf1 {t_big:.2f}s (k=80)  x{ratio:.1f}",
        flush=True,
    )

    print()
    print("| query | sf0.1 (s) | sf1 (s) | growth (10x data) |")
    print("|---|---|---|---|")
    for n, a, b, r in sorted(rows, key=lambda x: -x[3]):
        print(f"| `{n}` | {a:.2f} | {b:.2f} | x{r:.1f} |")
    spark.stop()




LINKAGE_QUERIES = [
    "er_blocking_audit",
    "er_master_rollup",
    "er_source_audit",
    "er_similarity_bands",
]


def linkage_sweep() -> None:
    """Round-11 decade rehearsal for the record-linkage family:
    sf0.1 -> sf1 (10x docs) min-of-2 wall times. The family's scale
    contract is linearity - candidates per record are bounded by the
    (broadcast) master catalog's block occupancy, so 10x records must
    cost ~10x map work amortized over fixed stage overhead, i.e.
    measured growth well under x10 at MB scale."""
    from betl_spark.contract import QUERIES
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_linkage_sweep")
    rows = []
    for n in LINKAGE_QUERIES:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
        gc.collect()
        t0 = time_query(QUERIES[n], spark, "/root/testdata/sf0.1")
        t1 = time_query(QUERIES[n], spark, SF1)
        ratio = t1 / t0 if t0 > 0 else float("nan")
        rows.append((n, t0, t1, ratio))
        print(f"{n}: sf0.1 {t0:.2f}s  sf1 {t1:.2f}s  x{ratio:.2f}", flush=True)
    print()
    print("| query | sf0.1 (s) | sf1 (s) | growth (10x data) |")
    print("|---|---|---|---|")
    for n, a, b, r in sorted(rows, key=lambda x: -x[3]):
        print(f"| `{n}` | {a:.2f} | {b:.2f} | x{r:.2f} |")




SF10 = "/root/repo/.scale/sf10"

# sf1 -> sf10 sweep (round-11): a SECOND full decade on top of the
# sf0.1 -> sf1 tables, one representative per workload class. Combined
# with the earlier tables every listed class now has growth measured
# across TWO decades (sf0.1 -> sf1 -> sf10 = 100x total), which is the
# strongest locally-achievable form of the "plans survive a 10-100x
# scale-up" claim.
SF10_SWEEP = [
    "tpch_q1_pricing_summary",       # exact DECIMAL agg, 60M lineitem
    "tpch_q21_waiting_suppliers",    # full-table multi-join
    "dedup_minhash_lsh_pairs",       # banded LSH pair generation
    "line_dedup",                    # explode-heavy text dedup
    "token_count_bpe",               # saturated-CPU tokenization
    "dsir_scores",                   # hashed-ngram importance scoring
    "resample_gapfill_observed",     # the prescribed spine mode
    "events_stream_stateful",        # streaming state commits, 10M events
    "web_curation_pipeline",         # round-11 web flagship
    "er_blocking_audit",             # round-11 linkage flagship
]


def sf10_sweep() -> None:
    from betl_spark.contract import QUERIES
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_sf10_sweep")
    rows = []
    for n in SF10_SWEEP:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
        gc.collect()
        t1 = time_query(QUERIES[n], spark, SF1)
        t10 = time_query(QUERIES[n], spark, SF10)
        ratio = t10 / t1 if t1 > 0 else float("nan")
        rows.append((n, t1, t10, ratio))
        print(f"{n}: sf1 {t1:.2f}s  sf10 {t10:.2f}s  x{ratio:.2f}", flush=True)
    print()
    print("| query | sf1 (s) | sf10 (s) | growth (10x data) |")
    print("|---|---|---|---|")
    for n, a, b, r in sorted(rows, key=lambda x: -x[3]):
        print(f"| `{n}` | {a:.2f} | {b:.2f} | x{r:.2f} |")


if __name__ == "__main__":
    if "--ann-skew" in sys.argv:
        ann_skew_rehearsal()
    elif "--coarse-skew" in sys.argv:
        coarse_skew_rehearsal()
    elif "--bpe-rounds" in sys.argv:
        bpe_rounds_rehearsal()
    elif "--hot-gram" in sys.argv:
        hot_gram_rehearsal()
    elif "--sf3" in sys.argv:
        sf3_sweep()
    elif "--linkage" in sys.argv:
        linkage_sweep()
    elif "--sf10" in sys.argv:
        sf10_sweep()
    else:
        main()
