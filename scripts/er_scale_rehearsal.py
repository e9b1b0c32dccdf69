#!/usr/bin/env python
"""Round-13 ER scale rehearsals (round-12 verdict asks #2 and #3).

Part A — growing-vocabulary decade (sf0.1 -> sf1, vocab ~2k -> ~20k):
times and counts for every stage of cluster_records on the
round-13 growing corpus (contract/round13.growing_records_frame),
with per-stage growth exponents  x = log(v1/v01) / log(V1/V01)
against the VOCABULARY ratio (the axis the stages are bounded by),
plus the two mitigations measured on the same corpus:

  - SNM pairs: candidates = (window-1)*|vocab| by construction —
    the linear-in-vocab generator;
  - prefix_len=3 blocked pairs: the key-growth knob (finer keys →
    more blocks → smaller Σ|block|²).

The round-12 ladder was flat because the corpus fixed the vocabulary;
this is the honest replacement: with 2-char keys over FIXED name
pools the block-key cardinality saturates, so blocked candidates grow
~quadratically in vocab — the measured fact that drives the operating
rule documented in SCALE.md (grow the key with the vocabulary, or
bound candidates with SNM).

Part B — whale-block skew (sf1, skew=True: 30% of entities share the
'zz' head prefix): blocked vs SNM vs their union — wall time,
candidate counts, and TRUE recall against an all-pairs
levenshtein ground truth (vocabulary-grain cartesian, gated to this
validation script exactly like the repo's other all-pairs baselines).

Usage: PYTHONPATH=/root/repo python scripts/er_scale_rehearsal.py
Output: markdown tables for SCALE.md on stdout.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import functions as F

from betl_spark.contract.linkage import THRESHOLD
from betl_spark.contract.round13 import growing_records_frame
from betl_spark.operators import linkage
from betl_spark.session import build_spark

SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/root/repo/.scale/sf1")]
WINDOW = 5


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def vocab_of(recs):
    return (
        recs.select(F.lower(F.trim("name")).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
    )


def candidate_count(vocab, prefix_len=2):
    """Blocked candidate pairs BEFORE the distance filter (the join
    cost driver): same keyed self-join + p:/l: map-side dedup as
    fuzzy_name_pairs, without the levenshtein."""
    keyed = vocab.select(
        "name",
        F.explode(linkage.block_keys(F.col("name"), prefix_len)).alias(
            "block_key"
        ),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = a.join(
        b,
        (F.col("a.block_key") == F.col("b.block_key"))
        & (F.col("a.name") < F.col("b.name")),
    ).where(
        F.col("a.block_key").startswith("p:")
        | (
            F.substring(F.col("a.name"), 1, prefix_len)
            != F.substring(F.col("b.name"), 1, prefix_len)
        )
    )
    return cand.count()


def part_a(spark):
    rows = []
    for tag, sf_dir in SCALES:
        recs = growing_records_frame(spark, sf_dir).persist()
        n_rec = recs.count()
        vocab = vocab_of(recs).persist()
        n_vocab = vocab.count()
        n_cand, t_cand = timed(lambda: candidate_count(vocab))
        pairs = linkage.fuzzy_name_pairs(vocab, THRESHOLD)
        n_pairs, t_pairs = timed(pairs.count)
        cc, t_cc = timed(
            lambda: linkage.cluster_records(
                recs, record_id="doc_id", record_name="name"
            )
            .select("cluster_id")
            .distinct()
            .count()
        )
        n_snm, t_snm = timed(
            linkage.sorted_neighborhood_pairs(vocab, WINDOW, THRESHOLD).count
        )
        n_cand3, t_cand3 = timed(lambda: candidate_count(vocab, prefix_len=3))
        n_pairs3, _ = timed(
            linkage.fuzzy_name_pairs(vocab, THRESHOLD, prefix_len=3).count
        )
        rows.append(
            dict(tag=tag, n_rec=n_rec, n_vocab=n_vocab, n_cand=n_cand,
                 t_cand=t_cand, n_pairs=n_pairs, t_pairs=t_pairs,
                 n_clusters=cc, t_full=t_cc, n_snm=n_snm, t_snm=t_snm,
                 n_cand3=n_cand3, t_cand3=t_cand3, n_pairs3=n_pairs3)
        )
        recs.unpersist(); vocab.unpersist()

    print("\n### Part A: growing-vocabulary decade (cluster_records stages)\n")
    print("| scale | records | vocab | blocked cands (p=2) | t | matched pairs | t | clusters | full t | SNM pairs | SNM t | cands (p=3) | pairs (p=3) |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['tag']} | {r['n_rec']} | {r['n_vocab']} | {r['n_cand']:,}"
            f" | {r['t_cand']:.1f}s | {r['n_pairs']:,} | {r['t_pairs']:.1f}s"
            f" | {r['n_clusters']:,} | {r['t_full']:.1f}s | {r['n_snm']:,}"
            f" | {r['t_snm']:.1f}s | {r['n_cand3']:,} | {r['n_pairs3']:,} |"
        )
    a, b = rows
    vr = b["n_vocab"] / a["n_vocab"]

    def expo(k):
        return math.log(max(b[k], 1) / max(a[k], 1)) / math.log(vr)

    print(
        f"\nvocab ratio x{vr:.2f}; growth exponents vs vocab: "
        f"blocked candidates x^{expo('n_cand'):.2f}, matched pairs "
        f"x^{expo('n_pairs'):.2f}, SNM candidates bounded at "
        f"(w-1)*V (measured pairs x^{expo('n_snm'):.2f}), p=3 "
        f"candidates x^{expo('n_cand3'):.2f}"
    )
    return rows


def part_b(spark):
    recs = growing_records_frame(spark, SCALES[1][1], skew=True).persist()
    vocab = vocab_of(recs).persist()
    n_vocab = vocab.count()

    # ground truth: vocabulary-grain all-pairs (gated validation
    # baseline — the only cartesian in this script, never in an op)
    a = vocab.select(F.col("name").alias("name_a"))
    b = vocab.select(F.col("name").alias("name_b"))
    truth = (
        a.crossJoin(b)
        .where(F.col("name_a") < F.col("name_b"))
        .where(
            # bounded variant early-exits past the threshold but
            # returns -1 there — filter on the non-negative band
            F.levenshtein("name_a", "name_b", THRESHOLD + 1).between(
                0, THRESHOLD
            )
        )
    ).persist()
    n_truth, t_truth = timed(truth.count)

    methods = {}
    bp = linkage.fuzzy_name_pairs(vocab, THRESHOLD).persist()
    n_b, t_b = timed(bp.count)
    n_bcand, t_bcand = timed(lambda: candidate_count(vocab))
    sp = (
        linkage.sorted_neighborhood_pairs(vocab, WINDOW, THRESHOLD)
        .select("name_a", "name_b")
        .persist()
    )
    n_s, t_s = timed(sp.count)
    un = bp.select("name_a", "name_b").union(sp).distinct().persist()
    n_u, t_u = timed(un.count)

    def recall(found):
        hit = truth.join(found, ["name_a", "name_b"], "left_semi").count()
        return hit / max(n_truth, 1)

    methods["blocked (p=2)"] = (n_bcand, n_b, t_b, recall(bp))
    methods[f"SNM (w={WINDOW})"] = ((WINDOW - 1) * n_vocab, n_s, t_s, recall(sp))
    methods["union"] = (None, n_u, t_b + t_s + t_u, recall(un))

    print(
        f"\n### Part B: whale-block skew at sf1 "
        f"(30% of entities share prefix 'zz'; vocab={n_vocab:,}, "
        f"true pairs={n_truth:,}, all-pairs truth cost {t_truth:.1f}s)\n"
    )
    print("| method | candidates | matched pairs | wall | recall |")
    print("|---|---|---|---|---|")
    for name, (cand, n, t, rec) in methods.items():
        c = f"{cand:,}" if cand is not None else "—"
        print(f"| {name} | {c} | {n:,} | {t:.1f}s | {rec:.4f} |")
    for d in [bp, sp, un, truth, recs, vocab]:
        d.unpersist()


def part_c(spark):
    """The larger-than-broadcast regime on the whale corpus: shuffled
    pair join, unsalted vs grid-salted. AQE partition coalescing is
    disabled for this part — on a test-sized vocabulary it collapses
    BOTH variants to one partition (map bytes are tiny; the explosion
    is output rows), which is precisely the broadcast path's reason to
    exist; at a 10^8-name vocabulary map bytes are large, coalescing
    is moot, and per-KEY skew (whale block -> one reducer) is the
    bottleneck salt addresses."""
    coalesce_conf = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_conf)
    spark.conf.set(coalesce_conf, "false")
    try:
        recs = growing_records_frame(spark, SCALES[1][1], skew=True)
        vocab = vocab_of(recs).persist()
        vocab.count()
        rows = []
        for tag, kw in [
            ("shuffled unsalted", dict(broadcast_names=False, salt=1)),
            ("shuffled salt=8", dict(broadcast_names=False, salt=8)),
            ("broadcast plain", dict(salt=1)),
            ("broadcast grid (default)", {}),
        ]:
            n, t = timed(
                linkage.fuzzy_name_pairs(vocab, THRESHOLD, **kw).count
            )
            rows.append((tag, n, t))
        print("\n### Part C: whale corpus, pair-join strategies "
              "(AQE coalescing off)\n")
        print("| strategy | matched pairs | wall |")
        print("|---|---|---|")
        for tag, n, t in rows:
            print(f"| {tag} | {n:,} | {t:.1f}s |")
        vocab.unpersist()
    finally:
        spark.conf.set(coalesce_conf, prev)


def part_d(spark):
    """Daily-ingest loop at growing vocabulary: the incremental pass's
    pairwise work runs at UNSEEN-name grain (the smallest set in the
    problem) against the frozen map — measure the attach wall time and
    the unseen fraction across the decade."""
    from betl_spark.contract.linkage import THRESHOLD as T

    print("\n### Part D: incremental ingest at growing vocabulary\n")
    print("| scale | frozen names | day-2 unseen names | incr wall |")
    print("|---|---|---|---|")
    for tag, sf_dir in SCALES:
        recs = growing_records_frame(spark, sf_dir).persist()
        day1 = recs.where(F.col("doc_id") % 2 == 0)
        day2 = recs.where(F.col("doc_id") % 2 == 1)
        lab1 = (
            linkage.cluster_records(
                day1, record_id="doc_id", record_name="name", threshold=T
            )
            .select("name", "cluster_id")
            .distinct()
            .persist()
        )
        n_frozen = lab1.count()
        unseen = (
            vocab_of(day2)
            .join(lab1.select("name"), "name", "left_anti")
            .count()
        )
        _, t = timed(
            lambda: linkage.incremental_cluster_assign(
                day2, lab1, record_id="doc_id", record_name="name",
                threshold=T,
            ).write.format("noop").mode("overwrite").save()
        )
        print(f"| {tag} | {n_frozen:,} | {unseen:,} | {t:.1f}s |")
        recs.unpersist(); lab1.unpersist()


def main():
    spark = build_spark()
    part_a(spark)
    part_b(spark)
    part_c(spark)
    part_d(spark)


if __name__ == "__main__":
    main()
