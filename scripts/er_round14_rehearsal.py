#!/usr/bin/env python
"""Round-14 ER scale rehearsals (round-13 verdict asks #4, #6, #8).

Part A — salted-strategy decade row at sf3 (ask #4): the grid-salt
fallback was measured at ONE point (salt=8, sf1 skewed corpus, 1.66x
vs unsalted); this runs the shuffled strategies on the growing corpus
at sf1 AND sf3 (blocked candidates ~186M at sf3) against broadcast,
completing the mitigation ladder's evidence — broadcast while the
keyed vocabulary fits, salt the shuffled join when it doesn't, SNM
when the candidate budget binds. AQE partition coalescing is disabled
for the shuffled variants for the same reason as round 13's Part C:
at test scale map-side bytes are tiny and coalescing collapses every
variant to one partition, hiding exactly the per-key skew that salt
addresses at real scale.

Part B — k-day chain growth (ask #6): er_3day_chain pins 3 days; the
daily loop at 100 TB runs forever. This extends the rehearsal to a
7-DAY incremental chain (day = doc_id % 7) at sf0.1 and sf1 on the
FIXED corpus, measuring per-day attach wall, label-map rows, and
unseen-name counts, with the frozen map localCheckpoint'ed (eager) at
every boundary — the same scoped materialization the contract query
uses, which also TRUNCATES LINEAGE so day k's plan does not grow with
k (the chain's other failure mode besides wall time).

Part C — growing-vocab incremental at sf3 (ask #8, evidence polish):
one more decade point for the daily loop's unseen-name-grain bound
(part D of round 13 measured sf0.1/sf1).

Usage: PYTHONPATH=/root/repo python scripts/er_round14_rehearsal.py
Output: markdown tables for SCALE.md on stdout.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from betl_spark.contract.linkage import THRESHOLD, records_frame
from betl_spark.contract.round13 import growing_records_frame
from betl_spark.operators import linkage
from betl_spark.session import build_spark

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scale/sf1"),
    ("sf3", "/root/repo/.scale/sf3"),
]
N_DAYS = 7


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


def part_a(spark):
    coalesce_conf = "spark.sql.adaptive.coalescePartitions.enabled"
    print(
        "\n### Part A: pair-join strategy decade on the growing corpus"
        " (skewed; AQE coalescing off for shuffled variants)\n"
    )
    print("| scale | vocab | strategy | matched pairs | wall |")
    print("|---|---|---|---|---|")
    for tag, sf_dir in SCALES[1:]:
        recs = growing_records_frame(spark, sf_dir, skew=True)
        vocab = vocab_of(recs).persist()
        n_vocab = vocab.count()
        for name, kw, coal in [
            ("broadcast plain", dict(salt=1), True),
            ("broadcast grid (default)", {}, True),
            ("shuffled unsalted", dict(broadcast_names=False, salt=1), False),
            ("shuffled salt=8", dict(broadcast_names=False, salt=8), False),
            ("shuffled salt=16", dict(broadcast_names=False, salt=16), False),
        ]:
            prev = spark.conf.get(coalesce_conf)
            spark.conf.set(coalesce_conf, str(coal).lower())
            try:
                n, t = timed(
                    linkage.fuzzy_name_pairs(vocab, THRESHOLD, **kw).count
                )
            finally:
                spark.conf.set(coalesce_conf, prev)
            print(f"| {tag} | {n_vocab:,} | {name} | {n:,} | {t:.1f}s |")
        vocab.unpersist()


def chain_days(spark, sf_dir, n_days=N_DAYS):
    """Day-0 batch cluster, then n_days-1 incremental attaches with
    the frozen map eagerly localCheckpoint'ed at each boundary
    (contract shape). Returns per-day (wall, map_rows, unseen)."""
    recs = records_frame(spark, sf_dir).persist()
    recs.count()
    out = []
    day0 = recs.where(F.col("doc_id") % n_days == 0)
    (lab, t0) = timed(
        lambda: linkage.cluster_records(
            day0, record_id="doc_id", record_name="name", threshold=THRESHOLD
        )
        .select("name", "cluster_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    out.append((0, t0, lab.count(), None))
    for d in range(1, n_days):
        batch = recs.where(F.col("doc_id") % n_days == d)
        unseen = (
            vocab_of(batch)
            .join(lab.select("name"), "name", "left_anti")
            .count()
        )

        def attach(b=batch, frozen=lab):
            inc = linkage.incremental_cluster_assign(
                b, frozen, record_id="doc_id", record_name="name",
                threshold=THRESHOLD,
            )
            return (
                frozen.unionByName(inc.select("name", "cluster_id"))
                .distinct()
                .localCheckpoint(eager=True)
            )

        lab, t = timed(attach)
        out.append((d, t, lab.count(), unseen))
    recs.unpersist()
    return out


def part_b(spark):
    print(
        f"\n### Part B: {N_DAYS}-day incremental chain on the fixed"
        " corpus (frozen map localCheckpoint'ed per boundary)\n"
    )
    print("| scale | day | attach wall | map rows | unseen names |")
    print("|---|---|---|---|---|")
    for tag, sf_dir in SCALES[:2]:
        for d, t, rows, unseen in chain_days(spark, sf_dir):
            u = f"{unseen:,}" if unseen is not None else "— (batch)"
            print(f"| {tag} | {d} | {t:.1f}s | {rows:,} | {u} |")


def part_c(spark):
    print("\n### Part C: growing-vocab incremental, sf3 decade point\n")
    print("| scale | frozen names | day-2 unseen names | incr wall |")
    print("|---|---|---|---|")
    tag, sf_dir = SCALES[2]
    recs = growing_records_frame(spark, sf_dir).persist()
    day1 = recs.where(F.col("doc_id") % 2 == 0)
    day2 = recs.where(F.col("doc_id") % 2 == 1)
    lab1 = (
        linkage.cluster_records(
            day1, record_id="doc_id", record_name="name",
            threshold=THRESHOLD,
        )
        .select("name", "cluster_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_frozen = lab1.count()
    unseen = (
        vocab_of(day2).join(lab1.select("name"), "name", "left_anti").count()
    )
    _, t = timed(
        lambda: linkage.incremental_cluster_assign(
            day2, lab1, record_id="doc_id", record_name="name",
            threshold=THRESHOLD,
        ).write.format("noop").mode("overwrite").save()
    )
    print(f"| {tag} | {n_frozen:,} | {unseen:,} | {t:.1f}s |")
    recs.unpersist()


def main():
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    part_a(spark)
    part_b(spark)
    part_c(spark)


if __name__ == "__main__":
    main()
