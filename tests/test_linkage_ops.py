"""Unit tests for the record-linkage operators
(betl_spark/operators/linkage.py) — hand-checked distance pins per
perturbation class, the multi-pass blocking witnesses, tie-break
determinism, similarity-band edges, and a Spark-vs-DuckDB levenshtein
cross-check (the family's entire parity story rests on the two
engines' edit distance being the same exact integer)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from betl_spark.operators import linkage
from betl_spark.operators.linkage import similarity_band_sql


def _masters(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "master_id: long, name: string"
    )


def _records(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "record_id: long, name: string"
    )


def _link(spark, records, masters, **kw):
    return {
        r["record_id"]: r
        for r in linkage.link_records(
            _records(spark, records), _masters(spark, masters), **kw
        ).collect()
    }


MASTER = "alice brandt llc"


@pytest.mark.parametrize(
    "dirty,dist",
    [
        (MASTER, 0),  # exact
        ("ALICE BRANDT LLC", 0),  # case fold via normalization
        ("  alice brandt llc ", 0),  # trim via normalization
        ("alice brandt ll", 1),  # drop last char
        ("lice brandt llc", 1),  # drop first char (l-key witness)
        ("alice brandt llcc", 1),  # double last char
        ("alice-brandt-llc", 2),  # hyphenation: one sub per space
        ("alice brandt llc jr", 3),  # ' jr' suffix
        ("dr alice brandt llc", 3),  # 'dr ' prefix (l-key witness)
        ("alicxe brandt llc", 1),  # mid insert
    ],
)
def test_variant_distances(spark, dirty, dist):
    got = _link(spark, [dirty], [MASTER])
    assert got[0]["best_dist"] == dist
    assert got[0]["best_master_id"] == 0
    assert bool(got[0]["matched"]) == (dist <= linkage.DEFAULT_THRESHOLD)


def test_null_and_unblocked_records_absent(spark):
    got = _link(spark, [None, "zz qq"], [MASTER])
    assert got == {}  # NULL emits no keys; 'zz qq' hits no block


def test_multipass_blocking_recovers_head_edits(spark):
    """Head edits break the p: key; the l: last-token key recovers
    them — the reason blocking is multi-pass."""
    head_edited = ["lice brandt llc", "dr alice brandt llc"]
    got = _link(spark, head_edited, [MASTER])
    assert set(got) == {0, 1}
    # single-pass head-prefix blocking alone would have missed both:
    # their normalized head prefixes are 'li'/'dr', the master's 'al'
    for r in got.values():
        assert r["n_candidates"] >= 1 and r["matched"]


def test_token_swap_is_candidate_but_no_match(spark):
    """A swapped name shares the suffix's l: key (candidate) but sits
    far beyond the threshold (no match)."""
    got = _link(spark, ["brandt alice llc"], [MASTER])
    assert got[0]["n_candidates"] >= 1
    assert got[0]["best_dist"] > linkage.DEFAULT_THRESHOLD
    assert not got[0]["matched"]


def test_best_match_tie_breaks_on_master_id(spark):
    """Two masters at the same distance: the lower master_id wins —
    the deterministic total order the oracle mirrors."""
    masters = ["alfa x", "alfa y"]  # dist 1 from 'alfa z' each
    got = _link(spark, ["alfa z"], masters)
    assert got[0]["best_dist"] == 1
    assert got[0]["best_master_id"] == 0
    assert got[0]["n_candidates"] == 2


def test_candidate_count_dedupes_multi_key_pairs(spark):
    """A record matching a master via BOTH keys counts it once."""
    got = _link(spark, [MASTER], [MASTER])
    assert got[0]["n_candidates"] == 1


def test_keep_cols_pass_through(spark):
    recs = spark.createDataFrame(
        [(1, "alice brandt llc", "src9")],
        "record_id: long, name: string, source: string",
    )
    out = linkage.link_records(
        recs, _masters(spark, [MASTER]), keep_cols=("source",)
    ).collect()
    assert out[0]["source"] == "src9"


def test_block_keys_shape(spark):
    df = spark.createDataFrame(
        [("alice brandt",), ("solo",), (None,)], "n: string"
    )
    rows = df.select(
        linkage.block_keys(F.col("n")).alias("k")
    ).collect()
    assert rows[0]["k"] == ["p:al", "l:br"]
    assert rows[1]["k"] == ["p:so", "l:so"]  # tags keep both entries
    assert rows[2]["k"] == [None]  # NULL key: can never equi-join


@pytest.mark.parametrize(
    "dist,rec,mas,band",
    [
        (0, "abcdefghij", "abcdefghij", 9),  # identical
        (1, "abcdefghij", "abcdefghij", 9),  # 10*(10-1) DIV 10 = 9
        (5, "abcdefghij", "abcdefghij", 5),
        (10, "abcdefghij", "abcdefghij", 0),
        (0, "", "", 9),  # maxlen 0 → identical
        (3, "ab", "abc", 0),  # 10*(3-3) DIV 3 = 0
    ],
)
def test_similarity_band_integer_edges(spark, dist, rec, mas, band):
    df = spark.createDataFrame([(dist, rec, mas)], "d: long, r: string, m: string")
    got = df.select(
        F.expr(similarity_band_sql("d", "r", "m")).alias("band")
    ).collect()[0]["band"]
    assert got == band
    duck = duckdb.sql(
        f"SELECT {similarity_band_sql(str(dist), repr(rec), repr(mas), duckdb=True)}"
    ).fetchone()[0]
    assert duck == band


def test_levenshtein_cross_engine(spark):
    """The family's parity rests on Spark and DuckDB computing the
    SAME exact integer edit distance — sweep a pair grid through both
    engines, including empties, containments, and transposition-heavy
    pairs (classic levenshtein counts a transposition as 2)."""
    names = [
        "", "a", "alice", "alcie", "alice brandt", "brandt alice",
        "alice brandt llc", "dr alice brandt", "alice-brandt-llc",
        "kowalski", "kowalsik", "lindqvist gmbh",
    ]
    pairs = [(a, b) for a in names for b in names]
    df = spark.createDataFrame(pairs, "a: string, b: string")
    got = {
        (r["a"], r["b"]): r["d"]
        for r in df.select(
            "a", "b", F.levenshtein("a", "b").alias("d")
        ).collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "SELECT levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert got[(a, b)] == want, (a, b)


def test_contract_name_spec_is_injective(spark):
    """The 211 golden names are pairwise distinct (CRT over the
    coprime pools) — required for the tie-break to mean anything."""
    from betl_spark.contract.linkage import masters_frame

    m = masters_frame(spark)
    assert m.count() == 211
    assert m.select("name").distinct().count() == 211


def test_resolve_entities_verb_journals_and_stores(dfl, spark):
    dfl.data["recs"] = spark.createDataFrame(
        [(1, "alice brandt llc"), (2, "alice brandt ll"), (3, None)],
        "id long, name string",
    )
    dfl.data["golden"] = spark.createDataFrame(
        [(7, "alice brandt llc")], "master_id long, name string"
    )
    out = dfl.resolveEntities("recs", "golden", "id", "name", maxDist=2)
    got = {r["record_id"]: r for r in out.collect()}
    assert got[1]["best_dist"] == 0 and got[1]["best_master_id"] == 7
    assert got[2]["best_dist"] == 1 and got[2]["matched"]
    assert 3 not in got  # NULL name audited upstream, never matched
    assert "recs_resolved" in dfl.data
    assert any(s.op == "resolveEntities" for s in dfl.journal.steps)


def test_contract_all_null_name_slice_guards(spark, tmp_path):
    """A corpus slice whose ONLY doc has v=0 (NULL name): the audit
    emits one row with NULL-guarded rates and the match-side queries
    emit zero rows — the degenerate shape a 1-doc/1-class partition
    hits at any scale. (Cross-engine agreement for this slice and a
    17-doc partial-class slice was verified against DuckDB when the
    family shipped; empty-input agreement is pinned for every contract
    pair in test_empty_robustness.py.)"""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src)
    pq.write_table(t.slice(0, 1), str(tmp_path / "documents.parquet"))

    from betl_spark.contract.linkage import (
        q_er_blocking_audit,
        q_er_master_rollup,
        q_er_similarity_bands,
    )

    audit = q_er_blocking_audit(spark, str(tmp_path)).collect()
    assert len(audit) == 1
    row = audit[0]
    assert row["v"] == 0 and row["n_named"] == 0
    assert row["match_rate"] is None and row["mean_best_dist"] is None
    assert q_er_master_rollup(spark, str(tmp_path)).count() == 0
    assert q_er_similarity_bands(spark, str(tmp_path)).count() == 0


def test_majority_vote_tie_breaks_on_smallest_value(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c"), (2, None)],
        "g long, v string",
    )
    got = {r["g"]: (r["v"], r["n_votes"])
           for r in linkage.majority_vote(df, "g", "v").collect()}
    assert got[1] == ("a", 2)  # 2-2 tie between a and b -> smallest
    assert 2 not in got  # NULLs abstain; all-NULL group has no winner


def test_survivorship_rules_and_mode_join(spark):
    df = spark.createDataFrame(
        [
            (1, 10, 5.0, "s2"),
            (1, 20, 1.0, "s1"),
            (1, 30, 3.0, "s1"),
            (2, 40, 2.0, None),
        ],
        "g long, id long, d double, src string",
    )
    out = {r["g"]: r for r in linkage.survivorship(
        df, "g", {"id": "min", "d": "max", "src": "mode"}
    ).collect()}
    assert out[1]["n_members"] == 3
    assert out[1]["id_min"] == 10 and out[1]["d_max"] == 5.0
    assert out[1]["src"] == "s1" and out[1]["src_votes"] == 2
    # group 2: src all-NULL -> mode LEFT-joins to NULL, aggs survive
    assert out[2]["n_members"] == 1 and out[2]["src"] is None
    assert out[2]["src_votes"] is None


def test_survivorship_rejects_unknown_rule(spark):
    df = spark.createDataFrame([(1, 2)], "g long, x long")
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        linkage.survivorship(df, "g", {"x": "median"})


def test_survive_golden_records_verb(dfl, spark):
    dfl.data["members"] = spark.createDataFrame(
        [(1, 5, "a"), (1, 7, "a"), (1, 9, "b")], "g long, id long, s string"
    )
    out = dfl.surviveGoldenRecords(
        "members", "g", {"id": "min", "s": "mode"}
    ).collect()
    assert out[0]["id_min"] == 5 and out[0]["s"] == "a"
    assert "members_golden" in dfl.data
    assert any(s.op == "surviveGoldenRecords" for s in dfl.journal.steps)


# ---- master-less ER: cluster_records / fuzzy_name_pairs (round 12) ----


def test_cluster_records_transitive_chain(spark):
    """A chain a~b, b~c (each within threshold, a-c farther) must land
    in ONE cluster labeled by the smallest member name — transitivity
    is the whole point of the CC stage."""
    recs = _records(
        spark,
        [
            "alice brandt llc",      # 0: base
            "alice brandt ll",       # 1: dist 1 from base
            "alice brandt l",        # 2: dist 1 from #1, dist 2 from base
            "dmitri moreau",         # 3: unrelated singleton
            None,                    # 4: NULL name — excluded
        ],
    )
    out = {
        r["record_id"]: r
        for r in linkage.cluster_records(recs).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    chain = {out[i]["cluster_id"] for i in (0, 1, 2)}
    assert chain == {"alice brandt l"}  # min reachable name
    assert out[3]["cluster_id"] == "dmitri moreau"  # singleton = self


def test_cluster_records_normalizes_and_dedupes_vocab(spark):
    """Records with case/space variants of the SAME name cluster via
    the normalized vocabulary, and the output name is normalized."""
    recs = _records(
        spark, ["ALICE BRANDT", "  alice brandt ", "alice brandt x"]
    )
    out = {
        r["record_id"]: r
        for r in linkage.cluster_records(recs).collect()
    }
    assert {out[i]["name"] for i in (0, 1)} == {"alice brandt"}
    assert len({out[i]["cluster_id"] for i in (0, 1, 2)}) == 1


def test_cluster_records_blocks_gate_matching(spark):
    """Two names within edit distance but sharing NO block key (head
    prefix and last-token prefix both differ) stay apart — clustering
    is blocked-fuzzy, not all-pairs."""
    recs = _records(spark, ["ab xy", "cd zw"])  # dist > 0 but no key overlap
    out = {
        r["record_id"]: r
        for r in linkage.cluster_records(recs).collect()
    }
    assert out[0]["cluster_id"] != out[1]["cluster_id"]


def test_fuzzy_name_pairs_dedupes_multi_key_pairs(spark):
    """A pair matching via BOTH the p: and l: keys appears exactly
    once (the map-side dedup), ordered name_a < name_b."""
    vocab = spark.createDataFrame(
        [("alice brandt",), ("alice brandx",)], "name: string"
    )
    rows = linkage.fuzzy_name_pairs(vocab).collect()
    assert len(rows) == 1
    assert rows[0]["name_a"] == "alice brandt"
    assert rows[0]["name_b"] == "alice brandx"
    assert rows[0]["dist"] == 1


def test_cluster_records_matches_python_union_find(spark):
    """Independent replay: clusters from the Spark chain equal a
    driver-side union-find over an independently computed (pure
    Python DP levenshtein) blocked pair set, on a corpus mixing
    chains, separate entities, and token swaps."""
    names = [
        "alice brandt llc", "alice brandt ll", "dr alice brandt llc",
        "alice-brandt-llc", "brandt alice llc", "jonas jansen",
        "jonas jansenn", "jonas janse", "karim moreau", "karim moreau",
    ]
    recs = _records(spark, names)
    got = {
        r["record_id"]: r["cluster_id"]
        for r in linkage.cluster_records(recs).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def keys(n):
        return {"p:" + n[:2], "l:" + n.split(" ")[-1][:2]}

    vocab = sorted({n.lower().strip() for n in names})
    parent = {n: n for n in vocab}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            if keys(a) & keys(b) and lev(a, b) <= linkage.DEFAULT_THRESHOLD:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = sorted((ra, rb))
                    parent[hi] = lo
    want_label = {n: find(n) for n in vocab}
    for rid, name in enumerate(names):
        assert got[rid] == want_label[name.lower().strip()], (rid, name)


# ---- incremental (attach-or-create) ER (round 12, part 2) ----


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "name: string, cluster_id: string")


def test_incremental_assign_exact_name_keeps_existing_label(spark):
    recs = _records(spark, ["alice brandt", "ALICE BRANDT  "])
    existing = _labels(spark, [("alice brandt", "alice b")])
    out = linkage.incremental_cluster_assign(recs, existing).collect()
    assert len(out) == 2
    assert all(r["cluster_id"] == "alice b" for r in out)
    assert all(not r["is_new_cluster"] for r in out)


def test_incremental_assign_attaches_component_to_min_cluster(spark):
    """A fresh two-name component adjacent to TWO existing clusters
    attaches whole to the MINIMUM existing cluster_id (stable labels,
    no silent merge) — and the bridge audit reports n_adjacent=2."""
    recs = _records(spark, ["alice brandt x", "alice brandt xy"])
    existing = _labels(
        spark,
        [("alice brandt", "cl_a"), ("alice brandt xyz", "cl_b")],
    )
    out = {r["record_id"]: r for r in
           linkage.incremental_cluster_assign(recs, existing).collect()}
    assert out[0]["cluster_id"] == "cl_a" and out[1]["cluster_id"] == "cl_a"
    assert not out[0]["is_new_cluster"]
    audit = linkage.incremental_bridge_audit(recs, existing).collect()
    assert len(audit) == 1
    assert audit[0]["n_adjacent"] == 2
    assert audit[0]["attach_id"] == "cl_a"
    assert audit[0]["n_members"] == 2


def test_incremental_assign_creates_new_cluster_when_unattached(spark):
    recs = _records(spark, ["zz unseen name", "zz unseen nam"])
    existing = _labels(spark, [("alice brandt", "cl_a")])
    out = {r["record_id"]: r for r in
           linkage.incremental_cluster_assign(recs, existing).collect()}
    # both land in one NEW cluster labeled by the min member name
    assert out[0]["cluster_id"] == "zz unseen nam"
    assert out[1]["cluster_id"] == "zz unseen nam"
    assert out[0]["is_new_cluster"] and out[1]["is_new_cluster"]
    # no existing neighbor -> audit emits nothing
    assert linkage.incremental_bridge_audit(recs, existing).count() == 0


def test_incremental_assign_matches_full_recluster_when_consistent(spark):
    """When no batch component bridges two existing clusters, the
    incremental assignment agrees with a full re-cluster of the union
    (same member sets; labels may differ by representative) — the
    consistency property that makes attach-or-create a sound daily
    approximation."""
    day1 = _records(spark, ["alice brandt llc", "alice brandt ll",
                            "jonas jansen"])
    day2_names = ["alice brandt llcc", "jonas jansenn", "karim moreau"]
    day2 = _records(spark, day2_names)
    labels1 = (
        linkage.cluster_records(day1)
        .select("name", "cluster_id").distinct()
    )
    incr = linkage.incremental_cluster_assign(day2, labels1)
    full = linkage.cluster_records(
        _records(spark, ["alice brandt llc", "alice brandt ll",
                         "jonas jansen"] + day2_names)
    )
    # group day-2 names by cluster under each scheme; partitions match
    def groups(rows):
        g = {}
        for r in rows:
            g.setdefault(r["cluster_id"], set()).add(r["name"])
        return sorted(
            frozenset(v) for v in g.values()
            if v & {n.lower() for n in day2_names}
        )
    gi = groups(incr.collect())
    gf = groups(full.collect())
    # restrict full-recluster groups to day-2 names before comparing
    # (compare as SETS of frozensets — frozenset ordering is the
    # subset partial order, useless for list equality)
    d2 = {n.lower() for n in day2_names}
    gf = {frozenset(s & d2) for s in gf if s & d2}
    gi = {frozenset(s & d2) for s in gi if s & d2}
    assert gi == gf


# ---- sorted-neighborhood pairing (round 12, part 3) ----


def _vocab(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name: string")


def test_snm_pairs_window_semantics(spark):
    """Adjacent-in-sort names pair; names window-or-more apart never
    do, however similar; rank_gap is the sorted distance."""
    names = ["aaaa", "aaab", "aaac", "aaad", "aaae", "aaaf"]
    rows = linkage.sorted_neighborhood_pairs(
        _vocab(spark, names), window=3
    ).collect()
    got = {(r["name_a"], r["name_b"]): r["rank_gap"] for r in rows}
    # every within-2 pair is dist 1 <= threshold -> all present
    for i, a in enumerate(names):
        for j in range(i + 1, min(i + 3, len(names))):
            assert got[(a, names[j])] == j - i
    # gap-3 pairs excluded by the window even though dist == 1
    assert ("aaaa", "aaad") not in got
    assert len(rows) == 5 + 4


def test_snm_pairs_threshold_filters(spark):
    rows = linkage.sorted_neighborhood_pairs(
        _vocab(spark, ["aaaa", "aaab", "zzzz"]), window=3, threshold=1
    ).collect()
    got = {(r["name_a"], r["name_b"]) for r in rows}
    assert got == {("aaaa", "aaab")}  # zzzz within window but dist > 1


def test_snm_pairs_matches_python_replay(spark):
    """Independent replay on a shuffled vocabulary: sort, pair within
    the window, DP levenshtein filter."""
    names = [
        "alice brandt", "alice brand", "alice brandy", "bruno castillo",
        "bruno castill", "carmen durand", "carmen durant", "dmitri",
    ]
    import random

    shuffled = names[:]
    random.Random(7).shuffle(shuffled)
    rows = linkage.sorted_neighborhood_pairs(
        _vocab(spark, shuffled), window=4, threshold=3
    ).collect()
    got = {(r["name_a"], r["name_b"], r["dist"], r["rank_gap"]) for r in rows}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    s = sorted(names)
    want = {
        (s[i], s[j], lev(s[i], s[j]), j - i)
        for i in range(len(s))
        for j in range(i + 1, min(i + 4, len(s)))
        if lev(s[i], s[j]) <= 3
    }
    assert got == want


def test_snm_rejects_degenerate_window(spark):
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(_vocab(spark, ["a"]), window=1)


# ---- multi-day incremental chain (round 13, verdict ask #7) ----


def _chain_3days(spark, day_names):
    """Run the day0-batch -> day1-incremental -> day2-incremental
    chain; returns (per-day record outputs, per-day label maps)."""
    d0, d1, d2 = (_records(spark, n) for n in day_names)
    lab0 = (
        linkage.cluster_records(d0).select("name", "cluster_id").distinct()
    )
    out1 = linkage.incremental_cluster_assign(d1, lab0)
    lab1 = (
        lab0.unionByName(out1.select("name", "cluster_id")).distinct()
    )
    out2 = linkage.incremental_cluster_assign(d2, lab1)
    lab2 = (
        lab1.unionByName(out2.select("name", "cluster_id")).distinct()
    )
    return (out1, out2), (lab0, lab1, lab2)


def test_3day_chain_never_rewrites_labels(spark):
    """Chained attach-or-create is append-only on the label map: every
    (name, cluster_id) present after day k is present verbatim after
    day k+1 — including when a later day's component ATTACHES to an
    earlier cluster (the attach reuses the frozen id) and when a later
    batch re-sends an already-labeled name."""
    days = [
        ["alice brandt llc", "jonas jansen"],
        # day1: fuzzy variant attaching to alice's cluster + new entity
        ["alice brandt llcc", "karim moreau", "jonas jansen"],
        # day2: attaches to day-1-created cluster + brand new
        ["karim moreauu", "elena durand"],
    ]
    _, (lab0, lab1, lab2) = _chain_3days(spark, days)
    m0 = {r["name"]: r["cluster_id"] for r in lab0.collect()}
    m1 = {r["name"]: r["cluster_id"] for r in lab1.collect()}
    m2 = {r["name"]: r["cluster_id"] for r in lab2.collect()}
    # distinct() must not have hidden a conflicting relabel
    assert lab1.count() == len(m1) and lab2.count() == len(m2)
    assert all(m1[n] == c for n, c in m0.items())
    assert all(m2[n] == c for n, c in m1.items())
    # and the day-1 attach really reused the frozen day-0 id
    assert m1["alice brandt llcc"] == m0["alice brandt llc"]
    assert m2["karim moreauu"] == m1["karim moreau"]


def test_3day_chain_matches_full_recluster_when_no_bridges(spark):
    """Extending the 2-day consistency pin: when no component of any
    day bridges two frozen clusters, the 3-day chained incremental
    partition equals the full re-cluster of all three days' records
    (same member sets; representatives may differ)."""
    days = [
        ["alice brandt llc", "alice brandt ll", "jonas jansen"],
        ["alice brandt llcc", "jonas jansenn", "karim moreau"],
        ["karim moreauu", "elena durand", "alice brandt lllcc"],
    ]
    _, (_, _, lab2) = _chain_3days(spark, days)
    full = linkage.cluster_records(
        _records(spark, [n for d in days for n in d])
    )

    def partition(rows):
        g = {}
        for r in rows:
            g.setdefault(r["cluster_id"], set()).add(r["name"])
        return {frozenset(v) for v in g.values()}

    assert partition(lab2.collect()) == partition(full.collect())


def test_3day_chain_bridge_surfaced_not_merged(spark):
    """A later-day component adjacent to TWO frozen clusters attaches
    to the smaller id and the audit reports it — across chained days,
    frozen labels never merge silently."""
    day0 = ["alice brandt llc", "alice brandt xyz qq"]
    lab0 = (
        linkage.cluster_records(_records(spark, day0))
        .select("name", "cluster_id")
        .distinct()
    )
    m0 = {r["name"]: r["cluster_id"] for r in lab0.collect()}
    assert len(set(m0.values())) == 2, m0  # two frozen clusters
    # the bridge name is within threshold of both frozen names
    bridge = ["alice brandt xyz"]
    out = linkage.incremental_cluster_assign(_records(spark, bridge), lab0)
    got = {r["name"]: r for r in out.collect()}
    assert got["alice brandt xyz"]["cluster_id"] == min(m0.values())
    audit = linkage.incremental_bridge_audit(_records(spark, bridge), lab0)
    rows = audit.collect()
    assert len(rows) == 1 and rows[0]["n_adjacent"] == 2


# ---- pair-join strategies (round 13: whale-block lesson) ----


def test_fuzzy_pair_strategies_agree(spark):
    """The three candidate-join strategies (broadcast default, plain
    shuffled, grid-salted shuffled) are plan variants of one
    semantics: identical (name_a, name_b, dist) sets on a vocabulary
    with a deliberate whale block (shared 'zz' prefix) plus normal
    names, including multi-key (p:+l:) duplicates and prefix-breaking
    variants."""
    names = [
        "zzalice brandt", "zzalice brandtt", "zzalice brand",
        "zzbob kowalski", "zzbob kowalsky", "zzcarol moreau",
        "alice brandt", "lice brandt", "dr alice brandt",
        "jonas jansen", "jonas jansenn", "karim haddad",
    ]
    vocab = _vocab(spark, names)

    def pairset(df):
        return {
            (r["name_a"], r["name_b"], r["dist"]) for r in df.collect()
        }

    base = pairset(linkage.fuzzy_name_pairs(vocab))
    shuffled = pairset(
        linkage.fuzzy_name_pairs(vocab, broadcast_names=False)
    )
    assert base == shuffled
    for s in (2, 3, 7):
        salted = pairset(
            linkage.fuzzy_name_pairs(
                vocab, broadcast_names=False, salt=s
            )
        )
        assert salted == base, f"salt={s}"
        grid_bcast = pairset(
            linkage.fuzzy_name_pairs(vocab, salt=s)
        )
        assert grid_bcast == base, f"broadcast salt={s}"
    assert base, "witness vocabulary produced no pairs"


def test_cross_pair_strategies_agree(spark):
    """cross_name_pairs' three strategies (broadcast default, plain
    shuffled, bucket-salted shuffled) emit the identical
    (name_l, name_r, dist) multiset — the two-sided analogue of the
    fuzzy_name_pairs grid equality, covering the round-13 advisor's
    threaded larger-than-broadcast escape."""
    left = _vocab(
        spark,
        ["zzalice brandt", "zzbob kowalski", "alice brandt", "lice brandt"],
    )
    right = _vocab(
        spark,
        ["zzalice brandtt", "zzbob kowalsky", "dr alice brandt",
         "karim haddad"],
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    base = rows(linkage.cross_name_pairs(left, right))
    assert base, "witness vocabularies produced no cross pairs"
    assert rows(
        linkage.cross_name_pairs(left, right, broadcast_names=False)
    ) == base
    for s in (2, 5):
        assert rows(
            linkage.cross_name_pairs(
                left, right, broadcast_names=False, salt=s
            )
        ) == base, f"salt={s}"


def test_threaded_strategies_through_cluster_and_incremental(spark):
    """The round-13 advisor's ask: broadcast_names/salt reach the
    pairwise stages FROM the high-level operators. cluster_records and
    incremental_cluster_assign produce identical assignments under the
    broadcast default and the shuffled+salted escape."""
    day1 = _records(
        spark,
        ["zzalice brandt", "zzalice brandtt", "zzbob kowalski",
         "alice brandt", "jonas jansen"],
    )
    day2 = _records(
        spark,
        ["zzalice brand", "zzbob kowalsky", "lice brandt",
         "karim haddad", "karim hadad"],
    )

    def amap(df):
        return {r["record_id"]: tuple(r)[1:] for r in df.collect()}

    base = amap(linkage.cluster_records(day1))
    assert base == amap(
        linkage.cluster_records(day1, broadcast_names=False, salt=3)
    )
    labels = (
        linkage.cluster_records(day1)
        .select("name", "cluster_id")
        .distinct()
    )
    inc_base = amap(linkage.incremental_cluster_assign(day2, labels))
    assert inc_base == amap(
        linkage.incremental_cluster_assign(
            day2, labels, broadcast_names=False, salt=3
        )
    )
    audit_base = sorted(
        tuple(r)
        for r in linkage.incremental_bridge_audit(day2, labels).collect()
    )
    assert audit_base == sorted(
        tuple(r)
        for r in linkage.incremental_bridge_audit(
            day2, labels, broadcast_names=False, salt=3
        ).collect()
    )


def test_fuzzy_pair_salted_property(spark):
    """Property sweep: on random vocabularies the salted grid emits
    every unordered in-block pair exactly once (set-equality with the
    unsalted join, no duplicates)."""
    import random

    rng = random.Random(13)
    pool = ["al", "be", "ca", "do", "el"]
    for trial in range(3):
        names = list(
            {
                "".join(
                    rng.choice(pool) for _ in range(rng.randint(1, 3))
                )
                + (" " + rng.choice(pool) if rng.random() < 0.7 else "")
                for _ in range(40)
            }
        )
        vocab = _vocab(spark, names)
        plain = linkage.fuzzy_name_pairs(vocab, broadcast_names=False)
        salted = linkage.fuzzy_name_pairs(
            vocab, broadcast_names=False, salt=4
        )
        prow = sorted(tuple(r) for r in plain.collect())
        srow = sorted(tuple(r) for r in salted.collect())
        assert prow == srow, f"trial {trial}"
