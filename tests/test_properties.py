"""Property-based tests (hypothesis) for the all-string staging
invariants — SURVEY.md §5 test-plan item 4.

The reference's staging layers are untyped all-text with '' standing in
for missing (betl/io/fileIO.py:26-51), and '' → NULL happens only at
the warehouse boundary (betl/io/dbIO.py:27-28). These invariants must
hold for *arbitrary* cell values, not just the fixtures, so they are
checked over generated data. Each example runs a single Spark job over
a whole generated column (examples are kept small and few — the point
is the value-domain coverage, not volume).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from betl_spark.io.writers import empty_to_null, null_to_empty
from betl_spark.schema.registry import all_string_schema

# cells: empty string, separators, whitespace, unicode, None
CELL = st.one_of(
    st.none(),
    st.text(
        alphabet=st.sampled_from(list("ab_ 0-£é中")),
        max_size=6,
    ),
)
# Fast default tier runs every property with fewer hypothesis examples
# (each example is a full Spark round-trip, so wall time is ~linear in
# the count); BETL_FULL_MATRIX=1 restores the pre-r15 matrix. The
# hypothesis example DB still replays previously-found failures first
# in both tiers.
PROP_SETTINGS = settings(
    max_examples=15 if os.environ.get("BETL_FULL_MATRIX") == "1" else 6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, values, cols=("c1",)):
    rows = [[v[i] if isinstance(v, (list, tuple)) else v for i in range(len(cols))] for v in values]
    return spark.createDataFrame(rows, schema=all_string_schema(list(cols)))


@PROP_SETTINGS
@given(values=st.lists(CELL, min_size=1, max_size=5))
def test_staging_to_warehouse_boundary_canonicalizes(spark, values):
    """null_to_empty (staging entry) then empty_to_null (warehouse
    write) sends both None and '' to NULL and leaves every other value
    untouched — the '' ↔ NULL duality of SURVEY.md §1.2."""
    df = _df(spark, [[v] for v in values])
    out = [r["c1"] for r in empty_to_null(null_to_empty(df)).collect()]
    expected = [None if (v is None or v == "") else v for v in values]
    assert sorted(out, key=str) == sorted(expected, key=str)


@PROP_SETTINGS
@given(values=st.lists(CELL, min_size=1, max_size=5))
def test_null_to_empty_idempotent_and_total(spark, values):
    """Staging canonicalization is idempotent and never yields NULL."""
    df = _df(spark, [[v] for v in values])
    once = null_to_empty(df)
    twice = null_to_empty(once)
    got_once = sorted((r["c1"] for r in once.collect()), key=str)
    got_twice = sorted((r["c1"] for r in twice.collect()), key=str)
    assert got_once == got_twice
    assert all(v is not None for v in got_once)


@PROP_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.text(alphabet=st.sampled_from(list("abc0-")), max_size=4),
            st.text(alphabet=st.sampled_from(list("xyz1 ")), max_size=4),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_nk_concat_stability(spark, rows):
    """collapseNaturalKeyCols is exactly '_'.join over the source
    columns in declared order, for arbitrary string cells (reference
    betl/dataflow/dfl_loadPrep.py:28-69)."""
    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    dfl = DataFlow(
        Conf(app_root=tempfile.mkdtemp(prefix="betl_prop_")), "prop nk", spark=spark
    )
    dfl.createDataset("d", _df(spark, rows, cols=("k1", "k2")))
    out = dfl.collapseNaturalKeyCols("d", {"nk": ["k1", "k2"]})
    got = sorted(r["nk"] for r in out.collect())
    assert got == sorted(f"{a}_{b}" for a, b in rows)
    assert out.columns == ["nk"]


@PROP_SETTINGS
@given(
    rows1=st.lists(st.tuples(CELL, CELL), min_size=1, max_size=4),
    rows2=st.lists(st.tuples(CELL, CELL), min_size=1, max_size=4),
)
def test_union_aligns_by_name_not_position(spark, rows1, rows2):
    """union matches columns by NAME (pandas concat semantics,
    betl/dataflow/dfl_merge.py:57-83): permuting the second input's
    column order never changes the result."""
    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    def run(second_cols, second_rows):
        dfl = DataFlow(
            Conf(app_root=tempfile.mkdtemp(prefix="betl_prop_")),
            "prop union",
            spark=spark,
        )
        dfl.createDataset("u1", _df(spark, rows1, cols=("a", "b")))
        dfl.createDataset("u2", _df(spark, second_rows, cols=second_cols))
        out = dfl.union(["u1", "u2"], "u")
        return sorted((tuple(r) for r in out.select("a", "b").collect()), key=str)

    straight = run(("a", "b"), rows2)
    permuted = run(("b", "a"), [(b, a) for a, b in rows2])
    assert straight == permuted


def test_union_mismatch_raises_for_any_extra_column(spark):
    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    dfl = DataFlow(
        Conf(app_root=tempfile.mkdtemp(prefix="betl_prop_")), "prop err", spark=spark
    )
    dfl.createDataset("u1", _df(spark, [["x"]], cols=("a",)))
    dfl.createDataset("u2", _df(spark, [["y", "z"]], cols=("a", "extra")))
    with pytest.raises(ValueError, match="union column mismatch"):
        dfl.union(["u1", "u2"], "u")


@PROP_SETTINGS
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30, unique=True),
    f1=st.sampled_from([0.1, 0.3, 0.6]),
)
def test_hash_sample_membership_is_pure_and_monotone(spark, keys, f1):
    """Sampling is a pure function of the key: partitioning never changes
    membership, and a smaller fraction's sample is a subset of a larger
    one (nested thresholds over the same hash)."""
    from betl_spark.operators import sampling

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    small = {r.k for r in sampling.hash_sample(df, "k", f1).collect()}
    small_rep = {r.k for r in sampling.hash_sample(df.repartition(5), "k", f1).collect()}
    big = {r.k for r in sampling.hash_sample(df, "k", min(1.0, f1 * 2)).collect()}
    assert small == small_rep
    assert small <= big


@PROP_SETTINGS
@given(
    counts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=25),
)
def test_pack_sequences_offset_rule_for_any_counts(spark, counts):
    from betl_spark.operators import corpus

    df = spark.createDataFrame(list(enumerate(counts)), "doc_id bigint, n_tokens int")
    out = sorted(map(tuple, corpus.pack_sequences(df, "doc_id", "n_tokens", 1000, 3).collect()))
    per_shard = {}
    for doc_id, n_tokens, shard, chunk in out:
        per_shard.setdefault(shard, []).append((doc_id, n_tokens, chunk))
    for items in per_shard.values():
        offset = 0
        for _, n_tokens, chunk in sorted(items):
            assert chunk == offset // 1000
            offset += n_tokens


@PROP_SETTINGS
@given(
    prev=st.lists(st.tuples(st.integers(0, 8), st.one_of(st.none(), st.integers(0, 3))),
                  max_size=8, unique_by=lambda t: t[0]),
    inc=st.lists(st.tuples(st.integers(0, 8), st.one_of(st.none(), st.integers(0, 3))),
                 max_size=8, unique_by=lambda t: t[0]),
)
def test_apply_delta_reproduces_incoming_exactly(spark, prev, inc):
    """classify → apply must reproduce the incoming snapshot bit-for-bit,
    including NULL attribute values (the coalesce bug this guards
    against kept previous values on value→NULL updates)."""
    from betl_spark.defaults.delta import apply_delta, classify_changes

    pdf = spark.createDataFrame(prev or [(99, 0)], "nk int, v int")
    idf = spark.createDataFrame(inc or [(98, 0)], "nk int, v int")
    changes = classify_changes(pdf, idf, ["nk"], ["v"])
    got = sorted(map(tuple, apply_delta(pdf, changes, ["nk"]).collect()))
    want = sorted(map(tuple, idf.collect()))
    assert got == want


def test_mixture_rates_properties():
    """mixture_rates invariants over random counts/weights: rates in
    (0,1]; the limiting stratum keeps 100%; kept volumes hit the target
    proportions exactly; zero-weight strata drop."""
    import random

    from betl_spark.operators.sampling import mixture_rates

    rng = random.Random(11)
    for _ in range(200):
        strata = [f"s{i}" for i in range(rng.randint(1, 6))]
        counts = {s: rng.randint(1, 10_000) for s in strata}
        weights = {s: rng.random() for s in strata}
        if rng.random() < 0.3:
            weights[strata[0]] = 0.0
        rates = mixture_rates(counts, weights)
        assert set(rates) == set(counts)
        for s, r in rates.items():
            if weights.get(s, 0) <= 0:
                assert r == 0.0
            else:
                assert 0.0 < r <= 1.0
        live = {s for s in strata if weights.get(s, 0) > 0}
        if live:
            assert any(abs(rates[s] - 1.0) < 1e-12 for s in live)
            kept = {s: rates[s] * counts[s] for s in live}
            total_kept = sum(kept.values())
            total_w = sum(weights[s] for s in live)
            for s in live:
                assert abs(kept[s] / total_kept - weights[s] / total_w) < 1e-9


def test_line_dedup_matches_python_reference(spark):
    """line_dedup vs a brute-force Python reference over randomized
    corpora: empty lines, all-duplicate docs, separator edge cases."""
    import random
    from collections import Counter

    from betl_spark.operators.dedup import line_dedup

    rng = random.Random(23)
    vocab = ["alpha", "beta", "", "gamma delta", "x"]
    for trial in range(5):
        docs = []
        for i in range(rng.randint(1, 12)):
            n = rng.randint(1, 6)
            docs.append((i, "\n".join(rng.choice(vocab) for _ in range(n))))
        min_docs = rng.randint(2, 3)

        # python reference
        doc_lines = {i: t.split("\n") for i, t in docs}
        df_count = Counter()
        for i, ls in doc_lines.items():
            for line in set(ls):
                df_count[line] += 1
        want = {}
        for i, ls in doc_lines.items():
            kept = [l for l in ls if df_count[l] < min_docs]
            want[i] = ("\n".join(kept), len(kept), len(ls) - len(kept))

        out = line_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            "doc_id", "text", min_docs=min_docs,
        )
        got = {
            r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
            for r in out.collect()
        }
        assert got == want, (trial, min_docs, docs, got, want)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_three_paths_agree(spark, edges):
    """duplicate_clusters has three execution paths — driver union-find
    (small graphs), distributed large/small-star contraction, and
    min-label propagation. On ANY pair graph (self-loops, duplicates,
    chains, whale stars — whatever hypothesis draws) all three must
    assign identical (node -> min reachable id) labels."""
    from betl_spark.operators import dedup

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    uf = sorted(map(tuple, dedup.duplicate_clusters(pairs).collect()))
    star = sorted(
        map(
            tuple,
            dedup.duplicate_clusters(pairs, small_graph_edges=0).collect(),
        )
    )
    ml = sorted(
        map(tuple, dedup.duplicate_clusters(pairs, algorithm="min_label").collect())
    )
    assert uf == star == ml


# ---- round-8: substring-span family vs pure-Python references ----

_SPAN = st.tuples(
    st.integers(min_value=0, max_value=30), st.integers(min_value=1, max_value=15)
).map(lambda t: (t[0], t[0] + t[1]))


@PROP_SETTINGS
@given(
    text=st.text(alphabet="ab ", min_size=0, max_size=40),
    spans=st.lists(_SPAN, min_size=0, max_size=5),
)
def test_trim_spans_matches_python_complement(spark, text, spans):
    """trim_spans' higher-order splice must equal the obvious
    per-character complement for ARBITRARY (overlapping, out-of-range,
    unsorted) span sets."""
    from betl_spark.operators.dedup import trim_spans

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sdf = spark.createDataFrame(
        [(1, s, e) for s, e in spans],
        "doc_id long, span_start long, span_end long",
    )
    row = trim_spans(docs, sdf, "doc_id", "text").collect()[0]
    cut = set()
    for s, e in spans:
        cut.update(range(s, e))
    want = "".join(ch for i, ch in enumerate(text) if i not in cut)
    assert row["text_clean"] == want
    assert row["n_trimmed_chars"] == len(text) - len(want)


@PROP_SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="abcd", min_size=0, max_size=60),
        min_size=2,
        max_size=5,
    )
)
def test_repeated_substring_spans_matches_python_reference(spark, texts):
    """The distributed fingerprint/census/merge pipeline must equal a
    direct Python implementation of the same definition (mod-p md5
    k-gram selection, >=2-doc census, gap-merge) on arbitrary texts."""
    import hashlib
    from collections import defaultdict

    from betl_spark.operators.dedup import repeated_substring_spans

    K, P, GAP = 5, 2, 8
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_fingerprints"])
        for r in repeated_substring_spans(
            df, "doc_id", "text", k=K, p=P, min_docs=2, merge_gap=GAP
        ).collect()
    )

    fps = defaultdict(list)  # h -> [(doc, off)]
    for d, t in docs:
        for off in range(0, max(0, len(t) - K + 1)):
            h = hashlib.md5(t[off : off + K].encode()).hexdigest()
            if int(h[:8], 16) % P == 0:
                fps[h].append((d, off))
    rep = {h for h, v in fps.items() if len({d for d, _ in v}) >= 2}
    hits = defaultdict(list)
    for h in rep:
        for d, off in fps[h]:
            hits[d].append(off)
    want = []
    for d, offs in hits.items():
        offs.sort()
        start, prev, n = offs[0], offs[0], 1
        for o in offs[1:]:
            if o - prev > GAP:
                want.append((d, start, prev + K, n))
                start, n = o, 0
            prev = o
            n += 1
        want.append((d, start, prev + K, n))
    assert got == sorted(want)


# ---- round-8: classifier_train vs a pure-Python integer reference ----


def _clf_reference(rows, buckets, iterations, lr):
    """Direct Python replay of classifier_train's exact-integer
    pipeline (md5-hashed tokens, floor(x+.5) quantization, integer
    nano state) — the third independent implementation after the
    engine and the DuckDB oracle."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    feats = []  # (doc, y, [(bucket, x9)])
    for doc_id, y, text in rows:
        entries = [(-1, 10**9)]
        if text is not None:
            toks = text.split(" ")
            cnt = Counter(
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % buckets
                for t in toks
            )
            n = sum(cnt.values())
            entries = [
                (b, math.floor(c * 1e9 / n + 0.5)) for b, c in cnt.items()
            ] + entries
        feats.append((doc_id, y, entries))
    n_docs = len(feats)
    den = 1.0e9 * n_docs
    wn: dict[int, int] = {}
    for _ in range(iterations):
        grads: dict[int, int] = defaultdict(int)
        for _, y, entries in feats:
            S = sum(x9 * wn.get(b, 0) for b, x9 in entries)
            logit = math.floor(float(S) / 1e9 + 0.5) / 1e9
            p_nano = math.floor(1.0 / (1.0 + math.exp(-logit)) * 1e9 + 0.5)
            e9 = p_nano - y * 10**9
            for b, x9 in entries:
                grads[b] += e9 * x9
        for b, g in grads.items():
            wn[b] = wn.get(b, 0) - math.floor(lr * float(g) / den + 0.5)
    return {b: float(v) / 1e9 for b, v in wn.items()}


@PROP_SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=30),
        min_size=2,
        max_size=6,
    ),
    labels=st.lists(st.booleans(), min_size=6, max_size=6),
)
def test_classifier_train_matches_python_reference(spark, texts, labels):
    from pyspark.sql import functions as F

    from betl_spark.operators.quality import classifier_train

    rows = [
        (i, int(labels[i]), t) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    got = {
        r["bucket"]: r["w"]
        for r in classifier_train(
            df, "doc_id", "text", F.col("y") == 1,
            buckets=32, iterations=2, lr=0.5,
        ).collect()
    }
    want = _clf_reference(rows, 32, 2, 0.5)
    assert got == want


# ---------------------------------------------------------------------
# Round-9 time-series / stats invariants over generated event streams
# ---------------------------------------------------------------------

EVENT_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                      # key
        st.integers(min_value=0, max_value=10**9),        # ts micros
        st.integers(min_value=0, max_value=50_000),       # value cents
    ),
    min_size=1,
    max_size=25,
)


@PROP_SETTINGS
@given(rows=EVENT_ROWS)
def test_resample_gapfill_matches_python_reference(spark, rows):
    """Dense spine, zero-fill, forward-fill — checked against a direct
    Python replay for arbitrary (key, ts, value) streams."""
    from betl_spark.operators.timeseries import resample_gapfill

    B = 100_000_000  # small bucket so streams span several
    df = spark.createDataFrame(
        [(k, t, c / 100.0) for k, t, c in rows], "k string, t long, v double"
    )
    got = {
        (r["k"], r["bucket"]): (r["n_events"], r["sum_value"], r["ffill_avg"])
        for r in resample_gapfill(df, "k", "t", "v", B).collect()
    }

    import collections
    from decimal import Decimal

    per = collections.defaultdict(list)
    for k, t, c in rows:
        per[(k, t // B)].append(Decimal(c) / 100)
    b0 = min(t // B for _, t, _ in rows)
    b1 = max(t // B for _, t, _ in rows)
    keys = {k for k, _, _ in rows}
    want = {}
    for k in keys:
        ff = None
        for b in range(b0, b1 + 1):
            vals = per.get((k, b), [])
            if vals:
                ff = round(float(sum(vals)) / len(vals), 6)
            want[(k, b)] = (
                len(vals),
                round(float(sum(vals)), 6) if vals else 0.0,
                ff,
            )
    assert got == want


@PROP_SETTINGS
@given(rows=EVENT_ROWS)
def test_time_weighted_avg_matches_python_reference(spark, rows):
    from betl_spark.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [(k, t, c / 100.0) for k, t, c in rows], "k string, t long, v double"
    )
    got = {
        r["k"]: (r["n_intervals"], r["total_seconds"], r["twap"])
        for r in time_weighted_avg(df, "k", "t", "v").collect()
    }

    import collections
    from decimal import Decimal

    per = collections.defaultdict(list)
    for k, t, c in rows:
        per[k].append((t, Decimal(c) / 100))
    want = {}
    for k, evs in per.items():
        evs.sort()  # (t, v) — the operator's documented tie order
        terms = [
            ((b_t - a_t) // 1_000_000, a_v)
            for (a_t, a_v), (b_t, _) in zip(evs, evs[1:])
        ]
        if not terms:
            continue
        tot = sum(d for d, _ in terms)
        w = sum(v * d for d, v in terms)
        want[k] = (
            len(terms),
            tot,
            round(float(w) / tot, 6) if tot else None,
        )
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2], k
        if want[k][2] is not None:
            assert got[k][2] == pytest.approx(want[k][2], abs=2e-6), k


@PROP_SETTINGS
@given(rows=EVENT_ROWS)
def test_rolling_distinct_count_matches_python_reference(spark, rows):
    from betl_spark.operators.timeseries import rolling_distinct_count

    B, W = 100_000_000, 3
    df = spark.createDataFrame(
        [(k, t) for k, t, _ in rows], "k string, t long"
    )
    got = {
        r["bucket"]: (r["active_entities"], r["n_events"])
        for r in rolling_distinct_count(df, "t", "k", W, B).collect()
    }
    import collections

    ents = collections.defaultdict(set)
    cnts = collections.defaultdict(int)
    for k, t, _ in rows:
        for i in range(W):
            ents[t // B + i].add(k)
            cnts[t // B + i] += 1
    assert got == {b: (len(ents[b]), cnts[b]) for b in ents}


@PROP_SETTINGS
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=3, max_size=30
    )
)
def test_winsorized_stats_matches_python_reference(spark, vals):
    """Clip bounds from R-7 percentiles, clipped mean, tail counts —
    against numpy's identical linear interpolation."""
    import numpy as np

    from betl_spark.operators.stats import winsorized_stats

    df = spark.createDataFrame(
        [("g", c / 100.0) for c in vals], "g string, v double"
    )
    r = winsorized_stats(df, ["g"], "v", p_lo=0.1, p_hi=0.9).collect()[0]
    arr = np.array([c / 100.0 for c in vals])
    lo = round(float(np.percentile(arr, 10)), 6)
    hi = round(float(np.percentile(arr, 90)), 6)
    assert (r["lo"], r["hi"]) == (lo, hi)
    assert r["n"] == len(vals)
    assert r["n_clipped_lo"] == int((arr < lo).sum())
    assert r["n_clipped_hi"] == int((arr > hi).sum())
    assert r["mean_raw"] == pytest.approx(arr.mean(), abs=2e-6)
    assert r["mean_winsor"] == pytest.approx(
        np.clip(arr, lo, hi).mean(), abs=2e-6
    )


@PROP_SETTINGS
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=25,
    )
)
def test_grouped_pearson_matches_numpy(spark, pts):
    import numpy as np

    from betl_spark.operators.stats import grouped_pearson

    df = spark.createDataFrame(
        [("g", x / 100.0, y) for x, y in pts], "g string, x double, y long"
    )
    r = grouped_pearson(df, ["g"], "x", "y", x_scale=2, y_scale=0).collect()[0]
    xs = np.array([x / 100.0 for x, _ in pts])
    ys = np.array([float(y) for _, y in pts])
    # degeneracy must be decided on the EXACT quantized values (the
    # operator's min==max gate), not np.std()==0: binary roundoff makes
    # np.std of a constant non-representable column (e.g. 0.05·n) come
    # out ~1e-17, and corrcoef of that is cancellation noise
    if len({x for x, _ in pts}) == 1 or len({y for _, y in pts}) == 1:
        assert r["r"] is None
    else:
        assert r["r"] == pytest.approx(
            float(np.corrcoef(xs, ys)[0, 1]), abs=2e-6
        )


@PROP_SETTINGS
@given(
    arms=st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=40
    )
)
def test_ab_test_matches_statsmodels_formula(spark, arms):
    import math

    from betl_spark.operators.stats import ab_test_proportions

    df = spark.createDataFrame(
        [("g", a, s) for a, s in arms], "g string, isa boolean, s boolean"
    )
    r = ab_test_proportions(df, ["g"], F.col("isa"), F.col("s")).collect()[0]
    na = sum(1 for a, _ in arms if a)
    nb = len(arms) - na
    sa = sum(1 for a, s in arms if a and s)
    sb = sum(1 for a, s in arms if not a and s)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    pooled = (sa + sb) / len(arms)
    if na == 0 or nb == 0 or pooled in (0.0, 1.0):
        assert r["z"] is None
    else:
        se = math.sqrt(pooled * (1 - pooled) * (1 / na + 1 / nb))
        assert r["z"] == pytest.approx(
            (sa / na - sb / nb) / se, abs=2e-6
        )


@PROP_SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab XYé")), max_size=30),
        min_size=1,
        max_size=8,
    )
)
def test_char_diversity_matches_python_counter(spark, texts):
    import collections

    from betl_spark.operators.text import char_diversity

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in char_diversity(df, "doc_id", "text").collect()
    }

    def r6(x: float) -> float:
        # Spark/DuckDB ROUND is half-away-from-zero; python round() is
        # banker's, and ratios of small ints DO land on exact binary
        # midpoints (226/256 = 0.8828125 — found by this very sweep)
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    for i, t in enumerate(texts):
        c = collections.Counter(t.lower())
        if not c:
            assert i not in got  # no chars -> no row
            continue
        n = sum(c.values())
        r = got[i]
        assert r["n_chars_counted"] == n
        assert r["distinct_chars"] == len(c)
        assert r["top_char_ratio"] == r6(max(c.values()) / n)
        assert r["simpson_concentration"] == r6(
            sum(v * v for v in c.values()) / (float(n) * n)
        )


TOKEN_TEXTS = st.lists(
    st.lists(
        st.sampled_from(["spark", "merge", "window", "row", "agg", "key"]),
        min_size=0,
        max_size=12,
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@PROP_SETTINGS
@given(texts=TOKEN_TEXTS)
def test_bm25_matches_python_reference(spark, texts):
    """BM25 scores against a direct python replay of the Robertson
    formulation, same 9dp-nanos discipline."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from betl_spark.operators.corpus import bm25_topk

    terms = ["spark", "merge"]
    k1, b = 1.2, 0.75
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_topk(df, "doc_id", "text", terms, k1=k1, b=b, top_n=100).collect()
    }

    def r9(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    toks = [t.split(" ") if t else [""] for t in texts]
    n_docs = len(texts)
    avglen = sum(len(tk) for tk in toks) / n_docs
    dfreq = {
        t: sum(1 for tk in toks if t in tk) for t in terms
    }
    want = {}
    for i, tk in enumerate(toks):
        nanos, matched = 0, 0
        for t in terms:
            tf = tk.count(t)
            if not tf:
                continue
            matched += 1
            idf = r9(math.log(1.0 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)))
            w = (idf * (tf * (k1 + 1.0))) / (tf + k1 * (1 - b + b * len(tk) / avglen))
            nanos += int(round(r9(w) * 1e9))
        if matched:
            # the engine's final 6dp render is INTEGRAL half-away
            # micros (util.round6_nanos_ratio_expr, the bug-#5 fix) —
            # replay it exactly: round(nanos/1e9, 6) double-rounds at
            # true ...500-nano midpoints (hypothesis found 276174500).
            mag = (abs(nanos) + 500) // 1000
            want[i] = (matched, (-mag if nanos < 0 else mag) / 1e6)
    assert got == want


@PROP_SETTINGS
@given(texts=TOKEN_TEXTS)
def test_source_overlap_matches_python_sets(spark, texts):
    from betl_spark.operators.corpus import source_overlap_matrix

    N = 3
    rows = [(f"s{i % 2}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["group_a"], r["group_b"]): (r["inter"], r["n_a"], r["n_b"], r["jaccard"])
        for r in source_overlap_matrix(df, "source", "text", ngram=N).collect()
    }
    grams = {"s0": set(), "s1": set()}
    for src, t in rows:
        tk = t.split(" ") if t else [""]
        for i in range(len(tk) - N + 1):
            grams[src].add(" ".join(tk[i : i + N]))
    a, b = grams["s0"], grams["s1"]
    inter = len(a & b)
    if inter:
        assert got == {
            ("s0", "s1"): (
                inter,
                len(a),
                len(b),
                round(inter / (len(a) + len(b) - inter), 6),
            )
        }
    else:
        assert got == {}


@PROP_SETTINGS
@given(texts=TOKEN_TEXTS)
def test_pmi_matches_python_reference(spark, texts):
    import collections
    import math

    from betl_spark.operators.corpus import pmi_topk

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["w1"], r["w2"]): (r["c_bigram"], r["c_w1"], r["c_w2"], r["pmi"])
        for r in pmi_topk(df, "text", min_count=2, top_n=1000).collect()
    }
    uni = collections.Counter()
    bi = collections.Counter()
    for t in texts:
        tk = t.split(" ") if t else [""]
        uni.update(tk)
        bi.update(zip(tk, tk[1:]))
    nu = sum(uni.values())
    nb = sum(c for c in bi.values())
    want = {}
    for (w1, w2), c in bi.items():
        if c < 2:
            continue
        want[(w1, w2)] = (
            c,
            uni[w1],
            uni[w2],
            round(math.log((c * float(nu) * nu) / (float(nb) * uni[w1] * uni[w2])), 6),
        )
    assert got == want


NAME_TOKENS = ["alpha", "ALPHA", "alp", "beta", "bets", "gamma", "ga", "x"]
DIRTY_NAMES = st.one_of(
    st.none(),
    st.just(""),
    st.lists(st.sampled_from(NAME_TOKENS), min_size=1, max_size=3).map(
        " ".join
    ),
)


@PROP_SETTINGS
@given(
    records=st.lists(DIRTY_NAMES, min_size=1, max_size=10),
    masters=st.lists(
        st.lists(
            st.sampled_from(NAME_TOKENS), min_size=1, max_size=2
        ).map(" ".join),
        min_size=1,
        max_size=6,
        unique=True,
    ),
)
def test_link_records_matches_python_reference(spark, records, masters):
    """Blocked catalog linkage against an independent python replay:
    normalization, tagged multi-pass blocking, candidate count under
    the map-side pair dedup, pure-python DP levenshtein, and the
    (dist, master_id) argmin tie-break."""
    from betl_spark.operators.linkage import (
        DEFAULT_PREFIX_LEN,
        DEFAULT_THRESHOLD,
        link_records,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    P = DEFAULT_PREFIX_LEN

    def keys(n: str) -> set[str]:
        return {"p:" + n[:P], "l:" + n.split(" ")[-1][:P]}

    mnorm = [(i, m.strip(" ").lower()) for i, m in enumerate(masters)]
    want = {}
    for rid, raw in enumerate(records):
        if raw is None:
            continue
        n = raw.strip(" ").lower()
        kr = keys(n)
        cands = []
        for mid, mn in mnorm:
            km = keys(mn)
            # map-side dedup rule: the p: pair exists iff head
            # prefixes agree; an l: pair only counts when they differ
            if ("p:" + n[:P]) in km or (
                ("l:" + n.split(" ")[-1][:P]) in km and n[:P] != mn[:P]
            ):
                cands.append((lev(n, mn), mid, mn))
        if not cands:
            continue
        d, mid, mn = min(cands)
        want[rid] = (len(cands), d, mid, mn, d <= DEFAULT_THRESHOLD)

    rdf = spark.createDataFrame(
        list(enumerate(records)), "record_id: long, name: string"
    )
    mdf = spark.createDataFrame(
        list(enumerate(masters)), "master_id: long, name: string"
    )
    got = {
        r["record_id"]: (
            r["n_candidates"],
            r["best_dist"],
            r["best_master_id"],
            r["best_master_name"],
            bool(r["matched"]),
        )
        for r in link_records(rdf, mdf).collect()
    }
    assert got == want


# ---- round-12: master-less ER clustering vs independent union-find ----

# short names over a tiny alphabet with spaces: maximizes fuzzy-pair
# and block-key collisions in few examples (the interesting regime)
_NAME = st.one_of(
    st.none(),
    st.text(alphabet=st.sampled_from(list("ab c")), min_size=0, max_size=8),
)


def _py_lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def _py_keys(n):
    return {"p:" + n[:2], "l:" + (n.split(" ")[-1] if " " in n else n)[:2]}


def _py_cluster(names, threshold=3):
    """Independent replay: normalize -> blocked fuzzy pairs ->
    union-find min-label, pure Python."""
    vocab = sorted({n.lower().strip() for n in names if n is not None})
    parent = {n: n for n in vocab}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            if _py_keys(a) & _py_keys(b) and _py_lev(a, b) <= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = sorted((ra, rb))
                    parent[hi] = lo
    return {n: find(n) for n in vocab}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(names=st.lists(_NAME, min_size=1, max_size=12))
def test_cluster_records_equals_union_find_on_arbitrary_names(spark, names):
    """cluster_records' full distributed chain (distinct vocabulary ->
    tagged-key blocked pairs -> CC -> label join-back) agrees with an
    independent pure-Python union-find over DP-levenshtein pairs for
    ARBITRARY name lists — including empties, all-space strings, and
    single-char names that stress the p:/l: key edge cases."""
    from betl_spark.operators import linkage

    recs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)],
        "record_id: long, name: string",
    )
    got = {
        r["record_id"]: r["cluster_id"]
        for r in linkage.cluster_records(recs).collect()
    }
    want = _py_cluster(names)
    norm = {
        i: names[i].lower().strip()
        for i in range(len(names))
        if names[i] is not None
    }
    assert set(got) == set(norm)
    for rid, n in norm.items():
        assert got[rid] == want[n], (rid, n, got[rid], want[n])
