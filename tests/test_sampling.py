"""Deterministic sampling / split operators (operators/sampling.py).

The oracle-parity suite already value-checks q_sample_stratified and
q_sample_split against DuckDB; these tests pin the PROPERTIES the oracle
can't see: determinism across runs, rate accuracy, stratified-subset
consistency, split stability under re-splitting, and the no-shuffle plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_movie_database_import_spark.operators.sampling import (
    hash_sample,
    hex_threshold,
    split_column,
    stratified_sample,
)
from the_movie_database_import_spark.sources.readers import load_table

from conftest import SF_DIR


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    # 'g' sorts above every hex char: rate 1.0 must be keep-ALL, not
    # keep-all-but-bucket-ffffffff
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(0.2) == format(int(0.2 * 16**8), "08x")
    with pytest.raises(ValueError):
        hex_threshold(-0.1)
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_hash_sample_deterministic_and_rate(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = sorted(r.doc_id for r in hash_sample(docs, F.col("doc_id"), 0.3).collect())
    b = sorted(r.doc_id for r in hash_sample(docs, F.col("doc_id"), 0.3).collect())
    assert a == b, "same key + rate must select the identical row set"
    n = docs.count()
    # binomial(n, 0.3) stays within ±5 sigma of the mean
    sigma = (n * 0.3 * 0.7) ** 0.5
    assert abs(len(a) - 0.3 * n) <= 5 * sigma, (len(a), n)


def test_hash_sample_is_nested_across_rates(spark):
    """Raising the rate only ADDS rows (threshold grows, bucket per row is
    fixed) — incremental corpus growth never flips earlier members out."""
    docs = load_table(spark, SF_DIR, "documents")
    small = {r.doc_id for r in hash_sample(docs, F.col("doc_id"), 0.1).collect()}
    large = {r.doc_id for r in hash_sample(docs, F.col("doc_id"), 0.4).collect()}
    assert small <= large


def test_stratified_equals_per_stratum_hash_sample(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rates = {"en": 0.2, "de": 0.9}
    got = {
        r.doc_id
        for r in stratified_sample(
            docs, F.col("doc_id"), F.col("lang"), rates
        ).collect()
    }
    want: set[int] = set()
    for lang, rate in rates.items():
        sub = docs.filter(F.col("lang") == lang)
        want |= {r.doc_id for r in hash_sample(sub, F.col("doc_id"), rate).collect()}
    assert got == want  # strata outside `rates` default to rate 0


def test_split_disjoint_exhaustive_and_stable(spark):
    docs = load_table(spark, SF_DIR, "documents")
    labeled = docs.select(
        "doc_id",
        split_column(F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}).alias(
            "split"
        ),
    ).collect()
    by_split: dict[str, set[int]] = {}
    for r in labeled:
        by_split.setdefault(r.split, set()).add(r.doc_id)
    assert None not in by_split, "fractions sum to 1 — every row gets a label"
    assert set(by_split) == {"train", "val", "test"}
    assert sum(len(v) for v in by_split.values()) == len(labeled)

    # Re-splitting with a WIDER train keeps every existing train row (the
    # no-leakage property: val/test rows move into train, never the reverse)
    wider = docs.select(
        "doc_id",
        split_column(F.col("doc_id"), {"train": 0.9, "val": 0.05, "test": 0.05}).alias(
            "split"
        ),
    ).collect()
    wider_train = {r.doc_id for r in wider if r.split == "train"}
    assert by_split["train"] <= wider_train


def test_split_rejects_bad_fractions(spark):
    with pytest.raises(ValueError):
        split_column(F.col("doc_id"), {"a": 0.8, "b": 0.4})
    with pytest.raises(ValueError):
        split_column(F.col("doc_id"), {"a": -0.1, "b": 0.5})


def test_stratified_sample_plan_has_no_exchange(spark):
    """The 100 TB contract: membership is a codegen'd filter fused into the
    scan — no shuffle, no join, no Python."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = stratified_sample(
        docs, F.col("doc_id"), F.col("lang"), {"en": 0.5, "de": 0.25}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_sample_fixed_k_sizes_and_determinism(spark):
    from the_movie_database_import_spark.operators.sampling import sample_fixed_k

    docs = load_table(spark, SF_DIR, "documents")
    got = sample_fixed_k(docs, F.col("doc_id"), F.col("lang"), 10).collect()
    sizes: dict[str, int] = {}
    for r in got:
        sizes[r.lang] = sizes.get(r.lang, 0) + 1
    stratum_totals = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {
        lang: min(10, n) for lang, n in stratum_totals.items()
    }, "exactly min(k, stratum size) per stratum"
    again = sample_fixed_k(docs, F.col("doc_id"), F.col("lang"), 10).collect()
    assert sorted((r.lang, r.doc_id, r._rk) for r in got) == sorted(
        (r.lang, r.doc_id, r._rk) for r in again
    )
    # rank prefix is itself the k=5 sample: sub-slicing is consistent
    five = {
        (r.lang, r.doc_id)
        for r in sample_fixed_k(docs, F.col("doc_id"), F.col("lang"), 5).collect()
    }
    assert five == {(r.lang, r.doc_id) for r in got if r._rk <= 5}

    with pytest.raises(ValueError):
        sample_fixed_k(docs, F.col("doc_id"), F.col("lang"), 0)


def test_rate_one_keeps_every_row(spark):
    """rate=1.0 / fractions-summing-to-1 must be keep-all / exhaustive even
    for a row hashing to bucket 'ffffffff' (threshold is 'g', above all
    hex), so the documented contracts hold exactly, not probabilistically."""
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    assert hash_sample(docs, F.col("doc_id"), 1.0).count() == n
    labeled = docs.select(
        split_column(F.col("doc_id"), {"all": 1.0}).alias("split")
    )
    assert labeled.filter("split IS NULL").count() == 0


def test_split_thresholds_snap_float_accumulation(spark):
    """{0.7, 0.2, 0.1} accumulates to 0.9999999999999999 in floats; the last
    threshold must still snap to the keep-all 'g' so sum-to-1 splits stay
    exhaustive (ADVICE r04: without the snap a row with bucket exactly
    'ffffffff' falls through to NULL, in both the Spark and SQL twins)."""
    from the_movie_database_import_spark.operators.sampling import (
        _split_thresholds,
        split_case_sql,
    )

    thresholds = _split_thresholds({"train": 0.7, "val": 0.2, "test": 0.1})
    assert thresholds[-1] == ("test", "g"), thresholds
    assert "'g'" in split_case_sql("doc_id", {"train": 0.7, "val": 0.2, "test": 0.1})
    docs = load_table(spark, SF_DIR, "documents")
    labeled = docs.select(
        split_column(
            F.col("doc_id"), {"train": 0.7, "val": 0.2, "test": 0.1}
        ).alias("split")
    )
    assert labeled.filter("split IS NULL").count() == 0


def test_sample_fixed_k_rejects_reserved_column(spark):
    from the_movie_database_import_spark.operators.sampling import sample_fixed_k

    docs = load_table(spark, SF_DIR, "documents").withColumn("_rk", F.lit(1))
    with pytest.raises(ValueError, match="_rk"):
        sample_fixed_k(docs, F.col("doc_id"), F.col("lang"), 3)


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """Splitting on the cluster representative must put every member of a
    near-dup cluster in the SAME split — the hygiene property doc_id-keyed
    splitting lacks (a near-dup pair straddling train/test is test leakage).
    Verified per-document against the pair graph."""
    from the_movie_database_import_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_exact,
    )

    docs = load_table(spark, SF_DIR, "documents")
    edges = jaccard_pairs_exact(docs, threshold=0.8)
    clusters = connected_components(docs.select("doc_id"), edges, node_col="doc_id")
    labeled = clusters.select(
        "doc_id",
        "cluster_rep",
        split_column(F.col("cluster_rep"), {"train": 0.8, "val": 0.1, "test": 0.1}).alias(
            "split"
        ),
    )
    rows = labeled.collect()
    split_of = {r.doc_id: r.split for r in rows}
    assert all(r.split is not None for r in rows), "sum-to-1 split must label all"
    for e in edges.collect():
        assert split_of[e.doc_a] == split_of[e.doc_b], (
            f"near-dup pair ({e.doc_a}, {e.doc_b}) straddles splits"
        )
    # and the naive doc_id-keyed split DOES straddle on this corpus — the
    # operator exists because the hazard is real, not hypothetical
    naive = {
        r.doc_id: r.split
        for r in clusters.select(
            "doc_id",
            split_column(F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}).alias(
                "split"
            ),
        ).collect()
    }
    assert any(naive[e.doc_a] != naive[e.doc_b] for e in edges.collect())


def test_select_token_budget_hand_cases(spark):
    """Greedy token-budget selection: full-keep buckets, the boundary
    bucket's per-doc cutoff with id-order tie-breaking, the excluded
    tail, and the budget edges — all against hand-computed expectations
    with a custom integer score (grid=1, so buckets == score values)."""
    from the_movie_database_import_spark.operators.mixing import (
        select_token_budget,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", 3.0),    # 3 tokens, score 3
            (2, "d e", 3.0),      # 2 tokens, score 3  -> bucket 3: 5 toks
            (3, "f g", 2.0),      # 2 tokens, score 2
            (5, "h i j", 2.0),    # 3 tokens, score 2  -> bucket 2: 5 toks
            (4, "j", 1.0),        # 1 token,  score 1  -> bucket 1: 1 tok
        ],
        "doc_id long, text string, prio double",
    )

    def ids(budget):
        return sorted(
            r["doc_id"]
            for r in select_token_budget(
                docs, budget, score=F.col("prio"), grid=1
            ).collect()
        )

    assert ids(0) == []            # zero budget selects nothing
    assert ids(4) == [1]           # boundary INSIDE bucket 3: id1 (cum 3)
                                   # keeps, id2 (cum 5) drops
    assert ids(5) == [1, 2]        # bucket 3 exactly fills the budget
    assert ids(7) == [1, 2, 3]     # bucket 2 boundary: id3 (cum 7) keeps,
                                   # id5 (cum 10) drops — id order breaks the tie
    assert ids(10) == [1, 2, 3, 5] # bucket 2 fully in
    assert ids(11) == [1, 2, 3, 4, 5]  # whole corpus within budget
    assert ids(10**9) == [1, 2, 3, 4, 5]

    # n_kept/token accounting survives on the output
    out = {r["doc_id"]: (r["quality_q"], r["n_tokens"])
           for r in select_token_budget(docs, 7, score=F.col("prio"), grid=1).collect()}
    assert out == {1: (3, 3), 2: (3, 2), 3: (2, 2)}


def test_select_token_budget_matches_naive_greedy(spark):
    """Property check vs the naive doc-level greedy scan on pseudorandom
    (score, length) data: for every budget the engine's bucket-census
    selection must equal 'keep docs in (score desc, id asc) order while
    the running token total stays within budget'."""
    import random

    from the_movie_database_import_spark.operators.mixing import (
        select_token_budget,
    )

    rng = random.Random(11)
    rows = [
        (i, " ".join("w%d" % rng.randrange(50) for _ in range(rng.randint(1, 12))),
         float(rng.randint(0, 5)))
        for i in range(80)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, prio double")
    by_rank = sorted(rows, key=lambda r: (-r[2], r[0]))
    for budget in (0, 17, 100, 250, 10**6):
        expect, cum = [], 0
        for i, text, _ in by_rank:
            cum += len(text.split(" "))
            if cum > budget:
                break
            expect.append(i)
        got = sorted(
            r["doc_id"]
            for r in select_token_budget(
                docs, budget, score=F.col("prio"), grid=1
            ).collect()
        )
        assert got == sorted(expect), f"budget={budget}"


def test_select_token_budget_plan_shape(spark):
    """The scale contract (operators/mixing.select_token_budget): corpus
    rows must never enter a GLOBAL doc-level window — the plan carries
    exactly two Window operators (the bounded census prefix-sum and the
    single boundary bucket's running sum, the latter hash-partitioned on
    the bucket key), and the bucket decisions reach the probe as a
    broadcast."""
    import re

    from the_movie_database_import_spark.operators.mixing import (
        select_token_budget,
    )
    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        select_token_budget(docs, 100_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, "bucket decisions must broadcast"
    assert re.search(r"Exchange hashpartitioning\(quality_q", plan), (
        "boundary window must partition by the bucket key"
    )
    # The forbidden shape: a single window ordered (quality_q DESC, doc_id)
    # with NO partition columns — the naive global greedy that funnels
    # every doc row into one partition. In windowspecdefinition's printed
    # form order columns carry ASC/DESC markers and partition columns
    # don't, so the global form reads 'quality_q# DESC ... doc_id#' while
    # the legitimate boundary window reads 'quality_q#L, doc_id# ASC'
    # (partitioned by bucket). The census prefix window orders the BOUNDED
    # bucket table only (<= grid+1 rows by construction) and carries no
    # doc_id at all.
    assert not re.search(
        r"windowspecdefinition\(quality_q#\d+L? DESC[^)]*doc_id", plan
    ), f"global doc-level window found:\n{plan}"


def test_mix_corpus_temperature_semantics_and_margins(spark):
    """Temperature mixing: (1) the smallest group keeps EVERYTHING (it
    binds); (2) every group's keep-rate is (n_bind/n_g)^(1-alpha) within
    hash-sampling tolerance, so larger groups are damped while the tail's
    SHARE rises vs natural proportions; (3) alpha=1 keeps every row (all
    rates snap to exactly 1); (4) the pow-drift guard: every realized
    quantized rate sits far from a 1e-9 grid boundary (margin >> 1 ulp of
    the rate), so a Math.pow vs libm disagreement cannot flip an md5
    bucket — the A-ES realized-margin pin pattern."""
    import math

    from the_movie_database_import_spark.operators.mixing import (
        mix_corpus_temperature,
    )

    docs = load_table(spark, SF_DIR, "documents")
    n_by = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_bind = min(n_by.values())
    bind_langs = [g for g, n in n_by.items() if n == n_bind]

    out = mix_corpus_temperature(docs, alpha=0.5, group_col="lang")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for g in bind_langs:
        assert got[g] == n_by[g], "binding group must keep every row"
    for g, n in n_by.items():
        expect_rate = math.sqrt(n_bind / n)
        assert abs(got.get(g, 0) / n - expect_rate) < 0.1, (g, got.get(g), n)
    # damped head / boosted tail SHARE vs natural proportions
    tot_in, tot_out = sum(n_by.values()), sum(got.values())
    for g in bind_langs:
        assert got[g] / tot_out > n_by[g] / tot_in

    # alpha=1: natural proportions == keep everything (rates snap to 1)
    assert mix_corpus_temperature(docs, alpha=1.0, group_col="lang").count() \
        == docs.count()

    # realized-margin pin: replicate the engine's rate derivation in
    # python (same IEEE doubles) and assert distance from the 1e-9 grid
    t = min(n / math.pow(float(n), 0.5) for n in n_by.values())
    for g, n in n_by.items():
        rate0 = math.pow(float(n), 0.5) * t / n
        if abs(rate0 - round(rate0)) < 1e-9:
            continue  # snapped to an exact integer — no boundary to sit on
        frac = rate0 * 1e9 - math.floor(rate0 * 1e9)
        margin = min(frac, 1 - frac)
        # 1 ulp of rate0 (~1e-16) scaled by 1e9 is ~1e-7; demand 100x that
        assert margin > 1e-5, (g, rate0, margin)


def test_sample_weighted_per_group_semantics_and_grid(spark):
    """Stratified A-ES: (1) exactly k rows per group (fewer only when the
    group is smaller), ranks 1..k dense; (2) deterministic and
    partition-invariant (same rows under different repartitionings);
    (3) non-positive/NULL weights never sampled; (4) the 'wg'-salted
    realized keys keep the pow-grid margin at every SF (the
    weighted_sample_key discipline — margins are salt-specific)."""
    import hashlib

    import duckdb

    from the_movie_database_import_spark.operators.sampling import (
        sample_weighted_k_per_group,
    )

    rows = [(i, "g%d" % (i % 3), float(1 + i % 7)) for i in range(60)]
    rows += [(100, "g0", 0.0), (101, "g1", -2.0), (102, "g2", None)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    out = sample_weighted_k_per_group(
        df, 4, F.col("w"), F.col("doc_id"), "g"
    )
    got = [(r["g"], r["doc_id"], r["sample_rank"]) for r in out.collect()]
    by_g = {}
    for g, d, rk in got:
        by_g.setdefault(g, []).append((rk, d))
    assert set(by_g) == {"g0", "g1", "g2"}
    for g, members in by_g.items():
        assert sorted(rk for rk, _ in members) == [1, 2, 3, 4], (g, members)
    assert not {100, 101, 102} & {d for _, d, _ in got}
    # partition invariance
    got13 = {
        (r["g"], r["doc_id"], r["sample_rank"])
        for r in sample_weighted_k_per_group(
            df.repartition(13), 4, F.col("w"), F.col("doc_id"), "g"
        ).collect()
    }
    assert got13 == set(got)

    # pow-grid margins for THIS salt at every SF
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        drows = duckdb.sql(
            f"SELECT doc_id, n_chars FROM '/root/testdata/{sf}/documents.parquet' "
            "WHERE n_chars > 0"
        ).fetchall()
        worst = 1.0
        for doc_id, w in drows:
            h = hashlib.md5(f"wg:{doc_id}".encode()).hexdigest()[:8]
            u = (int(h, 16) + 0.5) / 4294967296.0
            v = 1e9 * (u ** (1.0 / w))
            worst = min(worst, abs(v - round(v)))
        assert worst > 1e-5, (sf, worst)
