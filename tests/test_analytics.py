"""Event-sequence analytics (funnel, retention) and BM25 ranking:
independent-python-model parity on the real testdata plus synthetic edge
cases the generated data can't produce (zero-count stages, same-timestamp
ties, out-of-order stage events), and the BM25 quantization-grid safety
pin (the discipline test_unigram_nll_grid_safety established)."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from the_movie_database_import_spark.operators.analytics import (
    funnel_counts,
    retention_cohorts,
)
from the_movie_database_import_spark.operators.ranking import (
    QUANT,
    bm25_scores,
    bm25_topk,
)
from the_movie_database_import_spark.plans.analytics import (
    BM25_TERMS,
    FUNNEL_STAGES,
)

from conftest import SF_DIR


def _events_pdf():
    return duckdb.sql(
        f"SELECT user_id, ts, event_type FROM '{SF_DIR}/events.parquet' "
        "WHERE ts IS NOT NULL"
    ).fetchdf()


# ---------------------------------------------------------------- funnel


def _python_funnel(pdf, stages):
    """Greedy-earliest fold over each user's (ts, type)-sorted events —
    the same semantics the Spark in-row fold implements."""
    reached_per_user = {}
    for user, grp in pdf.groupby("user_id"):
        evs = sorted(zip(grp["ts"], grp["event_type"]))
        reached, last_ts = 0, None
        for ts, et in evs:
            if (
                reached < len(stages)
                and et == stages[reached]
                and (reached == 0 or ts > last_ts)
            ):
                reached, last_ts = reached + 1, ts
        reached_per_user[user] = reached
    return {
        i + 1: sum(1 for r in reached_per_user.values() if r >= i + 1)
        for i in range(len(stages))
    }


def test_funnel_matches_python_model(spark):
    pdf = _events_pdf()
    expected = _python_funnel(pdf, list(FUNNEL_STAGES))
    sdf = spark.createDataFrame(pdf)
    got = {
        r["stage_idx"]: r["n_users"]
        for r in funnel_counts(sdf, FUNNEL_STAGES).collect()
    }
    assert got == expected
    # a funnel is non-increasing by construction
    counts = [got[i] for i in sorted(got)]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0  # the generated log reaches at least stage 1


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_funnel_emits_zero_count_stages(spark):
    sdf = spark.createDataFrame(
        [(1, _ts(0), "view"), (2, _ts(1), "view")],
        "user_id long, ts timestamp, event_type string",
    )
    rows = {
        r["stage_idx"]: (r["stage"], r["n_users"])
        for r in funnel_counts(sdf, FUNNEL_STAGES).collect()
    }
    assert rows == {1: ("view", 2), 2: ("click", 0), 3: ("purchase", 0)}


def test_funnel_requires_strictly_increasing_ts(spark):
    sdf = spark.createDataFrame(
        # user 1: stages present but in REVERSE time order -> stage 1 only
        [(1, _ts(2), "view"), (1, _ts(1), "click"), (1, _ts(0), "purchase")]
        # user 2: click shares view's timestamp -> strict > rejects stage 2
        + [(2, _ts(0), "view"), (2, _ts(0), "click")]
        # user 3: clean progression, interleaved with noise types
        + [
            (3, _ts(0), "view"),
            (3, _ts(1), "signup"),
            (3, _ts(2), "click"),
            (3, _ts(3), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["stage_idx"]: r["n_users"] for r in funnel_counts(sdf, FUNNEL_STAGES).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_duplicate_stages_raise(spark):
    sdf = spark.createDataFrame(
        [(1, _ts(0), "view")], "user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(sdf, ["view", "view"])


# ------------------------------------------------------------- retention


def test_retention_matches_python_model(spark):
    pdf = _events_pdf()
    pdf = pdf.assign(day=pdf["ts"].dt.date)
    first = pdf.groupby("user_id")["day"].min()
    expected: dict = {}
    for (user, day), _ in pdf.groupby(["user_id", "day"]):
        key = (first[user], (day - first[user]).days)
        expected[key] = expected.get(key, 0) + 1
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in retention_cohorts(spark.createDataFrame(pdf)).collect()
    }
    assert got == expected


def test_retention_offset_zero_is_cohort_size(spark):
    pdf = _events_pdf()
    sdf = spark.createDataFrame(pdf)
    out = retention_cohorts(sdf)
    sizes = {
        r["cohort_day"]: r["n_users"]
        for r in out.filter(F.col("offset_days") == 0).collect()
    }
    first = (
        sdf.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d")).collect()
    )
    expected: dict = {}
    for r in first:
        expected[r["d"]] = expected.get(r["d"], 0) + 1
    assert sizes == expected
    # every cell's count is bounded by its cohort's size
    for r in out.collect():
        assert 0 < r["n_users"] <= sizes[r["cohort_day"]], r


# ------------------------------------------------------------------ bm25


def _python_bm25(k1=1.2, b=0.75):
    """Independent model with the SAME arithmetic shapes (Python floats are
    C doubles; inside the grid tolerance the engines agree)."""
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE text IS NOT NULL"
    ).fetchall()
    toks = {i: t.split(" ") for i, t in docs}
    n_docs = len(toks)
    sum_dl = sum(len(v) for v in toks.values())
    avgdl = sum_dl / n_docs
    scores = {}
    for i, tv in toks.items():
        score_q = 0
        for term in BM25_TERMS:
            tf = sum(1 for x in tv if x == term)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            sat = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (len(tv) / avgdl))
            )
            score_q += math.floor(QUANT * (idf * sat))
        scores[i] = score_q
    return scores


def test_bm25_matches_python_model(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["doc_id"]: r["score_q"] for r in bm25_scores(docs, BM25_TERMS).collect()
    }
    expected = _python_bm25()
    assert got == expected
    assert any(v > 0 for v in got.values())
    # score is the quantized integer re-scaled
    for r in bm25_scores(docs, BM25_TERMS).collect()[:5]:
        assert r["score"] == r["score_q"] / QUANT


def test_bm25_topk_is_deterministic_total_order(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    top = bm25_topk(docs, BM25_TERMS, k=10).collect()
    assert len(top) == 10
    keys = [(-r["score_q"], r["doc_id"]) for r in top]
    assert keys == sorted(keys)
    expected = sorted(
        ((-q, i) for i, q in _python_bm25().items())
    )[:10]
    assert keys == expected


def test_bm25_duplicate_terms_raise(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="distinct"):
        bm25_scores(docs, ["a", "a"])


def test_bm25_grid_safety():
    """The 1e-6 floor grid is only hash-safe if no term contribution sits
    within engine-rounding distance of an integer: a 1-ulp Java-vs-libm
    ln() difference (~1e-9 after the 1e6 scale at these magnitudes) could
    otherwise flip the floored BIGINT. Check every realized (tf, dl) pair
    of every query term at every test SF keeps a >100x margin."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        per_doc = duckdb.sql(
            f"""
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM '/root/testdata/{sf}/documents.parquet'
            )
            SELECT doc_id, COUNT(*) AS dl,
              {", ".join(
                  f"SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS tf_{i}"
                  for i, t in enumerate(BM25_TERMS)
              )}
            FROM tok GROUP BY doc_id
            """
        ).fetchdf()
        n_docs = len(per_doc)
        avgdl = int(per_doc["dl"].sum()) / n_docs
        k1, b = 1.2, 0.75
        checked = 0
        for i in range(len(BM25_TERMS)):
            df = int((per_doc[f"tf_{i}"] > 0).sum())
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for tf, dl in set(
                zip(per_doc[f"tf_{i}"].astype(int), per_doc["dl"].astype(int))
            ):
                if tf == 0:
                    continue
                sat = (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * (dl / avgdl))
                )
                v = QUANT * (idf * sat)
                dist = abs(v - round(v))
                assert dist > 1e-6, (sf, BM25_TERMS[i], tf, dl, v, dist)
                checked += 1
        assert checked > 0


# ------------------------------------------------------------------ scd2


def test_scd2_matches_python_model(spark):
    from the_movie_database_import_spark.operators.analytics import scd2_history

    pdf = duckdb.sql(
        f"SELECT user_id, ts, event_type, event_id FROM '{SF_DIR}/events.parquet' "
        "WHERE ts IS NOT NULL"
    ).fetchdf()
    expected = []
    for user, grp in pdf.groupby("user_id"):
        evs = sorted(zip(grp["ts"], grp["event_id"], grp["event_type"]))
        runs = [
            (ts, et) for i, (ts, _eid, et) in enumerate(evs)
            if i == 0 or et != evs[i - 1][2]
        ]
        for v, (ts, et) in enumerate(runs):
            valid_to = runs[v + 1][0] if v + 1 < len(runs) else None
            expected.append((user, et, ts, valid_to, v + 1, valid_to is None))
    got = [
        (r["user_id"], r["value"], r["valid_from"].to_pydatetime()
         if hasattr(r["valid_from"], "to_pydatetime") else r["valid_from"],
         r["valid_to"].to_pydatetime()
         if r["valid_to"] is not None and hasattr(r["valid_to"], "to_pydatetime")
         else r["valid_to"],
         r["version"], r["is_current"])
        for r in scd2_history(spark.createDataFrame(pdf)).collect()
    ]
    assert sorted(got, key=lambda t: (t[0], t[4])) == sorted(
        expected, key=lambda t: (t[0], t[4])
    )


def test_scd2_interval_invariants(spark):
    """Per key: versions are 1..n contiguous, intervals chain exactly
    (valid_to == next version's valid_from), and exactly one row is
    current (NULL valid_to)."""
    from the_movie_database_import_spark.operators.analytics import scd2_history

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = scd2_history(events.withColumn("ts", F.col("ts").cast("timestamp"))).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert sum(1 for r in rs if r["is_current"]) == 1
        assert rs[-1]["valid_to"] is None and rs[-1]["is_current"]
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], (user, a, b)
            assert a["value"] != b["value"], "consecutive runs must differ"


# --------------------------------------------------------------- quality


def test_audit_counts_violations_and_passes(spark):
    from the_movie_database_import_spark.operators.quality import (
        audit,
        check_accepted_values,
        check_not_null,
        check_range,
    )

    df = spark.createDataFrame(
        [(1, 10, "A"), (1, 99, "A"), (2, None, "X"), (None, 5, "N")],
        "k long, v long, f string",
    )
    rows = {
        r["check_name"]: (r["violations"], r["total"], r["passed"])
        for r in audit(
            df,
            [
                check_not_null("k"),
                check_range("v", 1, 50),
                check_accepted_values("f", ["A", "N"]),
            ],
            unique_keys=[["k"]],
        ).collect()
    }
    assert rows == {
        "not_null(k)": (1, 4, False),
        "range(v,1,50)": (2, 4, False),  # 99 out of range + NULL
        "accepted_values(f,[A,N])": (1, 4, False),
        "unique(k)": (1, 4, False),  # k=1 twice (NULL counts as a value)
    }


def test_audit_empty_input_passes_everything(spark):
    from the_movie_database_import_spark.operators.quality import (
        audit,
        check_not_null,
    )

    df = spark.createDataFrame([], "k long")
    rows = audit(df, [check_not_null("k")], unique_keys=[["k"]]).collect()
    assert [(r["violations"], r["total"], r["passed"]) for r in rows] == [
        (0, 0, True),
        (0, 0, True),
    ]


def test_scd2_as_at_returns_one_value_per_key(spark):
    """as_at over the SCD2 history: at any probed instant, at most one
    interval covers each user, and the value agrees with a direct replay
    of the log up to that instant."""
    import datetime

    from the_movie_database_import_spark.operators.analytics import (
        as_at,
        scd2_history,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    hist = scd2_history(events)
    probe = datetime.datetime(2024, 1, 15, 12, 0, 0)
    snap = as_at(hist, probe).collect()
    per_user = {}
    for r in snap:
        assert r["user_id"] not in per_user, "overlapping intervals"
        per_user[r["user_id"]] = r["value"]
    # replay model: last change-point value at or before the probe
    rows = events.filter(F.col("ts") <= F.lit(probe)).orderBy("ts", "event_id").collect()
    last: dict = {}
    for r in rows:
        last[r["user_id"]] = r["event_type"]
    assert per_user == last


# ----------------------------------------------------------- weighted k


def _python_weighted_keys(sf):
    """Independent model of the A-ES key (same md5-uniform + pow + grid)."""
    import hashlib

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '/root/testdata/{sf}/documents.parquet' "
        "WHERE n_chars > 0"
    ).fetchall()
    out = {}
    for doc_id, w in rows:
        h = hashlib.md5(f"wk:{doc_id}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 4294967296.0
        out[doc_id] = (math.floor(1e9 * (u ** (1.0 / w))), w)
    return out


def test_weighted_sample_matches_python_model(spark):
    from the_movie_database_import_spark.operators.sampling import sample_weighted_k

    sf = SF_DIR.rstrip("/").rsplit("/", 1)[1]
    model = _python_weighted_keys(sf)
    expected = sorted(((-q, i) for i, (q, _w) in model.items()))[:50]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = [
        (-r["wkey_q"], r["doc_id"])
        for r in sample_weighted_k(docs, 50, F.col("n_chars"), F.col("doc_id"))
        .orderBy(F.col("wkey_q").desc(), "doc_id")
        .collect()
    ]
    assert got == expected


def test_weighted_sample_prefers_heavy_rows(spark):
    """Statistical sanity: with weights 1000 vs 1 on two equal halves, the
    heavy half must take the overwhelming share of a half-sized sample."""
    from the_movie_database_import_spark.operators.sampling import sample_weighted_k

    df = spark.range(400).select(
        F.col("id"),
        F.when(F.col("id") < 200, F.lit(1000)).otherwise(F.lit(1)).alias("w"),
    )
    picked = sample_weighted_k(df, 200, F.col("w"), F.col("id")).collect()
    heavy = sum(1 for r in picked if r["id"] < 200)
    assert heavy >= 190, heavy
    # zero/negative weights never selected
    df2 = df.withColumn("w", F.when(F.col("id") < 200, F.lit(0)).otherwise(F.lit(1)))
    picked2 = sample_weighted_k(df2, 100, F.col("w"), F.col("id")).collect()
    assert all(r["id"] >= 200 for r in picked2)


def test_weighted_sample_partition_invariant(spark):
    from the_movie_database_import_spark.operators.sampling import sample_weighted_k

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = [
        r["doc_id"]
        for r in sample_weighted_k(docs, 25, F.col("n_chars"), F.col("doc_id"))
        .orderBy("doc_id").collect()
    ]
    b = [
        r["doc_id"]
        for r in sample_weighted_k(
            docs.repartition(13), 25, F.col("n_chars"), F.col("doc_id")
        ).orderBy("doc_id").collect()
    ]
    assert a == b and len(a) == 25


def test_weighted_sample_grid_safety():
    """pow is the one cross-engine-soft primitive in the A-ES key: a
    few-ulp disagreement on the base key (~1e-16 relative) scales to
    ~3e-7 absolute on the 1e9 grid. Verify every realized key at every SF
    keeps a >100x margin (1e-5) to its floor boundary."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        keys = _python_weighted_keys(sf)
        import hashlib

        worst = 1.0
        rows = duckdb.sql(
            f"SELECT doc_id, n_chars FROM '/root/testdata/{sf}/documents.parquet' "
            "WHERE n_chars > 0"
        ).fetchall()
        for doc_id, w in rows:
            h = hashlib.md5(f"wk:{doc_id}".encode()).hexdigest()[:8]
            u = (int(h, 16) + 0.5) / 4294967296.0
            v = 1e9 * (u ** (1.0 / w))
            worst = min(worst, abs(v - round(v)) / 1.0)
        assert worst > 1e-5, (sf, worst)
        assert keys


# ------------------------------------------------------------- fuzzy join


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_bruteforce(spark):
    """Symmetric-delete blocking must find EXACTLY the brute-force
    all-pairs edit-distance<=1 set (the neighborhood identity never
    under-generates for distance 1; verification removes over-generation)."""
    from the_movie_database_import_spark.operators.fuzzy import fuzzy_pairs_edit1

    names = duckdb.sql(
        f"SELECT c_custkey, c_name FROM '{SF_DIR}/customer.parquet'"
    ).fetchall()
    expected = {
        (a_id, b_id, _lev(a_n, b_n))
        for i, (a_id, a_n) in enumerate(names)
        for b_id, b_n in names[i + 1:]
        if _lev(a_n, b_n) <= 1
    }
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    got = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]), r["dist"])
        for r in fuzzy_pairs_edit1(cust, "id", "name").collect()
    }
    assert got == expected and got


def test_fuzzy_pairs_edit_kinds(spark):
    """One of each edit kind: substitution, insertion, deletion, and exact
    duplicate all pair at <=1; a transposition is distance 2 and must NOT."""
    from the_movie_database_import_spark.operators.fuzzy import fuzzy_pairs_edit1

    df = spark.createDataFrame(
        [
            (1, "spark"),
            (2, "spork"),   # substitution -> dist 1
            (3, "sparke"),  # insertion   -> dist 1
            (4, "spak"),    # hmm: deletion of r -> dist 1 vs spark
            (5, "spark"),   # exact dup   -> dist 0
            (6, "sprak"),   # transposition vs spark -> dist 2: excluded
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs_edit1(df, "id", "name").collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 5)] == 0
    # the transposition pairs with nothing at distance <=1 except "spak"
    # (one insertion away); notably NOT with "spark" despite sharing two
    # deletion variants — verification rejects the distance-2 candidate
    assert (1, 6) not in got and (2, 6) not in got and (3, 6) not in got
    assert got[(4, 6)] == 1
    # neighbors of the duplicate mirror the original's neighborhood
    assert got[(2, 5)] == 1 and got[(3, 5)] == 1 and got[(4, 5)] == 1


def test_fuzzy_pairs_hot_block_cap(spark):
    """The >max_block hot-variant cap is an explicit recall trade: when
    EVERY shared variant of a pair is hot, the pair is not emitted; with
    the default cap the same data pairs fully."""
    from the_movie_database_import_spark.operators.fuzzy import fuzzy_pairs_edit1

    df = spark.createDataFrame(
        [(i, "a") for i in range(5)], "id long, name string"
    )
    assert fuzzy_pairs_edit1(df, "id", "name", max_block=2).count() == 0
    assert fuzzy_pairs_edit1(df, "id", "name").count() == 10  # C(5,2)


def test_fuzzy_hot_variants_census_reports_the_drop(spark):
    """hot_variants surfaces exactly the buckets fuzzy_pairs_edit1 drops:
    the 5x-repeated name's whole deletion neighborhood ("a" plus its
    single deletion "") at max_block=2, and nothing at the default cap —
    so a pipeline can gate/report the recall trade instead of eating it
    silently."""
    from the_movie_database_import_spark.operators.fuzzy import hot_variants

    df = spark.createDataFrame(
        [(i, "a") for i in range(5)] + [(9, "b")], "id long, name string"
    )
    hot = hot_variants(df, "id", "name", max_block=2).collect()
    assert sorted(r["n_rows"] for r in hot) == [5, 6]  # "a" x5; "" x6
    assert hot_variants(df, "id", "name").count() == 0


# ------------------------------------------------ events ts encodings


def test_event_ops_survive_nanos_encoding(spark, tmp_path):
    """The driver regenerates events.parquet between rounds and has used
    BOTH TIMESTAMP(MICROS) and TIMESTAMP(NANOS) encodings (readers.py
    probes and adapts). Rewrite the current events table as NANOS and
    assert load_table normalizes to identical microsecond instants, and
    that a representative event-time operator (the funnel) returns
    byte-identical results on both encodings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from the_movie_database_import_spark.sources.readers import load_table

    src = pq.read_table(f"{SF_DIR}/events.parquet")
    ts_idx = src.schema.get_field_index("ts")
    ns_type = pa.timestamp("ns")
    ns_col = src.column("ts").cast(ns_type)
    ns_table = src.set_column(ts_idx, pa.field("ts", ns_type), ns_col)
    d = str(tmp_path / "ns_sf")
    import os

    os.makedirs(d)
    pq.write_table(ns_table, f"{d}/events.parquet", coerce_timestamps=None)
    # confirm the file really is NANOS on disk (else this test guards nothing)
    assert pa.types.is_timestamp(pq.read_schema(f"{d}/events.parquet").field("ts").type)
    assert pq.read_schema(f"{d}/events.parquet").field("ts").type.unit == "ns"

    a = load_table(spark, d, "events")
    b = load_table(spark, SF_DIR, "events")
    assert dict(a.dtypes)["ts"] == "timestamp_ntz"
    ra = sorted((r["event_id"], r["ts"]) for r in a.select("event_id", "ts").collect())
    rb = sorted((r["event_id"], r["ts"]) for r in b.select("event_id", "ts").collect())
    assert ra == rb

    fa = sorted(map(tuple, funnel_counts(a, FUNNEL_STAGES).collect()))
    fb = sorted(map(tuple, funnel_counts(b, FUNNEL_STAGES).collect()))
    assert fa == fb


# ------------------------------------------------------------- histogram


def test_histogram_matches_python_model(spark):
    from the_movie_database_import_spark.operators.quality import numeric_histogram

    vals = [
        r[0]
        for r in duckdb.sql(
            f"SELECT l_extendedprice FROM '{SF_DIR}/lineitem.parquet' "
            "WHERE l_extendedprice IS NOT NULL"
        ).fetchall()
    ]
    lo, hi, n = min(vals), max(vals), 20
    expected: dict = {}
    for x in vals:
        b = min(n - 1, math.floor((x - lo) * n / (hi - lo))) if hi > lo else 0
        expected[b] = expected.get(b, 0) + 1
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    rows = numeric_histogram(li, "l_extendedprice", n_bins=n).collect()
    got = {r["bin_id"]: r["n"] for r in rows}
    assert got == expected
    assert sum(got.values()) == len(vals)
    for r in rows:  # edges bracket the bin and agree with the model
        assert r["bin_lo"] == lo + r["bin_id"] * (hi - lo) / n
        assert r["bin_hi"] == lo + (r["bin_id"] + 1) * (hi - lo) / n


def test_histogram_degenerate_and_nulls(spark):
    from the_movie_database_import_spark.operators.quality import numeric_histogram

    df = spark.createDataFrame(
        [(7.0,), (7.0,), (None,)], "x double"
    )
    rows = numeric_histogram(df, "x", n_bins=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["bin_id"], r["n"]) == (0, 2)  # NULL excluded, min==max -> bin 0
    assert r["bin_lo"] == r["bin_hi"] == 7.0  # zero-width edges


def test_rrf_fuse_hand_case(spark):
    """Reciprocal-rank fusion: a doc in both lists outranks single-list
    docs with better single ranks (1/(60+1)+1/(60+3) > 1/(60+1)); ties
    break by id; n_lists counts membership; quantization matches the
    python formula exactly."""
    import math

    from the_movie_database_import_spark.operators.ranking import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rk long"
    )
    sem = spark.createDataFrame(
        [(12, 1), (13, 2), (10, 3)], "doc_id long, rk long"
    )
    got = {
        r["doc_id"]: (r["rrf_q"], r["n_lists"], r["rrf_rank"])
        for r in rrf_fuse([lex, sem], k=10).collect()
    }

    def q(rk):
        return math.floor(1e9 * (1.0 / (60.0 + rk)))

    # doc 10: lex rk1 + sem rk3; doc 12: lex rk3 + sem rk1 — identical
    # fused scores, id breaks the tie; docs 11/13 single-list
    assert got[10] == (q(1) + q(3), 2, 1)
    assert got[12] == (q(1) + q(3), 2, 2)
    assert got[11] == (q(2), 1, 3)
    assert got[13] == (q(2), 1, 4)
    # both dual-list docs beat every single-list doc
    assert got[10][0] > got[11][0] and got[12][0] > got[13][0]

    with pytest.raises(ValueError):
        rrf_fuse([])


# ------------------------------------------------------------ sessionize


def _sessionize_model(rows, gap_seconds):
    """Independent python model: per user, sort by (ts, event_id), cut a
    new session where the gap exceeds the threshold, and summarize."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        if r["ts"] is not None:
            by_user[r["user_id"]].append(r)
    out = {}
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        idx = 0
        prev = None
        for r in evs:
            if prev is None or (r["ts"] - prev).total_seconds() > gap_seconds:
                idx += 1
            prev = r["ts"]
            key = (uid, idx)
            s = out.setdefault(
                key,
                {"start": r["ts"], "end": r["ts"], "n": 0, "val": 0.0},
            )
            s["end"] = max(s["end"], r["ts"])
            s["n"] += 1
            s["val"] += round(r["value"], 2) if r["value"] is not None else 0.0
    return out


def test_sessionize_matches_python_model(spark):
    from the_movie_database_import_spark.operators.analytics import sessionize
    from the_movie_database_import_spark.plans.analytics import (
        SESSION_GAP_SECONDS,
    )
    from the_movie_database_import_spark.sources.readers import load_table

    events = load_table(spark, SF_DIR, "events")
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in sessionize(events, gap_seconds=SESSION_GAP_SECONDS).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_id, ts, value FROM '{SF_DIR}/events.parquet'"
    ).fetchdf().to_dict("records")
    import pandas as pd

    for r in rows:
        r["ts"] = None if pd.isna(r["ts"]) else r["ts"].to_pydatetime()
    want = _sessionize_model(rows, SESSION_GAP_SECONDS)
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        assert g["session_start"] == w["start"], key
        assert g["session_end"] == w["end"], key
        assert g["n_events"] == w["n"], key
        assert g["duration_secs"] == pytest.approx(
            (w["end"] - w["start"]).total_seconds()
        ), key
        assert g["total_value"] == pytest.approx(w["val"], abs=1e-9), key


def test_sessionize_edge_semantics(spark):
    """Ties share a session regardless of tiebreak order; a gap of EXACTLY
    the threshold stays in-session (strict >, matching session_window's
    exclusive close); NULL timestamps drop."""
    import datetime as dt

    from the_movie_database_import_spark.operators.analytics import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0, 1.0),
        (2, 1, t0, 2.0),  # same-ts tie: same session
        (3, 1, t0 + dt.timedelta(seconds=60), 3.0),  # exactly the gap: stays
        (4, 1, t0 + dt.timedelta(seconds=121), 4.0),  # 61 s > gap: new session
        (5, 1, None, 9.0),  # NULL ts: dropped
        (6, 2, t0, 5.0),  # second user: own numbering
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in sessionize(df, gap_seconds=60).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    assert got[(1, 1)]["n_events"] == 3
    assert got[(1, 1)]["duration_secs"] == 60.0
    assert got[(1, 1)]["total_value"] == pytest.approx(6.0)
    assert got[(1, 2)]["n_events"] == 1
    assert got[(1, 2)]["duration_secs"] == 0.0
    assert got[(2, 1)]["n_events"] == 1


# ------------------------------------------------------------ time-range window


def test_win_time_range_frame_semantics(spark):
    """RANGE frame membership is set by TIME: an event exactly 7 days old
    is IN the trailing frame (inclusive lower bound), 7 days + 1 µs is
    out; same-timestamp peers always share a frame (no tiebreak can
    split them)."""
    import datetime as dt

    from pyspark.sql import Window, functions as F
    from the_movie_database_import_spark.operators.analytics import _epoch_us

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    week = dt.timedelta(days=7)
    rows = [
        (1, 1, t0, 10.0),
        (2, 1, t0 + week, 20.0),                            # exactly 7d: in
        (3, 1, t0 + week + dt.timedelta(microseconds=1), 30.0),  # out for t0
        (4, 1, t0 + week, 40.0),                            # tie peer of 2
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    df = df.withColumn("_us", _epoch_us(df, "ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, Window.currentRow)
    )
    got = {
        r["event_id"]: (r["s"], r["n"])
        for r in df.select(
            "event_id",
            F.sum(F.col("value").cast("decimal(9,2)"))
            .over(w)
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
        ).collect()
    }
    assert got[1] == (10.0, 1)
    # events 2 and 4 are RANGE peers: both frames hold {1, 2, 4}
    assert got[2] == (70.0, 3) and got[4] == (70.0, 3)
    # 1 µs past the week: event 1 has aged out, peers 2/4 still in
    assert got[3] == (90.0, 3)


# ------------------------------------------------------------ resample + ffill


def test_resample_daily_ffill_hand_case(spark):
    """Grid spans first..last active day; gap days get n_events=0,
    day_value=0.0 and carry the last NON-NULL observation; a day whose
    only events have NULL values keeps the previous observation; days
    before the first non-null observation stay NULL; the per-day
    observation is the LATEST (ts, event_id) non-null value."""
    import datetime as dt

    from the_movie_database_import_spark.operators.analytics import (
        resample_daily_ffill,
    )

    d = lambda day, h=12: dt.datetime(2024, 5, day, h, 0, 0)  # noqa: E731
    rows = [
        (1, 1, d(1), None),          # day 1: only a NULL value -> no obs yet
        (2, 1, d(3, 8), 5.0),        # day 3, morning
        (3, 1, d(3, 9), 7.0),        # day 3, later ts
        (4, 1, d(3, 9), 6.0),        # same ts, HIGHER event_id wins -> obs 6.0
        (5, 1, d(6), None),          # day 6: NULL value -> carries 6.0
        (6, 1, d(7), 1.0),
        (7, 2, d(2), 3.0),           # second user: own grid
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    got = {
        (r["user_id"], str(r["day"])): r
        for r in resample_daily_ffill(df).collect()
    }
    u1 = [got[(1, f"2024-05-0{i}")] for i in range(1, 8)]
    assert [r["n_events"] for r in u1] == [1, 0, 3, 0, 0, 1, 1]
    assert [r["value_ffill"] for r in u1] == [
        None, None, 6.0, 6.0, 6.0, 6.0, 1.0
    ]
    assert u1[2]["day_value"] == pytest.approx(18.0)  # 5 + 7 + 6
    assert u1[1]["day_value"] == 0.0 and u1[1]["n_events"] == 0
    assert set(k for k in got if k[0] == 2) == {(2, "2024-05-02")}


# ------------------------------------------------------------ outlier census


def test_value_outliers_matches_numpy_quartiles(spark):
    """Quartiles equal numpy's linear-interpolation percentile (the same
    h = q*(n-1) order-statistic formula) and the fence counts equal the
    brute-force census, per group."""
    import numpy as np

    from the_movie_database_import_spark.operators.quality import value_outliers
    from the_movie_database_import_spark.sources.readers import load_table

    events = load_table(spark, SF_DIR, "events")
    got = {r["event_type"]: r for r in
           value_outliers(events, "event_type", "value").collect()}
    pdf = duckdb.sql(
        f"SELECT event_type, value FROM '{SF_DIR}/events.parquet' "
        "WHERE value IS NOT NULL"
    ).fetchdf()
    for etype, grp in pdf.groupby("event_type"):
        v = grp["value"].to_numpy()
        q1, q3 = np.percentile(v, [25, 75])  # linear interpolation
        r = got[etype]
        assert r["n"] == len(v)
        assert r["q1"] == pytest.approx(q1, rel=1e-12)
        assert r["q3"] == pytest.approx(q3, rel=1e-12)
        lo = r["lo_fence"]; hi = r["hi_fence"]
        assert r["n_low"] == int((v < lo).sum())
        assert r["n_high"] == int((v > hi).sum())
        assert r["n_outliers"] == r["n_low"] + r["n_high"]


def test_value_outliers_hand_case(spark):
    """n=5 group: h=0.25*4=1 exactly (no interpolation) -> q1=v[1], q3=v[3];
    fences at q1-1.5*iqr / q3+1.5*iqr; a value exactly ON the fence is NOT
    an outlier (strict inequality)."""
    from the_movie_database_import_spark.operators.quality import value_outliers

    # sorted: [0, 10, 20, 30, 100] -> q1=10, q3=30, iqr=20, fences -20/60
    rows = [("a", 20.0), ("a", 0.0), ("a", 100.0), ("a", 10.0), ("a", 30.0),
            ("b", 60.0), ("b", -20.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in value_outliers(df, "g", "v").collect()}
    a = got["a"]
    assert (a["q1"], a["q3"]) == (10.0, 30.0)
    assert (a["lo_fence"], a["hi_fence"]) == (-20.0, 60.0)
    assert (a["n_low"], a["n_high"], a["n_outliers"]) == (0, 1, 1)
    # group b sorted: [-20, 1, 2, 3, 60] -> q1=1, q3=3, fences -2/6
    b = got["b"]
    assert (b["q1"], b["q3"]) == (1.0, 3.0)
    assert (b["n_low"], b["n_high"]) == (1, 1)


# ------------------------------------------------------------ FK orphan audit


def test_fk_orphan_audit_hand_case(spark):
    """Planted data: orphans counted only for NON-NULL FKs with no parent;
    NULL FKs are their own category (not orphans); duplicate parent keys
    don't double-count children; ok flips only on orphans."""
    from the_movie_database_import_spark.operators.quality import fk_orphan_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 20)],
        "id long, fk long",
    )
    parent = spark.createDataFrame(
        [(10,), (10,), (20,), (30,)], "pk long"  # 10 duplicated
    )
    clean_child = spark.createDataFrame([(1, 30)], "id long, fk long")
    rows = {
        r["fk"]: r
        for r in fk_orphan_audit(
            [
                ("dirty", child, "fk", parent, "pk"),
                ("clean", clean_child, "fk", parent, "pk"),
            ]
        ).collect()
    }
    d = rows["dirty"]
    assert (d["n_rows"], d["n_null_fk"], d["n_orphans"], d["ok"]) == (
        5, 1, 1, False,
    )
    c = rows["clean"]
    assert (c["n_rows"], c["n_null_fk"], c["n_orphans"], c["ok"]) == (
        1, 0, 0, True,
    )


# ------------------------------------------------------------------ ewma


def test_ewma_hand_case_and_model(spark):
    """Fold seeds with the first observation and applies s' = αx + (1-α)s
    in (ts, event_id) order; NULL ts / NULL value rows are excluded; the
    full table matches an independent python fold."""
    import datetime as dt

    from the_movie_database_import_spark.operators.analytics import ewma_per_key
    from the_movie_database_import_spark.sources.readers import load_table

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (2, 1, t0 + dt.timedelta(seconds=1), 2.0),   # second by ts
        (1, 1, t0, 1.0),                              # first
        (3, 1, t0 + dt.timedelta(seconds=1), 10.0),  # ts tie: event_id 3 after 2
        (4, 1, None, 99.0),                           # NULL ts: dropped
        (5, 1, t0 + dt.timedelta(seconds=2), None),  # NULL value: dropped
        (6, 2, t0, 7.0),                              # single obs: ewma = value
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    got = {r["user_id"]: r for r in ewma_per_key(df, alpha=0.25).collect()}
    s = 1.0
    for x in (2.0, 10.0):
        s = 0.25 * x + 0.75 * s
    assert got[1]["n_obs"] == 3 and got[1]["ewma"] == s
    assert got[2]["n_obs"] == 1 and got[2]["ewma"] == 7.0

    events = load_table(spark, SF_DIR, "events")
    rows_pd = duckdb.sql(
        f"SELECT user_id, event_id, ts, value FROM '{SF_DIR}/events.parquet' "
        "WHERE ts IS NOT NULL AND value IS NOT NULL "
        "ORDER BY user_id, ts, event_id"
    ).fetchdf()
    want: dict = {}
    for uid, grp in rows_pd.groupby("user_id"):
        s = None
        for v in grp["value"]:
            s = v if s is None else 0.25 * v + 0.75 * s
        want[uid] = (len(grp), s)
    got_full = {
        r["user_id"]: (r["n_obs"], r["ewma"])
        for r in ewma_per_key(events, alpha=0.25).collect()
    }
    assert got_full == want  # bit-exact: identical fold order


# --------------------------------------------------------------- benford


def test_benford_census_hand_case(spark):
    """Exact digit extraction from 2-decimal fixed-point values (incl. a
    value whose double*100 product is not exactly integral); non-positive
    and NULL values drop; fractions sum to 1; expected_p are the
    log10(1+1/d) literals."""
    import math

    from the_movie_database_import_spark.operators.quality import benford_census

    rows = [(1.23,), (19.99,), (0.07,), (912.0,), (-5.0,), (None,), (0.0,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r for r in benford_census(df, "v").collect()}
    # digits: 1.23->1, 19.99->1, 0.07->7, 912.0->9
    assert {d: got[d]["n_obs"] for d in got} == {1: 2, 7: 1, 9: 1}
    assert got[1]["frac"] == 0.5
    assert got[1]["expected_p"] == math.log10(2.0)
    assert got[7]["excess"] == 0.25 - math.log10(1 + 1 / 7)
    assert sum(r["frac"] for r in got.values()) == pytest.approx(1.0)


def test_coalesce_intervals_swallowed_interval(spark):
    """The textbook gaps-and-islands bug: a long interval swallows a short
    one whose early end must NOT reopen a span (running-MAX rule, not
    lag(end)). [1,10] swallows [2,3]; [4,12] overlaps the running max 10;
    [13,14] touches nothing before it only via the gap at 12->13."""
    from the_movie_database_import_spark.operators.analytics import (
        coalesce_intervals,
    )

    df = spark.createDataFrame(
        [
            ("k", 1, 10),
            ("k", 2, 3),   # swallowed: lag(end)=10? no — lag is 3 for next row
            ("k", 4, 12),  # start 4 <= running max 10 -> same span
            ("k", 13, 14),  # 13 > running max 12 -> new span
            ("k2", 5, 6),
        ],
        "key string, s int, e int",
    )
    rows = {
        (r.key, r.span_id): (r.span_start, r.span_end, r.n_intervals)
        for r in coalesce_intervals(df, "key", "s", "e").collect()
    }
    assert rows == {
        ("k", 1): (1, 12, 3),
        ("k", 2): (13, 14, 1),
        ("k2", 1): (5, 6, 1),
    }


def test_coalesce_intervals_touching_merge_and_nulls(spark):
    """Closed-interval semantics: start == prior end merges; NULL bounds
    are excluded like sessionize excludes NULL timestamps."""
    from the_movie_database_import_spark.operators.analytics import (
        coalesce_intervals,
    )

    df = spark.createDataFrame(
        [("k", 1, 5), ("k", 5, 9), ("k", None, 3), ("k", 20, None)],
        "key string, s int, e int",
    )
    rows = [
        (r.span_start, r.span_end, r.n_intervals)
        for r in coalesce_intervals(df, "key", "s", "e").collect()
    ]
    assert rows == [(1, 9, 2)]


def test_sorted_neighborhood_matches_bruteforce(spark):
    """SNM pairs == all pairs within rank distance w-1 of the total
    (key, id) order — checked against a python re-derivation, including
    duplicate keys (id tiebreak keeps the order total)."""
    from the_movie_database_import_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    data = [(i, k) for i, k in enumerate(["b", "a", "c", "a", "d", "b", "e"])]
    w = 3
    order = sorted(data, key=lambda r: (r[1], r[0]))
    expect = set()
    for i in range(len(order)):
        for j in range(i + 1, min(i + w, len(order))):
            expect.add((order[i][0], order[j][0]))
    df = spark.createDataFrame(data, "id long, key string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=w).collect()
    }
    assert got == expect
    assert len(got) == (len(data) - 1) + (len(data) - 2)  # n*(w-1) minus tail


def test_sorted_neighborhood_partition_invariant(spark):
    """Global ranks (and therefore the pair set) must not depend on the
    input's partitioning — the range-partition + broadcast-offsets rank is
    exact, not partition-relative."""
    from the_movie_database_import_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    data = [(i, f"k{i % 5}") for i in range(40)]
    df1 = spark.createDataFrame(data, "id long, key string").repartition(1)
    df7 = spark.createDataFrame(data, "id long, key string").repartition(7)
    p1 = sorted(
        (r.id_a, r.id_b, r.rank_a, r.rank_b)
        for r in sorted_neighborhood_pairs(df1, "id", "key", window=4).collect()
    )
    p7 = sorted(
        (r.id_a, r.id_b, r.rank_a, r.rank_b)
        for r in sorted_neighborhood_pairs(df7, "id", "key", window=4).collect()
    )
    assert p1 == p7 and len(p1) == 39 + 38 + 37


def test_key_skew_census_hand_case(spark):
    """Counts, deterministic tie order (cnt DESC, key ASC), share and
    skew ratio as rounded integer quotients."""
    from the_movie_database_import_spark.operators.skew import key_skew_census

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 2,
        "k string",
    )
    rows = [
        (r.rank, r.key, r.cnt, r.share, r.n_keys, r.n_rows, r.skew_ratio)
        for r in key_skew_census(df, "k", top_k=3).collect()
    ]
    # mean group = 14/4 = 3.5; skew = 6/3.5 = 1.7143
    assert rows == [
        (1, "a", 6, round(6 / 14, 6), 4, 14, 1.7143),
        (2, "b", 3, round(3 / 14, 6), 4, 14, 1.7143),
        (3, "c", 3, round(3 / 14, 6), 4, 14, 1.7143),
    ]


def test_gopher_rules_fail_reason_priority_and_rules(spark):
    """Each rule trips on a crafted row, and fail_reason reports the FIRST
    violated rule in GOPHER_RULE_ORDER."""
    from the_movie_database_import_spark.functions.text import gopher_rules

    import pyspark.sql.functions as F

    good = "the a " + " ".join(f"tok{i}" for i in range(40))
    cases = [
        ("short", "the a and of"),                     # n_tokens
        ("long_words", "the a " + " ".join(["verylongword"] * 30)),  # word_len
        # 4-char digit tokens keep mean word length in [3, 5] so the
        # alpha rule, not word_len, is the first failure
        ("no_alpha", "the a " + " ".join(["1234"] * 30)),
        ("no_stops", " ".join(f"tok{i % 7}" for i in range(40))),  # stopwords
        ("symbols", "the a " + " ".join(["#"] * 5 + [f"tok{i}" for i in range(30)])),
        ("repeat", "the a " + " ".join(["xxxx yyyy"] * 20)),  # repetition
        ("keeper", good),
    ]
    df = spark.createDataFrame(cases, "name string, text string")
    g = gopher_rules(F.col("text"))
    out = {
        r.name: (r.keep, r.fail_reason)
        for r in df.select(
            "name", g["keep"].alias("keep"), g["fail_reason"].alias("fail_reason")
        ).collect()
    }
    assert out["keeper"] == (True, None)
    assert out["short"] == (False, "n_tokens")
    assert out["long_words"] == (False, "word_len")
    assert out["no_alpha"] == (False, "alpha")
    assert out["no_stops"] == (False, "stopwords")
    assert out["symbols"] == (False, "symbols")
    assert out["repeat"] == (False, "repetition")


def test_gopher_rules_discriminate_on_fixture(spark):
    """The default thresholds must split the real corpus non-trivially —
    a filter that keeps (or drops) everything is a vacuous test of the
    rule machinery."""
    from the_movie_database_import_spark.plans import REGISTRY

    from conftest import SF_DIR

    out = REGISTRY["q_quality_gopher_rules"].spark_fn(spark, SF_DIR).collect()
    kept = sum(1 for r in out if r.keep)
    assert 0 < kept < len(out)


def test_km_survival_hand_case(spark):
    """Six users over a 20-day window (obs_end = Jan 21, churn gap 7):
    durations and censoring computed by hand, KM factors replayed in
    python on the same integer-ln grid. Covers: multiple churns at one
    duration, a censored user inside the curve, and the all-remaining-
    churn row where survival hits exact zero (km_log_q6 NULL + km_zero)."""
    import datetime as dt
    import math

    from the_movie_database_import_spark.operators.analytics import km_survival

    def ts(day, h=12):
        return dt.datetime(2024, 1, day, h, 0, 0)

    rows = [
        # u1: days 1..3 -> churned, duration 2
        (1, ts(1)), (1, ts(3)),
        # u2: days 1..3 -> churned, duration 2 (ties with u1)
        (2, ts(1)), (2, ts(3)),
        # u3: days 2..10 -> churned (last 11 days before obs_end), dur 8
        (3, ts(2)), (3, ts(10)),
        # u4: days 4..18 -> active within gap -> censored at obs_end, dur 17
        (4, ts(4)), (4, ts(18)),
        # u5: days 1..21 -> censored, duration 20
        (5, ts(1)), (5, ts(21)),
        # u6: days 2..14 -> churned (7-day gap exactly), duration 12
        (6, ts(2)), (6, ts(14)),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r.duration_days: r
        for r in km_survival(events, churn_gap_days=7).collect()
    }
    assert sorted(got) == [2, 8, 12, 17, 20]

    def q6(x):
        return math.floor(1_000_000 * math.log(x))

    # d=2: n=6, 2 churn -> factor ln(4/6)
    r = got[2]
    assert (r.n_at_risk, r.n_events, r.n_censored) == (6, 2, 0)
    assert r.hazard_q6 == (1_000_000 * 2) // 6
    assert r.km_log_q6 == q6(4 / 6) and not r.km_zero
    # d=8: n=4, 1 churn
    r = got[8]
    assert (r.n_at_risk, r.n_events, r.n_censored) == (4, 1, 0)
    assert r.km_log_q6 == q6(4 / 6) + q6(3 / 4)
    # d=12: n=3, 1 churn
    r = got[12]
    assert (r.n_at_risk, r.n_events) == (3, 1)
    assert r.km_log_q6 == q6(4 / 6) + q6(3 / 4) + q6(2 / 3)
    # d=17: censored only -> factor 0, curve flat
    r = got[17]
    assert (r.n_at_risk, r.n_events, r.n_censored) == (2, 0, 1)
    assert r.hazard_q6 == 0
    assert r.km_log_q6 == got[12].km_log_q6
    # d=20: last user censored -> still no zero anywhere
    r = got[20]
    assert (r.n_at_risk, r.n_events, r.n_censored) == (1, 0, 1)
    assert not r.km_zero


def test_km_survival_zero_row_goes_null(spark):
    """When the whole remaining risk set churns at one duration the
    survival product is exactly zero: ln(0) is undefined, so km_log_q6
    must be NULL from that row on and km_zero flips true. A zero needs
    every censored user to exit EARLIER than the final churn duration
    (obs_end always sits >= last churn + gap), so the censored user here
    starts late and lives short."""
    import datetime as dt

    from the_movie_database_import_spark.operators.analytics import km_survival

    def ts(day):
        return dt.datetime(2024, 1, day, 12, 0, 0)

    rows = [
        (8, ts(15)), (8, ts(16)),  # last event = obs_end -> censored, dur 1
        (1, ts(1)), (1, ts(2)),    # churn, dur 1
        (2, ts(1)), (2, ts(9)),    # churn, dur 8
        (3, ts(1)), (3, ts(9)),    # churn, dur 8 -> d=8 risk set {2,3}
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r.duration_days: r
        for r in km_survival(events, churn_gap_days=7).collect()
    }
    assert sorted(got) == [1, 8]
    assert (got[1].n_at_risk, got[1].n_events, got[1].n_censored) == (
        4, 1, 1,
    )
    assert not got[1].km_zero and got[1].km_log_q6 is not None
    r = got[8]
    assert (r.n_at_risk, r.n_events) == (2, 2)
    assert r.km_zero and r.km_log_q6 is None
    assert r.hazard_q6 == 1_000_000
