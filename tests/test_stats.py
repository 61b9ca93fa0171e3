"""Statistical-census operators (operators/stats.py) and the event
transition/attribution operators: hand-built edge cases with known
closed-form answers (exact lines, alternating series, 2x2 contingency
tables) plus independent python-model parity on the real testdata —
the oracle sweep in test_oracle_parity.py covers the registry queries;
these pin the operator SEMANTICS the SQL comparison can't isolate
(NULL exclusion rules, tie-breaks, degenerate groups)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from the_movie_database_import_spark.operators.analytics import (
    attribution_last_touch,
    event_transitions,
)
from the_movie_database_import_spark.operators.stats import (
    autocorr_lag1,
    chi2_independence,
    regr_trend_per_key,
    welch_ttest,
)

from conftest import SF_DIR

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


# ------------------------------------------------------------- regr trend


def test_regr_trend_exact_line_and_degenerates(spark):
    """An exact line recovers (slope, intercept, r2=1) bit-cleanly; a
    single-point key and a zero-x-variance key yield NULL slope/r2 (the
    'too thin to fit' rows stay in the census); NULL x or y drops the
    pair but not the key."""
    rows = [
        # key 'line': y = 3x + 2 exactly
        ("line", 0.0, 2.0),
        ("line", 1.0, 5.0),
        ("line", 2.0, 8.0),
        ("line", 3.0, 11.0),
        # NULL y: excluded pairwise (n_obs must be 4, not 5)
        ("line", 9.0, None),
        # key 'point': one observation
        ("point", 1.0, 1.0),
        # key 'flat_x': zero x-variance
        ("flat_x", 2.0, 1.0),
        ("flat_x", 2.0, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {
        r["k"]: r
        for r in regr_trend_per_key(df, "k", F.col("x"), F.col("y")).collect()
    }
    assert set(got) == {"line", "point", "flat_x"}
    line = got["line"]
    assert line["n_obs"] == 4
    assert line["slope"] == pytest.approx(3.0, abs=1e-12)
    assert line["intercept"] == pytest.approx(2.0, abs=1e-12)
    assert line["r2"] == pytest.approx(1.0, abs=1e-12)
    assert got["point"]["n_obs"] == 1
    assert got["point"]["slope"] is None
    assert got["flat_x"]["slope"] is None
    assert got["flat_x"]["n_obs"] == 2


# -------------------------------------------------------------- autocorr


def test_autocorr_alternating_and_degenerate(spark):
    """A perfectly alternating series has lag-1 autocorrelation -1; a
    constant series has zero variance -> NULL; n_pairs counts rows with
    a predecessor (first row of each key drops)."""
    rows = []
    for i in range(8):
        rows.append(("alt", i, 1.0 if i % 2 == 0 else -1.0))
    for i in range(5):
        rows.append(("const", i, 4.0))
    df = spark.createDataFrame(rows, "k string, i int, v double")
    got = {r["k"]: r for r in autocorr_lag1(df, "k", ["i"], "v").collect()}
    assert got["alt"]["n_pairs"] == 7
    assert got["alt"]["autocorr"] == pytest.approx(-1.0, abs=1e-12)
    assert got["const"]["n_pairs"] == 4
    assert got["const"]["autocorr"] is None


def test_autocorr_order_cols_define_the_series(spark):
    """The SAME values under a different declared order change the
    statistic — ordering is part of the contract. (REVERSAL is the one
    reorder that provably cannot change it: the consecutive-pair set
    merely swaps roles and Pearson is symmetric — pinned here as the
    invariance it is; a genuine permutation does move the number.)"""
    # series 1,2,4,1 (corr -1/2) — under j the series reads 2,4,1,1
    # (corr -1/sqrt(28)): same multiset, different statistic
    rows = [
        ("k", 1, 3, 1.0),
        ("k", 2, 1, 2.0),
        ("k", 3, 2, 4.0),
        ("k", 4, 4, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, i int, j int, v double")
    nat = autocorr_lag1(df, "k", ["i"], "v").collect()[0]["autocorr"]
    rev = autocorr_lag1(
        df.withColumn("r", -F.col("i")), "k", ["r"], "v"
    ).collect()[0]["autocorr"]
    perm = autocorr_lag1(df, "k", ["j"], "v").collect()[0]["autocorr"]
    assert nat == pytest.approx(rev, abs=1e-12)  # reversal invariance
    assert perm != pytest.approx(nat, abs=1e-6)  # permutation sensitivity


# ------------------------------------------------------------------ chi2


def test_chi2_hand_case_2x2(spark):
    """Known 2x2 table: obs = [[10, 20], [20, 10]] over n=60. Expected
    cells are all 15, so chi2 = 4 * (5^2 / 15) = 20/3; dof = 1."""
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "u string, w string")
    got = chi2_independence(df, "u", "w").collect()[0]
    assert got["n_rows"] == 60
    assert got["n_cells"] == 4
    assert got["dof"] == 1
    assert got["chi2"] == pytest.approx(20.0 / 3.0, abs=1e-9)


def test_chi2_independent_uniform_is_zero(spark):
    """A perfectly product-form table (margins multiply exactly) scores
    chi2 = 0: no dependence signal from a balanced crossing."""
    rows = [(u, w) for u in ("a", "b", "c") for w in ("x", "y") for _ in range(7)]
    df = spark.createDataFrame(rows, "u string, w string")
    got = chi2_independence(df, "u", "w").collect()[0]
    assert got["n_rows"] == 42
    assert got["n_cells"] == 6
    assert got["dof"] == 2
    assert got["chi2"] == pytest.approx(0.0, abs=1e-9)


# ----------------------------------------------------------------- welch


def _welch_model(a: list[float], b: list[float]):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df_w = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return na, nb, ma, mb, t, df_w


def test_welch_hand_case(spark):
    a = [4.0, 5.0, 6.0, 5.5, 4.5]
    b = [1.0, 9.0, 5.0, 7.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b] + [("C", 99.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    na, nb, ma, mb, t, df_w = _welch_model(a, b)
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["mean_a"] == pytest.approx(ma, abs=1e-12)
    assert got["mean_b"] == pytest.approx(mb, abs=1e-12)
    assert got["t_stat"] == pytest.approx(t, abs=1e-12)
    assert got["df_welch"] == pytest.approx(df_w, abs=1e-9)


def test_welch_matches_python_model_on_testdata(spark):
    vals = duckdb.sql(
        f"SELECT event_type, value FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL"
    ).fetchall()
    a = [v for g, v in vals if g == "view"]
    b = [v for g, v in vals if g == "purchase"]
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = welch_ttest(events, "event_type", "value", "view", "purchase").collect()[0]
    na, nb, ma, mb, t, df_w = _welch_model(a, b)
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["t_stat"] == pytest.approx(t, rel=1e-9)
    assert got["df_welch"] == pytest.approx(df_w, rel=1e-9)


def test_welch_degenerate_group_yields_null(spark):
    """A one-observation arm has no sample variance: t and df are NULL,
    the counts and means still report."""
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 5.0)], "g string, v double"
    )
    got = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    assert (got["n_a"], got["n_b"]) == (2, 1)
    assert got["mean_b"] == pytest.approx(5.0)
    assert got["t_stat"] is None
    assert got["df_welch"] is None


def test_welch_two_constant_arms_yield_null(spark):
    """Both arms constant: zero pooled variance, t undefined. Under ANSI
    mode a bare division would raise DIVIDE_BY_ZERO — the operator's
    guard returns NULL (the SQL-standard corr/ratio convention)."""
    df = spark.createDataFrame(
        [("A", 2.0), ("A", 2.0), ("B", 5.0), ("B", 5.0)], "g string, v double"
    )
    got = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    assert (got["n_a"], got["n_b"]) == (2, 2)
    assert got["t_stat"] is None
    assert got["df_welch"] is None


# ----------------------------------------------------- event transitions


def test_transitions_hand_case(spark):
    """user1: A(0) -> B(1) -> A(2); user2: A(0) -> B(1). Transitions:
    A->B twice (p=1.0 from A), B->A once (p=1.0 from B). Each user's
    first event has no predecessor; NULL ts drops; the tie at user2 t=1
    breaks on event_id."""
    rows = [
        (1, 1, _ts(0), "A"),
        (2, 1, _ts(1), "B"),
        (3, 1, _ts(2), "A"),
        (4, 2, _ts(0), "A"),
        (5, 2, _ts(1), "B"),
        (6, 2, None, "Z"),  # NULL ts: excluded entirely
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["prev_type"], r["event_type"]): r for r in event_transitions(df).collect()
    }
    assert set(got) == {("A", "B"), ("B", "A")}
    assert got[("A", "B")]["n_transitions"] == 2
    assert got[("A", "B")]["p_transition"] == pytest.approx(1.0)
    assert got[("B", "A")]["n_transitions"] == 1
    assert got[("B", "A")]["p_transition"] == pytest.approx(1.0)


def test_transitions_tie_breaks_on_event_id(spark):
    """Two events at the SAME timestamp order by event_id — the declared
    deterministic tie-break, so the transition is lower-id -> higher-id."""
    rows = [(10, 1, _ts(0), "A"), (11, 1, _ts(0), "B")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = event_transitions(df).collect()
    assert len(got) == 1
    assert (got[0]["prev_type"], got[0]["event_type"]) == ("A", "B")


def test_transitions_probabilities_row_normalize(spark):
    """On the real event log every prev_type's outgoing probabilities sum
    to 1 (row-stochastic matrix)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = event_transitions(events).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p_transition"]
    assert by_prev and all(
        s == pytest.approx(1.0, abs=1e-9) for s in by_prev.values()
    )


# ------------------------------------------------------------ attribution


def test_attribution_hand_case(spark):
    """view(0) -> purchase(1): credited to view. purchase(2) right after:
    credited to view STILL (purchases never act as touches). user2's
    leading purchase with no prior touch lands in '(none)'."""
    rows = [
        (1, 1, _ts(0), "view", 0.0),
        (2, 1, _ts(1), "purchase", 10.0),
        (3, 1, _ts(2), "purchase", 5.0),
        (4, 2, _ts(0), "purchase", 7.0),
        (5, 2, _ts(1), "click", 0.0),
        (6, 2, _ts(2), "purchase", 3.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["touch_type"]: r for r in attribution_last_touch(df).collect()}
    assert set(got) == {"view", "(none)", "click"}
    assert got["view"]["n_conversions"] == 2
    assert got["view"]["total_value"] == pytest.approx(15.0)
    assert got["(none)"]["n_conversions"] == 1
    assert got["(none)"]["total_value"] == pytest.approx(7.0)
    assert got["click"]["n_conversions"] == 1
    assert got["click"]["total_value"] == pytest.approx(3.0)


def test_attribution_conserves_conversions(spark):
    """Census totals equal the raw conversion count and value — no
    conversion is dropped or double-credited by the window."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = attribution_last_touch(events).collect()
    n = sum(r["n_conversions"] for r in rows)
    v = sum(r["total_value"] for r in rows)
    want = duckdb.sql(
        f"SELECT COUNT(*), SUM(value) FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type = 'purchase' AND ts IS NOT NULL"
    ).fetchone()
    assert n == want[0]
    assert v == pytest.approx(want[1], rel=1e-9)


# ------------------------------------------------------------------ twap


def test_twap_hand_case(spark):
    """value 10 held for 2 s, then 20 for 1 s -> twap = 40/3; the final
    observation carries no duration; n_obs counts observations, span the
    covered microseconds."""
    rows = [
        (1, 1, _ts(0), 10.0),
        (2, 1, _ts(2), 20.0),
        (3, 1, _ts(3), 99.0),  # last: no duration, value never weighted
        (4, 2, _ts(0), 7.0),  # single-observation key: no span, excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    from the_movie_database_import_spark.operators.stats import twap_per_key

    got = {r["user_id"]: r for r in twap_per_key(df).collect()}
    assert set(got) == {1}  # key 2 has no gap at all
    r = got[1]
    assert r["n_obs"] == 3
    assert r["span_us"] == 3_000_000
    assert r["twap"] == pytest.approx(40.0 / 3.0, abs=1e-9)


def test_twap_same_ts_ties_carry_zero_weight(spark):
    """Two observations at the SAME timestamp: whichever orders first
    gets dt = 0, so the tie cannot move the average — the guarantee that
    makes the lead order-insensitive where it matters."""
    rows = [
        (1, 1, _ts(0), 10.0),
        (2, 1, _ts(0), 555.0),  # tie: zero duration either way
        (3, 1, _ts(4), 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    from the_movie_database_import_spark.operators.stats import twap_per_key

    r = twap_per_key(df).collect()[0]
    # 10 for 0s, 555 for 4s? No: tiebreak orders event 1 then 2, so 10
    # carries 0 µs and 555 carries the 4 s to event 3.
    assert r["span_us"] == 4_000_000
    assert r["twap"] == pytest.approx(555.0, abs=1e-6)


def test_twap_partition_invariance(spark):
    """The quantized-integer numerator makes the result independent of
    partitioning — repartition(13) must reproduce the value bit-for-bit
    (the operator's entire determinism claim within one engine)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from the_movie_database_import_spark.operators.stats import twap_per_key

    a = {r["user_id"]: r["twap"] for r in twap_per_key(events).collect()}
    b = {
        r["user_id"]: r["twap"]
        for r in twap_per_key(events.repartition(13)).collect()
    }
    assert a == b  # exact equality, not approx


# ---------------------------------------------------------- gap quantiles


def test_gap_quantiles_hand_case(spark):
    """One user, one type, events at t=0,1,3,6 -> gaps 1,2,3 s: exact
    interpolated quartiles p25=1.5, median=2, p75=2.5. Gaps never span
    users (user 2's lone event contributes nothing)."""
    rows = [
        (1, 1, _ts(0), "buy"),
        (2, 1, _ts(1), "buy"),
        (3, 1, _ts(3), "buy"),
        (4, 1, _ts(6), "buy"),
        (5, 2, _ts(100), "buy"),
        (6, 1, _ts(2), "view"),  # other type: own series, no gaps
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    from the_movie_database_import_spark.operators.stats import gap_quantiles

    got = {r["event_type"]: r for r in gap_quantiles(df).collect()}
    assert set(got) == {"buy"}  # view has no consecutive pair anywhere
    b = got["buy"]
    assert b["n_gaps"] == 3
    assert b["p25_secs"] == pytest.approx(1.5, abs=1e-12)
    assert b["median_secs"] == pytest.approx(2.0, abs=1e-12)
    assert b["p75_secs"] == pytest.approx(2.5, abs=1e-12)


def test_gap_quantiles_isolate_users_and_types(spark):
    """A gap is only counted between the SAME user's consecutive events
    of the SAME type: interleaved other-type events don't split a
    series, and two users' timelines never produce a cross-user gap."""
    rows = [
        (1, 1, _ts(0), "buy"),
        (2, 1, _ts(5), "view"),  # interleaved: buy series unaffected
        (3, 1, _ts(10), "buy"),  # buy gap = 10 s, not 5
        (4, 2, _ts(11), "buy"),  # different user: no 1 s cross-gap
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    from the_movie_database_import_spark.operators.stats import gap_quantiles

    got = {r["event_type"]: r for r in gap_quantiles(df).collect()}
    assert got["buy"]["n_gaps"] == 1
    assert got["buy"]["median_secs"] == pytest.approx(10.0)


# ------------------------------------------------------- calibrated keep


def test_calibrated_keep_matches_python_model(spark):
    """Independent model: collect every document's engine-computed
    quality score, derive each source's 0.75-quantile threshold with the
    same interpolation in pure python, and compare kept id sets."""
    from the_movie_database_import_spark.functions.text import quality_metrics
    from the_movie_database_import_spark.operators.curation import (
        calibrated_quality_keep,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = docs.select(
        "doc_id",
        "source",
        quality_metrics(F.col("text"))["quality_score"].alias("s"),
    ).collect()
    by_src: dict[str, list[tuple[float, int]]] = {}
    for r in scored:
        by_src.setdefault(r["source"], []).append((r["s"], r["doc_id"]))
    want = set()
    for src, pairs in by_src.items():
        vs = sorted(s for s, _ in pairs)
        n = len(vs)
        h = 0.75 * (n - 1)
        lo = int(h // 1)
        v_lo, v_hi = vs[lo], vs[min(lo + 1, n - 1)]
        thr = v_lo + (v_hi - v_lo) * (h - lo)
        want |= {d for s, d in pairs if s >= thr}
    got = {r["doc_id"] for r in calibrated_quality_keep(docs).collect()}
    assert got == want


def test_calibrated_keep_is_per_source_not_global(spark):
    """A mediocre document in a weak source survives its source's cut
    while a better-scoring document in a strong source is dropped — the
    calibration property a global threshold cannot have."""
    from the_movie_database_import_spark.operators.curation import (
        calibrated_quality_keep,
    )

    # Source 'weak': short low-diversity texts; 'strong': long diverse
    # ones. Scores are engine-derived, but ORDER within each source is
    # what the test pins, so exact values don't matter.
    weak = [(i, "weak", "a a a a " + " ".join(f"w{j}" for j in range(i)))
            for i in range(1, 9)]
    strong = [(100 + i, "strong",
               " ".join(f"s{i}_{j}" for j in range(50 + i)))
              for i in range(1, 9)]
    df = spark.createDataFrame(
        [(d, s, t) for d, s, t in weak + strong],
        "doc_id long, source string, text string",
    )
    kept = calibrated_quality_keep(df, keep_frac=0.25).collect()
    by_src: dict[str, set[int]] = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # each source keeps its own top tail — both sources are represented
    assert by_src.get("weak"), "weak source must keep its own best docs"
    assert by_src.get("strong"), "strong source keeps its best too"


def test_calibrated_keep_rejects_non_binary_fraction():
    from the_movie_database_import_spark.operators.curation import (
        calibrated_quality_keep,
    )

    with pytest.raises(ValueError, match="binary fraction"):
        calibrated_quality_keep(None, keep_frac=0.3)


# ------------------------------------------------- rolling distinct (HLL)


def test_rolling_distinct_tracks_exact(spark):
    """The HLL trailing-7-day estimate must sit within 5% of the exact
    trailing distinct for EVERY day (lg_config_k=14 targets ~0.8%
    relative error — asserted loose so the pin never flakes while still
    catching a broken sketch merge or a mis-sized window frame)."""
    from the_movie_database_import_spark.operators.analytics import (
        rolling_distinct_hll,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        r["day"]: (r["users_1d"], r["users_7d"])
        for r in rolling_distinct_hll(events, window_days=7).collect()
    }
    exact = dict(
        duckdb.sql(
            f"""
            WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
                              user_id
                       FROM '{SF_DIR}/events.parquet' WHERE ts IS NOT NULL),
            days AS (SELECT DISTINCT day FROM d)
            SELECT strftime(days.day, '%Y-%m-%d'),
                   COUNT(DISTINCT d.user_id)
            FROM days JOIN d
              ON d.day BETWEEN days.day - INTERVAL 6 DAY AND days.day
            GROUP BY days.day
            """
        ).fetchall()
    )
    assert set(got) == set(exact)
    for day, n_exact in exact.items():
        est = got[day][1]
        assert abs(est - n_exact) <= max(0.05 * n_exact, 2), (
            f"{day}: est {est} vs exact {n_exact}"
        )


def test_rolling_distinct_window_width(spark):
    """Synthetic: 10 fresh users on each of 10 days -> users_1d ~= 10
    every day, users_3d ~= 10, 20, then 30 steady — the frame must span
    exactly (window_days - 1) preceding days, not N."""
    import datetime as dt

    from the_movie_database_import_spark.operators.analytics import (
        rolling_distinct_hll,
    )

    rows = []
    for d in range(10):
        for u in range(10):
            rows.append((d * 10 + u, dt.datetime(2024, 3, 1 + d, 12, 0, 0)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: (r["users_1d"], r["users_3d"])
        for r in rolling_distinct_hll(df, window_days=3).collect()
    }
    assert len(got) == 10
    for i, day in enumerate(sorted(got)):
        one, three = got[day]
        assert one == 10  # tiny cardinalities: HLL is exact here
        assert three == 10 * min(i + 1, 3)


# ----------------------------------------------------------- golden record


def test_golden_record_fields_survive_from_different_rows(spark):
    """The defining MDM property: per field, the latest NON-NULL sighting
    wins, so the merged record combines values from different source
    rows — and a trailing NULL can never shadow an earlier real value."""
    from the_movie_database_import_spark.operators.delta import golden_record

    rows = [
        # (user, order, id, device, country)
        (1, 10, 1, "ios", None),
        (1, 20, 2, None, "de"),   # country arrives later, device NULL
        (1, 30, 3, None, None),   # trailing all-NULL row shadows nothing
        (2, 10, 4, None, None),   # never-observed fields stay NULL
    ]
    df = spark.createDataFrame(
        rows, "u long, o long, i long, device string, country string"
    )
    got = {
        r["u"]: r
        for r in golden_record(df, "u", ["o", "i"], ["device", "country"]).collect()
    }
    assert got[1]["device"] == "ios"
    assert got[1]["country"] == "de"
    assert got[1]["n_versions"] == 3
    assert got[2]["device"] is None
    assert got[2]["country"] is None


def test_golden_record_recency_and_tiebreak(spark):
    """A newer sighting replaces an older one; at an exact order tie the
    higher tiebreak wins (the declared total order)."""
    from the_movie_database_import_spark.operators.delta import golden_record

    rows = [
        (1, 10, 1, "old"),
        (1, 20, 2, "new"),
        (2, 10, 1, "a"),
        (2, 10, 2, "b"),  # tie on order: id 2 wins
    ]
    df = spark.createDataFrame(rows, "u long, o long, i long, v string")
    got = {r["u"]: r["v"] for r in golden_record(df, "u", ["o", "i"], ["v"]).collect()}
    assert got == {1: "new", 2: "b"}


def test_golden_record_matches_window_model(spark):
    """Independent model on the real attribute log: the aggregate
    formulation must equal the textbook last_value-IGNORE-NULLS window
    (the oracle's shape) computed in pure python."""
    import duckdb as _duck

    from the_movie_database_import_spark.operators.delta import golden_record

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    log = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
        F.when(F.col("event_type") == "view", F.get_json_object("props", "$.k")).alias("a"),
    )
    got = {
        r["user_id"]: r["a"]
        for r in golden_record(log, "user_id", ["_us", "event_id"], ["a"]).collect()
    }
    rows = _duck.sql(
        f"""
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'view'
                    THEN json_extract_string(props, '$.k') END AS a
        FROM '{SF_DIR}/events.parquet' WHERE ts IS NOT NULL
        ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    want: dict[int, str | None] = {}
    for u, _, _, a in rows:
        if u not in want:
            want[u] = None
        if a is not None:
            want[u] = a
    assert got == want


# ------------------------------------------------------------------ cusum


def test_cusum_matches_python_fold(spark):
    """The prefix-minimum CLOSED FORM the operator uses must equal the
    textbook recurrence s' = max(0, s + (x - k)) folded in pure python
    over every user's ordered stream — exactly, since both sides are
    integer arithmetic on the same grid."""
    from the_movie_database_import_spark.operators.stats import cusum_per_key

    target, slack, h = 50.0, 10.0, 1000.0
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        r["user_id"]: (r["n_obs"], r["cusum_final_q"], r["cusum_peak_q"], r["alarm"])
        for r in cusum_per_key(events, target, slack, h).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT user_id, CAST(floor(value * 1e6) AS BIGINT) AS vq
        FROM '{SF_DIR}/events.parquet'
        WHERE ts IS NOT NULL AND value IS NOT NULL
        ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    kq, hq = int((target + slack) * 1e6), int(h * 1e6)
    want: dict[int, list] = {}
    for u, vq in rows:
        st = want.setdefault(u, [0, 0, 0])  # n, s, peak
        st[0] += 1
        st[1] = max(0, st[1] + (vq - kq))
        st[2] = max(st[2], st[1])
    assert got == {
        u: (n, s, p, p >= hq) for u, (n, s, p) in want.items()
    }


def test_cusum_detects_planted_shift(spark):
    """A stream sitting at the target never alarms; the same stream with
    a sustained +3-sigma-ish shift accumulates linearly and crosses the
    threshold — and the statistic RESETS to 0 once values drop back."""
    from the_movie_database_import_spark.operators.stats import cusum_per_key

    rows = []
    # user 1: in-control at 50 throughout
    for i in range(20):
        rows.append((i, 1, _ts(i), 50.0))
    # user 2: in-control, then 10 samples at 90 (+30 over slack line),
    # then back to 40 (resets)
    for i in range(10):
        rows.append((100 + i, 2, _ts(i), 50.0))
    for i in range(10):
        rows.append((110 + i, 2, _ts(10 + i), 90.0))
    for i in range(20):
        rows.append((120 + i, 2, _ts(20 + i), 40.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["user_id"]: r
        for r in cusum_per_key(df, target=50.0, slack=10.0, threshold=250.0).collect()
    }
    # user 1: every step adds 50-60 = -10 -> clamped at 0
    assert got[1]["cusum_peak_q"] == 0
    assert not got[1]["alarm"]
    # user 2: 10 steps of +30 -> peak 300 value-units > 250
    assert got[2]["cusum_peak_q"] == 300_000_000
    assert got[2]["alarm"]
    # 20 steps of 40-60 = -20 drain the 300 peak in 15 and clamp at 0
    assert got[2]["cusum_final_q"] == 0


# ---------------------------------------------------- conversion latency


def test_conversion_latency_hand_case(spark):
    """Latency = first purchase STRICTLY after the first view; purchases
    before the first view don't convert; users without views (or without
    any later purchase) are absent; quartiles interpolate exactly."""
    from the_movie_database_import_spark.operators.analytics import (
        conversion_latency,
    )

    rows = [
        # user 1: view at 0, purchases at 10 and 5 -> latency 5
        (1, 1, _ts(0), "view"),
        (2, 1, _ts(10), "purchase"),
        (3, 1, _ts(5), "purchase"),
        # user 2: purchase BEFORE the first view only -> no conversion
        (4, 2, _ts(0), "purchase"),
        (5, 2, _ts(1), "view"),
        # user 3: view at 0, purchase at 0 (same ts, not strictly after)
        (6, 3, _ts(0), "view"),
        (7, 3, _ts(0), "purchase"),
        # user 4: view at 0, purchase at 15 -> latency 15
        (8, 4, _ts(0), "view"),
        (9, 4, _ts(15), "purchase"),
        # user 5: no view at all
        (10, 5, _ts(3), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = conversion_latency(df).collect()[0]
    assert got["n_converted"] == 2
    # latencies {5, 15}: p25 = 7.5, median = 10, p75 = 12.5
    assert got["p25_secs"] == pytest.approx(7.5, abs=1e-9)
    assert got["median_secs"] == pytest.approx(10.0, abs=1e-9)
    assert got["p75_secs"] == pytest.approx(12.5, abs=1e-9)


# ---------------------------------------------------- linear interpolation


def test_interpolate_linear_hand_case(spark):
    """Gap rows fill with the straight line through nearest neighbors;
    observed rows pass through untouched; leading/trailing gaps stay
    NULL (no extrapolation); x distance (not row position) sets the
    weights."""
    from the_movie_database_import_spark.operators.analytics import (
        interpolate_linear,
    )

    rows = [
        ("k", 0, None),    # leading gap: stays NULL
        ("k", 1, 10.0),
        ("k", 2, None),    # fill: 10 + (40-10) * (2-1)/(4-1) = 20
        ("k", 3, None),    # fill: 30
        ("k", 4, 40.0),
        ("k", 6, None),    # trailing gap: stays NULL
    ]
    df = spark.createDataFrame(rows, "k string, x int, y double")
    got = {
        r["x"]: r["y_interp"]
        for r in interpolate_linear(df, "k", "x", "y").collect()
    }
    assert got[0] is None
    assert got[1] == 10.0
    assert got[2] == pytest.approx(20.0, abs=1e-12)
    assert got[3] == pytest.approx(30.0, abs=1e-12)
    assert got[4] == 40.0
    assert got[6] is None


def test_interpolate_linear_uses_x_distance(spark):
    """Unequal x spacing weights the fill: a gap at x=9 between
    observations at x=0 (y=0) and x=10 (y=100) fills to 90, not the
    row-midpoint 50."""
    from the_movie_database_import_spark.operators.analytics import (
        interpolate_linear,
    )

    df = spark.createDataFrame(
        [("k", 0, 0.0), ("k", 9, None), ("k", 10, 100.0)],
        "k string, x int, y double",
    )
    got = {
        r["x"]: r["y_interp"]
        for r in interpolate_linear(df, "k", "x", "y").collect()
    }
    assert got[9] == pytest.approx(90.0, abs=1e-12)


def test_interpolate_linear_single_exchange(spark):
    """Both neighbor windows share one key exchange (same partition +
    order, different frames)."""
    import re as _re

    from the_movie_database_import_spark.plans import REGISTRY

    df = REGISTRY["q_resample_interpolate"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    groups = _re.findall(r"Exchange hashpartitioning\(([^,)#]*)", plan)
    # grid/span machinery adds user-keyed exchanges; the interpolation
    # itself must not add more than one beyond them — pin the total and
    # that every exchange is user-keyed.
    assert all(g.startswith("user_id") for g in groups), groups
    assert plan.count("Window ") == 1, "both neighbor lookups fuse into one window op"


# ------------------------------------------------------ linear attribution


def test_attribution_linear_hand_case(spark):
    """view, click, view then purchase(12): each of the 3 touch
    OCCURRENCES earns 4 (view gets 8 across its two copies but counts
    the conversion ONCE); a leading purchase credits '(none)' in full;
    value conservation holds across the census."""
    from the_movie_database_import_spark.operators.analytics import (
        attribution_linear,
    )

    rows = [
        (1, 1, _ts(0), "view", 0.0),
        (2, 1, _ts(1), "click", 0.0),
        (3, 1, _ts(2), "view", 0.0),
        (4, 1, _ts(3), "purchase", 12.0),
        (5, 2, _ts(0), "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["touch_type"]: r for r in attribution_linear(df).collect()}
    assert set(got) == {"view", "click", "(none)"}
    assert got["view"]["credited_value"] == pytest.approx(8.0)
    assert got["view"]["n_conversions_touched"] == 1  # once, despite 2 shares
    assert got["click"]["credited_value"] == pytest.approx(4.0)
    assert got["(none)"]["credited_value"] == pytest.approx(7.0)
    total = sum(r["credited_value"] for r in got.values())
    assert total == pytest.approx(19.0)  # conservation


def test_attribution_linear_conserves_value_on_testdata(spark):
    """Census credit sums exactly to the raw converted value — the
    invariant equal-split attribution must keep whatever the paths look
    like."""
    from the_movie_database_import_spark.operators.analytics import (
        attribution_linear,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = attribution_linear(events).collect()
    got = sum(r["credited_value"] for r in rows)
    want = duckdb.sql(
        f"SELECT SUM(value) FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type = 'purchase' AND ts IS NOT NULL"
    ).fetchone()[0]
    assert got == pytest.approx(want, rel=1e-9)


def test_conversion_by_deadline_hand_case(spark):
    """Three eligible users (view-first), latencies 30 min / 5 h / none:
    the curve is monotone in the deadline, the denominator counts every
    view-first user (converted or not), and a purchase-only user is not
    eligible."""
    from the_movie_database_import_spark.operators.analytics import (
        conversion_by_deadline,
    )

    rows = [
        (1, 1, _ts(0), "view"),
        (2, 1, _ts(1800), "purchase"),       # 30 min
        (3, 2, _ts(0), "view"),
        (4, 2, _ts(5 * 3600), "purchase"),   # 5 h
        (5, 3, _ts(0), "view"),              # never converts
        (6, 4, _ts(0), "purchase"),          # no view: not eligible
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["deadline_hours"]: r
        for r in conversion_by_deadline(df, deadlines_hours=(1, 6, 24)).collect()
    }
    assert set(got) == {1, 6, 24}
    assert all(r["n_eligible"] == 3 for r in got.values())
    assert got[1]["n_converted_within"] == 1
    assert got[6]["n_converted_within"] == 2
    assert got[24]["n_converted_within"] == 2
    assert got[1]["rate"] == pytest.approx(1 / 3)
    assert got[24]["rate"] == pytest.approx(2 / 3)


# ---------------------------------------------------- temporal dim join


def test_temporal_dim_join_hand_case(spark):
    """Each fact row joins the version covering ITS timestamp: a fact
    inside version 1 gets v1 even though v2 exists by query time; a
    fact at exactly a version boundary joins the NEW version (inclusive
    from, exclusive to); a fact before the first version keeps NULLs
    (left join); at most one match per fact."""
    from the_movie_database_import_spark.operators.analytics import (
        scd2_history,
        temporal_dimension_join,
    )

    attr = spark.createDataFrame(
        [
            (1, 1, _ts(10), "bronze"),
            (2, 1, _ts(20), "gold"),
        ],
        "event_id long, user_id long, ts timestamp, tier string",
    )
    hist = scd2_history(attr, attr_col="tier").drop("is_current")
    fact = spark.createDataFrame(
        [
            (100, 1, _ts(5)),    # before any version -> NULL
            (101, 1, _ts(15)),   # inside v1 -> bronze
            (102, 1, _ts(20)),   # boundary -> gold (exclusive upper)
            (103, 1, _ts(99)),   # open current interval -> gold
        ],
        "fid long, user_id long, ts timestamp",
    )
    got = {
        r["fid"]: (r["dim_value"], r["dim_version"])
        for r in temporal_dimension_join(fact, hist, "user_id", "ts").collect()
    }
    assert got == {
        100: (None, None),
        101: ("bronze", 1),
        102: ("gold", 2),
        103: ("gold", 2),
    }


# --------------------------------------------------------- bootstrap SE


def test_bootstrap_se_tracks_true_sampling_error(spark):
    """Statistical sanity: for an iid sample the bootstrap SE must sit
    near sd/sqrt(n) — assert within a loose factor-2 band per type (32
    replicates give a noisy but unbiased SE estimate; a broken weight
    ladder or replicate wiring lands far outside)."""
    from the_movie_database_import_spark.operators.stats import (
        bootstrap_se_mean,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        r["event_type"]: r
        for r in bootstrap_se_mean(
            events, "event_type", "value", "event_id"
        ).collect()
    }
    stats = duckdb.sql(
        f"""
        SELECT event_type, COUNT(*), AVG(value), STDDEV_SAMP(value)
        FROM '{SF_DIR}/events.parquet' WHERE value IS NOT NULL GROUP BY 1
        """
    ).fetchall()
    for t, n, mean, sd in stats:
        r = got[t]
        assert r["n_rows"] == n
        # the grid floor biases the mean down by < 1e-6
        assert r["mean"] == pytest.approx(mean, abs=2e-6)
        want_se = sd / math.sqrt(n)
        assert want_se / 2 < r["bootstrap_se"] < want_se * 2, (
            t, r["bootstrap_se"], want_se,
        )


def test_bootstrap_se_partition_invariance(spark):
    """Weights are hash-derived and sums are integer — the SE must be
    bit-identical under repartitioning (the whole point of the
    deterministic Poisson bootstrap)."""
    from the_movie_database_import_spark.operators.stats import (
        bootstrap_se_mean,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = {
        r["event_type"]: (r["mean"], r["bootstrap_se"])
        for r in bootstrap_se_mean(events, "event_type", "value", "event_id").collect()
    }
    b = {
        r["event_type"]: (r["mean"], r["bootstrap_se"])
        for r in bootstrap_se_mean(
            events.repartition(17), "event_type", "value", "event_id"
        ).collect()
    }
    assert a == b  # exact, not approx


# ------------------------------------------------------------ a/b lift


def test_ab_funnel_lift_null_experiment_is_quiet(spark):
    """The hash split is independent of behavior by construction, so on
    the real event log the readout is a NULL experiment: |z| must be
    small (< 4 — far looser than any correct-null bound, tight enough to
    catch a wiring bug that correlates arm with conversion), arm sizes
    near 50/50, and counts conserved."""
    from the_movie_database_import_spark.operators.stats import ab_funnel_lift

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    r = ab_funnel_lift(events).collect()[0]
    n = r["n_a"] + r["n_b"]
    assert n > 0
    # binomial balance: |n_a - n_b| ~ Normal(0, sqrt(n)); 5-sigma bound
    # stays meaningful at scale without flaking at the tiny test SF
    # (15 eligible users here — a 3/12 split is ordinary md5 luck)
    assert abs(r["n_a"] - r["n_b"]) <= 5 * math.sqrt(n) + 1
    assert r["conv_a"] <= r["n_a"] and r["conv_b"] <= r["n_b"]
    assert r["lift"] == pytest.approx(r["rate_a"] - r["rate_b"], abs=1e-12)
    if r["z_stat"] is None:
        # degenerate pool (everyone or no one converted): the guard's
        # NULL, only legitimate when the pooled rate is exactly 0 or 1
        pooled = (r["conv_a"] + r["conv_b"]) / n
        assert pooled in (0.0, 1.0)
    else:
        assert abs(r["z_stat"]) < 4.0


def test_ab_funnel_lift_detects_planted_effect(spark):
    """Plant a real effect: arm membership is hash-determined, so build
    a log where users converting is decided by the SAME hash the split
    uses — arm A converts, arm B never does. The readout must show
    rate_a = 1, rate_b = 0 and a large positive z."""
    import hashlib

    from the_movie_database_import_spark.operators.stats import ab_funnel_lift

    rows = []
    for u in range(1, 201):
        bucket = hashlib.md5(str(u).encode()).hexdigest()[:8]
        in_a = bucket < "80000000"
        rows.append((u * 10, u, _ts(0), "view"))
        if in_a:
            rows.append((u * 10 + 1, u, _ts(5), "purchase"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    r = ab_funnel_lift(df).collect()[0]
    assert r["rate_a"] == pytest.approx(1.0)
    assert r["rate_b"] == pytest.approx(0.0)
    assert r["z_stat"] > 5.0


def test_chi2_null_category_is_a_real_level(spark):
    """A NULL level forms real cells that stay IN the statistic (the
    margin joins are null-safe — an equality join would silently drop
    them): 2x2 over (a, b) x (x, NULL) with dependence through the NULL
    column must score chi2 > 0 and count all 4 cells."""
    rows = (
        [("a", "x")] * 10 + [("a", None)] * 2
        + [("b", "x")] * 2 + [("b", None)] * 10
    )
    df = spark.createDataFrame(rows, "u string, w string")
    got = chi2_independence(df, "u", "w").collect()[0]
    assert got["n_rows"] == 24
    assert got["n_cells"] == 4
    # NULL counts as a level in dof too: |A| = 2, |B| = 2 (x + NULL), so
    # dof = (2-1)*(2-1) = 1 — the same grid the chi2 sum ranges over.
    assert got["dof"] == 1
    # chi2 still sums ALL 4 cells: expected 6 everywhere, (10-6)^2/6 * 4
    assert got["chi2"] == pytest.approx(4 * 16 / 6, abs=1e-9)


def test_conversion_latency_empty_census_is_null_row(spark):
    """No converter anywhere: one census row with n=0 and NULL quartiles
    — under ANSI the unguarded interpolation index would error instead."""
    from the_movie_database_import_spark.operators.analytics import (
        conversion_latency,
    )

    df = spark.createDataFrame(
        [(1, 1, _ts(0), "view"), (2, 2, _ts(0), "view")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    r = conversion_latency(df).collect()[0]
    assert r["n_converted"] == 0
    assert r["p25_secs"] is None and r["median_secs"] is None


# ------------------------------------------------------------------ psi
def test_psi_identical_distributions_score_zero(spark):
    """PSI of a distribution against itself is exactly 0: every bin has
    p_cur == p_base, each term is 0 * ln(1) = 0, and floor(0) = 0 on the
    grid — no smoothing artifact leaks in when counts match."""
    from the_movie_database_import_spark.operators.stats import psi_drift

    rows = [("a", float(v), b) for v in range(10) for b in (True, False)]
    df = spark.createDataFrame(rows, "k string, v double, is_base boolean")
    got = psi_drift(df, "k", "v", "is_base", n_bins=10).collect()
    assert len(got) == 1
    assert got[0]["n_baseline"] == 10 and got[0]["n_current"] == 10
    assert got[0]["psi"] == 0.0


def test_psi_matches_python_model_and_ranks_drift(spark):
    """PSI replays the exact smoothed-sparse-census model, and a key whose
    current distribution collapsed into one bin scores far above a key
    that didn't move (the monitoring semantics the statistic exists for).
    Pooled bins: values span [0, 10] across both keys."""
    import math

    from the_movie_database_import_spark.operators.stats import psi_drift

    n_bins = 10
    rows = []
    # key "same": uniform over bins, both sides
    for v in range(10):
        rows += [("same", v + 0.5, True), ("same", v + 0.5, False)]
    # key "moved": baseline uniform, current all in the first bin
    for v in range(10):
        rows.append(("moved", v + 0.5, True))
    rows += [("moved", 0.25, False)] * 10
    rows.append(("edge", 10.0, True))  # pins max; 0.25 pins min via "moved"
    rows.append(("edge", 0.0, True))
    df = spark.createDataFrame(rows, "k string, v double, is_base boolean")
    got = {r["k"]: r for r in psi_drift(df, "k", "v", "is_base", 10).collect()}

    # python model: same pooled lo/hi, same sparse census, same grid
    lo, hi = 0.0, 10.0
    census: dict = {}
    for k, v, b in rows:
        bn = min(n_bins - 1, int((v - lo) * n_bins / (hi - lo)))
        cb, cc = census.get((k, bn), (0, 0))
        census[(k, bn)] = (cb + (1 if b else 0), cc + (0 if b else 1))
    keys = {k for k, _ in census}
    for k in keys:
        tb = sum(cb for (kk, _), (cb, _) in census.items() if kk == k)
        tc = sum(cc for (kk, _), (_, cc) in census.items() if kk == k)
        tq = 0
        for (kk, _), (cb, cc) in census.items():
            if kk != k:
                continue
            p_c = (cc + 1) / (tc + n_bins)
            p_b = (cb + 1) / (tb + n_bins)
            t = (p_c - p_b) * math.log(
                ((cc + 1) * (tb + n_bins)) / ((cb + 1) * (tc + n_bins))
            )
            tq += math.floor(t * 1e6)
        assert got[k]["psi"] == round(tq / 1e6, 6), k
        assert got[k]["n_baseline"] == tb and got[k]["n_current"] == tc
    assert got["moved"]["psi"] > 1.0 > 0.2 > got["same"]["psi"]


def test_psi_grid_safety_on_testdata():
    """The 1e-6 floor grid is hash-safe only if no PSI term sits within
    engine-rounding distance of a grid boundary (the unigram_nll lane:
    a 1-ulp ln() difference perturbs the scaled term by ~1e-10 here).
    Replay the exact term set at every test SF and assert margin."""
    import math

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = duckdb.sql(
            f"""
            WITH base AS (
                SELECT event_type AS k, CAST(value AS DOUBLE) AS v,
                       (ts < TIMESTAMP '2024-01-16') AS b
                FROM '/root/testdata/{sf}/events.parquet'
                WHERE value IS NOT NULL AND ts IS NOT NULL
            ),
            stats AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM base),
            binned AS (
                SELECT k, b,
                       LEAST(9, CAST(FLOOR((v - lo) * 10 / (hi - lo))
                                     AS BIGINT)) AS bin
                FROM base, stats
            ),
            census AS (
                SELECT k, bin,
                       SUM(CASE WHEN b THEN 1 ELSE 0 END) AS cb,
                       SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS cc
                FROM binned GROUP BY k, bin
            ),
            tot AS (SELECT k, SUM(cb) AS tb, SUM(cc) AS tc
                    FROM census GROUP BY k)
            SELECT cb, cc, tb, tc FROM census JOIN tot USING (k)
            """
        ).fetchall()
        assert rows
        for cb, cc, tb, tc in rows:
            p_c = (cc + 1) / (tc + 10)
            p_b = (cb + 1) / (tb + 10)
            v = 1e6 * (p_c - p_b) * math.log(
                ((cc + 1) * (tb + 10)) / ((cb + 1) * (tc + 10))
            )
            dist = abs(v - round(v))
            assert dist > 1e-7, (sf, cb, cc, tb, tc, v, dist)


# ------------------------------------------------------ seasonal z-score
def test_seasonal_zscore_hand_case(spark):
    """Three same-weekday days with totals (5, 10, 15): mean 10, sd 5,
    z = (-1, 0, 1). A weekday whose totals never vary has sd 0 -> NULL z
    (guarded; ANSI would raise). dow is days-since-epoch mod 7 (0 =
    Thursday: 1970-01-01), identical arithmetic on both engines."""
    from the_movie_database_import_spark.operators.stats import (
        seasonal_zscore_daily,
    )

    rows = []
    # Mondays 2024-01-01/08/15 (days 19723/19730/19737; dow = 19723%7 = 4)
    for day, total in [("2024-01-01", 5.0), ("2024-01-08", 10.0),
                       ("2024-01-15", 15.0)]:
        rows.append((1, f"{day} 09:00:00", total))
    # Tuesdays: constant totals -> sd 0 -> NULL z
    for day in ["2024-01-02", "2024-01-09", "2024-01-16"]:
        rows.append((1, f"{day} 09:00:00", 7.0))
    df = spark.createDataFrame(
        rows, "k int, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r["k"], r["day"]): r
        for r in seasonal_zscore_daily(df, "k", "ts", "value").collect()
    }
    assert len(got) == 6
    assert got[(1, "2024-01-01")]["dow"] == 19723 % 7
    assert got[(1, "2024-01-01")]["z_score"] == pytest.approx(-1.0)
    assert got[(1, "2024-01-08")]["z_score"] == pytest.approx(0.0)
    assert got[(1, "2024-01-15")]["z_score"] == pytest.approx(1.0)
    assert got[(1, "2024-01-15")]["dow_mean"] == pytest.approx(10.0)
    assert got[(1, "2024-01-15")]["dow_sd"] == pytest.approx(5.0)
    for day in ["2024-01-02", "2024-01-09", "2024-01-16"]:
        assert got[(1, day)]["z_score"] is None
        assert got[(1, day)]["day_total"] == pytest.approx(7.0)


# ---------------------------------------------------------------- mad
def test_mad_is_robust_to_one_outlier(spark):
    """[1,2,3,4,100]: median 3, MAD 1 — the outlier that would explode a
    stddev moves the robust yardstick not at all. Even-n interpolation:
    [1,2,3,4] -> median 2.5, MAD 1.0 (exact order-statistic lane)."""
    from the_movie_database_import_spark.operators.stats import mad_per_key

    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0, 100.0]] + [
        ("b", v) for v in [1.0, 2.0, 3.0, 4.0]
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in mad_per_key(df, "k", "v").collect()}
    assert got["a"]["n_obs"] == 5
    assert got["a"]["median"] == 3.0 and got["a"]["mad"] == 1.0
    assert got["b"]["median"] == 2.5 and got["b"]["mad"] == 1.0


# ------------------------------------------------- source concentration
def test_source_concentration_uniform_and_dominated(spark):
    """Uniform weights score Gini 0 / HHI 1/n; one group holding 97% of
    the mass scores Gini 0.72 (closed form) with top_share 0.97."""
    from the_movie_database_import_spark.operators.stats import (
        source_concentration,
    )

    uni = spark.createDataFrame(
        [(f"s{i}", 5) for i in range(4)], "g string, w int"
    )
    r = source_concentration(uni, "g", F.col("w")).collect()[0]
    assert r["n_groups"] == 4 and r["total"] == 20
    assert r["gini"] == 0.0 and r["hhi"] == 0.25 and r["top_share"] == 0.25

    dom = spark.createDataFrame(
        [("s0", 1), ("s1", 1), ("s2", 1), ("s3", 97)], "g string, w int"
    )
    r = source_concentration(dom, "g", F.col("w")).collect()[0]
    assert r["top_share"] == 0.97
    # G = 2*(1*1+2*1+3*1+4*97)/(4*100) - 5/4 = 0.72 exactly
    assert r["gini"] == pytest.approx(0.72, abs=1e-9)
    assert r["hhi"] == pytest.approx((1 + 1 + 1 + 97 * 97) / 10000, abs=1e-9)


def test_ks_drift_hand_cases(spark):
    """KS semantics pinned by construction: identical samples score
    exactly 0; disjoint supports score exactly 1; a textbook half-shift
    hand case hits its known sup exactly (integer lane, no tolerance);
    a key missing one side emits NULL (statistic undefined)."""
    from the_movie_database_import_spark.operators.stats import ks_drift

    rows = (
        # "same": identical 4-point samples on both sides -> D = 0
        [("same", float(v), b) for v in (1, 2, 3, 4) for b in (True, False)]
        # "disjoint": baseline all below current -> D = 1
        + [("disjoint", float(v), True) for v in (1, 2)]
        + [("disjoint", float(v), False) for v in (10, 20)]
        # "half": base {1,2,3,4}, cur {3,4,5,6} -> sup at v=2: |2/4 - 0/4| = 0.5
        + [("half", float(v), True) for v in (1, 2, 3, 4)]
        + [("half", float(v), False) for v in (3, 4, 5, 6)]
        # "onesided": no current rows -> NULL
        + [("onesided", 1.0, True)]
    )
    df = spark.createDataFrame(rows, "k string, v double, is_base boolean")
    got = {r["k"]: r for r in ks_drift(df, "k", "v", "is_base").collect()}
    assert got["same"]["ks_d"] == 0.0
    assert got["disjoint"]["ks_d"] == 1.0
    assert got["half"]["ks_d"] == 0.5
    assert got["onesided"]["ks_d"] is None
    assert got["onesided"]["n_baseline"] == 1
    assert got["onesided"]["n_current"] == 0
    assert (got["half"]["n_baseline"], got["half"]["n_current"]) == (4, 4)


def test_ks_drift_matches_scipy_style_model(spark):
    """Exact agreement with an independent python two-sample KS on a
    mixed-tie corpus (ties across sides, duplicates within a side) — the
    census path must weight duplicate values correctly."""
    from the_movie_database_import_spark.operators.stats import ks_drift

    base = [1.0, 1.0, 2.0, 3.0, 5.0, 5.0, 8.0]
    cur = [1.0, 2.0, 2.0, 2.0, 4.0, 8.0, 9.0, 9.0]
    rows = [("k", v, True) for v in base] + [("k", v, False) for v in cur]
    df = spark.createDataFrame(rows, "k string, v double, is_base boolean")
    got = ks_drift(df, "k", "v", "is_base").collect()[0]

    pooled = sorted(set(base) | set(cur))
    nb, nc = len(base), len(cur)
    d_num = max(
        abs(
            sum(1 for x in base if x <= v) * nc
            - sum(1 for x in cur if x <= v) * nb
        )
        for v in pooled
    )
    assert (got["n_baseline"], got["n_current"]) == (nb, nc)
    assert got["ks_d"] == round(d_num / (nb * nc), 6)


def test_mann_whitney_u_hand_and_model_cases(spark):
    """MWU semantics pinned: (1) exact agreement (U and tie-corrected z)
    with an independent python model on a tie-heavy corpus; (2) symmetric
    samples give U = nb*nc/2 and z = 0 exactly; (3) a stochastically
    larger current side gives positive z; (4) all-tied values (zero
    variance) and one-sided keys emit NULL z."""
    import math
    from collections import Counter

    from the_movie_database_import_spark.operators.stats import mann_whitney_u

    def model(base, cur):
        pooled = sorted(Counter(base + cur).items())
        nb, nc, n = len(base), len(cur), len(base) + len(cur)
        prev, r2, t3 = 0, 0, 0
        curc = Counter(cur)
        for v, c in pooled:
            r2 += curc.get(v, 0) * (2 * prev + c + 1)
            t3 += c * c * c - c
            prev += c
        u = (r2 - nc * (nc + 1)) / 2.0
        var = nb * nc / 12.0 * ((n + 1) - t3 / (n * (n - 1)))
        z = (
            round((r2 - nc * (nc + 1) - nb * nc) / (2.0 * math.sqrt(var)), 6)
            if nb and nc and var > 0
            else None
        )
        return u, z

    cases = {
        "ties": ([1.0, 2.0, 2.0, 3.0, 5.0], [2.0, 3.0, 3.0, 4.0, 6.0, 6.0]),
        "sym": ([1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]),
        "shift": ([1.0, 2.0, 3.0, 4.0], [10.0, 11.0, 12.0, 13.0]),
        "const": ([5.0, 5.0, 5.0], [5.0, 5.0]),
    }
    rows = [
        (k, v, is_base)
        for k, (b, c) in cases.items()
        for vals, is_base in ((b, True), (c, False))
        for v in vals
    ]
    df = spark.createDataFrame(rows, "k string, v double, is_base boolean")
    df = df.union(
        spark.createDataFrame(
            [("onesided", 1.0, True)], "k string, v double, is_base boolean"
        )
    )
    got = {r["k"]: r for r in mann_whitney_u(df, "k", "v", "is_base").collect()}

    for k, (b, c) in cases.items():
        u, z = model(b, c)
        assert got[k]["u_current"] == u, k
        assert got[k]["z"] == z, k
    assert got["sym"]["u_current"] == 8.0 and got["sym"]["z"] == 0.0
    assert got["shift"]["u_current"] == 16.0 and got["shift"]["z"] > 2
    assert got["const"]["z"] is None  # zero variance: all values tied
    assert got["onesided"]["z"] is None
    # cross-check the shift z against the textbook untied closed form
    assert got["shift"]["z"] == round(
        (16.0 - 8.0) / math.sqrt(4 * 4 * 9 / 12.0), 6
    )


def test_winsorized_mean_outlier_immunity_and_hand_case(spark):
    """Winsorized-mean semantics: (1) on {1..8} + one 1000x outlier the
    winsorized mean stays inside the quartile band while the raw mean is
    dragged past every data point but the outlier; (2) exact hand values
    for a small key (quartile interpolation + clamp replayed in python);
    (3) outlier-free symmetric data: winsorized == raw == center."""
    from the_movie_database_import_spark.operators.stats import (
        winsorized_mean_per_key,
    )

    spiked = [float(v) for v in range(1, 9)] + [8000.0]
    rows = (
        [("spiked", v) for v in spiked]
        + [("sym", v) for v in (1.0, 2.0, 3.0, 4.0, 5.0)]
    )
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in winsorized_mean_per_key(df, "k", "v").collect()}

    # python replay (h = q*(n-1), interpolate, clamp, mean)
    def replay(xs):
        xs = sorted(xs)
        n = len(xs)

        def interp(q):
            h = q * (n - 1)
            lo = int(h // 1)
            return xs[lo] + (xs[min(lo + 1, n - 1)] - xs[lo]) * (h - lo)

        q1, q3 = interp(0.25), interp(0.75)
        w = [min(max(x, q1), q3) for x in xs]
        return q1, q3, round(sum(xs) / n, 6), round(sum(w) / n, 6)

    q1, q3, raw, wins = replay(spiked)
    s = got["spiked"]
    assert (s["q1"], s["q3"]) == (round(q1, 6), round(q3, 6))
    assert (s["mean_raw"], s["mean_winsorized"]) == (raw, wins)
    assert s["mean_raw"] > 800            # dragged by the spike
    assert q1 <= s["mean_winsorized"] <= q3  # immune: stays in the band
    assert got["sym"]["mean_winsorized"] == got["sym"]["mean_raw"] == 3.0
