"""Batch/stream parity: the same window transforms over the events table must
produce identical results via readStream(availableNow) and plain batch
(SURVEY.md §5 test pyramid item 4 — streaming has no DuckDB oracle)."""

from __future__ import annotations

import pandas as pd

from conftest import SF_DIR, assert_frames_match

from the_movie_database_import_spark.sources.readers import load_table
from the_movie_database_import_spark.streaming import (
    dedup_within_watermark,
    run_to_memory,
    session_agg,
    sliding_agg,
    stateful_user_totals,
    stream_events,
    tumbling_agg,
)


def _batch_events(spark):
    # Same shape the stream produces: TimestampType event time.
    ev = load_table(spark, SF_DIR, "events")
    return ev.withColumn("ts", ev.ts.cast("timestamp"))


def test_tumbling_parity(spark):
    stream_out = run_to_memory(
        tumbling_agg(stream_events(spark, SF_DIR)), "t_tumble", "complete"
    ).toPandas()
    batch_out = tumbling_agg(_batch_events(spark)).toPandas()
    assert_frames_match(stream_out, batch_out, "tumbling_parity")


def test_sliding_parity(spark):
    stream_out = run_to_memory(
        sliding_agg(stream_events(spark, SF_DIR)), "t_slide", "complete"
    ).toPandas()
    batch_out = sliding_agg(_batch_events(spark)).toPandas()
    assert_frames_match(stream_out, batch_out, "sliding_parity")


def test_session_parity(spark):
    stream_out = run_to_memory(
        session_agg(stream_events(spark, SF_DIR)), "t_sess", "complete"
    ).toPandas()
    batch_out = session_agg(_batch_events(spark)).toPandas()
    assert_frames_match(stream_out, batch_out, "session_parity")


def test_dedup_within_watermark_keys(spark):
    """Survivor row choice is arrival-order-dependent; the deduped KEY SET is
    deterministic and must equal the batch distinct."""
    stream_out = run_to_memory(
        dedup_within_watermark(stream_events(spark, SF_DIR)), "t_dedup", "append"
    ).toPandas()
    batch_keys = (
        _batch_events(spark).select("user_id", "event_type").distinct().toPandas()
    )
    got = set(map(tuple, stream_out[["user_id", "event_type"]].itertuples(index=False)))
    want = set(map(tuple, batch_keys.itertuples(index=False)))
    assert got == want
    assert len(stream_out) == len(want)  # exactly one survivor per key


def test_stateful_user_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState accumulates per-key state across micro-batches:
    split the events into 4 files, stream them 1 file per trigger, and
    assert each user's LAST emitted running total equals the all-data batch
    aggregate (the q_stateful_user_totals registry twin)."""
    from the_movie_database_import_spark.plans import REGISTRY
    from the_movie_database_import_spark.streaming.windows import _events_raw_schema

    src = str(tmp_path / "events_split")
    load_table(spark, SF_DIR, "events").repartition(4).write.parquet(src)

    # the rewrite above stores ts as native TIMESTAMP_NTZ micros
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_is_long=False))
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_out = run_to_memory(stateful_user_totals(raw), "t_state", "update").toPandas()
    # update mode emits one running-total row per (key, batch); a key's
    # final emission is the one with the highest running count.
    final = (
        stream_out.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()[["user_id", "n_events", "total_cents"]]
    )
    batch_out = REGISTRY["q_stateful_user_totals"].spark_fn(spark, SF_DIR).toPandas()
    assert (stream_out.groupby("user_id").size() > 1).any(), (
        "expected multiple emissions per user across micro-batches"
    )
    assert_frames_match(final, batch_out, "stateful_user_totals")


def test_watermarked_append_equals_batch_twin(spark):
    """Append mode with watermark emits only finalized windows — and for a
    bounded availableNow run, EXACTLY the rows of the oracle-checked batch
    twin q_window_watermark (final watermark = max(ts) - delay, windows with
    end <= watermark). This ties the live streaming operator to the same
    query the external harness hash-gates."""
    from the_movie_database_import_spark.plans import REGISTRY
    from the_movie_database_import_spark.streaming.windows import watermarked_tumbling_agg

    out = run_to_memory(
        watermarked_tumbling_agg(stream_events(spark, SF_DIR)), "t_wm", "append"
    ).toPandas()
    twin = REGISTRY["q_window_watermark"].spark_fn(spark, SF_DIR).toPandas()
    cols = ["window_start", "event_type", "n_events"]
    assert set(map(tuple, out[cols].values)) == set(map(tuple, twin[cols].values))
    # and still a strict subset of the unwatermarked complete result
    full = tumbling_agg(_batch_events(spark)).toPandas()[cols]
    assert len(out) <= len(full)


def test_stream_to_parquet_file_sink(spark, tmp_path):
    """readStream → stateless transform → parquet writeStream (availableNow,
    checkpointed): the durable sink must hold exactly the batch-equivalent
    rows, partitioned for downstream pruning."""
    from pyspark.sql import functions as F

    from the_movie_database_import_spark.streaming import run_to_parquet, stream_events

    stream = stream_events(spark, SF_DIR).select(
        "event_id", "user_id", "event_type", F.to_date("ts").alias("day")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_to_parquet(stream, out, ckpt, partition_by=["event_type"])

    got = spark.read.parquet(out)
    batch = _batch_events(spark).select(
        "event_id", "user_id", "event_type", F.to_date("ts").alias("day")
    )
    assert got.count() == batch.count()
    assert sorted(got.select("event_id").toPandas()["event_id"]) == sorted(
        batch.select("event_id").toPandas()["event_id"]
    )
    # partition columns became directories (pruning keys at scale)
    kinds = [r.event_type for r in batch.select("event_type").distinct().collect()]
    import os
    assert any(d.startswith("event_type=") for d in os.listdir(out)), os.listdir(out)
    assert len([d for d in os.listdir(out) if d.startswith("event_type=")]) == len(kinds)


def test_stream_to_jdbc_exactly_once(spark, tmp_path):
    """readStream → foreachBatch JDBC sink with a transactional batch-id
    ledger: the Derby target must hold exactly the batch-equivalent rows
    after an availableNow run, and a re-run over the same checkpoint must
    not duplicate anything."""
    from the_movie_database_import_spark.sources.schema import execute_statements
    from the_movie_database_import_spark.streaming import run_to_jdbc_exactly_once

    DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
    props = {"driver": DERBY_DRIVER}
    url = f"jdbc:derby:{tmp_path}/stream_xo;create=true"
    execute_statements(
        spark, url,
        ["CREATE TABLE ev (event_id BIGINT, user_id BIGINT, event_type VARCHAR(100))"],
        driver=DERBY_DRIVER,
    )
    stream = stream_events(spark, SF_DIR).select("event_id", "user_id", "event_type")
    ckpt = str(tmp_path / "ckpt")
    run_to_jdbc_exactly_once(stream, url, "ev", ckpt, properties=props)

    def count():
        return (
            spark.read.format("jdbc").option("url", url).option("dbtable", "ev")
            .option("driver", DERBY_DRIVER).load().count()
        )

    want = _batch_events(spark).count()
    assert count() == want
    # restart over the same checkpoint: offsets say everything is consumed
    run_to_jdbc_exactly_once(stream, url, "ev", ckpt, properties=props)
    assert count() == want


def test_jdbc_batch_writer_replay_is_idempotent(spark, tmp_path):
    """The foreachBatch contract replays the last uncommitted batch with the
    SAME batch_id after a failure — the ledger must make the second delivery
    a no-op, while a new batch_id appends."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from the_movie_database_import_spark.sources.schema import execute_statements
    from the_movie_database_import_spark.streaming import (
        jdbc_exactly_once_batch_writer,
    )

    DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
    props = {"driver": DERBY_DRIVER}
    url = f"jdbc:derby:{tmp_path}/replay_xo;create=true"
    execute_statements(
        spark, url, ["CREATE TABLE kv (id BIGINT, val VARCHAR(100))"],
        driver=DERBY_DRIVER,
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("val", StringType())]
    )
    batch = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    sink = jdbc_exactly_once_batch_writer(url, "kv", stream_id="t", properties=props)

    def count():
        return (
            spark.read.format("jdbc").option("url", url).option("dbtable", "kv")
            .option("driver", DERBY_DRIVER).load().count()
        )

    sink(batch, 0)
    assert count() == 2
    sink(batch, 0)  # replayed delivery of the committed batch: must no-op
    assert count() == 2
    sink(batch, 1)  # genuinely new batch appends
    assert count() == 4
    # a separate stream lineage keeps its own ledger
    other = jdbc_exactly_once_batch_writer(url, "kv", stream_id="u", properties=props)
    other(batch, 0)
    assert count() == 6


def test_stream_stream_interval_join_parity(spark):
    """Stream-stream interval join (views -> purchases within 2h, watermarked
    both sides) must equal the batch twin pair-for-pair. Inner join + bounded
    time range means the watermark only EVICTS state, never changes results
    with availableNow delivering everything."""
    from the_movie_database_import_spark.streaming import (
        interval_join_views_to_purchases,
    )

    views = (
        stream_events(spark, SF_DIR)
        .filter("event_type = 'view'")
        .withWatermark("ts", "2 hours")
    )
    purchases = (
        stream_events(spark, SF_DIR)
        .filter("event_type = 'purchase'")
        .withWatermark("ts", "2 hours")
    )
    stream_out = run_to_memory(
        interval_join_views_to_purchases(views, purchases), "t_ssj", "append"
    ).toPandas()

    ev = _batch_events(spark)
    batch_out = interval_join_views_to_purchases(
        ev.filter("event_type = 'view'"), ev.filter("event_type = 'purchase'")
    ).toPandas()
    assert len(batch_out) > 0
    assert_frames_match(stream_out, batch_out, "stream_stream_join_parity")


def test_hash_sample_stream_batch_parity(spark):
    """Deterministic hash sampling composes with Structured Streaming
    unchanged: membership is a pure row-local function, so the SAME
    hash_sample() call applied to the event stream (availableNow) selects
    the IDENTICAL row set as the batch twin — the property that lets a
    streaming ingest pipeline and its batch backfill agree on every
    sampling decision forever."""
    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.sampling import hash_sample
    from the_movie_database_import_spark.sources.readers import load_table

    stream_out = run_to_memory(
        hash_sample(stream_events(spark, SF_DIR), F.col("event_id"), 0.3).select(
            "event_id"
        ),
        "t_sample",
        "append",
    )
    batch = hash_sample(
        load_table(spark, SF_DIR, "events"), F.col("event_id"), 0.3
    ).select("event_id")
    got = sorted(r.event_id for r in stream_out.collect())
    want = sorted(r.event_id for r in batch.collect())
    assert got == want and got


def test_stream_jsonl_matches_batch_scan(spark, tmp_path):
    """Streaming JSONL ingest (availableNow over a drop-folder) produces
    exactly the batch scan_jsonl rows, malformed-line quarantine included."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from the_movie_database_import_spark.sources.readers import scan_jsonl
    from the_movie_database_import_spark.streaming import run_to_memory, stream_jsonl

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "one"}\nnot json\n{"doc_id": 2, "text": "two"}\n'
    )
    (d / "b.jsonl").write_text('{"doc_id": 3, "text": "three"}\n')
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream_out = run_to_memory(
        stream_jsonl(spark, str(d), schema, max_files_per_trigger=1),
        "t_jsonl",
        "append",
    )
    batch = scan_jsonl(spark, str(d), schema)
    key = lambda r: (r.doc_id or -1, r.text or "", r._corrupt_record or "")
    assert sorted(map(key, stream_out.collect())) == sorted(
        map(key, batch.collect())
    )
    assert stream_out.filter("_corrupt_record IS NOT NULL").count() == 1


def test_stream_incremental_dedup_cross_batch_first_wins(spark, tmp_path):
    """Streaming incremental dedup: docs whose digest is in the static
    corpus table never emit; a digest novel in micro-batch 1 suppresses
    its copy in micro-batch 2 (cross-batch dropDuplicates state); the
    emitted set equals the batch operator's is_kept rows over the same
    files."""
    import json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from the_movie_database_import_spark.operators.delta import incremental_dedup
    from the_movie_database_import_spark.sources.readers import scan_jsonl
    from the_movie_database_import_spark.streaming import (
        run_to_memory,
        stream_incremental_dedup,
        stream_jsonl,
    )

    d = tmp_path / "drop"
    d.mkdir()
    # corpus already contains "known"; batch1 brings one known + two novel
    # (one duplicated within the batch); batch2 repeats a batch1 novel and
    # adds one new
    (d / "a.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 10, "text": "known"},
                {"doc_id": 11, "text": "novel-a"},
                {"doc_id": 12, "text": "novel-a"},
                {"doc_id": 13, "text": "novel-b"},
            ]
        )
        + "\n"
    )
    (d / "b.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 20, "text": "novel-a"},
                {"doc_id": 21, "text": "novel-c"},
            ]
        )
        + "\n"
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    from pyspark.sql import functions as F

    seen = spark.createDataFrame([("known",)], "text string").select(
        F.sha2("text", 256).alias("digest")
    )
    stream = stream_jsonl(spark, str(d), schema, max_files_per_trigger=1)
    out = run_to_memory(
        stream_incremental_dedup(stream.select("doc_id", "text"), seen),
        "t_inc_dedup",
        "append",
    )
    got_texts = sorted(r["text"] for r in out.collect())
    assert got_texts == ["novel-a", "novel-b", "novel-c"]
    # within/cross-batch first-wins kept ids; exact winner of the novel-a
    # group depends on micro-batch arrival order, so compare against the
    # batch operator modulo the in-group choice: same digest GROUPS kept
    batch_kept = incremental_dedup(
        scan_jsonl(spark, str(d), schema).select("doc_id", "text"), seen
    ).filter("is_kept")
    assert sorted(r["text"] for r in batch_kept.collect()) == got_texts
    # the corpus-known digest must never emit on either path
    assert "known" not in got_texts


def test_stream_incremental_dedup_state_survives_restart(spark, tmp_path):
    """The within-stream dropDuplicates state must persist across a query
    RESTART via the checkpoint: a text accepted as novel before the stop
    must still be suppressed when its copy arrives after the restart, and
    the parquet sink's exactly-once commit protocol must not re-emit the
    pre-restart output."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from the_movie_database_import_spark.streaming import (
        stream_incremental_dedup,
        stream_jsonl,
    )
    from the_movie_database_import_spark.streaming.windows import run_to_parquet

    d = tmp_path / "drop"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    seen = spark.createDataFrame([("known",)], "text string").select(
        F.sha2("text", 256).alias("digest")
    )

    def run():
        stream = stream_jsonl(spark, str(d), schema)
        run_to_parquet(
            stream_incremental_dedup(stream.select("doc_id", "text"), seen)
            .select("doc_id", "text"),
            out,
            ckpt,
        )

    (d / "a.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "novel-a"}) + "\n"
        + json.dumps({"doc_id": 2, "text": "known"}) + "\n"
    )
    run()  # first incarnation: accepts novel-a, suppresses known
    first = {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}
    assert first == {(1, "novel-a")}

    (d / "b.jsonl").write_text(
        json.dumps({"doc_id": 3, "text": "novel-a"}) + "\n"
        + json.dumps({"doc_id": 4, "text": "novel-b"}) + "\n"
    )
    run()  # restart from the same checkpoint: state must remember novel-a
    rows = [(r.doc_id, r.text) for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == [(1, "novel-a"), (4, "novel-b")], rows


def test_stream_funnel_time_ordered_replay_matches_batch(spark, tmp_path):
    """Incremental stateful funnel: replay the event log as 4 time-range
    micro-batches (the per-user ordered arrival the one-pass fold
    requires) and assert the final per-user progress aggregates to EXACTLY
    the batch funnel's stage census, with users advancing across multiple
    micro-batches along the way."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.analytics import funnel_counts
    from the_movie_database_import_spark.plans.analytics import FUNNEL_STAGES
    from the_movie_database_import_spark.streaming import stream_funnel
    from the_movie_database_import_spark.streaming.windows import _events_raw_schema

    ev = load_table(spark, SF_DIR, "events")
    quart = ev.withColumn(
        "_q", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    src = str(tmp_path / "events_by_time")
    os.makedirs(src)
    for i in range(1, 5):  # sequential writes -> increasing mtimes -> replay order
        stage_dir = str(tmp_path / f"q{i}")
        quart.filter(F.col("_q") == i).drop("_q").coalesce(1).write.parquet(stage_dir)
        part = glob.glob(stage_dir + "/part-*.parquet")[0]
        shutil.copy(part, os.path.join(src, f"{i:03d}.parquet"))
        time.sleep(0.05)

    raw = (
        spark.readStream.schema(_events_raw_schema(ts_is_long=False))
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_to_memory(
        stream_funnel(raw, FUNNEL_STAGES), "t_funnel", "update"
    ).toPandas()
    assert (out.groupby("user_id").size() > 1).any(), (
        "expected multiple emissions per user across micro-batches"
    )
    final = out.sort_values("reached").groupby("user_id", as_index=False).last()
    census = {
        k: int((final["reached"] >= k).sum())
        for k in range(1, len(FUNNEL_STAGES) + 1)
    }
    batch = {
        r["stage_idx"]: r["n_users"]
        for r in funnel_counts(_batch_events(spark), FUNNEL_STAGES).collect()
    }
    assert census == batch


def test_stream_funnel_state_survives_restart(spark, tmp_path):
    """Funnel state (reached, last event time) must persist across a query
    RESTART via the checkpoint: progress earned before the stop carries
    forward (user 1's view lets a later click+purchase finish the funnel),
    and the remembered last-timestamp still rejects an out-of-order event
    after the restart (user 2's stale purchase). Without recovery, batch 2
    alone would leave user 1 at 0 and user 2 unchanged at 2."""
    import datetime

    from the_movie_database_import_spark.streaming import stream_funnel
    from the_movie_database_import_spark.streaming.windows import run_to_parquet

    def t(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    src = str(tmp_path / "events_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, event_type string"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        raw = spark.readStream.schema(schema).parquet(src)
        run_to_parquet(
            stream_funnel(raw, ["view", "click", "purchase"], output_mode="append"),
            out,
            ckpt,
        )

    write_batch([(1, t(0), "view"), (2, t(0), "view"), (2, t(1), "click")])
    run()
    first = {(r.user_id, r.reached) for r in spark.read.parquet(out).collect()}
    assert first == {(1, 1), (2, 2)}

    # batch 2: user 1 completes IF state recovered; user 2's purchase is
    # OLDER than the remembered click timestamp -> must not advance
    write_batch([(1, t(2), "click"), (1, t(3), "purchase"), (2, t(0), "purchase")])
    run()
    latest: dict = {}
    for r in spark.read.parquet(out).collect():
        latest[r.user_id] = max(latest.get(r.user_id, 0), r.reached)
    assert latest == {1: 3, 2: 2}, latest


def test_stream_span_dedup_matches_sequential_batches(spark, tmp_path):
    """Streaming span dedup (foreachBatch maintenance loop): batch 1's
    kept grams join the side table, so batch 2 loses every span batch 1
    already kept; the streamed output equals applying the BATCH
    incremental operator file-by-file with the side table threaded
    through — the side table IS the cross-batch state."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from the_movie_database_import_spark.operators.dedup import (
        dedup_substring_spans_incremental,
        substring_gram_digests,
    )
    from the_movie_database_import_spark.streaming import (
        stream_jsonl,
        stream_span_dedup,
    )

    span = "s1 s2 s3 s4 s5"  # the 5-token span duplicated across batches
    batch1 = [
        {"doc_id": 1, "text": f"a b {span} c d"},      # first occurrence: kept
        {"doc_id": 2, "text": f"x y {span} u v"},      # within-batch dup: stripped
    ]
    batch2 = [
        {"doc_id": 10, "text": f"p q {span} r s"},     # vs batch1 side table: stripped
        {"doc_id": 11, "text": "fresh w1 w2 w3 w4 w5 w6"},  # novel: kept whole
    ]
    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in batch1) + "\n")
    (d / "b.jsonl").write_text("\n".join(json.dumps(r) for r in batch2) + "\n")
    # the file source orders micro-batches by modification time — pin
    # a.jsonl strictly older so batch1 really is the first batch (equal
    # mtimes leave the order unstable)
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(d / "a.jsonl", (now - 60, now - 60))
    _os.utime(d / "b.jsonl", (now, now))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    side = str(tmp_path / "span_grams")
    out = str(tmp_path / "kept")

    stream = stream_jsonl(spark, str(d), schema, max_files_per_trigger=1)
    stream_span_dedup(
        stream.select("doc_id", "text"), side, out,
        str(tmp_path / "ckpt"), k=5,
    )
    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(out).select("doc_id", "text").collect()}

    # sequential-batch reference: thread the side table by hand
    seen = spark.createDataFrame([], "gram_digest string")
    want = {}
    for rows in (batch1, batch2):
        df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        )
        kept = dedup_substring_spans_incremental(df, seen, k=5)
        for r in kept.select("doc_id", "text").collect():
            want[r["doc_id"]] = r["text"]
        seen = seen.unionByName(
            substring_gram_digests(kept, k=5).join(
                seen, "gram_digest", "left_anti"
            )
        ).localCheckpoint()

    assert got == want
    # the cross-batch strip actually happened
    assert got[10] == "p q r s"
    assert got[11] == "fresh w1 w2 w3 w4 w5 w6"
    # the side table holds each digest once (gram appends are idempotent
    # via the anti join)
    side_df = spark.read.parquet(side)
    assert side_df.count() == side_df.distinct().count()


def test_stream_minhash_dedup_matches_sequential_batches(spark, tmp_path):
    """Streaming MinHash near-dup (r11, foreachBatch maintenance loop):
    batch 1's kept docs' band signatures join the side table, so batch 2
    loses every doc near-duplicating batch 1's survivors; the streamed
    output equals threading the BATCH operators file-by-file with the
    keep rule applied in independent python-set logic — the side table
    IS the cross-batch state. Also pins the keep rule itself: within a
    batch the smaller id wins, vs the corpus the corpus always wins, and
    a doc pairing only with an already-dropped batch doc is still
    dropped (the documented conservative one-pass rule)."""
    import json
    import os as _os
    import time as _time

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from the_movie_database_import_spark.operators.dedup import (
        minhash_band_signatures,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )
    from the_movie_database_import_spark.streaming import (
        stream_jsonl,
        stream_minhash_dedup,
    )

    base = " ".join(f"t{i}" for i in range(20))
    near = lambda tag: " ".join(  # noqa: E731 — 19/20 shared, j = 19/21
        [f"t{i}" for i in range(19)] + [tag]
    )
    batch1 = [
        {"doc_id": 1, "text": base},            # kept (first of its cluster)
        {"doc_id": 2, "text": near("x2")},      # within-batch near-dup of 1
        {"doc_id": 3, "text": " ".join(f"u{i}" for i in range(12))},  # novel
    ]
    batch2 = [
        {"doc_id": 10, "text": near("y")},      # vs side table (doc 1): drop
        {"doc_id": 11, "text": " ".join(f"v{i}" for i in range(12))},  # novel
        {"doc_id": 12, "text": batch1[2]["text"]},  # exact dup of kept doc 3
    ]
    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in batch1) + "\n")
    (d / "b.jsonl").write_text("\n".join(json.dumps(r) for r in batch2) + "\n")
    now = _time.time()
    _os.utime(d / "a.jsonl", (now - 60, now - 60))
    _os.utime(d / "b.jsonl", (now, now))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    side = str(tmp_path / "bands")
    out = str(tmp_path / "kept")

    stream = stream_jsonl(spark, str(d), schema, max_files_per_trigger=1)
    stream_minhash_dedup(
        stream.select("doc_id", "text"), side, out,
        str(tmp_path / "ckpt"), threshold=0.8,
    )
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }

    # sequential-batch reference: batch pair operators threaded by hand,
    # keep rule in python-set logic
    seen = None
    want = {}
    for rows in (batch1, batch2):
        df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        )
        if seen is None:
            pairs = minhash_lsh_pairs(df, threshold=0.8)
        else:
            pairs = minhash_lsh_pairs_incremental(df, seen, threshold=0.8)
        bid = {r["doc_id"] for r in rows}
        drop = set()
        for p in pairs.collect():
            if p.doc_b in bid:
                drop.add(p.doc_b)
            if p.doc_a in bid and p.doc_b not in bid:
                drop.add(p.doc_a)
        kept_rows = [r for r in rows if r["doc_id"] not in drop]
        want.update({r["doc_id"]: r["text"] for r in kept_rows})
        kdf = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in kept_rows],
            "doc_id long, text string",
        )
        sigs = minhash_band_signatures(kdf, threshold=0.8)
        seen = sigs if seen is None else seen.unionByName(sigs).localCheckpoint()

    assert got == want
    # the semantics actually exercised: within-batch drop, cross-batch
    # drop via the side table, exact-dup drop of a kept doc, novels kept
    assert set(got) == {1, 3, 11}
    side_df = spark.read.parquet(side)
    assert side_df.count() == side_df.select("doc_id").distinct().count()
    assert set(r["doc_id"] for r in side_df.select("doc_id").collect()) == {
        1, 3, 11,
    }


def test_stream_cusum_matches_batch_operator(spark, tmp_path):
    """Streaming CUSUM parity: split the events into 4 EVENT-TIME-ordered
    chunks (CUSUM is sequential — unlike the totals test, arrival order
    matters), stream one file per trigger, and assert each user's LAST
    emission equals the batch prefix-min operator on all data."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.stats import cusum_per_key
    from the_movie_database_import_spark.streaming.windows import (
        _events_raw_schema,
        stream_cusum,
    )

    ev = load_table(spark, SF_DIR, "events").filter("ts IS NOT NULL")
    days = [r[0] for r in ev.selectExpr("CAST(ts AS DATE) d").distinct().orderBy("d").collect()]
    cuts = [days[len(days) // 4], days[len(days) // 2], days[3 * len(days) // 4]]
    src = str(tmp_path / "events_by_time")
    os.makedirs(src)
    bounds = [(None, cuts[0]), (cuts[0], cuts[1]), (cuts[1], cuts[2]), (cuts[2], None)]
    for i, (lo, hi) in enumerate(bounds):
        chunk = ev
        if lo is not None:
            chunk = chunk.filter(F.col("ts").cast("date") >= F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col("ts").cast("date") < F.lit(hi))
        path = f"{src}/part{i}.parquet"
        chunk.coalesce(1).write.parquet(path)
        # the file source orders by modification time: force ascending
        t = _time.time() + i * 10
        for root, _, files in os.walk(path):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    raw = (
        spark.readStream.schema(_events_raw_schema(ts_is_long=False))
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    stream_out = run_to_memory(stream_cusum(raw), "t_cusum", "update").toPandas()
    final = (
        stream_out.sort_values("n_obs")
        .groupby("user_id", as_index=False)
        .last()
    )
    batch_out = (
        cusum_per_key(ev, target=50.0, slack=10.0, threshold=1000.0)
        .toPandas()
    )
    assert (stream_out.groupby("user_id").size() > 1).any(), (
        "expected multiple emissions per user across micro-batches"
    )
    assert_frames_match(final, batch_out, "stream_cusum")


def test_stream_cusum_nondefault_grid_matches_batch(spark, tmp_path):
    """Non-default ``grid`` parity (regression: xq once hard-coded 1e6
    while kq/hq scaled by ``grid`` — values and thresholds quantized on
    DIFFERENT scales for any grid != 1e6): grid=1e3 on a tiny ordered
    stream must match the batch operator at the same grid, including
    the alarm decision."""
    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.stats import cusum_per_key
    from the_movie_database_import_spark.streaming.windows import (
        _events_raw_schema,
        stream_cusum,
    )

    rows = [
        (i, 1 + (i // 8), f"2024-01-01 00:00:{i % 8:02d}", 55.0 + 3.7 * (i % 5))
        for i in range(24)
    ]
    ev = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        )
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn("event_type", F.lit("view"))
        .withColumn("props", F.lit(None).cast("string"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    src = str(tmp_path / "grid_events")
    ev.coalesce(1).write.parquet(src)
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_is_long=False))
        .parquet(src)
    )
    kw = dict(target=50.0, slack=2.0, threshold=20.0)
    stream_out = run_to_memory(
        stream_cusum(raw, grid=1e3, **kw), "t_cusum_grid", "update"
    ).toPandas()
    batch_out = cusum_per_key(ev, grid=1e3, **kw).toPandas()
    assert_frames_match(stream_out, batch_out, "stream_cusum_grid")
    assert batch_out["alarm"].any()


def test_stream_psi_matches_batch_twin(spark, tmp_path):
    """Streaming PSI parity: freeze a baseline from the first half of
    January, stream the second half in micro-batches, and assert each
    key's LAST emission equals the batch twin over all current-period
    data — integer bin-count state is associative, so micro-batching
    cannot move the statistic (bit-for-bit, shared grid formula). Also
    pins the frozen-bin clamp: serving values outside the baseline's
    [lo, hi] land in the edge bins instead of inventing new ones."""
    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.stats import (
        psi_against_baseline,
        psi_baseline,
        psi_baseline_dict,
    )
    from the_movie_database_import_spark.streaming.windows import (
        _events_raw_schema,
        stream_psi,
    )

    ev = load_table(spark, SF_DIR, "events").filter(
        "ts IS NOT NULL AND value IS NOT NULL"
    )
    cut = "2024-01-16"
    base_df = ev.filter(F.col("ts") < F.lit(cut).cast("timestamp_ntz"))
    cur_df = ev.filter(F.col("ts") >= F.lit(cut).cast("timestamp_ntz"))
    baseline_census = psi_baseline(base_df, "event_type", "value", n_bins=10)
    baseline = psi_baseline_dict(baseline_census)  # the streaming-state form
    assert baseline["hi"] > baseline["lo"] and baseline["keys"]

    src = str(tmp_path / "cur_events")
    cur_df.repartition(4).write.parquet(src)
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_is_long=False))
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_out = run_to_memory(
        stream_psi(raw, baseline), "t_psi", "update"
    ).toPandas()
    final = (
        stream_out.sort_values("n_current")
        .groupby("key", as_index=False)
        .last()
    )
    assert (stream_out.groupby("key").size() > 1).any(), (
        "expected multiple emissions per key across micro-batches"
    )
    # the batch path must stay fully distributed (r13, VERDICT r12 #5):
    # spy that building + executing it never collect()s a census — the
    # only collect is the one the TEST performs on the final result
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    collects: list[int] = []
    orig_collect = CDF.collect
    try:
        CDF.collect = lambda self: collects.append(1) or orig_collect(self)
        batch_df = psi_against_baseline(cur_df, baseline_census, "event_type", "value")
        assert not collects, "psi_against_baseline collected during build"
        batch = batch_df.toPandas()
    finally:
        CDF.collect = orig_collect
    got = {r.key: (r.n_current, r.psi) for r in final.itertuples()}
    want = {r.event_type: (r.n_current, r.psi) for r in batch.itertuples()}
    assert got == want

    # clamp pin: a value far outside [lo, hi] scores into an edge bin —
    # same n_current, finite psi, no error
    wild = spark.createDataFrame(
        [(1, "2024-01-20 00:00:00", 1, "view", 10.0**9, None)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    b2 = psi_against_baseline(wild, baseline_census, "event_type", "value")
    rows2 = {x["event_type"]: x for x in b2.collect()}
    r = rows2["view"]
    assert r["n_current"] == 1 and r["psi"] is not None
    # keys absent from the current period still score (n_current = 0),
    # and every emitted key comes from the baseline
    assert set(rows2) == set(baseline["keys"])
    assert all(x["n_current"] == 0 for k, x in rows2.items() if k != "view")


def test_stream_heavy_hitters_superset_and_exact_recount(spark, tmp_path):
    """Streaming MG tracker parity: stream a seeded Zipf corpus (vocab
    2000 >> per-bucket capacity 40, so evictions really happen) in
    micro-batches; the FINAL per-bucket candidate union must (1) bound
    every candidate's true count inside [count_min, count_max], (2) be a
    superset of the true phi-heavy set, and (3) after an exact recount +
    ceil(phi*N) threshold equal the batch heavy_hitters output exactly —
    the sketch is approximate, the serving answer exact, under any
    micro-batching."""
    import math
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.vocab import heavy_hitters
    from the_movie_database_import_spark.streaming.windows import (
        run_to_memory,
        stream_heavy_hitters,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(2000)]
    weights = [1.0 / (i + 1) for i in range(2000)]
    docs, stream_toks = [], []
    for d in range(400):
        toks = rng.choices(vocab, weights=weights, k=50)
        stream_toks.extend(toks)
        docs.append((d, " ".join(toks)))
    phi = 0.005
    n = len(stream_toks)
    true_counts = Counter(stream_toks)
    thr = math.ceil(phi * n)
    want = {t: c for t, c in true_counts.items() if c >= thr}
    assert want and len(true_counts) > 800

    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "hh_docs")
    df.repartition(6).write.parquet(src)
    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_to_memory(
        stream_heavy_hitters(raw, phi=phi, n_buckets=8, capacity=40),
        "t_hh",
        "update",
    ).toPandas()
    assert (out.groupby("bucket")["n_bucket"].nunique() > 1).any(), (
        "expected multiple emissions per bucket across micro-batches"
    )
    # final emission per bucket = rows carrying that bucket's max n_bucket
    final = out[
        out["n_bucket"]
        == out.groupby("bucket")["n_bucket"].transform("max")
    ]
    cands = dict(zip(final["token"], zip(final["count_min"], final["count_max"])))
    # (1) bounds hold for every surviving candidate
    for t, (lo_, hi_) in cands.items():
        assert lo_ <= true_counts[t] <= hi_, (t, lo_, true_counts[t], hi_)
    # (2) superset of the true heavy set
    missing = set(want) - set(cands)
    assert not missing, missing
    # (3) exact recount of candidates == batch operator output
    recount = {t: c for t, c in true_counts.items() if t in cands and c >= thr}
    batch = {
        r["token"]: r["n_occurrences"]
        for r in heavy_hitters(df, phi=phi).collect()
    }
    assert recount == want == batch


def test_stream_vocab_merge_exactly_once_and_recount_parity(spark, tmp_path):
    from pyspark.sql import functions as F

    """Streaming twin of the incremental vocab merge (r11): batches merged
    through the idempotent writer equal ONE full recount bit-exactly; a
    REPLAYED batch id is skipped wholesale (counts are the one derived
    state where at-least-once is silent corruption — a replayed merge
    would double-count forever); a fresh batch id after the replay still
    commits."""
    import pandas as pd

    from the_movie_database_import_spark.sources.writers import (
        snapshot_current,
        snapshot_read,
    )
    from the_movie_database_import_spark.streaming.sinks import (
        vocab_merge_batch_writer,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(9),
                "text": [
                    "a b c", "a a b", "c d", "e a", "b b b",
                    "d e f", "a", "f f", "g a b",
                ],
            }
        )
    )
    side = str(tmp_path / "vocab_stream")
    writer = vocab_merge_batch_writer(side)
    for bid in (0, 1, 2):
        writer(docs.filter(F.col("doc_id") % 3 == bid), bid)

    def counts():
        return {r.token: r.n for r in snapshot_read(spark, side).collect()}

    recount = {
        r.token: r.cnt
        for r in docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("t", "token")
        .collect()
    }
    assert counts() == recount
    cur = snapshot_current(side)
    assert cur["last_batch_id"] == 2

    # replay batches 1 and 2 (the Structured Streaming restart contract):
    # the ledger recognizes them, counts and generation are untouched
    gen_before = cur["generation"]
    writer(docs.filter(F.col("doc_id") % 3 == 1), 1)
    writer(docs.filter(F.col("doc_id") % 3 == 2), 2)
    assert snapshot_current(side)["generation"] == gen_before
    assert counts() == recount

    # a genuinely new batch still merges and advances the ledger
    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["a z"]})
    )
    writer(extra, 3)
    cur = snapshot_current(side)
    assert cur["last_batch_id"] == 3 and cur["generation"] == gen_before + 1
    want = dict(recount)
    want["a"] = want["a"] + 1
    want["z"] = 1
    assert counts() == want
