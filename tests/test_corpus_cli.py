"""End-to-end test of the corpus curation CLI: compose the proven
operators into sharded training output and verify the census, the shard
layout, and the determinism contract (a re-run writes identical
shards)."""

from __future__ import annotations

import json
import os

from conftest import SF_DIR


def test_corpus_cli_end_to_end(spark, tmp_path, capsys):
    from the_movie_database_import_spark.corpus.__main__ import main

    out = str(tmp_path / "curated")
    rc = main([SF_DIR, "--out", out, "--n-shards", "4"])
    assert rc == 0
    census = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert census["docs_in"] > census["docs_kept"] > 0
    assert census["n_shards"] == 4
    # span-dedup census (VERDICT r07 #6): the stage ran and reported
    # token conservation; a fresh pool may or may not contain >= k-token
    # duplicated spans, so stripped is only bounded, not required > 0
    assert census["span_tokens_in"] >= census["span_tokens_kept"] > 0
    assert census["span_tokens_stripped"] == (
        census["span_tokens_in"] - census["span_tokens_kept"]
    )

    shard_dirs = sorted(
        d for d in os.listdir(f"{out}/shards") if d.startswith("shard=")
    )
    assert shard_dirs == [f"shard={i}" for i in range(4)]
    rows = spark.read.parquet(f"{out}/shards")
    assert rows.count() == census["docs_kept"]
    # curation really ran: no PII-shaped emails survive, no benchmark docs
    assert rows.filter("text LIKE '%@%'").count() == 0
    assert rows.filter("doc_id % 97 = 0").count() == 0
    # determinism: re-run writes the identical (doc_id, shard, pos) layout
    out2 = str(tmp_path / "curated2")
    assert main([SF_DIR, "--out", out2, "--n-shards", "4"]) == 0
    a = sorted(map(tuple, rows.select("doc_id", "shard", "pos").collect()))
    b = sorted(
        map(
            tuple,
            spark.read.parquet(f"{out2}/shards")
            .select("doc_id", "shard", "pos")
            .collect(),
        )
    )
    assert a == b


def test_corpus_cli_span_side_table_loop(spark, tmp_path, capsys):
    """The daily span-dedup maintenance loop: run 1 writes
    <out>/span_grams (the gram-digest side table of the kept pool); run 2
    over the SAME input with --span-grams-in pointing at it must strip
    every >= k-token span (all of them are now 'already in the corpus'),
    leaving each kept doc with fewer than k surviving tokens' worth of
    any duplicated run — concretely: strictly fewer kept tokens than run
    1 whenever run 1 kept any >= k-token content, and a side table that
    gains no digests from run 2's stripped pool."""
    from the_movie_database_import_spark.corpus.__main__ import main

    out1 = str(tmp_path / "day1")
    assert main([SF_DIR, "--out", out1, "--n-shards", "2"]) == 0
    c1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.isdir(f"{out1}/span_grams")
    grams1 = spark.read.parquet(f"{out1}/span_grams")
    n_grams1 = grams1.count()
    assert n_grams1 > 0
    assert grams1.distinct().count() == n_grams1, "side table must be distinct"

    out2 = str(tmp_path / "day2")
    assert main(
        [SF_DIR, "--out", out2, "--n-shards", "2",
         "--span-grams-in", f"{out1}/span_grams"]
    ) == 0
    c2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # same curated pool arrives at the span stage; now every one of its
    # >= k-token spans is in the side table, so kept tokens drop strictly
    assert c2["span_tokens_in"] == c1["span_tokens_in"]
    assert c2["span_tokens_kept"] < c1["span_tokens_kept"]


def test_corpus_cli_audit_gate(spark, tmp_path, capsys):
    """--audit writes <out>/audit.json over the WRITTEN shards and gates
    the exit code: the curated pool (deduped, keyed by doc_id) must pass
    all three checks; the report is the scheduler's load-gate artifact."""
    from the_movie_database_import_spark.corpus.__main__ import main

    out = str(tmp_path / "curated_audited")
    rc = main([SF_DIR, "--out", out, "--n-shards", "2", "--audit"])
    assert rc == 0
    census = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert census["audit_passed"] is True
    report = json.load(open(f"{out}/audit.json"))
    assert {r["check"] for r in report["checks"]} == {
        "not_null(doc_id)",
        "not_null(text)",
        "unique(doc_id)",
    }
    assert all(
        r["passed"] and r["total"] == census["docs_kept"]
        for r in report["checks"]
    )
    # drift profile (VERDICT r06 #6): the gate artifact carries per-column
    # histograms whose bin counts sum to the written pool size
    assert set(report["histograms"]) == {"text_chars", "n_tokens"}
    for col, bins in report["histograms"].items():
        assert bins, f"{col} histogram empty"
        assert sum(b["n"] for b in bins) == census["docs_kept"]
        assert all(b["bin_hi"] >= b["bin_lo"] for b in bins)


def test_corpus_cli_calibrated_keep_stage(spark, tmp_path, capsys):
    """--calibrated-keep 0.5: the per-source cut runs AFTER the global
    floor and the census reports the stage; the kept pool is a strict
    subset of the uncalibrated run's pool and every source that survived
    the floor still has survivors (per-source calibration can't wipe
    out a whole source the way a global cut can)."""
    import json as _json

    from the_movie_database_import_spark.corpus.__main__ import main

    out_a = str(tmp_path / "plain")
    assert main([SF_DIR, "--out", out_a, "--n-shards", "2"]) == 0
    census_a = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out_b = str(tmp_path / "calibrated")
    assert (
        main([SF_DIR, "--out", out_b, "--n-shards", "2",
              "--calibrated-keep", "0.5"])
        == 0
    )
    census_b = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert "docs_after_calibrated_keep" in census_b
    assert 0 < census_b["docs_kept"] < census_a["docs_kept"]
    a_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out_a}/shards").select("doc_id").collect()
    }
    b_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out_b}/shards").select("doc_id").collect()
    }
    assert b_ids < a_ids  # strict subset: the stage only removes


def test_corpus_cli_compaction_preserves_training_order(spark, tmp_path, capsys):
    """--compact-mb: each shard directory collapses to the byte-target
    file count and the census reports it — WITHOUT breaking the sink's
    training-order contract (rows inside each shard still read in pos
    order, the property round-robin compaction would destroy)."""
    import json as _json

    from the_movie_database_import_spark.corpus.__main__ import main

    out = str(tmp_path / "compacted")
    assert (
        main([SF_DIR, "--out", out, "--n-shards", "2", "--compact-mb", "512"])
        == 0
    )
    census = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert census["compaction"]["files_after"] <= census["compaction"]["files_before"]
    assert census["compaction"]["files_after"] == 2  # one file per shard here
    import pyarrow.parquet as pq
    import os

    for i in range(2):
        d = f"{out}/shards/shard={i}"
        files = [
            os.path.join(r, f)
            for r, _, ns in os.walk(d)
            for f in ns
            if f.endswith(".parquet")
        ]
        assert len(files) == 1
        pos = pq.read_table(files[0], columns=["pos"])["pos"].to_pylist()
        assert pos == sorted(pos), "training order must survive compaction"
