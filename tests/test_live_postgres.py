"""Live-PostgreSQL validation of the pg dialect in sources/schema.py
(VERDICT r03/r04 residual #1: "PostgreSQL dialect never exercised against a
real PostgreSQL").

The container now ships the PostgreSQL 15 SERVER toolchain but no JDBC
driver jar, so the Spark JDBC data path itself still can't reach pg —
these tests instead execute every rendered statement (bootstrap DDL,
permissive + full-schema staging clones, the rename-swap transaction, the
delete+insert swap transaction) against a REAL postgres via psql, which
upgrades the pg dialect from string-golden-only to server-validated:

- each statement must PARSE and EXECUTE on live pg 15;
- identity pks must assign, FK constraints must enforce (and must survive
  the rename swap on the renamed-in staging table);
- the hazard that justifies the registry's rename→delete_insert fallback
  is demonstrated on the server itself: an inbound FK FOLLOWS the
  referenced table through a rename, so renaming a referenced target away
  would leave referrers pointing at the renamed-away table.

A throwaway cluster (initdb to a tmpdir, unix-socket only, run as an
unprivileged user because postgres refuses root) starts once per module
and is torn down afterwards. Skips cleanly when the server toolchain or
root privileges are absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from the_movie_database_import_spark.sources.schema import (
    TABLES,
    create_table_sql,
    drop_table_sql,
    inbound_fk_referrers,
    rename_table_sql,
    stage_clone_sql,
)

PG_BIN = "/usr/local/bin"
PORT = "5599"


def _have_pg() -> bool:
    return (
        os.geteuid() == 0  # need su to shed root for the server processes
        and shutil.which("su") is not None
        and os.path.exists(os.path.join(PG_BIN, "initdb"))
        and os.path.exists(os.path.join(PG_BIN, "pg_ctl"))
        and shutil.which("psql") is not None
    )


pytestmark = pytest.mark.skipif(
    not _have_pg(), reason="PostgreSQL server toolchain not available"
)


def _as_nobody(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "-s", "/bin/bash", "nobody", "-c", cmd],
        capture_output=True,
        text=True,
        cwd="/tmp",  # nobody cannot chdir into the repo; irrelevant to the cmd
    )


@pytest.fixture(scope="module")
def pg(request, tmp_path_factory):
    base = tempfile.mkdtemp(prefix="pglive_")
    os.chmod(base, 0o777)
    data = os.path.join(base, "data")
    r = _as_nobody(f"{PG_BIN}/initdb -D {data} -A trust -U pguser")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _as_nobody(
        f"{PG_BIN}/pg_ctl -D {data} -l {base}/pg.log "
        f"-o '-p {PORT} -k {base} -c listen_addresses=' start"
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")

    def _teardown():
        _as_nobody(f"{PG_BIN}/pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)

    # registered immediately after a successful start so a failure later in
    # setup (e.g. createdb) still stops the server
    request.addfinalizer(_teardown)
    createdb = shutil.which("createdb") or f"{PG_BIN}/createdb"
    r = _as_nobody(f"{createdb} -h {base} -p {PORT} -U pguser tmdb")
    assert r.returncode == 0, r.stderr

    def run(sql: str, check: bool = True) -> str:
        """One psql invocation = one implicit transaction (multi-statement
        strings commit atomically — exactly how execute_transaction wraps
        the swap)."""
        p = subprocess.run(
            [
                "psql", "-h", base, "-p", PORT, "-U", "pguser", "-d", "tmdb",
                "-v", "ON_ERROR_STOP=1", "-tA", "-c", sql,
            ],
            capture_output=True,
            text=True,
        )
        if check:
            assert p.returncode == 0, f"{sql[:120]} -> {p.stderr[-400:]}"
        elif p.returncode != 0:
            raise RuntimeError(p.stderr)
        return p.stdout.strip()

    return run


@pytest.fixture(scope="module")
def bootstrapped(pg):
    """All 15 registry tables created in registry (FK-safe) order."""
    for t in TABLES:
        pg(create_table_sql(t.name, "postgresql"))
    return pg


def test_bootstrap_identity_and_fk_enforcement(bootstrapped):
    pg = bootstrapped
    pg("INSERT INTO genres (name) VALUES ('Drama'), ('Comedy')")
    assert pg("SELECT id FROM genres ORDER BY id").splitlines() == ["1", "2"]
    pg("INSERT INTO languages (lang_key, name) VALUES ('en', 'English')")
    pg(
        "INSERT INTO movies (title, release_date, budget, revenue, popularity,"
        " runtime, rating, original_language, belongs_to_collection, overview)"
        " VALUES ('M', '2020-01-01', 1, 2, 0.5, 90, 7.5, 1, NULL, 'o')"
    )
    pg("INSERT INTO movies_genres (movie_id, genre_id) VALUES (1, 1)")
    # the rendered FK must actually enforce on live pg
    with pytest.raises(RuntimeError, match="violates foreign key"):
        pg(
            "INSERT INTO movies_genres (movie_id, genre_id) VALUES (1, 999)",
            check=False,
        )


def test_delete_insert_swap_on_referenced_table(bootstrapped):
    """The default swap for FK-referenced targets, as one transaction: the
    permissive staging clone accepts explicit ids, and the DELETE+INSERT
    lands the verified staging contents atomically.

    Live pg also confirms the writers docstring's single-table-scope
    warning VERBATIM: with live referencing rows in movies_genres the
    DELETE aborts on the (non-deferrable) FK — which is why the composed
    ETL bootstraps fresh tables and loads in JDBC_WRITE_ORDER rather than
    swapping a referenced parent under live children."""
    pg = bootstrapped
    stage = "genres__stage"
    pg(stage_clone_sql("genres", stage, "postgresql"))
    # stage carries replacement rows that preserve referenced id 1
    pg(f"INSERT INTO {stage} (id, name) VALUES (1, 'Drama2'), (2, 'Comedy2')")
    swap = (
        "DELETE FROM genres; "
        f"INSERT INTO genres (id, name) SELECT id, name FROM {stage}"
    )
    # documented failure mode, demonstrated on the server: live child rows
    # block the parent DELETE (FK checks are immediate, not deferred)
    with pytest.raises(RuntimeError, match="violates foreign key"):
        pg(swap, check=False)
    assert pg("SELECT name FROM genres WHERE id = 1") == "Drama", (
        "failed swap transaction must roll back atomically"
    )
    pg("DELETE FROM movies_genres")  # the composed flow reloads children after
    pg(swap)
    assert pg("SELECT name FROM genres ORDER BY id").splitlines() == [
        "Drama2",
        "Comedy2",
    ]
    pg(drop_table_sql(stage, "postgresql"))


def test_rename_swap_preserves_schema_and_constraints(bootstrapped):
    """The O(1) rename swap on an FK-FREE target (actors): full-schema
    staging becomes the target through the three-statement transaction, and
    the renamed-in table still enforces ITS OWN outbound FKs and identity."""
    pg = bootstrapped
    assert inbound_fk_referrers("actors") == ()
    pg("INSERT INTO persons (name) VALUES ('P1')")
    pg("INSERT INTO actors (person_id, movie_id, order_id) VALUES (1, 1, 0)")
    stage, old = "actors__stage", "actors__old"
    pg(stage_clone_sql("actors", stage, "postgresql", full_schema=True))
    pg(f"INSERT INTO {stage} (person_id, movie_id, order_id) VALUES (1, 1, 7)")
    pg(
        rename_table_sql("actors", old, "postgresql")
        + "; "
        + rename_table_sql(stage, "actors", "postgresql")
        + "; "
        + drop_table_sql(old, "postgresql")
    )
    assert pg("SELECT order_id FROM actors").splitlines() == ["7"]
    # identity came across with the full-schema stage
    pg("INSERT INTO actors (person_id, movie_id, order_id) VALUES (1, 1, 8)")
    assert pg("SELECT COUNT(*) FROM actors") == "2"
    # and so did the outbound FK constraints
    with pytest.raises(RuntimeError, match="violates foreign key"):
        pg(
            "INSERT INTO actors (person_id, movie_id, order_id) VALUES (999, 1, 9)",
            check=False,
        )


def test_inbound_fk_follows_rename_so_fallback_is_required(bootstrapped):
    """Demonstrate ON THE SERVER the hazard the registry gate exists for:
    renaming a referenced table drags its inbound FK along, so a rename
    swap of `genres` would leave movies_genres referencing the renamed-away
    old table. write_jdbc_exactly_once therefore falls back to
    delete_insert whenever inbound_fk_referrers() is non-empty."""
    pg = bootstrapped
    assert inbound_fk_referrers("genres") == ("movies_genres",)
    pg(rename_table_sql("genres", "genres_renamed", "postgresql"))
    referenced = pg(
        "SELECT confrelid::regclass::text FROM pg_constraint "
        "WHERE conrelid = 'movies_genres'::regclass AND contype = 'f' "
        "AND confrelid = 'genres_renamed'::regclass"
    )
    pg(rename_table_sql("genres_renamed", "genres", "postgresql"))
    assert referenced == "genres_renamed", (
        "pg no longer drags inbound FKs through renames — revisit the "
        "rename-swap fallback gate"
    )
