"""Skew mitigation for shuffle joins ([ext], 100 TB posture: "skewed keys
hurt" — salting spreads a hot key across the cluster).

When the join key has few distinct values (events.event_type: 5 values over
the whole fact table), a shuffle join hashes every row of a hot key into ONE
partition — one straggler task does the whole join while the rest of the
cluster idles. AQE's skew-join split handles moderately skewed SORT-MERGE
joins, but a 5-value key is beyond splitting: the fix is to make the key
finer. Salting joins on (key, salt): the big side gets a deterministic
per-row salt in [0, n_salts), the small side is replicated once per salt
value, and the hot key now occupies n_salts partitions. Broadcast is the
first choice when the small side fits (`F.broadcast`); salting is the tool
when it does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small`` on ``key`` via
    (key, salt): result rows are EXACTLY those of the plain join (each big
    row matches the single replica of its salt), but each hot key's rows
    spread over ``n_salts`` shuffle partitions.

    ``unique_col`` drives the deterministic per-row salt (xxhash64 mod
    n_salts) — any well-distributed column works; correctness never depends
    on the salt values, only parallelism does. The small side is hinted
    SHUFFLE_HASH: salting exists precisely for the case where broadcast is
    off the table, and the replicated small side should be the build side.

    Only big-side-preserving joins are supported: for right/full outer an
    unmatched small-side key would surface once per replica (n_salts
    null-extended rows instead of one), so those modes are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "replicating the small side breaks right/full-outer semantics"
        )
    salt = F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    big_salted = big.withColumn("_salt", salt)
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        big_salted.join(small_salted.hint("shuffle_hash"), [key, "_salt"], how)
        .drop("_salt")
    )
