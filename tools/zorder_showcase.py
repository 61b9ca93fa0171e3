"""Measure what the Z-ordered parquet layout buys (the 100 TB claim made
concrete, like tools/bucketed_showcase.py does for bucketing): write
lineitem three ways — natural layout, sorted by l_partkey only, and
Z-ordered on (l_partkey, l_suppkey) — then count how many parquet row
groups each layout's min/max statistics let a reader SKIP for
single-dimension and two-dimension box predicates.

Row-group overlap against footer statistics is exactly the pruning
decision Spark's parquet reader makes per row group, so the fraction
measured here is the fraction of 100 TB that would be read.

Usage: python tools/zorder_showcase.py   (JSON line on stdout)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def overlap_fraction(path: str, box: dict[str, tuple[float, float]]) -> float:
    """Fraction of row groups whose [min,max] stats intersect the box on
    EVERY constrained column — the row groups a reader must fetch."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = md.schema.to_arrow_schema().names
        idx = {c: schema_names.index(c) for c in box}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            ok = True
            for c, (lo, hi) in box.items():
                st = g.column(idx[c]).statistics
                if st is None or st.min is None:
                    continue  # no stats -> cannot prune, must read
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            hit += ok
    return hit / total if total else 1.0


def main() -> None:
    from the_movie_database_import_spark.session import get_spark
    from the_movie_database_import_spark.sources.readers import load_table
    from the_movie_database_import_spark.sources.writers import write_zordered

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tmdb-spark-zorder")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem")
    pk_hi = li.agg({"l_partkey": "max"}).first()[0]
    sk_hi = li.agg({"l_suppkey": "max"}).first()[0]
    # 10%-wide boxes anchored mid-range
    pk_box = (0.45 * pk_hi, 0.55 * pk_hi)
    sk_box = (0.45 * sk_hi, 0.55 * sk_hi)

    base = tempfile.mkdtemp(prefix="zorder_showcase_")
    # Small row groups (~256 KiB) emulate the stats granularity of a big
    # table: a 100 TB lineitem has thousands of row groups no matter how
    # the writer is configured; all three layouts get the same knob.
    BLOCK = str(256 * 1024)
    layouts = {
        "natural": lambda df, p: df.write.option(
            "parquet.block.size", BLOCK
        ).parquet(p),
        "sorted_partkey": lambda df, p: (
            df.repartitionByRange(16, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.option("parquet.block.size", BLOCK)
            .parquet(p)
        ),
        "zorder_partkey_suppkey": lambda df, p: write_zordered(
            df, p, ["l_partkey", "l_suppkey"], n_files=16,
            parquet_block_bytes=256 * 1024,
        ),
    }
    queries = {
        "box_partkey": {"l_partkey": pk_box},
        "box_suppkey": {"l_suppkey": sk_box},
        "box_both": {"l_partkey": pk_box, "l_suppkey": sk_box},
    }
    out: dict = {"metric": "zorder_rowgroup_read_fraction", "sf_dir": sf_dir}
    try:
        for name, write in layouts.items():
            p = os.path.join(base, name)
            write(li, p)
            out[name] = {
                q: round(overlap_fraction(p, box), 4) for q, box in queries.items()
            }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
