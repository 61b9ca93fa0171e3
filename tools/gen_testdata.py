"""Generate a workload-equivalent testdata tier at an arbitrary scale factor.

The driver ships sf{0.001,0.01,0.1} under /root/testdata (read-only; its
generator is not published). For scale-linearity evidence the bench needs a
tier 10x past the largest shipped one, so this tool synthesizes an
sf-parameterized dataset with the SAME schemas, key ranges, and value
distributions measured from the shipped tiers (seed 42, deterministic):

- TPC-H-ish star: region(5) nation(25) customer(150k/sf) supplier(10k/sf)
  part(200k/sf) orders(1.5M/sf) lineitem(~6M/sf: 1+Poisson(3) lines/order)
- events: 1M/sf rows, 15k/sf users, 30 days of Jan 2024, value ~ Exp(50),
  props = {"k": uniform 0..99}
- documents: 50k/sf bags of 10..100 words over the shipped 31-word
  vocabulary (incl. the 'vector merge' bigram the trgm query probes),
  ~0.2% exact-duplicate injection, lang {en 41%, others ~15%}, 20 sources;
  tiers past sf0.1 grow the vocabulary by Heaps' law (see _vocab_for_sf)
  so near-dup pair density stays ~constant per doc (VERDICT r09 #6)
- embeddings: 20k/sf unit-norm 64-dim Gaussian vectors, label uniform 0..9
  (no label-cluster structure — matches the shipped tiers)

NOT byte-identical to a driver-generated tier of the same sf — the oracle
gate stays on the shipped tiers; this one exists for bench/linearity only.

Usage: python tools/gen_testdata.py [--sf 1.0] [--out testdata_local/sf1.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]


def _vocab_for_sf(sf: float) -> "np.ndarray":
    """Document vocabulary for a tier (VERDICT r09 #6 — testdata realism):
    the shipped tiers (sf <= 0.1) use a FIXED 31-word vocabulary, which
    makes random-pair Jaccard similarity grow with corpus size — at sf1.0
    the 50k-doc corpus emitted 289.6M near-dup pairs (98.6x for 10x rows),
    a data artifact, not a plan property. Real corpora add vocabulary as
    they add documents (Heaps' law, V ~ n^beta with beta ~0.5), so tiers
    PAST the largest shipped one grow the vocab by sqrt(sf/0.1): at sf1.0
    that is ~98 words, where the longest (100-token) random doc pair tops
    out near Jaccard ~0.46 — far under the 0.8 dedup threshold — so
    above-threshold pairs come only from the injected exact duplicates
    (~0.2% of docs), keeping emitted pairs ~linear in rows. Tiers at or
    below sf0.1 are byte-unchanged (base vocab only), preserving
    workload-equivalence with the shipped data."""
    base = np.array(VOCAB)
    if sf <= 0.1:
        return base
    target = int(round(len(base) * (sf / 0.1) ** 0.5))
    extra = [f"w{i:04d}" for i in range(target - len(base))]
    return np.concatenate([base, np.array(extra)])
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "MACHINERY", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "hot", "small", "cold", "new", "old", "large", "red"]
P_NOUN = ["ring", "rod", "bolt", "anvil", "widget", "gear", "plate", "cog"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_range(rng, n, lo, hi):
    us = rng.integers(lo, hi, n)
    return pa.array(us, type=pa.timestamp("us"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = args.sf
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_local",
        f"sf{sf:g}",
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    print(f"generating sf={sf} -> {out}")

    # -- region / nation (fixed) --------------------------------------
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))

    # -- customer ------------------------------------------------------
    n_cust = int(150_000 * sf)
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), type=pa.int32()
        ),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    # -- supplier --------------------------------------------------------
    n_supp = int(10_000 * sf)
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp), type=pa.int32()
        ),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # -- part ------------------------------------------------------------
    n_part = int(200_000 * sf)
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array(
            [f"Brand#{i}" for i in range(1, 26)]
        )[rng.integers(0, 25, n_part)],
        "p_type": np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    # -- orders ------------------------------------------------------------
    n_ord = int(1_500_000 * sf)
    date_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    date_hi = np.datetime64("2001-08-02").astype("datetime64[us]").astype(np.int64)
    day_us = 86_400_000_000
    o_dates = (
        rng.integers(date_lo // day_us, date_hi // day_us, n_ord) * day_us
    )
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord), type=pa.int64()
        ),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(o_dates, type=pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # -- lineitem (1 + Poisson(3) lines per order) -------------------------
    lines_per = 1 + rng.poisson(3.0, n_ord)
    n_li = int(lines_per.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    l_linenumber = (
        np.arange(n_li, dtype=np.int64)
        - np.repeat(np.cumsum(lines_per) - lines_per, lines_per)
        + 1
    ).astype(np.int32)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    rf_ls = np.array(["A|F", "A|O", "N|F", "N|O", "R|F", "R|O"])[
        rng.integers(0, 6, n_li)
    ]
    ship_dates = np.repeat(o_dates, lines_per) + (
        rng.integers(1, 96, n_li) * day_us
    )
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(l_linenumber, type=pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array([s[0] for s in rf_ls]),
        "l_linestatus": np.array([s[2] for s in rf_ls]),
        "l_shipdate": pa.array(ship_dates, type=pa.timestamp("us")),
    }))

    # -- events -----------------------------------------------------------
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    ev_lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ev_hi = np.datetime64("2024-01-31").astype("datetime64[us]").astype(np.int64)
    ts = np.sort(rng.integers(ev_lo, ev_hi, n_ev))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), type=pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": np.array(
            [f'{{"k": {k}}}' for k in range(100)]
        )[rng.integers(0, 100, n_ev)],
    }))

    # -- documents -------------------------------------------------------
    n_doc = int(50_000 * sf)
    vocab = _vocab_for_sf(sf)
    lengths = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lengths
    ]
    # ~0.2% exact-duplicate injection (matches the shipped tiers' rate)
    n_dup = max(1, n_doc // 500)
    dup_to = rng.integers(0, n_doc, n_dup)
    dup_from = rng.integers(0, n_doc, n_dup)
    for i, j in zip(dup_to, dup_from):
        texts[int(i)] = texts[int(j)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)
        ],
        "source": np.array(
            [f"src{i}" for i in range(20)]
        )[rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64)
        ),
    }))

    # -- embeddings --------------------------------------------------------
    n_emb = int(20_000 * sf)
    V = rng.standard_normal((n_emb, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(V), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), type=pa.int32()),
    }))
    print("done")


if __name__ == "__main__":
    main()
