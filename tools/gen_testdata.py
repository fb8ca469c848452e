#!/usr/bin/env python3
"""Generate the synthetic test tables (TESTDATA.md schemas) so the
repo is standalone: CI and fresh checkouts run `python
tools/gen_testdata.py --out <dir> --sf 0.001 0.01` and get the same
TPC-H-ish star schema + events/documents/embeddings tables the
correctness gate, pytest suite and bench expect.

Schema- and distribution-compatible with the driver-generated data
(same columns/types, same categorical domains, same row-count scaling)
but NOT byte-identical to it — every check that reads these tables is
self-consistent (Spark vs DuckDB over the SAME files; tests assert
behavioral properties), so value equality with the driver's seed is
not required.  Deterministic for a given (sf, seed).

No Spark dependency: numpy + pyarrow only, so the data step of CI is
seconds, not a JVM launch.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["red", "blue", "green", "small", "large", "shiny"]
P_NOUN = ["widget", "bolt", "ring", "gear", "plate", "cog"]
VOCAB = (
    "the a spark table scan join merge sort filter group agg window "
    "row column key value order part line customer batch stream hash "
    "query data big small slow fast dup vector"
).split()


def _counts(sf: float) -> dict[str, int]:
    """Row counts per table, matching the driver's scaling observed at
    sf 0.001 / 0.01 / 0.1 (region/nation fixed; documents/embeddings
    plateau at small scales)."""
    k = sf / 0.001
    return {
        "region": 5,
        "nation": 25,
        "customer": int(150 * k),
        "supplier": max(10, int(10 * k)),
        "part": int(200 * k),
        "orders": int(1500 * k),
        "lineitem": int(6000 * k),
        "events": int(1000 * k),
        "documents": 500 if sf <= 0.01 else int(5000 * (sf / 0.1)),
        "embeddings": 500 if sf <= 0.01 else int(2000 * (sf / 0.1)),
    }


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))


def generate(out: str, sf: float, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    n = _counts(sf)
    rng = np.random.default_rng(seed)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nc), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, nc)],
    }))

    ns = n["supplier"]
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, ns), 2),
    }))

    np_ = n["part"]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(np_), pa.int64()),
        "p_name": [
            f"{P_ADJ[a]} {P_NOUN[b]}"
            for a, b in zip(rng.integers(0, 6, np_), rng.integers(0, 6, np_))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, np_)],
        "p_type": [P_TYPES[i] for i in rng.integers(0, 6, np_)],
        "p_size": pa.array(rng.integers(1, 51, np_), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, np_), 2),
    }))

    no = n["orders"]
    day = np.timedelta64(86400, "s")
    o_dates = np.datetime64("1995-01-01") + day * rng.integers(0, 2405, no)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, no)],
        "o_totalprice": np.round(rng.uniform(100.0, 50000.0, no), 2),
        "o_orderdate": pa.array(o_dates.astype("datetime64[us]"),
                                pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, no)],
    }))

    nl = n["lineitem"]
    l_okey = rng.integers(0, no, nl)
    ship = (o_dates[l_okey].astype("datetime64[D]")
            + day.astype("timedelta64[D]") * rng.integers(1, 96, nl))
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, np_, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 100000.0, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, nl)],
        "l_linestatus": [["F", "O"][i] for i in rng.integers(0, 2, nl)],
        "l_shipdate": pa.array(ship.astype("datetime64[us]"),
                               pa.timestamp("us")),
    }))

    ne = n["events"]
    base = np.datetime64("2024-01-01T00:00:00")
    ts = np.sort(base + np.timedelta64(1, "s") * rng.integers(
        0, 30 * 86400, ne))
    _write(out, "events", pa.table({
        "event_id": pa.array(range(ne), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 150, ne), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, ne)],
        "value": np.round(rng.uniform(0.01, 500.0, ne), 2),
        "props": [json.dumps({"k": int(v)})
                  for v in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    texts = []
    for i in range(nd):
        ln = int(rng.integers(8, 90))
        texts.append(" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), ln)))
        # structural near-dups for the dedup/similarity operator
        # families: every 23rd doc is the previous doc with one word
        # appended, every 41st an exact copy of doc i-2
        if i % 41 == 0 and i >= 2:
            texts[-1] = texts[i - 2]
        elif i % 23 == 0 and i >= 1:
            texts[-1] = texts[i - 1] + " dup"
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(nd), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, nd)],
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n["embeddings"]
    dim, n_clusters = 64, 10
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    labels = rng.integers(0, n_clusters, nv)
    vecs = centers[labels] * 0.2 + rng.normal(0.0, 0.1, (nv, dim))
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(nv), pa.int64()),
        "embedding": pa.array(
            [v.astype("float32") for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.environ.get(
        "SPARK_GRAFT_TESTDATA", "/root/testdata"))
    ap.add_argument("--sf", nargs="+", type=float, default=[0.001, 0.01])
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    for sf in args.sf:
        out = os.path.join(args.out, f"sf{sf:g}")
        generate(out, sf, seed=args.seed)
        print(f"wrote sf{sf:g} -> {out}")


if __name__ == "__main__":
    main()
