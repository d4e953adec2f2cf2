"""Deterministic same-schema testdata generator for stress SFs.

The driver ships read-only parquet at sf0.001/0.01/0.1
(``/root/testdata``); invariants that only break past sf0.1 (e.g. the
round(double, n) half-boundary bug, which needed sf0.1 to surface —
CLAUDE.md) demand a bigger gate. This produces the same ten tables with
the same schemas and the same *shape* (near-dup document structure,
clustered embeddings, star-schema keys) at any SF into a local dir —
exact values need not match the driver's generator, because the oracle
gate compares Spark vs DuckDB *on the same files*.

Usage:
    python tools/gen_testdata.py 1.0 /root/repo/.localdata/sf1

Scaling (rows = base * sf, matching the shipped dirs):
    lineitem 6M, orders 1.5M, customer 150k, part 200k, supplier 10k,
    events 1M (15k users), documents 50k, embeddings 50k; nation 25 and
    region 5 fixed.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "PROMO"]
ADJS = ["small", "red", "blue", "green", "large", "shiny", "matte", "old"]
NOUNS = ["ring", "widget", "bolt", "gear", "cog", "pin", "valve", "rotor"]
EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_W = [0.44, 0.15, 0.15, 0.13, 0.13]
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "a the line sort window join data query vector filter group column "
    "customer small stream order big"
).split()

MICROS_DAY = 86_400_000_000


def _write(path: str, name: str, cols: dict, schema: pa.Schema) -> None:
    table = pa.table(cols, schema=schema)
    pq.write_table(table, os.path.join(path, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    lines_per = 4
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(50_000 * sf)

    _write(
        out_dir,
        "region",
        {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS},
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    _write(
        out_dir,
        "nation",
        {
            "n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32),
        },
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
    )
    _write(
        out_dir,
        "customer",
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
            "c_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    _write(
        out_dir,
        "supplier",
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
            "s_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_supp), 2),
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )
    _write(
        out_dir,
        "part",
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [
                f"{ADJS[i % 8]} {NOUNS[(i // 8) % 8]}" for i in range(n_part)
            ],
            "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
            "p_type": np.array(PTYPES)[rng.integers(0, 5, n_part)],
            "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
            "p_retailprice": np.round(rng.uniform(900.0, 2000.0, n_part), 2),
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )

    # orders: dates at day granularity over 1995-01-01 .. 2001-08-01.
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    n_days = int(
        (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    )
    odate_us = d0 + rng.integers(0, n_days + 1, n_ord) * MICROS_DAY
    _write(
        out_dir,
        "orders",
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord, dtype=np.int64),
            "o_orderstatus": np.array(["O", "F", "P"])[
                rng.choice(3, n_ord, p=[0.45, 0.45, 0.10])
            ],
            "o_totalprice": np.round(rng.uniform(1000.0, 400_000.0, n_ord), 2),
            "o_orderdate": odate_us.astype("datetime64[us]"),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    n_li = n_ord * lines_per
    ship_us = np.repeat(odate_us, lines_per) + rng.integers(
        1, 122, n_li
    ) * MICROS_DAY
    _write(
        out_dir,
        "lineitem",
        {
            "l_orderkey": np.repeat(np.arange(n_ord, dtype=np.int64), lines_per),
            "l_partkey": rng.integers(0, n_part, n_li, dtype=np.int64),
            "l_suppkey": rng.integers(0, n_supp, n_li, dtype=np.int64),
            "l_linenumber": np.tile(
                np.arange(1, lines_per + 1, dtype=np.int32), n_ord
            ),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900.0, 100_000.0, n_li), 2),
            "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
            "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
            "l_shipdate": ship_us.astype("datetime64[us]"),
        },
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )

    # events: one January of activity, microsecond timestamps.
    e0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = e0 + rng.integers(0, 30 * MICROS_DAY, n_events)
    _write(
        out_dir,
        "events",
        {
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": np.sort(ts).astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, n_events, dtype=np.int64),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)],
            "value": np.round(rng.uniform(0.01, 500.0, n_events), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )

    # documents: ~80% independent word salads, ~20% near-dup mutations
    # of an earlier doc (1-3 word edits) so dedup/cluster queries have
    # real work at every SF.
    texts: list[str] = []
    vocab_arr = np.array(VOCAB)
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.2:
            base = texts[int(rng.integers(0, i))].split()
            for _ in range(int(rng.integers(1, 4))):
                base[int(rng.integers(0, len(base)))] = str(
                    vocab_arr[int(rng.integers(0, len(vocab_arr)))]
                )
            texts.append(" ".join(base))
        else:
            n_words = int(rng.integers(10, 111))
            texts.append(" ".join(vocab_arr[rng.integers(0, len(vocab_arr), n_words)]))
    _write(
        out_dir,
        "documents",
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, n_docs, p=LANG_W)],
            "source": [f"src{s}" for s in rng.integers(0, 20, n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )

    # embeddings: 10 Gaussian clusters in R^64, values ~ ±0.37 like the
    # shipped data, float32 lists.
    centroids = rng.normal(0.0, 0.08, (10, 64))
    labels = rng.integers(0, 10, n_vecs, dtype=np.int32)
    vecs = (centroids[labels] + rng.normal(0.0, 0.05, (n_vecs, 64))).astype(
        np.float32
    )
    _write(
        out_dir,
        "embeddings",
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": labels,
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    with open(os.path.join(out_dir, "GENERATED.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "generator": "tools/gen_testdata.py"}, f)


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", ".localdata", f"sf{sf:g}")
    )
    generate(sf, out)
    print(f"wrote sf={sf} to {out}")
