"""Oracle-parity harness: mimic the driver's CORRECTNESS check locally.

Runs every ``queries()`` entry at the given SF dir in Spark AND its
``oracle_sql()`` in DuckDB (views pre-registered over the same parquet),
then compares row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ig_etl_sync_spark.session import get_spark
from ig_etl_sync_spark.sources.catalog import TABLES

import __spark_entry__ as entrymod


def normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, rows by value."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        # Exact compare, floats included: queries must round IN-ENGINE
        # (both sides) — no slack here, mirroring a strict value-hash.
        out.append(tuple(repr(r[i]) for i in idx))
    out.sort()
    return out


_SPARK_TYPE_TOKEN = {
    # All plain int widths group to one token: the driver's value-hash
    # renders them identically. Only the HUGEINT fingerprint (int128,
    # which DuckDB→pandas silently converts to float64) must stand out.
    "tinyint": "int", "smallint": "int", "int": "int",
    "bigint": "int", "float": "float32", "double": "float64",
    "string": "string", "boolean": "bool", "date": "date",
    "binary": "binary",
}


def spark_type_tokens(schema):
    """Canonical per-column type tokens from a Spark schema."""
    toks = {}
    for f in schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("array"):
            toks[f.name] = "array"
        elif s.startswith("timestamp"):
            toks[f.name] = "timestamp"
        elif s.startswith("decimal"):
            toks[f.name] = s  # decimal(p,s) compared literally
        else:
            toks[f.name] = _SPARK_TYPE_TOKEN.get(s, s)
    return toks


def duck_type_tokens(arrow_schema):
    """Canonical per-column type tokens from DuckDB's Arrow export.

    The critical case: DuckDB integer ``sum()`` returns HUGEINT, which
    Arrow exports as decimal128(38,0) — a token no Spark column ever
    produces, so the mismatch is caught here (fetchall() would silently
    collapse it to Python int and hide it; see VERDICT r01 root cause).
    """
    import pyarrow as pa

    toks = {}
    for field in arrow_schema:
        t = field.type
        if pa.types.is_decimal(t):
            if t.precision == 38 and t.scale == 0:
                toks[field.name] = "int128"  # HUGEINT fingerprint
            else:
                toks[field.name] = f"decimal({t.precision},{t.scale})"
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            toks[field.name] = "array"
        elif pa.types.is_timestamp(t):
            toks[field.name] = "timestamp"
        elif pa.types.is_date(t):
            toks[field.name] = "date"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            toks[field.name] = "string"
        elif pa.types.is_boolean(t):
            toks[field.name] = "bool"
        elif pa.types.is_integer(t):
            toks[field.name] = "int"
        elif pa.types.is_float64(t):
            toks[field.name] = "float64"
        elif pa.types.is_float32(t):
            toks[field.name] = "float32"
        else:
            toks[field.name] = str(t)
    return toks


def main() -> int:
    argv = list(sys.argv[1:])
    skip: set[str] = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    # names may be space- and/or comma-separated; reject unknown names
    # loudly (a typo'd filter must not report a vacuous green)
    only = {n for a in argv[1:] for n in a.split(",") if n}
    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2

    # SPARK_GRAFT_CHECK_PARTS simulates other planners (e.g. the
    # driver's vanilla session defaults to 200 shuffle partitions) —
    # results must be partition-count-independent.
    parts = int(os.environ.get("SPARK_GRAFT_CHECK_PARTS", "8"))
    spark = get_spark(master="local[8]", shuffle_partitions=parts)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name:32s} rows-only: {len(srows):7d} rows   [{t_spark:5.1f}s]")
            continue
        t0 = time.monotonic()
        res = con.execute(oracles[name])
        otable = res.arrow()
        ocols = otable.schema.names
        orows = [tuple(d.values()) for d in otable.to_pylist()]
        t_duck = time.monotonic() - t0

        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            stoks = spark_type_tokens(sdf.schema)
            dtoks = duck_type_tokens(otable.schema)
            skew = {
                c: (stoks[c], dtoks[c]) for c in stoks if stoks[c] != dtoks[c]
            }
            if skew:
                status.append(f"TYPE-SKEW {skew}")
        if len(srows) != len(orows):
            status.append(f"COUNT spark={len(srows)} duck={len(orows)}")
        if not status:
            sn = normalize([tuple(r) for r in srows], scols)
            on = normalize(orows, ocols)
            if sn != on:
                diffs = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b]
                sample = [(sn[i], on[i]) for i in diffs[:3]]
                status.append(f"VALUES {len(diffs)} differing rows, e.g. {sample}")
        if status:
            failures.append(name)
            print(f"  {name:32s} FAIL  {' | '.join(status)[:500]}")
        else:
            print(
                f"  {name:32s} OK    {len(srows):7d} rows   [spark {t_spark:5.1f}s, duck {t_duck:5.2f}s]"
            )

    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        return 1
    print("ALL QUERIES MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
