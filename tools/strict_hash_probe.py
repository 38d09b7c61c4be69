"""Strict raw-value probe for the driver's hash gate.

The driver's CORRECTNESS compare hashes RAW values — stricter than
``check_oracle``'s 9-dp float normalization (that sub-grid slack is
what hid the round-1/2 `s10_schema_enforce` decimal knife-edge).
This probe re-runs a set of queries and compares Spark vs DuckDB
with NO float rounding at all:

- floats must be bit-identical (``repr`` equality, NaN allowed);
- decimals must be string-identical after trailing-zero
  canonicalization on BOTH sides (engines legitimately differ on
  declared scale padding);
- dates/datetimes compare by ISO string;
- everything else compares by exact value.

A query that passes here cannot hash-mismatch under any value-level
driver hash. Usage:

    python tools/strict_hash_probe.py [sf_dir] [--window N] [names...]

Default: the first 50 registry entries (the driver's window).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def strict(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # bit-exact
    if isinstance(v, decimal.Decimal):
        # canonical: strip exponent/trailing zeros so DECIMAL(12,2)
        # '5.00' and '5' compare equal, but '5.01' vs '5.02' never do
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(strict(x) for x in v)
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(strict(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    window = 50
    if "--window" in args:
        i = args.index("--window")
        window = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = set(a for a in args if not os.path.isdir(a))

    import __spark_entry__ as entrymod
    from etl_pipeline_4handling_listings_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = list(qs)[:window] if not names else [n for n in qs if n in names]
    failed = []
    for name in targets:
        if name not in oracles:
            print(f"SKIP  {name}: no oracle")
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            s = canon(sdf.collect(), sdf.columns)
            res = con.execute(oracles[name])
            d = canon(res.fetchall(), [c[0] for c in res.description])
        except Exception as ex:
            print(f"FAIL  {name}: error {ex}")
            failed.append(name)
            continue
        if s == d:
            print(f"PASS  {name}: {len(s)} rows strict-identical")
        elif len(s) != len(d):
            # zip() would truncate to the shorter side and report an
            # empty diff list for a pure row-count mismatch
            print(
                f"FAIL  {name}: row-count mismatch"
                f" spark={len(s)} duckdb={len(d)}"
            )
            longer, label = (s, "spark") if len(s) > len(d) else (d, "duckdb")
            print(f"  first unpaired {label} row: {longer[min(len(s), len(d))]}")
            failed.append(name)
        else:
            diffs = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:3]
            print(f"FAIL  {name}: strict mismatch at rows {diffs}")
            for i in diffs[:1]:
                print(f"  spark : {s[i]}")
                print(f"  duckdb: {d[i]}")
            failed.append(name)
    print()
    print("STRICT ALL PASS" if not failed else f"STRICT FAILURES: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
