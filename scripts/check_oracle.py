"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
(default sf_dir /root/testdata/sf0.01; with query names given, checks those)

NB: the fixture-backed oracles (minhash/simhash/dup_clusters/corpus_curation)
are pinned to the sf0.01 testdata — the sf the driver's gate runs at; at any
other sf_dir those four will legitimately mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from funcify_feature_eng_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # NO Decimal normalization: the driver's hash compares engine-native
    # representations, and str(Decimal('243192.00')) != repr(243192.0) — a
    # float() norm here masked 4 real driver hash failures in round 1.
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in normed:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args)
    # a mistyped sf_dir would otherwise fall through into `only`, match no
    # query, and exit green having verified NOTHING — fail loudly instead
    known = set(entrymod.queries())
    unknown = only - known
    if unknown:
        print(f"ERROR: not query names (mistyped path?): {sorted(unknown)}")
        return 2
    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows):7d} rows   ({t_spark:.1f}s spark)")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": None}
            continue
        t0 = time.time()
        res = con.sql(oracles[name])
        orows = res.fetchall()
        ocols = list(res.columns)
        t_duck = time.time() - t0
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        results[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                         "hash_match": ok_hash, "spark_rows": len(srows),
                         "oracle_rows": len(orows), "err": None}
        print(
            f"{name:24s} {status} rows {len(srows)}/{len(orows)} cols={ok_cols} "
            f"hash {sh}/{oh} ({t_spark:.1f}s spark, {t_duck:.1f}s duck)"
        )
        if not ok_hash and ok_rows and ok_cols:
            # show first differing normalized row for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ns = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
            no = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
            for a, b in zip(ns, no):
                if a != b:
                    print(f"   spark: {a[:160]}\n   duck : {b[:160]}")
                    break
    spark.stop()
    # machine-readable artifact in queries() (CI) order so the driver's
    # CORRECTNESS_rN.json and this local replica diff cleanly (VERDICT r3
    # task 10) — only written on FULL runs (no `only` filter)
    if not only:
        import json

        rn = os.environ.get("SPARK_GRAFT_ROUND", "")
        if rn.isdigit():
            rn = rn.zfill(2)  # r4 and r04 must not fork into two artifacts
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"CORRECTNESS_local{('_r' + rn) if rn else ''}.json",
        )
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {out_path}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
