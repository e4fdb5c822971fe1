#!/usr/bin/env python
"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() in DuckDB over the same parquet at sf0.01; compare
row counts, schemas (column names), and values (sorted columns, sorted rows,
4dp rounding like the driver's value-hash).

The per-round driver artifact only records the first 50 registry entries,
so this replay is the evidence for the tail; --json PATH writes the full
per-query result map (same shape as CORRECTNESS_r*.json) for committing
alongside the driver's artifact."""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from open_source_search_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.4f}"
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def main():
    spark = get_spark("osse-selfcheck")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("-"):
            sys.exit("usage: selfcheck.py [--json PATH] [query ...]")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = argv
    fails = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            df = fn(spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(s_rows)
        except Exception as ex:
            fails.append(name)
            rec["err"] = f"spark error: {ex}"
            print(f"FAIL {name}: spark error {ex}")
            continue
        if name not in oracles:
            rec["rows_match"] = True
            rec["err"] = "rows-only (no oracle by design)"
            print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            rec["oracle_rows"] = len(o_rows)
        except Exception as ex:
            fails.append(name)
            rec["err"] = f"duckdb error: {ex}"
            print(f"FAIL {name}: duckdb error {ex}")
            continue
        sc, sv = frame_sig(s_cols, s_rows)
        oc, ov = frame_sig(o_cols, o_rows)
        rec["schema_match"] = sc == oc
        rec["rows_match"] = len(sv) == len(ov)
        rec["hash_match"] = sc == oc and sv == ov
        if sc != oc:
            fails.append(name)
            print(f"FAIL {name}: schema {sc} != {oc}")
        elif len(sv) != len(ov):
            fails.append(name)
            print(f"FAIL {name}: rowcount {len(sv)} != {len(ov)}")
        elif sv != ov:
            fails.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(sv, ov)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  spark : {sv[bad]}")
            print(f"  oracle: {ov[bad]}")
        else:
            print(f"ok   {name}: {len(sv)} rows match")
    spark.stop()
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_path} ({len(report)} entries)")
    if fails:
        print("FAILURES:", fails)
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
