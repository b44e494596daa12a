"""Local stand-in for the driver's DuckDB oracle gate.

Runs every entry in ``__spark_entry__.queries()`` at the given sf dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet,
and compares: row count, column names, and order-insensitive values
(rows sorted by all columns, columns sorted by name — floats compared
exactly, since our queries are written for bitwise-equal folds).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float) and math.isnan(v):
                v = "__nan__"
            if hasattr(v, "isoformat"):
                v = v.isoformat().replace("+00:00", "")
            if isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def main():
    import duckdb

    import __spark_entry__ as e
    from spark_sorted_spark.session import get_spark

    args = list(sys.argv[1:])
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: --json requires an output path operand")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            results[name] = {"status": "FAIL", "err": f"spark error: {ex}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows-only (no oracle), {len(srows)} rows")
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols_raw = list(ddf.columns)
            drows = [dict(zip(dcols_raw, t)) for t in ddf.fetchall()]
            dcols = sorted(dcols_raw)
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            results[name] = {"status": "FAIL", "err": f"duckdb error: {ex}"}
            failures += 1
            continue
        if scols != dcols:
            print(f"FAIL  {name}: columns {scols} vs oracle {dcols}")
            results[name] = {"status": "FAIL", "err": f"columns {scols} vs {dcols}"}
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rows {len(srows)} vs oracle {len(drows)}")
            results[name] = {
                "status": "FAIL",
                "err": f"rows {len(srows)} vs {len(drows)}",
            }
            failures += 1
            continue
        sn = normalize([r.asDict() for r in srows], scols)
        dn = normalize(drows, dcols)
        if sn != dn:
            bad = sum(1 for a, b in zip(sn, dn) if a != b)
            print(f"FAIL  {name}: {bad}/{len(sn)} rows differ")
            for a, b in zip(sn, dn):
                if a != b:
                    print(f"      spark : {a}\n      oracle: {b}")
                    break
            results[name] = {"status": "FAIL", "err": f"{bad}/{len(sn)} rows differ"}
            failures += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows, exact match")
        results[name] = {"status": "PASS", "rows": len(srows)}
    print("---")
    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
