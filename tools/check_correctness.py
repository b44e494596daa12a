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


# Spark simpleString -> acceptable DuckDB type names. Exact for
# numerics: the driver's value-hash is type-sensitive (a DuckDB
# HUGEINT `sum` over INTEGER hash-mismatches Spark's BIGINT even when
# every value is equal — the round-7 sessionize_native failure), so an
# uncast aggregate in an oracle is a latent driver fail this check
# exists to surface locally. Timestamps are accepted with or without
# a zone because normalize() strips offsets and those rows are
# driver-green today.
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_FLOATS = {"FLOAT", "REAL", "DOUBLE"}
_TYPE_COMPAT = {
    # Integer WIDTH differences are hash-safe (driver-green evidence:
    # r7 passed many spark-int vs oracle-BIGINT rows) — both sides
    # render as the same integer value. HUGEINT is deliberately NOT
    # in the class: DuckDB's pandas export turns int128 into
    # float64/object, so `3` hashes as `3.0` (the round-7
    # sessionize_native failure). Same for float-vs-int crossovers.
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": _FLOATS,
    "float": _FLOATS,
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "binary": {"BLOB"},
}


def type_mismatches(spark_schema, duck_cols, duck_types):
    """Compare a Spark schema against DuckDB result column types.

    Returns a list of ``"col: spark_type vs DUCK_TYPE"`` strings for
    columns whose types the driver's type-sensitive hash would treat
    as different. Struct/map columns are skipped (not hash-compared
    elementwise by the driver in a type-tagged way we can predict).
    """
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    bad = []
    for col, dtyp in zip(duck_cols, duck_types):
        styp = spark_types.get(col)
        if styp is None:
            continue
        d = str(dtyp).upper()
        if styp.startswith("decimal"):
            ok = d == styp.upper()
        elif styp.startswith("array<"):
            inner = styp[6:-1]
            accept = _TYPE_COMPAT.get(inner)
            if accept is None:
                continue
            ok = any(d == f"{a}[]" for a in accept)
        elif styp.startswith(("struct<", "map<")):
            continue
        else:
            accept = _TYPE_COMPAT.get(styp)
            if accept is None:
                continue
            ok = d in accept
        if not ok:
            bad.append(f"{col}: spark {styp} vs oracle {d}")
    return bad


def normalize(rows, cols, qname=None, _warned=set()):
    # WARN-LOUD list handling (VERDICT r12 item 2): the DRIVER's canon
    # sorts a pandas frame and dies on list-valued cells (`TypeError:
    # unhashable type: 'list'` — the round-12 embedding_quantize red
    # row). This harness can compare lists (tuple-ified below), which
    # is fine for OVERFLOW rows the driver never runs — but a GATED
    # row with an array column is a guaranteed driver fail that this
    # leniency used to hide. tests/test_gate_shape.py pins the gated
    # window to scalar columns; the warning here keeps ad-hoc runs of
    # this tool honest about the divergence.
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
                if (qname, c) not in _warned:
                    _warned.add((qname, c))
                    print(
                        f"WARN  {qname or '?'}: column {c!r} is "
                        "list-valued — local canon tuple-ifies it, but "
                        "the DRIVER canon cannot sort lists; a gated "
                        "row with this shape WILL go red on the driver "
                        "(see tests/test_gate_shape.py)"
                    )
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
            dtypes_raw = list(ddf.types)
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
        tbad = type_mismatches(sdf.schema, dcols_raw, dtypes_raw)
        if tbad:
            print(f"FAIL  {name}: type mismatch: {'; '.join(tbad)}")
            results[name] = {"status": "FAIL", "err": f"types: {'; '.join(tbad)}"}
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
        sn = normalize([r.asDict() for r in srows], scols, qname=name)
        dn = normalize(drows, dcols, qname=name)
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
