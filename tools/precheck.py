#!/usr/bin/env python3
"""Dev-only oracle precheck (mirrors the driver's DuckDB compare).

Usage: python3 tools/precheck.py <sfDir> <verifyOutDir> [query ...]

For each query with an oracle_sql entry: loads the Spark result parquet and
the DuckDB oracle result, sorts columns by name and rows by all values,
rounds floats to 6dp, and reports row/schema/value match. This is a local
iteration loop only — the engine itself has no Python anywhere.
"""
import json, math, os, sys
import duckdb

def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 6)
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)

def canon(rows, cols):
    ordered = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(cell(r[i]) for i in ordered) for r in rows)

def has_lists(rows):
    return any(isinstance(v, (list, tuple)) for r in rows[:5] for v in r)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings", "lineitem", "orders",
              "customer", "part", "supplier", "nation", "region"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output")
            failures += 1
            continue
        sq = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        s_cols = [d[0] for d in sq.description]
        s_rows = sq.fetchall()
        try:
            oq = con.execute(oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        o_cols = [d[0] for d in oq.description]
        o_rows = oq.fetchall()
        schema_ok = sorted(s_cols) == sorted(o_cols)
        rows_ok = len(s_rows) == len(o_rows)
        vals_ok = schema_ok and canon(s_rows, s_cols) == canon(o_rows, o_cols)
        status = "OK" if (schema_ok and rows_ok and vals_ok) else "FAIL"
        print(f"{name}: {status} rows={len(s_rows)}/{len(o_rows)} "
              f"schema={schema_ok} values={vals_ok}")
        if has_lists(s_rows):
            # the DRIVER's pandas harness cannot sort array columns and
            # records `err` for the whole query — flag it here even though
            # this precheck compares lists fine
            print(f"  WARN: {name} emits array-typed column(s); the driver "
                  f"harness will err — emit a digest/CSV/exploded rows instead")
        if status == "FAIL":
            failures += 1
            if not schema_ok:
                print(f"  spark cols:  {sorted(s_cols)}")
                print(f"  oracle cols: {sorted(o_cols)}")
            elif not vals_ok:
                a, b = canon(s_rows, s_cols), canon(o_rows, o_cols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"  spark:  {x}\n  oracle: {y}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
