#!/usr/bin/env python3
"""Dev-only oracle precheck (mirrors the driver's DuckDB compare).

Usage: python3 tools/precheck.py <sfDir> <verifyOutDir> [query ...]

For each query with an oracle_sql entry: loads the Spark result parquet and
the DuckDB oracle result at the pandas (`.df()`) level — what the DRIVER
hashes. DuckDB types that pandas widens (HUGEINT -> float64, DECIMAL ->
object/float) differ there even when python values coincide: round 4/5
shipped a "69/69 local" q_embed_drift twice while the driver saw a hash
mismatch, because the oracle's `list_sum` bucket is HUGEINT -> float64
("3.0") while Spark emits int64 ("3").

A query passes only if the pandas-level canonical forms match (rows, column
names, and stringified cell values including dtype-induced rendering) AND
the per-column dtype kinds match, so local green implies driver green. This
is a local iteration loop only — the engine itself has no Python anywhere.
"""
import json, math, os, sys
import duckdb
import numpy as np

def cell(v):
    # numpy scalars stringify differently from python ints (np.float64(3.0)
    # -> "3.0" vs int 3 -> "3"): KEEP that distinction — it is exactly the
    # dtype-representation difference the driver's pandas hash sees.
    # bool FIRST: python bool subclasses int, and pandas itertuples yields
    # python bool for bool-dtype columns — the driver sees "True"/"False",
    # not "1"/"0"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        v = round(v, 6)
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    if v is None:
        return "None"
    return str(v)

def canon_df(df):
    """Driver-faithful canonical form: columns sorted by name, rows
    stringified FROM THE PANDAS REPRESENTATION and sorted."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("|".join(cell(v) for v in row))
    return sorted(out)

def dtype_kinds(df):
    return {c: df[c].dtype.kind for c in df.columns}

def has_lists(df):
    for c in df.columns:
        s = df[c].head(5)
        if any(isinstance(v, (list, tuple, np.ndarray)) for v in s):
            return True
    return False

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
        s_df = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        try:
            o_cur = con.execute(oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        o_df = o_cur.df()
        schema_ok = sorted(s_df.columns) == sorted(o_df.columns)
        rows_ok = len(s_df) == len(o_df)
        s_canon = canon_df(s_df)
        o_canon = canon_df(o_df) if schema_ok else []
        pandas_ok = schema_ok and rows_ok and s_canon == o_canon
        # dtype KIND comparison (i/u/f/b/O/M...) — the usual culprit when
        # values match but the pandas canon differs
        s_kinds, o_kinds = dtype_kinds(s_df), dtype_kinds(o_df)
        dtypes_ok = schema_ok and all(
            s_kinds[c] == o_kinds[c] for c in s_df.columns)
        status = "OK" if (pandas_ok and dtypes_ok) else "FAIL"
        print(f"{name}: {status} rows={len(s_df)}/{len(o_df)} "
              f"schema={schema_ok} pandas_values={pandas_ok} dtypes={dtypes_ok}")
        if has_lists(s_df):
            # the DRIVER's pandas harness cannot sort array columns and
            # records `err` for the whole query — flag it here even though
            # this precheck compares lists fine
            print(f"  WARN: {name} emits array-typed column(s); the driver "
                  f"harness will err — emit a digest/CSV/exploded rows instead")
        if status == "FAIL":
            failures += 1
            if not schema_ok:
                print(f"  spark cols:  {sorted(s_df.columns)}")
                print(f"  oracle cols: {sorted(o_df.columns)}")
            else:
                if not dtypes_ok:
                    for c in s_df.columns:
                        if s_kinds[c] != o_kinds[c]:
                            print(f"  dtype {c}: spark={s_df[c].dtype} "
                                  f"oracle={o_df[c].dtype}")
                only_s = [x for x in s_canon if x not in set(o_canon)][:5]
                only_o = [x for x in o_canon if x not in set(s_canon)][:5]
                for x in only_s:
                    print(f"  only in spark:  {x}")
                for x in only_o:
                    print(f"  only in oracle: {x}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
