#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (FIXTURES.md section 2).

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]

Reads <outdir>/oracle_sql.json (written by graft.Verify), runs each oracle
SQL in DuckDB over views named after the parquet tables in <sfdir>, and
compares with the Spark result parquet at <outdir>/<name>/.
Columns sorted by name; floats rounded to 10 significant digits; rows
compared in query order AND as sorted multisets (both reported).
"""
import json, math, sys
import duckdb

def norm(v):
    if v is None:
        return r"\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return "%.10g" % v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql)
            want_cols = [c.lower() for c in want.columns]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got.columns]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1
            continue
        cw = canon(want_rows, want_cols)
        cg = canon(got_rows, got_cols)
        if cw == cg:
            print(f"PASS {name} ({len(cw)} rows)")
            n_pass += 1
        elif sorted(cw) == sorted(cg):
            print(f"WARN {name}: rows match as multiset but ORDER differs")
            n_fail += 1
        else:
            print(f"FAIL {name}: {len(cg)} spark rows vs {len(cw)} oracle rows")
            sw, sg = set(cw), set(cg)
            for r in list(sg - sw)[:3]:
                print(f"  spark-only: {r}")
            for r in list(sw - sg)[:3]:
                print(f"  oracle-only: {r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
