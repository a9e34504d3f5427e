#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the testdata tables and compare (schema-insensitively: columns sorted by
name, rows sorted, values hashed).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # match on 12 significant digits to flag real mismatches, not ulps
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        qname = os.path.basename(qdir)
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if qname not in oracle:
            print(f"ROWS-ONLY {qname}: {len(got_rows)} rows")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[qname])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {qname}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {qname}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g, e = table_key(got_rows, got_cols), table_key(exp_rows, exp_cols)
        if g == e:
            print(f"PASS {qname}: {len(got_rows)} rows")
            n_pass += 1
        else:
            print(f"FAIL {qname}: rows {len(got_rows)} vs {len(exp_rows)}")
            only_g = [r for r in g if r not in e][:3]
            only_e = [r for r in e if r not in g][:3]
            for r in only_g:
                print(f"   spark-only: {r}")
            for r in only_e:
                print(f"   oracle-only: {r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
