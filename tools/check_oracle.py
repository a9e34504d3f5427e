#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the testdata tables and compare (schema-insensitively: columns sorted by
name, rows sorted, values hashed).

Fetches through pandas on BOTH sides, like the driver: DuckDB HUGEINT /
DECIMAL surface as float64 there, so an oracle `sum(bigint)` against a Spark
long prints "285.0" vs "285" and hash-mismatches even though fetchall()'s
python ints would compare equal. Strict string reprs, no float rounding —
the queries are designed for bit-identical IEEE trees. When strict fails but
a 12-sig-digit loose compare passes, reports FAIL(type/precision) so the
fix target is obvious.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [queryFilter...]
"""
import sys, os, json, glob
import duckdb


def cells(df, strict):
    cols = sorted(df.columns)
    out = []
    for t in df[cols].itertuples(index=False, name=None):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and v != v):
                row.append("NULL")
            elif isinstance(v, bytes):
                row.append(v.hex())
            elif not strict and isinstance(v, float):
                row.append(f"{v:.12g}")
            else:
                row.append(str(v))
        out.append(tuple(row))
    return sorted(out)


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        qname = os.path.basename(qdir)
        if only and not any(f in qname for f in only):
            continue
        got_df = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        if qname not in oracle:
            print(f"ROWS-ONLY {qname}: {len(got_df)} rows")
            n_rowsonly += 1
            continue
        try:
            exp_df = con.execute(oracle[qname]).fetchdf()
        except Exception as e:
            print(f"FAIL {qname}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_df.columns) != sorted(exp_df.columns):
            print(f"FAIL {qname}: columns {sorted(got_df.columns)} != {sorted(exp_df.columns)}")
            n_fail += 1
            continue
        g, e = cells(got_df, strict=True), cells(exp_df, strict=True)
        if g == e:
            print(f"PASS {qname}: {len(got_df)} rows")
            n_pass += 1
            continue
        gl, el = cells(got_df, strict=False), cells(exp_df, strict=False)
        kind = "type/precision" if gl == el else "values"
        print(f"FAIL({kind}) {qname}: rows {len(got_df)} vs {len(exp_df)}")
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
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
