#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: row count, sorted-column-name schema, and a
hash over all values with rows sorted by every column.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to strings for value comparison
    out = df.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return df.dtypes, out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got_path = os.path.join(out_dir, name)
        if not glob.glob(f"{got_path}/*.parquet"):
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            gd, got = canon(con, f"SELECT * FROM '{got_path}/*.parquet'")
            ed, exp = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        status = []
        if len(got) != len(exp):
            status.append(f"rows {len(got)} vs {len(exp)}")
        if list(got.columns) != list(exp.columns):
            status.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
        elif len(got) != len(exp):
            pass  # row-count mismatch already recorded; frames not comparable
        elif not got.equals(exp):
            diff = (got != exp)
            bad_cols = [c for c in got.columns if diff[c].any()]
            n_bad = int(diff.any(axis=1).sum())
            status.append(f"values differ in {bad_cols} ({n_bad} rows)")
            for c in bad_cols[:2]:
                i = diff[c].idxmax()
                status.append(f"  e.g. {c}[{i}]: got={got[c][i]!r} exp={exp[c][i]!r}")
        sd = [f"{c}:{gd[c]}->{ed[c]}" for c in gd.index if c in ed.index and str(gd[c]) != str(ed[c])]
        if status:
            print(f"FAIL {name}: " + "; ".join(status));  n_fail += 1
        else:
            note = f"  (dtype diff: {sd})" if sd else ""
            print(f"PASS {name} ({len(got)} rows){note}");  n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
