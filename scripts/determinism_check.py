#!/usr/bin/env python3
"""Double-run determinism check: compare two graft.Verify output dirs
(ideally produced at DIFFERENT thread counts) and report any query whose
row set differs — partitioning-invariance is the strongest determinism
signal the single-run oracle gate cannot provide.

Usage:
  SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify <sfDir> /tmp/det_a [q...]"
  SPARK_GRAFT_CPUS=16 sbt "runMain graft.Verify <sfDir> /tmp/det_b [q...]"
  python3 scripts/determinism_check.py /tmp/det_a /tmp/det_b
"""
import os
import sys

import duckdb


def main() -> int:
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    fails = []
    queries = sorted(q for q in os.listdir(a)
                     if q != "oracle_sql.json" and os.path.isdir(os.path.join(a, q)))
    for q in queries:
        if not os.path.isdir(os.path.join(b, q)):
            fails.append((q, "missing in second run"))
            continue
        try:
            n = con.sql(
                f"SELECT count(*) FROM ("
                f"(SELECT * FROM '{a}/{q}/*.parquet' EXCEPT SELECT * FROM '{b}/{q}/*.parquet')"
                f" UNION ALL "
                f"(SELECT * FROM '{b}/{q}/*.parquet' EXCEPT SELECT * FROM '{a}/{q}/*.parquet'))"
            ).fetchone()[0]
            if n:
                fails.append((q, f"{n} differing rows"))
        except Exception as e:  # schema mismatch etc.
            fails.append((q, str(e)[:120]))
    for q, msg in fails:
        print(f"DIFF {q}: {msg}")
    print(f"== {len(queries) - len(fails)} identical, {len(fails)} differ")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
