#!/usr/bin/env python3
"""Regenerate bench_quiet_reference.json from a QUIET full bench run.

Usage: python3 scripts/make_quiet_reference.py [bench_last.json] [out.json]

Reference format (what graft.Bench reads back):
  "<query>"      -> the quiet run's per-query MEDIAN seconds
  "load:<query>" -> the quiet run's own pre-rep load stamp at that query
                    (the suite's self-load profile, the baseline hot
                    detection compares against)
  "cpu_probe_min" -> the run's CPU-probe floor

REFUSES a run that does not look quiet (any hot row, any failed row):
BASELINE.md policy is that the reference may only come from a quiet
full run — regenerating from a contaminated one would launder the
contamination into every future verdict.
"""
import json
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
    out = sys.argv[2] if len(sys.argv) > 2 else "bench_quiet_reference.json"
    d = json.load(open(src))
    hot = d.get("load_hot", [])
    if hot:
        print(f"REFUSING: {len(hot)} rows ran hot: {hot[:6]}...",
              file=sys.stderr)
        sys.exit(1)
    qs = d["queries"]
    failed = sorted(k for k, v in qs.items() if v < 0)
    if failed:
        print(f"REFUSING: failed rows {failed}", file=sys.stderr)
        sys.exit(1)
    bad = sorted(k for k, v in d.get("verdicts", {}).items()
                 if v in ("suspect", "regressed", "suspect_unresolved"))
    if bad:
        print(f"REFUSING: non-ok verdicts on {bad}", file=sys.stderr)
        sys.exit(1)
    ref = {}
    for k, v in qs.items():
        ref[k] = round(v, 3)
        ref[f"load:{k}"] = d["load"][k]
    ref["cpu_probe_min"] = d["cpu_probe_floor"]
    with open(out, "w") as f:
        json.dump(dict(sorted(ref.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(qs)} queries, probe floor {ref['cpu_probe_min']}")


if __name__ == "__main__":
    main()
