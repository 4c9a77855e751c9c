#!/usr/bin/env python3
"""Regenerate bench_quiet_reference.json from a QUIET full bench run.

Usage: python3 scripts/make_quiet_reference.py [bench_last.json] [out.json]

Reference format (what graft.Bench reads back):
  "<query>"      -> the quiet run's per-query seconds (see below)
  "load:<query>" -> the quiet run's own pre-rep load stamp at that query
                    (the suite's self-load profile, the baseline hot
                    detection compares against)
  "cpu_probe_min" -> the run's CPU-probe floor

REFUSES a run with contamination EVIDENCE: any failed row, any
suspect/suspect_unresolved/regressed verdict, or a CPU-probe floor
more than 10% above the prior reference's (the box was not delivering
quiet cycles). BASELINE.md policy: regenerating from a contaminated
run would launder the contamination into every future verdict.

Rows flagged load_hot with an ok verdict are NOT refused: after a plan
change the suite's self-load profile legitimately shifts, which trips
the old profile's per-slot thresholds on a box the probe proves quiet.
Their reference value is the row's MIN rep (the quiet-box estimate the
artifact already emits) — the conservative direction: a too-small
yardstick makes future verdicts stricter, never blinder. Rows the
suite retested solo use the retest measurement (that solo re-measure
is exactly the quiet estimate the acquittal was based on).
"""
import json
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
    out = sys.argv[2] if len(sys.argv) > 2 else "bench_quiet_reference.json"
    d = json.load(open(src))
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
    floor = d["cpu_probe_floor"]
    try:
        prior = json.load(open(out)).get("cpu_probe_min")
    except Exception:
        prior = None
    if prior is not None and floor > prior * 1.10:
        print(f"REFUSING: probe floor {floor} > 1.10x prior {prior} — "
              "the box was not delivering quiet cycles", file=sys.stderr)
        sys.exit(1)
    hot = set(d.get("load_hot", []))
    retest = d.get("retest", {})
    mins = d.get("queries_min", {})
    ref, n_retest, n_min = {}, 0, 0
    for k, v in qs.items():
        if k in retest:
            ref[k] = round(retest[k], 3)
            n_retest += 1
        elif k in hot and k in mins:
            ref[k] = round(mins[k], 3)
            n_min += 1
        else:
            ref[k] = round(v, 3)
        ref[f"load:{k}"] = d["load"][k]
    ref["cpu_probe_min"] = floor
    with open(out, "w") as f:
        json.dump(dict(sorted(ref.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(qs)} queries "
          f"({n_retest} from retest, {n_min} hot-row mins), "
          f"probe floor {floor}")


if __name__ == "__main__":
    main()
