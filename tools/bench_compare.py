#!/usr/bin/env python3
"""Per-query diff of two bench.json artifacts with a regression gate.

Usage:
    python3 tools/bench_compare.py OLD.json NEW.json [--gate]

Compares the queries SHARED by both artifacts (each value is that
artifact's per-query min across trials).  Prints:
  - shared-subtotal A/B (the cross-round comparability headline),
  - the canary subtotal of each artifact when present (the absolute
    host anchor — see CLAUDE.md's canary rule),
  - the CANARY-NORMALIZED shared subtotal (VERDICT r14 #5): the new
    subtotal divided by the canary ratio, i.e. what the new run would
    have measured on the old artifact's host.  The raw cross-round
    series absorbed four rounds of host drift (133.8 → 167.0 s on the
    r10 convention set) while every per-round canary adjudication said
    "flat" — quote BOTH numbers in any cross-round narrative, and read
    the 2× baseline gate off the normalized one,
  - every query whose ratio trips the REGRESSION GATE: new/old > 1.30
    AND new-old > 0.15 s (both thresholds from VERDICT r11 #1 — the
    ratio alone flags sub-second noise, the delta alone flags big
    queries' ordinary drift),
  - the 10 largest improvements/regressions by delta for context.

With --gate, exits non-zero when any query trips the regression gate
(for use as a pre-commit check on a bench.json refresh).

Reading artifacts from git history:
    git show e10e073:bench.json > /tmp/old.json
    python3 tools/bench_compare.py /tmp/old.json bench.out.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    gate = "--gate" in sys.argv
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old, new = load(args[0]), load(args[1])
    oq = {k: v for k, v in old["queries"].items() if v >= 0}
    nq = {k: v for k, v in new["queries"].items() if v >= 0}
    shared = sorted(set(oq) & set(nq))
    if not shared:
        print("no shared queries between the two artifacts")
        sys.exit(2)

    osub = sum(oq[k] for k in shared)
    nsub = sum(nq[k] for k in shared)
    print(f"shared queries : {len(shared)}  "
          f"(old has {len(oq)}, new has {len(nq)})")
    print(f"shared subtotal: {osub:.2f} s -> {nsub:.2f} s  "
          f"(x{nsub / osub:.3f})")
    for label, art in (("old", old), ("new", new)):
        c = art.get("canary_secs")
        if c is not None and c > 0:
            print(f"canary [{label}]: {c:.3f} s "
                  f"({','.join(art.get('canary_queries', []))})")
    oc, nc = old.get("canary_secs"), new.get("canary_secs")
    if oc and nc and oc > 0 and nc > 0:
        print(f"canary ratio  : x{nc / oc:.3f} "
              f"({'COMPARABLE (<=15%)' if abs(nc / oc - 1) <= 0.15 else 'HOSTS NOT COMPARABLE (>15%)'})")
        # the new subtotal re-expressed on the OLD host (divide out the
        # canary ratio): the engine-movement number for cross-round series
        norm = nsub / (nc / oc)
        print(f"normalized subtotal (new @ old host): {osub:.2f} s -> "
              f"{norm:.2f} s  (x{norm / osub:.3f} engine, "
              f"x{nsub / osub:.3f} raw)")

    # regression gate: >30% slower AND >0.15 s absolute
    regressions = [(k, oq[k], nq[k]) for k in shared
                   if nq[k] > oq[k] * 1.30 and nq[k] - oq[k] > 0.15]
    regressions.sort(key=lambda t: t[2] - t[1], reverse=True)
    if regressions:
        print(f"\nREGRESSION GATE TRIPPED ({len(regressions)} queries, "
              ">30% and >0.15 s):")
        for k, a, b in regressions:
            print(f"  {k:42s} {a:7.3f} -> {b:7.3f}  (x{b / a:.2f}, "
                  f"+{b - a:.3f} s)")
    else:
        print("\nregression gate: clean (no query >30% and >0.15 s slower)")

    deltas = sorted(((nq[k] - oq[k], k) for k in shared))
    print("\nlargest improvements:")
    for d, k in deltas[:10]:
        if d < -0.05:
            print(f"  {k:42s} {oq[k]:7.3f} -> {nq[k]:7.3f}  ({d:+.3f} s)")
    print("largest slowdowns:")
    for d, k in deltas[-10:][::-1]:
        if d > 0.05:
            print(f"  {k:42s} {oq[k]:7.3f} -> {nq[k]:7.3f}  ({d:+.3f} s)")

    if gate and regressions:
        sys.exit(1)


if __name__ == "__main__":
    main()
