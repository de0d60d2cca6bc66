#!/usr/bin/env python3
"""Compare two bench_full artifacts: common-entry subtotal, median
per-entry ratio, calibration drift, biggest movers. Usage:
  python3 tools/bench_compare.py bench_full_r13_builder.json bench_full_r14_builder.json
"""
import json, sys, statistics

def load(p):
    with open(p) as f:
        return json.load(f)["queries"]

a, b = load(sys.argv[1]), load(sys.argv[2])
cal_a, cal_b = a.pop("_calibration", None), b.pop("_calibration", None)
common = sorted(set(a) & set(b))
if not common:
    sys.exit("no common entries between the two artifacts — nothing to compare")
sa, sb = sum(a[k] for k in common), sum(b[k] for k in common)
ratios = {k: (b[k] / a[k] if a[k] > 0 else float("inf")) for k in common}
med = statistics.median(ratios.values())
if cal_a and cal_b:
    print(f"calibration: {cal_a} -> {cal_b} (x{cal_b/cal_a:.3f})")
else:
    print("calibration: missing in at least one artifact — raw seconds only")
print(f"common-{len(common)} subtotal: {sa:.1f} -> {sb:.1f} s = x{sb/sa:.3f}")
print(f"median per-entry ratio: {med:.3f}")
print(f"entries >1.25: {sum(1 for r in ratios.values() if r > 1.25)}")
new = sorted(set(b) - set(a))
if new:
    print("new entries:", ", ".join(f"{k}={b[k]:.2f}s" for k in new))
movers = sorted(ratios.items(), key=lambda kv: kv[1])
print("top improvements:")
for k, r in movers[:8]:
    print(f"  {k}: {a[k]:.2f} -> {b[k]:.2f} s (x{r:.2f})")
print("top regressions:")
for k, r in movers[-8:]:
    print(f"  {k}: {a[k]:.2f} -> {b[k]:.2f} s (x{r:.2f})")
