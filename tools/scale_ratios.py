"""Per-query scaling ratios between two graft.Bench full-JSON records.

Usage: python3 tools/scale_ratios.py BENCH_sf01.json BENCH_sf1.json [factor]

Prints every shared query's steady time at both SFs and the ratio, sorted
by ratio descending, plus a summary (median/mean ratio, outliers above
the data factor). The data factor (default 10) is the break-even line: a
query scaling at exactly the data growth is linear; above it is
super-linear and needs attribution.
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
rows = [(q, qa[q], qb[q], qb[q] / qa[q]) for q in shared]
rows.sort(key=lambda r: -r[3])

print(f"{'query':40s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}")
for q, x, y, r in rows:
    flag = " <-- SUPER-LINEAR" if r > factor else ""
    print(f"{q:40s} {x:8.3f} {y:9.3f} {r:7.2f}{flag}")

rs = sorted(r for _, _, _, r in rows)
n = len(rs)
med = rs[n // 2] if n % 2 else (rs[n // 2 - 1] + rs[n // 2]) / 2
print(f"\nshared={n} median_ratio={med:.2f} mean_ratio={sum(rs)/n:.2f} "
      f"over_factor={sum(1 for r in rs if r > factor)} "
      f"(factor={factor})")
print(f"total base={sum(x for _, x, _, _ in rows):.1f}s "
      f"scaled={sum(y for _, _, y, _ in rows):.1f}s")
print(f"ctx base={a.get('ctx')} scaled={b.get('ctx')}")
