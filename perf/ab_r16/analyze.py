import json
import os

# the committed metrics copies live NEXT TO this script — resolve
# relative to it so the committed artifacts are what it analyzes
# (run_ab.sh's working dir, .ab/out/, is not committed)
HERE = os.path.dirname(os.path.abspath(__file__))

def load(p):
    d = json.load(open(p))
    return d["totals_per_run"][0], d["metrics"]

passes = {}
for side in ("r14", "r15"):
    for p in (1, 2):
        try:
            passes[(side, p)] = load(os.path.join(HERE, f"{side}_p{p}_metrics.json"))
        except FileNotFoundError:
            pass

names = {k: set(m) for k, (_, m) in passes.items()}
shared = set.intersection(*names.values())
print(f"shared queries across all passes: {len(shared)}")
print(f"{'pass':10s} {'wall':>8s} {'shared_sum':>10s} {'gc_s':>7s} {'exec_s':>8s} {'fails':>5s}")
for k, (wall, m) in sorted(passes.items()):
    ss = sum(m[q]["sec"] for q in shared if m[q]["sec"] > 0)
    gc = sum(v["gc_ms"] for v in m.values()) / 1000
    ex = sum(v["exec_ms"] for v in m.values()) / 1000
    fails = sum(1 for v in m.values() if v["sec"] < 0)
    print(f"{k[0]}_p{k[1]:<6d} {wall:8.1f} {ss:10.1f} {gc:7.0f} {ex:8.0f} {fails:5d}")

# min-per-query per side over its passes (the Bench min-of-two contract)
def best(side):
    ms = [passes[(side, p)][1] for p in (1, 2) if (side, p) in passes]
    out = {}
    for q in shared:
        ok = [m[q]["sec"] for m in ms if m[q]["sec"] > 0]
        if ok:
            out[q] = min(ok)
    return out

a, b = best("r14"), best("r15")
both = set(a) & set(b)
ta, tb = sum(a[q] for q in both), sum(b[q] for q in both)
print(f"\nmin-of-passes shared-{len(both)}: r14 {ta:.1f}s  r15 {tb:.1f}s  ratio {tb / ta:.3f}")
# matched DEGRADED state: r14_p2 vs r15_p1 (both in the slow regime)
if ("r14", 2) in passes and ("r15", 1) in passes:
    m14, m15 = passes[("r14", 2)][1], passes[("r15", 1)][1]
    t14 = sum(m14[q]["sec"] for q in shared if m14[q]["sec"] > 0)
    t15 = sum(m15[q]["sec"] for q in shared if m15[q]["sec"] > 0)
    print(f"matched-degraded shared: r14_p2 {t14:.1f}s vs r15_p1 {t15:.1f}s  ratio r15/r14 {t15 / t14:.3f}")
rows = sorted(((b[q] / max(a[q], 1e-9), a[q], b[q], q) for q in both
               if b[q] > a[q] * 1.5 and b[q] - a[q] > 1.0), reverse=True)
print(f"\nqueries slower than 1.5x min-vs-min AND +1s ({len(rows)}):")
for r, sa, sb, q in rows[:15]:
    print(f"  x{r:5.2f} {sa:7.2f} -> {sb:7.2f}  {q}")
