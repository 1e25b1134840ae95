"""Summarize benchmarks/resident_probe_r4.jsonl into the session table.

Prints: per-variant gather-vs-resident ms (with spreads), TF/s, SoL
fractions, the capacity ladder outcome, and the session-1 baseline
cross-check (the lite gather numbers should reproduce the plan-level
baselines within the ~10% relay band — if they don't, the lite run's
timing window was degraded and the numbers are suspect).
"""

import json
import sys

PATH = "benchmarks/resident_probe_r4.jsonl"
BASELINES = {  # session-1/2 plan-level square-chain records (ms)
    "bf16": 6.95, "int8": 4.26, "f32": 14.68, "bf16x3": 11.02,
}


def main():
    rows = [json.loads(l) for l in open(PATH)]
    lite = [r for r in rows if r.get("kind") == "resident_lite"]
    caps = [r for r in rows if r.get("kind") == "resident_capacity"]
    fails = [r for r in rows if r.get("kind", "").endswith("fail")]

    if caps:
        print("capacity ladder (bf16 slice):")
        for r in caps:
            print(f"  {r['slice_mb']:4d} MB  "
                  f"{'ok' if r.get('ok') else 'FAIL: ' + r.get('error', '')[:80]}")
        print()

    if lite:
        print(f"{'variant':12s} {'gather ms':>16s} {'resident ms':>16s} "
              f"{'speedup':>7s} {'g TF/s':>7s} {'r TF/s':>7s} "
              f"{'r SoL':>6s} {'agree':>9s}")
        for r in lite:
            gs = r.get("gather_ms_spread", [0, 0])
            rs = r.get("resident_ms_spread", [0, 0])
            dt = r["variant"].split("_")[0]
            base = BASELINES.get(dt)
            flag = ""
            if base and abs(r["gather_ms"] - base) / base > 0.15:
                flag = f"  [!] gather {r['gather_ms']:.2f} vs plan baseline {base:.2f}"
            print(f"{r['variant']:12s} "
                  f"{r['gather_ms']:6.2f} [{gs[0]:5.2f},{gs[1]:5.2f}] "
                  f"{r['resident_ms']:6.2f} [{rs[0]:5.2f},{rs[1]:5.2f}] "
                  f"{r['speedup']:7.2f} {r['gather_tflops']:7.1f} "
                  f"{r['resident_tflops']:7.1f} "
                  f"{r.get('resident_sol_frac', 0):6.2f} "
                  f"{r['resident_vs_gather_rel']:9.1e}{flag}")

    for r in fails:
        print("FAIL:", r.get("label") or r.get("variant"),
              r.get("error", "")[:160])


if __name__ == "__main__":
    main()
