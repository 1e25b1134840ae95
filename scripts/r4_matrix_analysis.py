"""Adjudicate the round-4 dataset matrix with intervals (VERDICT r3 #3).

Reads benchmarks/dataset_matrix_r4.jsonl and answers, variance-aware:
  1. auto-vs-manual: is auto within 10% of the manual comparator on
     every dataset (now that every dataset HAS one)? A verdict counts
     only if the [ms_min, ms_max] intervals separate.
  2. gorder-vs-rabbit serving at products scale — the r3 close call.
  3. r4-vs-r3 per-row deltas (the fuse-pass re-base).
Appends one summary record to the same jsonl and prints the table.
"""

import json
import sys

R3 = "/root/repo/benchmarks/dataset_matrix_r3.jsonl"
R4 = "/root/repo/benchmarks/dataset_matrix_r4.jsonl"


def load(path):
    rows = []
    try:
        with open(path) as fh:
            for line in fh:
                rows.append(json.loads(line))
    except FileNotFoundError:
        pass
    return rows


def main():
    r4 = [r for r in load(R4) if r.get("kind") == "dataset_matrix"]
    r3 = load(R3)
    if not r4:
        print("no r4 rows yet")
        return

    def key(r):
        return (r["dataset"], r["strategy"], r.get("impl", "auto"),
                r.get("dtype"))

    # 1) auto vs manual, interval-aware
    print("== auto vs manual(csr_ell+compact), bf16, rabbit ==")
    verdicts = {}
    for ds in sorted({r["dataset"] for r in r4}):
        auto = [r for r in r4 if r["dataset"] == ds
                and r["strategy"] == "rabbit" and r["impl"] == "auto"]
        man = [r for r in r4 if r["dataset"] == ds
               and r["impl"] == "manual(csr_ell)"]
        if not auto or not man:
            continue
        a, m = auto[-1], man[-1]
        sep = a["ms_min"] > m["ms_max"] or m["ms_min"] > a["ms_max"]
        ratio = a["ms"] / m["ms"]
        within = ratio <= 1.10
        verdict = ("auto_ok" if within else
                   ("manual_faster_CONFIRMED" if sep else
                    "manual_faster_within_noise"))
        verdicts[ds] = {
            "auto_ms": [a["ms_min"], a["ms"], a["ms_max"]],
            "manual_ms": [m["ms_min"], m["ms"], m["ms_max"]],
            "ratio": round(ratio, 3), "verdict": verdict,
        }
        print(f"  {ds:16s} auto {a['ms']:8.1f} [{a['ms_min']:.1f},"
              f"{a['ms_max']:.1f}]  manual {m['ms']:8.1f} "
              f"[{m['ms_min']:.1f},{m['ms_max']:.1f}]  -> {verdict}")

    # 2) gorder vs rabbit at products
    gr = {}
    for strat in ("gorder", "rabbit"):
        rows = [r for r in r4 if r["dataset"] == "ogbn-products"
                and r["strategy"] == strat and r["impl"] == "auto"]
        if rows:
            gr[strat] = rows[-1]
    close_call = None
    if len(gr) == 2:
        g, rb = gr["gorder"], gr["rabbit"]
        sep = g["ms_min"] > rb["ms_max"] or rb["ms_min"] > g["ms_max"]
        close_call = {
            "gorder_ms": [g["ms_min"], g["ms"], g["ms_max"]],
            "rabbit_ms": [rb["ms_min"], rb["ms"], rb["ms_max"]],
            "separated": sep,
            "verdict": ("gorder" if g["ms"] < rb["ms"] else "rabbit")
            + ("_CONFIRMED" if sep else "_within_noise"),
        }
        print(f"== gorder vs rabbit (products serving): gorder "
              f"{g['ms']:.1f} [{g['ms_min']:.1f},{g['ms_max']:.1f}] vs "
              f"rabbit {rb['ms']:.1f} [{rb['ms_min']:.1f},"
              f"{rb['ms_max']:.1f}] sep={sep}")

    # 3) r4 vs r3 deltas
    print("== r4 vs r3 (auto rows) ==")
    deltas = {}
    for r in r4:
        if r["impl"] != "auto":
            continue
        old = [o for o in r3 if o.get("dataset") == r["dataset"]
               and o.get("strategy") == r["strategy"]
               and o.get("impl") == "auto"]
        if old:
            d = r["ms"] / old[-1]["ms"] - 1
            deltas[f"{r['dataset']}/{r['strategy']}"] = round(d, 3)
            print(f"  {r['dataset']:16s} {r['strategy']:9s} "
                  f"{old[-1]['ms']:8.1f} -> {r['ms']:8.1f} ms "
                  f"({d*100:+.1f}%)")

    summary = {"kind": "matrix_adjudication", "auto_vs_manual": verdicts,
               "gorder_vs_rabbit": close_call, "r4_vs_r3_delta": deltas}
    with open(R4, "a") as fh:
        fh.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
