#!/usr/bin/env python3
"""Suite-vs-floor tax attribution (r13, VERDICT item 1).

Joins a full-suite bench_regime.jsonl (one row per timed run) against
an isolated-floors artifact (per-query `runs` detail rows) and, for
each query, compares the MIN run of each side on the r13 triple:

  input_mb     - source bytes read (page-cache eviction shows up as
                 flat MB with inflated wall, or as iowait)
  task_cpu_ms  - summed executor CPU (JIT/codegen/GC/allocation state
                 inflates this)
  task_ms      - summed executor wall (task_ms - task_cpu_ms grows
                 with IO stalls and scheduling)

Usage: suitetax_compare.py <suite_bench_regime.jsonl> <floors.json> [out.json]
Prints a per-query table sorted by (suite_sec - floor_sec) and writes
the joined JSON when out is given.
"""
import json
import sys


def main() -> None:
    suite_path, floors_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    suite = {}
    with open(suite_path) as f:
        for line in f:
            r = json.loads(line)
            q = r["q"]
            if r.get("ok") and (q not in suite or r["sec"] < suite[q]["sec"]):
                suite[q] = r
    floors = json.load(open(floors_path))["queries"]
    rows = []
    for q, fl in floors.items():
        if q not in suite or fl.get("sec", -1) < 0:
            continue
        fruns = [r for r in fl.get("runs", []) if r.get("ok")]
        if not fruns:
            continue
        fbest = min(fruns, key=lambda r: r["sec"])
        s = suite[q]
        gap = s["sec"] - fbest["sec"]
        def d(k):
            return (s.get(k, -1), fbest.get(k, -1))
        rows.append({
            "q": q, "suite_sec": s["sec"], "floor_sec": fbest["sec"],
            "gap_sec": round(gap, 3),
            "input_mb": d("input_mb"),
            "task_cpu_ms": d("task_cpu_ms"),
            "task_ms": d("task_ms"),
            "gc_ms": d("gc_ms"),
            "sys_share": d("sys_share"),
        })
    rows.sort(key=lambda r: -r["gap_sec"])
    hdr = (f"{'query':34s} {'suite':>7s} {'floor':>7s} {'gap':>6s} "
           f"{'cpu_x':>6s} {'io_x':>6s} {'in_mb s/f':>12s}")
    print(hdr)
    for r in rows:
        sc, fc = r["task_cpu_ms"]
        sm, fm = r["task_ms"]
        cpu_x = sc / fc if fc > 0 else -1
        sio, fio = sm - sc, fm - fc
        io_x = sio / fio if fio > 0 else -1
        print(f"{r['q']:34s} {r['suite_sec']:7.2f} {r['floor_sec']:7.2f} "
              f"{r['gap_sec']:6.2f} {cpu_x:6.2f} {io_x:6.2f} "
              f"{r['input_mb'][0]:5d}/{r['input_mb'][1]:<5d}")
    if out:
        json.dump({"rows": rows}, open(out, "w"), indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
