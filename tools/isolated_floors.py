#!/usr/bin/env python3
"""Fresh-JVM isolated floors at a given SF dir.

One graft.Bench JVM per query (the bench itself times 2-3 runs
in-JVM and reports the min); the per-query regime row is read back
from bench_last.json. Emits ISOLATED-style JSON:
  {"sf": ..., "method": ..., "queries": {name: {sec, regime}}}

Usage: tools/isolated_floors.py <sfdir> <out.json> <query> [query...]
"""
import json
import os
import subprocess
import sys


def main() -> None:
    sfdir, out = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for i, q in enumerate(queries):
        env = dict(os.environ)
        env["SPARK_GRAFT_ONLY"] = q
        env.setdefault("SPARK_DRIVER_MEM", "48g")
        try:
            subprocess.run(
                [os.path.join(repo, "tools", "run_bench.sh"), sfdir],
                env=env, cwd=repo, check=True,
                stdout=subprocess.DEVNULL, timeout=900)
            with open(os.path.join(repo, "bench_last.json")) as f:
                line = json.load(f)
            sec = line["queries"][shorten(q)]
            regime = line.get("regime_all_runs", line.get("regime", {}))
            results[q] = {"sec": sec, "regime": regime}
            # per-timing detail rows (input_mb / task_ms / task_cpu_ms,
            # r13) for suite-vs-floor attribution
            try:
                with open(os.path.join(repo, "bench_regime.jsonl")) as f:
                    results[q]["runs"] = [
                        json.loads(l) for l in f if f'"q":"{q}"' in l]
            except OSError:
                pass
            print(f"[{i+1}/{len(queries)}] {q:35s} {sec:8.3f}s "
                  f"sys={regime.get('sys_share', -1)}", flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            results[q] = {"sec": -1, "error": str(e)[:200]}
            print(f"[{i+1}/{len(queries)}] {q:35s} FAILED: {e}", flush=True)
    doc = {
        "sf": sfdir,
        "method": ("fresh JVM per query; graft.Bench internal min-of-2 "
                   "(3rd sample on >1.5x spread); regime per entry "
                   "(all-runs scope)"),
        "queries": results,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out} ({len(results)} queries)")


def shorten(name: str) -> str:
    if name.startswith("flight_q"):
        digits = "".join(c for c in name[len("flight_q"):] if c.isdigit())
        return "fq" + digits
    return name.split("_")[0]


if __name__ == "__main__":
    main()
