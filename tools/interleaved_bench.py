#!/usr/bin/env python3
"""Interleaved engine/DuckDB pair bench — weather-cancelled ratios.

Usage: interleaved_bench.py [sf_dir] [verify_out_dir] [threads] [runs] [duck_timeout]

The shared microVM's load swings identical fresh-JVM runs 8x across an
evening (ISOLATED100_r10's q48 control), so an engine total measured at
hour A divided by a DuckDB total measured at hour B carries the WEATHER
DELTA between A and B, not just the plan costs. This runner alternates
the two engines per query inside the same minutes-window, ABBA order
(engine, duck, duck, engine with runs=2) so slow drifts cancel to first
order from both mins, and reports per-query pairs plus the paired
ratio. The engine side is graft.BenchServe — the SAME timing kernel the
driver's bench uses (one long-lived session, noop-write
materialization, clearCache/GC/settle hygiene between timings). The
DuckDB side reuses duck_bench.py's --one child mode: a subprocess per
timing (the only form that survives interrupts at large SF — see
duck_bench.py's docstring), timing execute+fetch only, warm page cache
shared across children.

Emits one JSON object to stdout:
  {"sf":…, "runs":N, "queries":{name:{"eng":s,"duck":s,"ratio":r}…},
   "eng_total":…, "duck_total":…, "ratio_of_totals":…,
   "eng_failed":[…], "duck_failed":[…]}
ratio_of_totals excludes queries where either side failed/timed out
(they are listed, with the surviving side's time, in *_failed).
"""
import sys, json, os, subprocess, time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
duck_timeout = float(sys.argv[5]) if len(sys.argv) > 5 else 300.0

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
names = sorted(oracle)

# ---- engine server (same JVM flags as tools/run_bench.sh) ----
add_opens = []
for p in ('java.lang java.lang.invoke java.lang.reflect java.io java.net '
          'java.nio java.util java.util.concurrent java.util.concurrent.atomic '
          'sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar').split():
    add_opens += ['--add-opens', f'java.base/{p}=ALL-UNNAMED']
env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
           SPARK_GRAFT_CPUS=str(threads))
eng = subprocess.Popen(
    ['java', *add_opens, '-Xmx' + os.environ.get('SPARK_DRIVER_MEM', '8g'),
     '-Dspark.ui.enabled=false', '-Dspark.sql.session.timeZone=UTC',
     '-cp', f'{REPO}/target/scala-2.13/classes:/opt/spark/jars/*',
     'graft.BenchServe'],
    stdin=subprocess.PIPE, stdout=subprocess.PIPE,
    stderr=open('/tmp/interleaved_eng_stderr.log', 'w'),
    text=True, bufsize=1, cwd=REPO, env=env)
ready = json.loads(eng.stdout.readline())
assert ready.get('ready'), ready


def eng_time(name):
    eng.stdin.write(name + '\n')
    eng.stdin.flush()
    return float(json.loads(eng.stdout.readline())['sec'])


def duck_time(name):
    """One DuckDB timing in its own process (duck_bench.py --one);
    None on timeout or error. Child prints execute+fetch seconds."""
    try:
        r = subprocess.run(
            [sys.executable, f'{HERE}/duck_bench.py', sf_dir, out_dir,
             str(threads), str(duck_timeout), '--one', name],
            capture_output=True, text=True, timeout=duck_timeout)
        if r.returncode != 0:
            return None
        return float(r.stdout.strip())
    except subprocess.TimeoutExpired:
        return None


# warm the duck side once too (child imports + page cache for the views)
duck_time(names[0])

queries, eng_failed, duck_failed = {}, [], []
for name in names:
    es, ds = [], []
    # ABBA: engine, duck | duck, engine — each extra run flips order
    for r in range(runs):
        pair = [('e', eng_time), ('d', duck_time)]
        if r % 2 == 1:
            pair.reverse()
        for kind, f in pair:
            t = f(name)
            (es if kind == 'e' else ds).append(t)
    e_ok = [t for t in es if t is not None and t >= 0]
    d_ok = [t for t in ds if t is not None and t >= 0]
    e = round(min(e_ok), 3) if e_ok else None
    d = round(min(d_ok), 3) if d_ok else None
    rec = {'eng': e, 'duck': d}
    if e is not None and d is not None and d > 0:
        rec['ratio'] = round(e / d, 3)
    if e is None:
        eng_failed.append(name)
    if d is None:
        duck_failed.append(name)
    queries[name] = rec
    print(f'[pair] {name} eng={e} duck={d}', file=sys.stderr)

eng.stdin.write('\n')
eng.stdin.flush()
eng.wait(timeout=120)

paired = {n: q for n, q in queries.items()
          if q['eng'] is not None and q['duck'] is not None}
eng_total = round(sum(q['eng'] for q in paired.values()), 3)
duck_total = round(sum(q['duck'] for q in paired.values()), 3)
print(json.dumps({
    'sf': sf_dir, 'runs': runs, 'threads': threads,
    'method': 'ABBA per-query interleave; min per side; engine = BenchServe '
              '(Bench kernel, one session); duck = subprocess per timing '
              f'(timeout {duck_timeout:g}s); totals over the '
              f'{len(paired)}/{len(names)} both-sides-completed queries',
    'queries': queries,
    'eng_total': eng_total, 'duck_total': duck_total,
    'ratio_of_totals': round(eng_total / duck_total, 4) if duck_total else None,
    'eng_failed': eng_failed, 'duck_failed': duck_failed,
}, indent=1))
