#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the single-node baseline the README's
"Measured" section compares the engine bench against.

Usage: duck_bench.py [sf_dir] [verify_out_dir] [threads] [timeout_sec]
Runs every SQL in <verify_out_dir>/oracle_sql.json over the sf_dir
parquet tables (fetching results, like the engine bench does), one
timed pass after one untimed warm-up of the file cache via a
row-count probe. Prints a JSON line shaped like the engine bench.

With timeout_sec set (large-SF companion runs), each query runs in
its OWN subprocess with a hard kill at the deadline, recorded as null
with a stderr note. Process isolation is load-bearing, not cosmetic:
at 100x both softer forms failed — con.interrupt() on a shared
connection left the process unable to allocate (every later query
OOM'd), and a fresh connection per query still shares the process
allocator, which one interrupted 74GB-scale query had exhausted. A
DuckDB timeout/OOM at 100x is itself evidence, not an error. The OS
page cache keeps the parquet warm across the per-query processes.
"""
import sys, json, os, subprocess, time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
timeout = float(sys.argv[4]) if len(sys.argv) > 4 else None

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']


def connect():
    import duckdb
    c = duckdb.connect()
    c.execute(f"SET threads={threads}")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


if len(sys.argv) > 5 and sys.argv[5] == '--one':
    # child mode: run one named query, print its wall seconds
    name = sys.argv[6]
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    c = connect()
    t0 = time.monotonic()
    c.execute(oracle[name]).fetchall()
    print(round(time.monotonic() - t0, 3))
    sys.exit(0)

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
times, total = {}, 0.0

if timeout:
    for name in sorted(oracle):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, out_dir,
                 str(threads), str(timeout), '--one', name],
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f'{name}: TIMEOUT >{timeout}s (killed)', file=sys.stderr)
            times[name] = None
            continue
        if r.returncode != 0:
            tail = (r.stderr or '').strip().splitlines()
            print(f'{name}: ERROR {tail[-1] if tail else r.returncode}', file=sys.stderr)
            times[name] = None
            continue
        dt = float(r.stdout.strip().splitlines()[-1])
        times[name] = dt
        total += dt
else:
    con = connect()
    for t in TABLES:
        con.execute(f"SELECT count(*) FROM {t}").fetchall()  # warm file cache
    for name in sorted(oracle):
        t0 = time.monotonic()
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f'{name}: ERROR {e}', file=sys.stderr)
            times[name] = None
            continue
        dt = time.monotonic() - t0
        times[name] = round(dt, 3)
        total += dt

short = {('q' + k.split('_')[0][1:] if k.startswith('q') else 'f' + k.split('_')[1]):
         v for k, v in times.items()}
print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                  "unit": "sec", "n": len(oracle), "threads": threads,
                  "queries": short, "sf": sf_dir}))
