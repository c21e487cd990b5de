#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the single-node baseline the README's
"Measured" section compares the engine bench against.

Usage: duck_bench.py [sf_dir] [verify_out_dir] [threads] [timeout_sec]
Runs every SQL in <verify_out_dir>/oracle_sql.json over the sf_dir
parquet tables (fetching results, like the engine bench does), one
timed pass after one untimed warm-up of the file cache via a
row-count probe. Prints a JSON line shaped like the engine bench.
With timeout_sec set (large-SF companion runs), each query is
interrupted at the deadline and recorded as null with a stderr note —
a DuckDB timeout at 100x is itself evidence, not an error.
"""
import sys, json, time, threading
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
timeout = float(sys.argv[4]) if len(sys.argv) > 4 else None

con = duckdb.connect()
con.execute(f"SET threads={threads}")
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    con.execute(f"SELECT count(*) FROM {t}").fetchall()  # warm file cache

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
times, total = {}, 0.0
for name in sorted(oracle):
    t0 = time.monotonic()
    timer = None
    if timeout:
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
    try:
        con.execute(oracle[name]).fetchall()
    except Exception as e:
        kind = 'TIMEOUT' if timeout and time.monotonic() - t0 >= timeout else 'ERROR'
        print(f'{name}: {kind} {e}', file=sys.stderr)
        times[name] = None
        continue
    finally:
        if timer:
            timer.cancel()
    dt = time.monotonic() - t0
    times[name] = round(dt, 3)
    total += dt
short = {('q' + k.split('_')[0][1:] if k.startswith('q') else 'f' + k.split('_')[1]):
         v for k, v in times.items()}
print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                  "unit": "sec", "n": len(oracle), "threads": threads,
                  "queries": short, "sf": sf_dir}))
