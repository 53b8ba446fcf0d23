#!/usr/bin/env python3
"""Oracle tractability gate.

Executes EVERY registered oracle SQL in embedded DuckDB against views
over <sfDir>'s parquet tables, each under a strict per-query
wall-clock budget, and exits nonzero if any oracle errors or times
out.

Why this exists: an oracle that is CORRECT but UNPLANNABLE — e.g. an
unrolled round chain whose CTEs DuckDB inlines as a tree, exponential
in rounds — is invisible to every Spark-side test (tests never run
the oracles) yet hangs the driver's compare and zeroes the whole
round's correctness artifact (round 13: `text_bpe_train12`,
>10 min at PLAN time vs 0.7 s with `AS MATERIALIZED`). This gate
makes `sbt test` fail first.

Each oracle runs in its own OS process: a hung *planner* holds the
GIL-adjacent native loop and cannot be interrupted in-thread, but a
process past its deadline can always be SIGKILLed.

Usage: oracle_gate.py <oracle_json> <sfDir> <timeout_sec> [workers]
Prints one line per oracle (runtime, row count) sorted slowest-first
at the end; exit 0 iff all oracles finished in budget.
"""
import glob
import json
import multiprocessing as mp
import os
import sys
import time


def _run(name, sql, sfdir, q):
    import duckdb
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.monotonic()
    rows = len(con.execute(sql).fetchall())
    q.put((name, time.monotonic() - t0, rows))


def main():
    oracle_json, sfdir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3])
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    oracle = json.load(open(oracle_json))
    pending = sorted(oracle.items())
    running = {}  # name -> (proc, start)
    q = mp.Queue()
    done, failed = {}, []
    while pending or running:
        while pending and len(running) < workers:
            name, sql = pending.pop()
            proc = mp.Process(target=_run, args=(name, sql, sfdir, q))
            proc.start()
            running[name] = (proc, time.monotonic())
        # drain results
        try:
            while True:
                n, dt, rows = q.get_nowait()
                done[n] = (dt, rows)
        except Exception:
            pass
        now = time.monotonic()
        for name in list(running):
            proc, start = running[name]
            if not proc.is_alive():
                proc.join()
                del running[name]
                if name not in done and proc.exitcode != 0:
                    failed.append((name, f"exit {proc.exitcode}"))
            elif now - start > budget:
                proc.kill()
                proc.join()
                del running[name]
                failed.append((name, f"TIMEOUT >{budget:.0f}s"))
        time.sleep(0.02)
    # one more drain (results may land between checks)
    try:
        while True:
            n, dt, rows = q.get_nowait()
            done[n] = (dt, rows)
    except Exception:
        pass
    failed = [f for f in failed if f[0] not in done]
    for name, (dt, rows) in sorted(done.items(), key=lambda kv: -kv[1][0]):
        print(f"OK   {dt:7.2f}s {rows:8d} rows  {name}")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    missing = set(oracle) - set(done) - {f[0] for f in failed}
    for name in sorted(missing):
        print(f"FAIL {name}: no result")
    print(f"{len(done)}/{len(oracle)} oracles ok, {len(failed) + len(missing)} failed")
    sys.exit(0 if not failed and not missing else 1)


if __name__ == "__main__":
    main()
