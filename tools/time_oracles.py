#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given SF with a per-query
timeout (separate process per query so a quadratic arm can be killed):
  python3 tools/time_oracles.py <sfdir> <outdir> [timeout_sec] [only...]
Prints one line per query: seconds or TIMEOUT/ERROR.
"""
import json
import multiprocessing as mp
import sys
import time


def run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    con.execute(sql).fetchall()
    q.put(time.time() - t0)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
    only = set(sys.argv[4:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name in sorted(oracle):
        if only and name not in only:
            continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, oracle[name], q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"TIMEOUT {name} (> {timeout:.0f}s)", flush=True)
        elif not q.empty():
            print(f"{q.get():8.1f}s {name}", flush=True)
        else:
            print(f"ERROR   {name} (exit {p.exitcode})", flush=True)


if __name__ == "__main__":
    main()
