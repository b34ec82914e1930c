#!/usr/bin/env python3
"""Compare graft.Verify parquet dumps against DuckDB oracle SQL.

Mirrors the driver's t2 gate: for each query, sort columns by name,
sort rows, and compare values (exact for ints/strings, exact-bits for
doubles since both sides are built to be deterministic).
"""
import json
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=repr)
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            scols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failures += 1
            continue
        oc, orows = canon(odf, ocols)
        sc, srows = canon(sdf, scols)
        if oc != sc:
            print(f"FAIL {name}: schema {sc} != oracle {oc}")
            failures += 1
        elif orows != srows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows; "
                  f"first diffs: {diff[:3]}"
                  if len(srows) == len(orows) else
                  f"FAIL {name}: row count {len(srows)} != {len(orows)}; "
                  f"spark[:2]={srows[:2]} oracle[:2]={orows[:2]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
