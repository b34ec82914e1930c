#!/usr/bin/env python3
"""Driver-faithful gate replica: dtype-STRICT compare of graft.Verify
parquet dumps against DuckDB oracle SQL.

The round gate loads both sides into pandas, sorts columns by name, sorts
rows, and hashes typed values — so an int64 Spark column vs a float64
oracle column (DuckDB HUGEINT/`//` widening) is a red row even when every
value is equal, and an array-typed cell crashes the sort outright. The
older tools/compare_oracle.py normalizes types and so cannot see those
seams; THIS script reproduces them:

  * dtype FAMILY mismatch (int-like vs float vs string vs datetime)
    between Spark and oracle                        -> FAIL (dtype seam)
    (pandas hashes bool/int32/int64 of equal values identically — the
    driver accepts width differences — but int vs float never matches)
  * any object-dtype cell holding a list/ndarray    -> FAIL (unsortable)
  * row-hash mismatch after lexicographic sort      -> FAIL (hash)

Run before every snapshot commit:
  python3 tools/gate_strict.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def load_spark(con, out_dir, name):
    return con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()


def canon(df):
    """Driver shape: columns sorted by name, rows lexicographically sorted."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def unsortable_cols(df):
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            head = df[c].head(50)
            if any(isinstance(v, (list, np.ndarray, dict)) for v in head):
                bad.append(c)
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        try:
            sdf = load_spark(con, out_dir, name)
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failures += 1
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        osec = time.time() - t0
        bad = unsortable_cols(sdf) + unsortable_cols(odf)
        if bad:
            print(f"FAIL {name}: unsortable array/object columns {sorted(set(bad))}")
            failures += 1
            continue
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: schema {list(s.columns)} != {list(o.columns)}")
            failures += 1
            continue
        def family(dt):
            k = dt.kind  # b/i/u -> int-like (hash-equivalent in pandas)
            return {"b": "int", "i": "int", "u": "int", "f": "float",
                    "M": "datetime", "m": "timedelta"}.get(k, "obj")

        dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
              if family(s[c].dtype) != family(o[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype seam {dt}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} != {len(o)}")
            failures += 1
            continue
        # Typed row hash, the driver's equality: exact for ints/strings/
        # bools; float64 compared bit-for-float after both engines' own
        # rounding (the suite rounds every float column on both sides).
        sh = pd.util.hash_pandas_object(s, index=False)
        oh = pd.util.hash_pandas_object(o, index=False)
        if not sh.equals(oh):
            n = int((sh != oh).sum())
            idx = (sh != oh).idxmax()
            print(f"FAIL {name}: {n} row-hash diffs; first at row {idx}:\n"
                  f"  spark : {s.iloc[idx].to_dict()}\n"
                  f"  oracle: {o.iloc[idx].to_dict()}")
            failures += 1
            continue
        print(f"OK   {name} ({len(s)} rows, oracle {osec:.1f}s)", flush=True)
    n = len(oracle)
    print(f"\n{n - failures}/{n} strict-green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
