#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads a graft.Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same parquet tables, and
compares: schema (column names sorted), row count, and values (rows in
the produced order, columns sorted by name — like the driver's hash).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style: exact doubles expected (Det protocol); repr keeps ulps
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main(sf_dir, out_dir, json_out=None, skip=()):
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written lake (ScaleLake): dir of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # validate the skip list (ADVICE r20): a misspelled entry would
    # silently drop a real query from the gate while still exiting 0
    unknown = set(skip) - set(oracle)
    if unknown:
        print(f"ERROR: skip list names unknown queries: {sorted(unknown)}")
        return 2
    if skip:
        print(f"[compare] SKIPPING {len(set(skip))} queries "
              f"(replica_check.py covers them): {sorted(set(skip))}",
              flush=True)
    results = {}
    import time
    for name in sorted(oracle):
        if name in skip:
            # declared O(n^2)-oracle exact baselines whose DuckDB replay
            # is priced out at big SFs; tools/replica_check.py covers them
            results[name] = "SKIPPED_oracle_infeasible_at_sf"
            continue
        sql = oracle[name]
        t0 = time.time()
        print(f"[compare] {name} ...", flush=True)
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            results[name] = f"NO_SPARK_OUTPUT {e}"
            continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {type(e).__name__}: {e}"
            continue
        sc, dc = sorted(spark.columns), sorted(duck.columns)
        if sc != dc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} duck={dc}"
            continue
        if len(spark) != len(duck):
            results[name] = f"ROWCOUNT spark={len(spark)} duck={len(duck)}"
            continue
        s_rows = spark[sc].values.tolist()
        d_rows = duck[sc].values.tolist()
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            na, nb = [norm(x) for x in a], [norm(x) for x in b]
            if na != nb:
                bad = (i, na, nb)
                break
        results[name] = "OK" if bad is None else \
            f"VALUE_MISMATCH row {bad[0]}: spark={bad[1]} duck={bad[2]}"
        print(f"[compare] {name}: {results[name][:60]} "
              f"({time.time() - t0:.1f}s)", flush=True)
    n_ok = sum(1 for v in results.values() if v == "OK")
    n_skip = sum(1 for v in results.values() if v.startswith("SKIPPED"))
    for name, v in results.items():
        if v != "OK" and not v.startswith("SKIPPED"):
            print(f"FAIL {name}: {v}")
    print(f"\n{n_ok}/{len(results) - n_skip} oracle-checked queries OK "
          f"({len(results)} with oracle, {n_skip} skipped)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "n_ok": n_ok, "n_total": len(results),
                       "results": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0 if n_ok + n_skip == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  set(sys.argv[4].split(",")) if len(sys.argv) > 4 else ()))
