#!/usr/bin/env python3
"""Decade-correctness check for the pair-dedup queries whose DuckDB
oracles are declared O(n^2) exact baselines and priced out at sf1
(llm2/llm2b exact Jaccard, llm2e containment, llm12 dup clusters).

ScaleLake's construction makes their sf1 ground truth DERIVABLE from the
sf0.1 oracle (feasible in DuckDB) plus a SMALL exactly-computable
cross-replica candidate set:

 - within a replica, the token rewrite (tok -> tok_r<r>) is injective on
   shingles, so |A|, |B|, |A n B| — hence Jaccard and containment — are
   EXACTLY preserved: each replica's pair set is the sf0.1 pair set with
   doc_ids shifted by r*docK;
 - across replicas r1 != r2, a shingle survives shared only if NO token
   of it was rewritten in either copy, so cross-replica Jaccard (and
   containment) is <= the ORIGINAL pair's value. A cross-replica pair at
   threshold therefore requires the original pair (or the identity twin,
   J=1) to be at threshold — the candidate set is CLOSED:
   {(d+r1K, d+r2K)} u {(a+r1K, b+r2K), (b+r1K, a+r2K) : (a,b) in pairs01}
   and the check computes those few candidates' exact values on the sf1
   text directly.

The check is conservative: any deviation (a lost pair, a drifted value, a
genuine cross-replica pair the engine missed) fails the compare; it can
false-fail, never false-pass.

Usage: replica_check.py <sf01Dir> <sf1Dir> <verifySf1Dir> [outJson]
"""
import json
import math
import sys

import duckdb

# The engine's own oracle form (exactJaccardSql) is an all-pairs nested
# loop — DuckDB runs it single-threaded and it is the reason sf1 is
# priced out. The sf0.1 ground truth here uses the POSTING-LIST form
# instead: identical exact values (a pair sharing zero shingles has
# J = 0 < threshold and C = 0, so restricting to co-posting pairs loses
# nothing), but it parallelizes as hash joins.
POSTINGS_CTE = """
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in range(1, len(w) - 1)]) AS ws
       FROM d WHERE len(w) >= 3),
sz AS (SELECT doc_id, len(ws) AS n FROM sh),
post AS (SELECT doc_id, unnest(ws) AS g FROM sh),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
  FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)"""

JACCARD_SQL = POSTINGS_CTE + """
SELECT a_id, b_id,
  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM common JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
ORDER BY a_id, b_id"""

CONTAIN_SQL = POSTINGS_CTE + """
, directed AS (
  SELECT a_id, b_id, c FROM common
  UNION ALL SELECT b_id, a_id, c FROM common)
SELECT a_id, b_id, CAST(c AS DOUBLE) / sa.n AS containment
FROM directed JOIN sz sa ON sa.doc_id = a_id
WHERE sa.n >= 5 AND CAST(c AS DOUBLE) / sa.n >= 0.9
ORDER BY a_id, b_id"""

# exact pair metrics on the sf1 text, restricted to an explicit candidate
# id table (no cartesian anywhere near sf1)
CAND_METRICS_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in range(1, len(w) - 1)]) AS ws
       FROM d WHERE len(w) >= 3)
SELECT c.a_id, c.b_id,
  CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
    len(list_distinct(list_concat(a.ws, b.ws))) AS jaccard,
  CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) / len(a.ws)
    AS containment,
  len(a.ws) AS n_a
FROM cand c JOIN sh a ON c.a_id = a.doc_id JOIN sh b ON c.b_id = b.doc_id"""


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def compare(name, expected_rows, verify_dir, con, results):
    got = con.execute(
        f"SELECT * FROM '{verify_dir}/{name}/*.parquet'").fetchall()
    if len(got) != len(expected_rows):
        results[name] = f"ROWCOUNT spark={len(got)} expected={len(expected_rows)}"
        return
    for i, (g, e) in enumerate(zip(got, expected_rows)):
        ng, ne = [norm(x) for x in g], [norm(x) for x in e]
        if ng != ne:
            results[name] = f"VALUE_MISMATCH row {i}: spark={ng} expected={ne}"
            return
    results[name] = "OK"


def main(sf01, sf1, vdir, out_json=None):
    con = duckdb.connect()

    def docs_view(d):
        p = f"{d}/documents.parquet"
        import os
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute("CREATE OR REPLACE VIEW documents AS "
                    f"SELECT * FROM '{p}'")

    docs_view(sf01)
    dock = con.execute(
        "SELECT max(doc_id) + 1 FROM documents").fetchone()[0]
    n01 = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    k = 10  # ScaleLake default replica count; verified against row count
    pairs01 = con.execute(JACCARD_SQL).fetchall()
    cont01 = con.execute(CONTAIN_SQL).fetchall()
    print(f"[replica] sf0.1: {len(pairs01)} jaccard pairs, "
          f"{len(cont01)} containment pairs, docK={dock}", flush=True)

    docs_view(sf1)
    n1 = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert n1 == k * n01, f"sf1 doc count {n1} != {k}x{n01}"

    # cross-replica candidates: identity twins + original-pair derived
    cands = set()
    for r1 in range(k):
        for r2 in range(r1 + 1, k):
            for d in range(dock):
                cands.add((d + r1 * dock, d + r2 * dock))
            for a, b, _ in pairs01:
                cands.add((a + r1 * dock, b + r2 * dock))
                cands.add((b + r1 * dock, a + r2 * dock))
            for a, b, _ in cont01:
                cands.add((a + r1 * dock, b + r2 * dock))
                cands.add((b + r1 * dock, a + r2 * dock))
    # containment is DIRECTED: every candidate needs both orientations
    # (jaccard's a<b filter dedups the mirror; containment reads it)
    cands |= {(b, a) for (a, b) in cands}
    con.execute("CREATE OR REPLACE TABLE cand(a_id BIGINT, b_id BIGINT)")
    con.executemany("INSERT INTO cand VALUES (?, ?)", sorted(cands))
    cand_rows = con.execute(CAND_METRICS_SQL).fetchall()
    cross_j = [(a, b, j) for a, b, j, c, na in cand_rows
               if a < b and j >= 0.8]
    cross_c = [(a, b, c) for a, b, j, c, na in cand_rows
               if na >= 5 and c >= 0.9]
    print(f"[replica] cross-replica: {len(cross_j)} jaccard pairs, "
          f"{len(cross_c)} containment pairs over {len(cands)} candidates",
          flush=True)

    # expected pair sets = shifted within-replica u cross-replica
    exp_j = sorted(
        [(a + r * dock, b + r * dock, j)
         for r in range(k) for a, b, j in pairs01] + cross_j)
    exp_c = sorted(
        [(a + r * dock, b + r * dock, c)
         for r in range(k) for a, b, c in cont01] + cross_c)

    # expected clusters: union-find over the expected jaccard edge set
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b, _ in exp_j:
        union(a, b)
    exp_cl = [(d, find(d) if d in parent else d,
               (find(d) if d in parent else d) == d)
              for d in range(n1)]

    results = {}
    compare("llm2_minhash_lsh", exp_j, vdir, con, results)
    compare("llm2b_ngram_jaccard", exp_j, vdir, con, results)
    compare("llm2e_containment", exp_c, vdir, con, results)
    compare("llm12_dup_clusters", exp_cl, vdir, con, results)
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(f"[replica] {name}: {v}")
    print(f"\n{n_ok}/{len(results)} replica-decomposition checks OK")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf01": sf01, "sf1": sf1, "k": k,
                       "pairs_sf01": len(pairs01),
                       "cross_replica_pairs": len(cross_j),
                       "n_ok": n_ok, "n_total": len(results),
                       "results": results}, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  sys.argv[4] if len(sys.argv) > 4 else None))
