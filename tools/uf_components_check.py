#!/usr/bin/env python3
"""Independent union-find validation of the three component-labelling
queries (q_dedup_clusters, q_components, q_dedup_semantic) at scales
where their recursive-CTE oracles are infeasible.

The shipped oracle SQLs compute components as a TRANSITIVE CLOSURE
(`reach` = every reachable pair) — exact, and fine at the driver's
sf0.01 gate, but the closure materializes O(|component|^2) rows: at sf1
the cosine graph has ~5e5 edges and a giant component, so the recursive
CTE never finishes. This tool recomputes the SAME spec a different way:
edge sets via the oracles' own non-recursive prefixes in DuckDB, then
path-compressed union-find over them, then an exact (node -> min-id
component) compare against the engine's parquet output. Algorithm
diversity is the point — a labelling bug cannot cancel out between the
engine's large-star/small-star iteration and this driver-side
union-find.

Usage: uf_components_check.py <sfDir> <verifyOutDir> <sf001OutDir>
  sfDir        parquet tables (e.g. /tmp/graft_sf1)
  verifyOutDir graft.Verify output for that sf (engine results)
  sf001OutDir  any Verify outDir whose oracle_sql.json still carries the
               q_dedup_semantic SQL (source of the inlined hyperplane
               literals; the sf0.01 gate dir works)
"""
import json
import sys

import duckdb


def uf_components(nodes, edges):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def main():
    sf_dir, out_dir, sf001_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    ok = True

    def check(name, labels, engine_sql, with_keep=False):
        nonlocal ok
        eng = con.execute(engine_sql).fetchall()
        if with_keep:
            got = {r[0]: (r[1], r[2]) for r in eng}
            exp = {n: (c, n == c) for n, c in labels.items()}
        else:
            got = {r[0]: r[1] for r in eng}
            exp = labels
        miss = {k: (exp[k], got.get(k)) for k in exp if got.get(k) != exp[k]}
        extra = set(got) - set(exp)
        status = "OK" if not miss and not extra else "MISMATCH"
        if status != "OK":
            ok = False
        print(f"{status:8s} {name}: nodes={len(exp)} mismatches={len(miss)} "
              f"extra={len(extra)}"
              + (f" sample={list(miss.items())[:3]}" if miss else ""))

    emb = f"'{sf_dir}/embeddings.parquet'"

    # q_dedup_clusters: exact cosine >= 0.35 edges (same predicate as the
    # oracle's non-recursive `pairs` CTE)
    edges = con.execute(f"""
      SELECT a.vec_id, b.vec_id
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {emb}) a
      JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {emb}) b
        ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e) /
        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
        >= 0.35
    """).fetchall()
    nodes = [r[0] for r in con.execute(f"SELECT vec_id FROM {emb}").fetchall()]
    print(f"[uf] q_dedup_clusters edges={len(edges)}")
    check("q_dedup_clusters", uf_components(nodes, edges),
          f"SELECT id, component FROM '{out_dir}/q_dedup_clusters/*.parquet'")

    # q_components: item co-occurrence graph (pair count >= 3)
    edges2 = con.execute(f"""
      WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                 FROM '{sf_dir}/lineitem.parquet')
      SELECT a.it, b2.it FROM b a JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it
      GROUP BY a.it, b2.it HAVING count(*) >= 3
    """).fetchall()
    nodes2 = sorted({x for e in edges2 for x in e})
    print(f"[uf] q_components edges={len(edges2)} nodes={len(nodes2)}")
    check("q_components", uf_components(nodes2, edges2),
          f"SELECT id, component FROM '{out_dir}/q_components/*.parquet'")

    # q_dedup_semantic: coarse-bucket pairs — the hyperplane literals live
    # only in the generated oracle SQL, so reuse its non-recursive prefix
    osql = json.load(open(f"{sf001_dir}/oracle_sql.json"))["q_dedup_semantic"]
    prefix = osql.split("), sym AS (")[0].replace("WITH RECURSIVE", "WITH") + ")"
    con.execute(f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM {emb}")
    edges3 = con.execute(prefix + "\nSELECT id_a, id_b FROM pairs").fetchall()
    print(f"[uf] q_dedup_semantic edges={len(edges3)}")
    check("q_dedup_semantic", uf_components(nodes, edges3),
          f"SELECT id, component, keep FROM "
          f"'{out_dir}/q_dedup_semantic/*.parquet'", with_keep=True)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
