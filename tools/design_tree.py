#!/usr/bin/env python3
"""Design pass for ml_tree_fit / ml_tree_predict (r16).

Generates the unrolled MATERIALIZED-CTE oracle SQL for the
depth-bounded EXACT regression tree (integer-mean SSE, greedy
threshold search, total-order ties), runs it in DuckDB on the sf0.01
events table, and cross-checks it against an independent pure-Python
replay of the algorithm. Both must agree on every node row before the
Scala implementation exists — the numpy-pre-census discipline.

Usage: python3 tools/design_tree.py [sf_dir]
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
D = 3  # split levels 0..D-1; leaves at depth <= D

BASE = """
  SELECT CAST(round(value) AS BIGINT) AS f1,
         event_id % 97 AS f2,
         CASE WHEN round(value) <= 245 THEN 10 * (event_id % 97)
              ELSE 1000 - (event_id % 97) END
           + CAST(round(value) AS BIGINT) AS y
  FROM events
"""

def level_ctes(lvl):
    """candidate scan + best split + next assignment for one level."""
    return f"""c{lvl} AS MATERIALIZED (
  SELECT node, fi, v,
    sum(c)  OVER w AS cl,  sum(sy)  OVER w AS syl,  sum(syy) OVER w AS syyl,
    sum(c)  OVER t AS ct,  sum(sy)  OVER t AS syt,  sum(syy) OVER t AS syyt
  FROM (
    SELECT node, 0 AS fi, f1 AS v, count(*) AS c, sum(y) AS sy,
      sum(y*y) AS syy FROM a{lvl} GROUP BY 1, 3
    UNION ALL
    SELECT node, 1 AS fi, f2 AS v, count(*) AS c, sum(y) AS sy,
      sum(y*y) AS syy FROM a{lvl} GROUP BY 1, 3)
  WINDOW w AS (PARTITION BY node, fi ORDER BY v),
         t AS (PARTITION BY node, fi)),
s{lvl} AS MATERIALIZED (
  SELECT node, fi, v, ct, syt, syyt FROM (
    SELECT *, row_number() OVER (PARTITION BY node ORDER BY sse, fi, v) AS rk
    FROM (
      SELECT *,
        (syyl - 2*(syl // cl)*syl + (syl // cl)*(syl // cl)*cl)
        + ((syyt - syyl) - 2*((syt - syl) // (ct - cl))*(syt - syl)
           + ((syt - syl) // (ct - cl))*((syt - syl) // (ct - cl))*(ct - cl))
          AS sse
      FROM c{lvl} WHERE ct - cl > 0) x) z WHERE rk = 1),
a{lvl + 1} AS MATERIALIZED (
  SELECT CASE WHEN s.node IS NULL THEN a.node
    ELSE a.node * 2 + CASE WHEN (s.fi = 0 AND a.f1 <= s.v)
                            OR (s.fi = 1 AND a.f2 <= s.v) THEN 0 ELSE 1 END
    END AS node, a.f1, a.f2, a.y
  FROM a{lvl} a LEFT JOIN s{lvl} s ON s.node = a.node)"""

def chain():
    parts = [f"base AS MATERIALIZED ({BASE})",
             "a0 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS node, f1, f2, y FROM base)"]
    parts += [level_ctes(l) for l in range(D)]
    return ",\n".join(parts)

def split_select(lvl):
    return f"""SELECT node, CAST({lvl} AS BIGINT) AS depth,
  CAST(ct AS BIGINT) AS n, CAST(syt AS BIGINT) AS sum_y,
  CAST(syyt - 2*(syt // ct)*syt + (syt // ct)*(syt // ct)*ct AS BIGINT) AS sse,
  CASE fi WHEN 0 THEN 'f1' ELSE 'f2' END AS feature,
  v AS threshold,
  CAST((syt * 1000000) // ct AS BIGINT) AS pred_micros,
  FALSE AS is_leaf
FROM s{lvl}"""

FIT_SQL = f"""WITH {chain()},
leafstats AS (SELECT node, count(*) AS c, sum(y) AS sy, sum(y*y) AS syy
  FROM a{D} GROUP BY 1)
{" UNION ALL ".join(split_select(l) for l in range(D))}
UNION ALL
SELECT node, CAST(length(bin(node)) - 1 AS BIGINT) AS depth,
  CAST(c AS BIGINT) AS n, CAST(sy AS BIGINT) AS sum_y,
  CAST(syy - 2*(sy // c)*sy + (sy // c)*(sy // c)*c AS BIGINT) AS sse,
  CAST(NULL AS VARCHAR) AS feature, CAST(NULL AS BIGINT) AS threshold,
  CAST((sy * 1000000) // c AS BIGINT) AS pred_micros,
  TRUE AS is_leaf
FROM leafstats"""

PREDICT_SQL = f"""WITH {chain()},
leafpred AS (SELECT node,
    (CAST(sum(y) AS HUGEINT) * 1000000) // count(*) AS pm
  FROM a{D} GROUP BY 1)
SELECT CAST(p.pm AS BIGINT) AS pred_micros, count(*) AS n,
  CAST(sum(a.y) AS BIGINT) AS sum_y
FROM a{D} a JOIN leafpred p USING (node) GROUP BY 1"""


# ---------- independent pure-python replay ----------

def replay(rows):
    """rows: list of (f1, f2, y) python ints. Returns node-row dicts."""
    def sse(c, sy, syy):
        m = sy // c
        return syy - 2 * m * sy + m * m * c

    out = []
    frontier = {1: rows}
    for depth in range(D + 1):
        nxt = {}
        for node in sorted(frontier):
            rs = frontier[node]
            c = len(rs)
            sy = sum(r[2] for r in rs)
            syy = sum(r[2] * r[2] for r in rs)
            best = None  # (sse, fi, v)
            if depth < D:
                for fi in (0, 1):
                    groups = {}
                    for r in rs:
                        g = groups.setdefault(r[fi], [0, 0, 0])
                        g[0] += 1
                        g[1] += r[2]
                        g[2] += r[2] * r[2]
                    vs = sorted(groups)
                    cl = syl = syyl = 0
                    for v in vs[:-1]:
                        g = groups[v]
                        cl += g[0]; syl += g[1]; syyl += g[2]
                        cr, syr, syyr = c - cl, sy - syl, syy - syyl
                        sc = sse(cl, syl, syyl) + sse(cr, syr, syyr)
                        cand = (sc, fi, v)
                        if best is None or cand < best:
                            best = cand
            if best is None:
                out.append(dict(node=node, depth=depth, n=c, sum_y=sy,
                                sse=sse(c, sy, syy), feature=None,
                                threshold=None,
                                pred_micros=(sy * 1000000) // c,
                                is_leaf=True))
            else:
                _, fi, v = best
                out.append(dict(node=node, depth=depth, n=c, sum_y=sy,
                                sse=sse(c, sy, syy),
                                feature='f1' if fi == 0 else 'f2',
                                threshold=v,
                                pred_micros=(sy * 1000000) // c,
                                is_leaf=False))
                left = [r for r in rs if r[fi] <= v]
                right = [r for r in rs if r[fi] > v]
                nxt[node * 2] = left
                nxt[node * 2 + 1] = right
        frontier = nxt
    return out


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    sql_rows = con.execute(FIT_SQL).fetchall()
    cols = [d[0] for d in con.description]
    sql_nodes = sorted([dict(zip(cols, r)) for r in sql_rows],
                       key=lambda d: d["node"])

    raw = con.execute(f"SELECT f1, f2, y FROM ({BASE})").fetchall()
    py_nodes = sorted(replay([(int(a), int(b), int(c)) for a, b, c in raw]),
                      key=lambda d: d["node"])

    ok = True
    if len(sql_nodes) != len(py_nodes):
        print(f"FAIL: {len(sql_nodes)} sql nodes vs {len(py_nodes)} replay")
        ok = False
    for a, b in zip(sql_nodes, py_nodes):
        if a != b:
            print("FAIL node mismatch:\n  sql   ", a, "\n  replay", b)
            ok = False
    print(f"{'OK' if ok else 'FAIL'}: {len(sql_nodes)} node rows agree "
          f"(DuckDB CTE chain vs python replay) on {SF}")
    for n in sql_nodes:
        print("  ", n)
    pred = con.execute(PREDICT_SQL).fetchall()
    print(f"predict groups: {len(pred)}; total n = {sum(r[1] for r in pred)}")
    if "--emit-sql" in sys.argv:
        print("=== FIT_SQL ===\n" + FIT_SQL)
        print("=== PREDICT_SQL ===\n" + PREDICT_SQL)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
