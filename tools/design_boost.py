#!/usr/bin/env python3
"""Design pass for ml_boost_fit / ml_boost_predict (r16).

The EXACT boosted ensemble: gradient boosting with squared loss over
the exact regression tree (design_tree.py), kept bit-replayable by
integer arithmetic — each round fits the exact tree to the SHIFTED
integer residual (residual minus its corpus min, so the tree's
nonneg-label contract holds; SSE and every split decision are
shift-invariant because integer-floor means shift exactly by integer
offsets), and the round's contribution is leaf floor-mean + offset
(unit scale, learning rate 1). Generates the unrolled
MATERIALIZED-CTE oracle (rounds x levels chained, the BPE-merge
discipline), runs it in DuckDB on sf0.01, and cross-checks against an
independent pure-python replay. Both must agree on every node row
before the Scala implementation exists.

Usage: python3 tools/design_boost.py [sf_dir]
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
R = 3  # boosting rounds
D = 2  # split levels per tree

BASE = """
  SELECT CAST(round(value) AS BIGINT) AS f1,
         event_id % 97 AS f2,
         CASE WHEN round(value) <= 245 THEN 10 * (event_id % 97)
              ELSE 1000 - (event_id % 97) END
           + CAST(round(value) AS BIGINT) AS y
  FROM events
"""


def level_ctes(g, lvl):
    """One tree level for round g: histogram over the shifted residual
    yy, rows carry (y, pred) through for the next round."""
    p = f"g{g}"
    return f"""{p}c{lvl} AS MATERIALIZED (
  SELECT node, fi, v,
    sum(c)  OVER w AS cl,  sum(sy)  OVER w AS syl,  sum(syy) OVER w AS syyl,
    sum(c)  OVER t AS ct,  sum(sy)  OVER t AS syt,  sum(syy) OVER t AS syyt
  FROM (
    SELECT node, 0 AS fi, f1 AS v, count(*) AS c, sum(yy) AS sy,
      sum(yy*yy) AS syy FROM {p}a{lvl} GROUP BY 1, 3
    UNION ALL
    SELECT node, 1 AS fi, f2 AS v, count(*) AS c, sum(yy) AS sy,
      sum(yy*yy) AS syy FROM {p}a{lvl} GROUP BY 1, 3)
  WINDOW w AS (PARTITION BY node, fi ORDER BY v),
         t AS (PARTITION BY node, fi)),
{p}s{lvl} AS MATERIALIZED (
  SELECT node, fi, v, ct, syt, syyt FROM (
    SELECT *, row_number() OVER (PARTITION BY node ORDER BY sse, fi, v) AS rk
    FROM (
      SELECT *,
        (syyl - 2*(syl // cl)*syl + (syl // cl)*(syl // cl)*cl)
        + ((syyt - syyl) - 2*((syt - syl) // (ct - cl))*(syt - syl)
           + ((syt - syl) // (ct - cl))*((syt - syl) // (ct - cl))*(ct - cl))
          AS sse
      FROM {p}c{lvl} WHERE ct - cl > 0) x) z WHERE rk = 1),
{p}a{lvl + 1} AS MATERIALIZED (
  SELECT CASE WHEN s.node IS NULL THEN a.node
    ELSE a.node * 2 + CASE WHEN (s.fi = 0 AND a.f1 <= s.v)
                            OR (s.fi = 1 AND a.f2 <= s.v) THEN 0 ELSE 1 END
    END AS node, a.f1, a.f2, a.y, a.pred, a.yy
  FROM {p}a{lvl} a LEFT JOIN {p}s{lvl} s ON s.node = a.node)"""


def round_ctes(g):
    """Residual -> offset shift -> tree levels -> leaf fold for round g."""
    p = f"g{g}"
    prev = "r0" if g == 1 else f"g{g - 1}next"
    parts = [
        f"""{p}off AS ({{}}SELECT min(y - pred) AS o FROM {prev})""".format(""),
        f"""{p}a0 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS node, f1, f2, y, pred,
    y - pred - (SELECT o FROM {p}off) AS yy FROM {prev})""",
    ]
    parts += [level_ctes(g, l) for l in range(D)]
    parts += [
        f"""{p}leaf AS (SELECT node, count(*) AS c, sum(yy) AS sy,
  sum(yy*yy) AS syy FROM {p}a{D} GROUP BY 1)""",
        f"""{p}next AS MATERIALIZED (
  SELECT a.f1, a.f2, a.y,
    a.pred + (l.sy // l.c) + (SELECT o FROM {p}off) AS pred
  FROM {p}a{D} a JOIN {p}leaf l USING (node))""",
    ]
    return ",\n".join(parts)


def chain():
    parts = [
        f"base AS MATERIALIZED ({BASE})",
        """r0 AS MATERIALIZED (SELECT f1, f2, y,
  (SELECT sum(y) // count(*) FROM base) AS pred FROM base)""",
    ]
    parts += [round_ctes(g) for g in range(1, R + 1)]
    return ",\n".join(parts)


def split_select(g, lvl):
    p = f"g{g}"
    return f"""SELECT CAST({g} AS BIGINT) AS round, node,
  CAST({lvl} AS BIGINT) AS depth,
  CAST(ct AS BIGINT) AS n, CAST(syt AS BIGINT) AS sum_y,
  CAST(syyt - 2*(syt // ct)*syt + (syt // ct)*(syt // ct)*ct AS BIGINT) AS sse,
  CASE fi WHEN 0 THEN 'f1' ELSE 'f2' END AS feature,
  v AS threshold,
  CAST((syt // ct) + (SELECT o FROM {p}off) AS BIGINT) AS contrib,
  FALSE AS is_leaf
FROM {p}s{lvl}"""


def leaf_select(g):
    p = f"g{g}"
    return f"""SELECT CAST({g} AS BIGINT) AS round, node,
  CAST(length(bin(node)) - 1 AS BIGINT) AS depth,
  CAST(c AS BIGINT) AS n, CAST(sy AS BIGINT) AS sum_y,
  CAST(syy - 2*(sy // c)*sy + (sy // c)*(sy // c)*c AS BIGINT) AS sse,
  CAST(NULL AS VARCHAR) AS feature, CAST(NULL AS BIGINT) AS threshold,
  CAST((sy // c) + (SELECT o FROM {p}off) AS BIGINT) AS contrib,
  TRUE AS is_leaf
FROM {p}leaf"""


FIT_SQL = f"""WITH {chain()}
SELECT CAST(0 AS BIGINT) AS round, CAST(1 AS BIGINT) AS node,
  CAST(0 AS BIGINT) AS depth,
  count(*) AS n, CAST(sum(y) AS BIGINT) AS sum_y,
  CAST(sum(y*y) - 2*(sum(y) // count(*))*sum(y)
    + (sum(y) // count(*))*(sum(y) // count(*))*count(*) AS BIGINT) AS sse,
  CAST(NULL AS VARCHAR) AS feature, CAST(NULL AS BIGINT) AS threshold,
  CAST(sum(y) // count(*) AS BIGINT) AS contrib,
  TRUE AS is_leaf
FROM base
UNION ALL
{" UNION ALL ".join(
    " UNION ALL ".join(split_select(g, l) for l in range(D))
    + " UNION ALL " + leaf_select(g)
    for g in range(1, R + 1))}"""

PREDICT_SQL = f"""WITH {chain()}
SELECT CAST(pred AS BIGINT) AS pred, count(*) AS n,
  CAST(sum(y) AS BIGINT) AS sum_y
FROM g{R}next GROUP BY 1"""


# ---------- independent pure-python replay ----------

def sse_i(c, sy, syy):
    m = sy // c
    return syy - 2 * m * sy + m * m * c


def fit_tree(rows):
    """rows: (f1, f2, yy). Returns (node dicts, leaf assign fn)."""
    out = []
    leaves = {}
    frontier = {1: rows}
    for depth in range(D + 1):
        nxt = {}
        for node in sorted(frontier):
            rs = frontier[node]
            c = len(rs)
            sy = sum(r[2] for r in rs)
            syy = sum(r[2] * r[2] for r in rs)
            best = None
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
                        gg = groups[v]
                        cl += gg[0]; syl += gg[1]; syyl += gg[2]
                        sc = sse_i(cl, syl, syyl) + sse_i(c - cl, sy - syl,
                                                          syy - syyl)
                        cand = (sc, fi, v)
                        if best is None or cand < best:
                            best = cand
            if best is None:
                out.append(dict(node=node, depth=depth, n=c, sum_y=sy,
                                sse=sse_i(c, sy, syy), feature=None,
                                threshold=None, leaf_mean=sy // c,
                                is_leaf=True))
                leaves[node] = sy // c
            else:
                _, fi, v = best
                out.append(dict(node=node, depth=depth, n=c, sum_y=sy,
                                sse=sse_i(c, sy, syy),
                                feature='f1' if fi == 0 else 'f2',
                                threshold=v, leaf_mean=sy // c,
                                is_leaf=False))
                nxt[node * 2] = [r for r in rs if r[fi] <= v]
                nxt[node * 2 + 1] = [r for r in rs if r[fi] > v]
        frontier = nxt
    return out


def assign(nodes_by_id, f1, f2):
    node = 1
    while not nodes_by_id[node]["is_leaf"]:
        nd = nodes_by_id[node]
        x = f1 if nd["feature"] == "f1" else f2
        node = node * 2 + (0 if x <= nd["threshold"] else 1)
    return node


def replay(rows):
    """rows: (f1, f2, y). Returns (fit node dicts, per-row preds)."""
    n = len(rows)
    p0 = sum(r[2] for r in rows) // n
    sy = sum(r[2] for r in rows)
    syy = sum(r[2] * r[2] for r in rows)
    out = [dict(round=0, node=1, depth=0, n=n, sum_y=sy,
                sse=sse_i(n, sy, syy), feature=None, threshold=None,
                contrib=p0, is_leaf=True)]
    preds = [p0] * n
    for g in range(1, R + 1):
        resid = [rows[i][2] - preds[i] for i in range(n)]
        off = min(resid)
        yy = [(rows[i][0], rows[i][1], resid[i] - off) for i in range(n)]
        tree = fit_tree(yy)
        by_id = {t["node"]: t for t in tree}
        for t in tree:
            out.append(dict(round=g, node=t["node"], depth=t["depth"],
                            n=t["n"], sum_y=t["sum_y"], sse=t["sse"],
                            feature=t["feature"], threshold=t["threshold"],
                            contrib=t["leaf_mean"] + off,
                            is_leaf=t["is_leaf"]))
        for i in range(n):
            leaf = assign(by_id, rows[i][0], rows[i][1])
            preds[i] += by_id[leaf]["leaf_mean"] + off
    return out, preds


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    sql_rows = con.execute(FIT_SQL).fetchall()
    cols = [d[0] for d in con.description]
    sql_nodes = sorted([dict(zip(cols, r)) for r in sql_rows],
                       key=lambda d: (d["round"], d["node"]))

    raw = con.execute(f"SELECT f1, f2, y FROM ({BASE})").fetchall()
    rows = [(int(a), int(b), int(c)) for a, b, c in raw]
    py_nodes, preds = replay(rows)
    py_nodes = sorted(py_nodes, key=lambda d: (d["round"], d["node"]))

    ok = True
    if len(sql_nodes) != len(py_nodes):
        print(f"FAIL: {len(sql_nodes)} sql nodes vs {len(py_nodes)} replay")
        ok = False
    for a, b in zip(sql_nodes, py_nodes):
        if a != b:
            print("FAIL node mismatch:\n  sql   ", a, "\n  replay", b)
            ok = False

    # predict census cross-check
    sql_pred = {r[0]: (r[1], r[2])
                for r in con.execute(PREDICT_SQL).fetchall()}
    py_pred = {}
    for i, p in enumerate(preds):
        c, s = py_pred.get(p, (0, 0))
        py_pred[p] = (c + 1, s + rows[i][2])
    if sql_pred != py_pred:
        print("FAIL predict census mismatch:",
              {k: (sql_pred.get(k), py_pred.get(k))
               for k in set(sql_pred) | set(py_pred)
               if sql_pred.get(k) != py_pred.get(k)})
        ok = False

    # boosting must reduce train SSE round over round
    mse0 = sum((rows[i][2] - sum(r[2] for r in rows) // len(rows)) ** 2
               for i in range(len(rows)))
    mseR = sum((rows[i][2] - preds[i]) ** 2 for i in range(len(rows)))
    print(f"{'OK' if ok else 'FAIL'}: {len(sql_nodes)} node rows agree "
          f"(DuckDB chain vs python replay) on {SF}; "
          f"{len(sql_pred)} pred groups; train SSE {mse0} -> {mseR} "
          f"({mseR / mse0:.4f}x)")
    if "--emit-sql" in sys.argv:
        print("=== FIT_SQL ===\n" + FIT_SQL)
        print("=== PREDICT_SQL ===\n" + PREDICT_SQL)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
