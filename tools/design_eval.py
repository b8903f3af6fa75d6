#!/usr/bin/env python3
"""Design pass for ml_eval_holdout (r16).

The honest-holdout learning curve over the exact boosted ensemble:
rows split train/test by the md5(event_id)-prefix side rule (< 'c' =
train, 75%), the ensemble fits on TRAIN ONLY (same integer arithmetic
as design_boost.py), and every round-prefix ensemble 0..R is scored
on the HELD-OUT rows — n, integer SSE, integer sum-abs-error per
round. The CTE chain carries is_train through every tree level:
histograms and leaf stats filter to train rows, the assignment CASE
routes ALL rows (every leaf holds >= 1 train row by construction —
children of a chosen split are nonempty in train), so test rows ride
the same frames and the metrics fall out of a WHERE NOT is_train.

Cross-checked against an independent pure-python replay before the
Scala implementation exists.

Usage: python3 tools/design_eval.py [sf_dir]
"""
import hashlib
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
R = 3
D = 2

BASE = """
  SELECT CAST(round(value) AS BIGINT) AS f1,
         event_id % 97 AS f2,
         CASE WHEN round(value) <= 245 THEN 10 * (event_id % 97)
              ELSE 1000 - (event_id % 97) END
           + CAST(round(value) AS BIGINT) AS y,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < 'c' AS is_train
  FROM events
"""


def level_ctes(g, lvl):
    p = f"g{g}"
    return f"""{p}c{lvl} AS MATERIALIZED (
  SELECT node, fi, v,
    sum(c)  OVER w AS cl,  sum(sy)  OVER w AS syl,  sum(syy) OVER w AS syyl,
    sum(c)  OVER t AS ct,  sum(sy)  OVER t AS syt,  sum(syy) OVER t AS syyt
  FROM (
    SELECT node, 0 AS fi, f1 AS v, count(*) AS c, sum(yy) AS sy,
      sum(yy*yy) AS syy FROM {p}a{lvl} WHERE is_train GROUP BY 1, 3
    UNION ALL
    SELECT node, 1 AS fi, f2 AS v, count(*) AS c, sum(yy) AS sy,
      sum(yy*yy) AS syy FROM {p}a{lvl} WHERE is_train GROUP BY 1, 3)
  WINDOW w AS (PARTITION BY node, fi ORDER BY v),
         t AS (PARTITION BY node, fi)),
{p}s{lvl} AS MATERIALIZED (
  SELECT node, fi, v FROM (
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
    END AS node, a.f1, a.f2, a.y, a.pred, a.yy, a.is_train
  FROM {p}a{lvl} a LEFT JOIN {p}s{lvl} s ON s.node = a.node)"""


def round_ctes(g):
    p = f"g{g}"
    prev = "r0" if g == 1 else f"g{g - 1}next"
    parts = [
        f"{p}off AS (SELECT min(y - pred) AS o FROM {prev} WHERE is_train)",
        f"""{p}a0 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS node, f1, f2, y, pred,
    y - pred - (SELECT o FROM {p}off) AS yy, is_train FROM {prev})""",
    ]
    parts += [level_ctes(g, l) for l in range(D)]
    parts += [
        f"""{p}leaf AS (SELECT node, count(*) AS c, sum(yy) AS sy
  FROM {p}a{D} WHERE is_train GROUP BY 1)""",
        f"""{p}next AS MATERIALIZED (
  SELECT a.f1, a.f2, a.y,
    a.pred + (l.sy // l.c) + (SELECT o FROM {p}off) AS pred, a.is_train
  FROM {p}a{D} a JOIN {p}leaf l USING (node))""",
    ]
    return ",\n".join(parts)


def chain():
    parts = [
        f"base AS MATERIALIZED ({BASE})",
        """r0 AS MATERIALIZED (SELECT f1, f2, y,
  (SELECT sum(y) // count(*) FROM base WHERE is_train) AS pred,
  is_train FROM base)""",
    ]
    parts += [round_ctes(g) for g in range(1, R + 1)]
    return ",\n".join(parts)


def metric_select(k):
    src = "r0" if k == 0 else f"g{k}next"
    return f"""SELECT CAST({k} AS BIGINT) AS round, count(*) AS n_test,
  CAST(sum((y - pred) * (y - pred)) AS BIGINT) AS sse_test,
  CAST(sum(abs(y - pred)) AS BIGINT) AS sae_test
FROM {src} WHERE NOT is_train"""


EVAL_SQL = f"""WITH {chain()}
{" UNION ALL ".join(metric_select(k) for k in range(R + 1))}"""


# ---------- independent pure-python replay ----------

def sse_i(c, sy, syy):
    m = sy // c
    return syy - 2 * m * sy + m * m * c


def fit_tree(rows):
    """rows: (f1, f2, yy). Returns node dict {node: info}."""
    out = {}
    frontier = {1: rows}
    for depth in range(D + 1):
        nxt = {}
        for node in sorted(frontier):
            rs = frontier[node]
            c = len(rs)
            sy = sum(r[2] for r in rs)
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
                    syy = sum(r[2] * r[2] for r in rs)
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
                out[node] = dict(is_leaf=True, mean=sy // c)
            else:
                _, fi, v = best
                out[node] = dict(is_leaf=False, fi=fi, v=v, mean=sy // c)
                nxt[node * 2] = [r for r in rs if r[fi] <= v]
                nxt[node * 2 + 1] = [r for r in rs if r[fi] > v]
        frontier = nxt
    return out


def assign(tree, f1, f2):
    node = 1
    while not tree[node]["is_leaf"]:
        nd = tree[node]
        x = f1 if nd["fi"] == 0 else f2
        node = node * 2 + (0 if x <= nd["v"] else 1)
    return node


def replay(rows):
    """rows: (f1, f2, y, is_train). Returns per-round metric dicts."""
    train = [r for r in rows if r[3]]
    p0 = sum(r[2] for r in train) // len(train)
    preds = [p0] * len(rows)
    out = []

    def metrics(k):
        ds = [rows[i][2] - preds[i] for i in range(len(rows))
              if not rows[i][3]]
        out.append(dict(round=k, n_test=len(ds),
                        sse_test=sum(d * d for d in ds),
                        sae_test=sum(abs(d) for d in ds)))

    metrics(0)
    for g in range(1, R + 1):
        tresid = [rows[i][2] - preds[i] for i in range(len(rows))
                  if rows[i][3]]
        off = min(tresid)
        tyy = [(rows[i][0], rows[i][1], rows[i][2] - preds[i] - off)
               for i in range(len(rows)) if rows[i][3]]
        tree = fit_tree(tyy)
        # leaf means recomputed over the SHIFTED train labels (= the
        # SQL's leaf CTE); contribution = mean + off
        for i in range(len(rows)):
            leaf = assign(tree, rows[i][0], rows[i][1])
            preds[i] += tree[leaf]["mean"] + off
        metrics(g)
    return out


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    sql_rows = con.execute(EVAL_SQL).fetchall()
    cols = [d[0] for d in con.description]
    sql_m = sorted([dict(zip(cols, r)) for r in sql_rows],
                   key=lambda d: d["round"])

    raw = con.execute(
        f"SELECT f1, f2, y, is_train FROM ({BASE})").fetchall()
    rows = [(int(a), int(b), int(c), bool(t)) for a, b, c, t in raw]
    py_m = replay(rows)

    ok = sql_m == py_m
    if not ok:
        for a, b in zip(sql_m, py_m):
            if a != b:
                print("FAIL:\n  sql   ", a, "\n  replay", b)
    print(f"{'OK' if ok else 'FAIL'}: holdout curve (DuckDB vs replay) on {SF}")
    for m in sql_m:
        print("  ", m)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
