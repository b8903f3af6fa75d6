#!/usr/bin/env python3
"""Design pass for ml_early_stop (r16).

XGBoost's early_stopping_rounds semantic over the exact boosted
ensemble, exactly replayable: fit round by round on the TRAIN split,
track the integer valid-SSE running best, STOP once `patience`
consecutive rounds fail to improve it, keep the best round's prefix.
The fixture is a SEPARABLE 8-group target — the integer ensemble
converges exactly (pure leaves -> zero residual), so later rounds
contribute exactly 0 improvement and the stop fires
deterministically. Oracle: the holdout chain (train-filtered fits,
all rows routed) + the per-round metric union + the patience window
rule replayed with correlated subqueries over the 5-row series.

Usage: python3 tools/design_earlystop.py [sf_dir]
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
R = 4        # max rounds
D = 3        # split levels per tree
PATIENCE = 1

BASE = """
  SELECT CAST(round(value) AS BIGINT) AS f1,
         event_id % 4 AS f2,
         CASE WHEN round(value) <= 245 THEN 10 * (event_id % 4)
              ELSE 1000 - (event_id % 4) END AS y,
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


def metric_select(k):
    src = "r0" if k == 0 else f"g{k}next"
    return f"""SELECT CAST({k} AS BIGINT) AS round, count(*) AS n_valid,
  CAST(sum((y - pred) * (y - pred)) AS BIGINT) AS sse_valid
FROM {src} WHERE NOT is_train"""


def sql():
    chain = ",\n".join(
        [f"base AS MATERIALIZED ({BASE})",
         """r0 AS MATERIALIZED (SELECT f1, f2, y,
  (SELECT sum(y) // count(*) FROM base WHERE is_train) AS pred,
  is_train FROM base)"""] + [round_ctes(g) for g in range(1, R + 1)])
    series = "\nUNION ALL\n".join(metric_select(k) for k in range(R + 1))
    return f"""WITH {chain},
series AS MATERIALIZED (
{series}),
-- bestAsOf(r) = FIRST round achieving the running min over 0..r
besta AS (SELECT s1.round,
    (SELECT min(s2.round) FROM series s2 WHERE s2.round <= s1.round
       AND s2.sse_valid = (SELECT min(s3.sse_valid) FROM series s3
                            WHERE s3.round <= s1.round)) AS best_so_far
  FROM series s1),
-- stop = first round with `patience` rounds since the running best
stopr AS (SELECT coalesce(
    (SELECT min(round) FROM besta WHERE round - best_so_far >= {PATIENCE}),
    {R}) AS stop)
SELECT s.round, s.n_valid, s.sse_valid,
  s.round = (SELECT best_so_far FROM besta
             WHERE round = (SELECT stop FROM stopr)) AS is_best
FROM series s WHERE s.round <= (SELECT stop FROM stopr)"""


# ---------- pure-python replay ----------

def early_stop(series, patience):
    """series: metric per round 0..N. Returns (stop, best)."""
    best = 0
    for r in range(len(series)):
        if series[r] < series[best]:
            best = r
        if r - best >= patience:
            return r, best
    return len(series) - 1, best


def sse_i(c, sy, syy):
    m = sy // c
    return syy - 2 * m * sy + m * m * c


def fit_tree(rows):
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
                syy = sum(r[2] * r[2] for r in rs)
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
                out[node] = dict(is_leaf=True, mean=sy // c)
            else:
                _, fi, v = best
                out[node] = dict(is_leaf=False, fi=fi, v=v)
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
    train = [r for r in rows if r[3]]
    p0 = sum(r[2] for r in train) // len(train)
    preds = [p0] * len(rows)

    def metric():
        ds = [rows[i][2] - preds[i] for i in range(len(rows))
              if not rows[i][3]]
        return len(ds), sum(d * d for d in ds)

    series = [metric()]
    for g in range(1, R + 1):
        tresid = [rows[i][2] - preds[i] for i in range(len(rows))
                  if rows[i][3]]
        off = min(tresid)
        tyy = [(rows[i][0], rows[i][1], rows[i][2] - preds[i] - off)
               for i in range(len(rows)) if rows[i][3]]
        tree = fit_tree(tyy)
        for i in range(len(rows)):
            leaf = assign(tree, rows[i][0], rows[i][1])
            preds[i] += tree[leaf]["mean"] + off
        series.append(metric())
    stop, best = early_stop([s[1] for s in series], PATIENCE)
    return [dict(round=k, n_valid=series[k][0], sse_valid=series[k][1],
                 is_best=(k == best)) for k in range(stop + 1)]


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    sql_rows = con.execute(sql()).fetchall()
    cols = [d[0] for d in con.description]
    sql_m = sorted([dict(zip(cols, r)) for r in sql_rows],
                   key=lambda d: d["round"])
    raw = con.execute(
        f"SELECT f1, f2, y, is_train FROM ({BASE})").fetchall()
    rows = [(int(a), int(b), int(c), bool(t)) for a, b, c, t in raw]
    py_m = replay(rows)
    ok = sql_m == py_m
    if not ok:
        print("sql   ", sql_m)
        print("replay", py_m)
    print(f"{'OK' if ok else 'FAIL'}: early-stop series (DuckDB vs replay) "
          f"on {SF}")
    for m in sql_m:
        print("  ", m)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
