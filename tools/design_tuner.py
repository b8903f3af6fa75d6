#!/usr/bin/env python3
"""Design pass for ml_tuner_best (r16).

The reference TrainerManager's Tuner slice (trainer_manager.py:
TunerConfig/param_space/num_samples/metric/mode) made exactly
replayable: candidates are sampled DETERMINISTICALLY from the param
space (md5-prefix integers keyed by the sample index — the repo's
knob-derivation discipline; data-independent, so the sampled
(rounds, depth) pairs are shared literal metadata between engines),
each candidate's exact boosted ensemble fits on the TRAIN split of a
three-way md5 side rule (hex-quantized [0.5, 0.31, 0.19] ~ the
reference's train_valid_test_split), the metric is integer SSE on
the VALID split, and the winner is argmin (sse, trial). Oracle: one
shared base + per-candidate prefixed boost chains + a ranked union.
Cross-checked against a pure-python replay.

Usage: python3 tools/design_tuner.py [sf_dir]
"""
import hashlib
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# param space: rounds ~ randint(1, 3), maxDepth ~ randint(1, 3);
# 3 samples, metric = valid SSE, mode = min
N_SAMPLES = 3


def md5int(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def sample_candidates():
    out = []
    for i in range(N_SAMPLES):
        rounds = 1 + md5int(f"rounds{i}") % 3
        depth = 1 + md5int(f"depth{i}") % 3
        out.append((i, rounds, depth))
    return out


BASE = """
  SELECT CAST(round(value) AS BIGINT) AS f1,
         event_id % 97 AS f2,
         CASE WHEN round(value) <= 245 THEN 10 * (event_id % 97)
              ELSE 1000 - (event_id % 97) END
           + CAST(round(value) AS BIGINT) AS y,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8' AS is_train,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 1) >= '8'
           AND substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < 'd' AS is_valid
  FROM events
"""


def level_ctes(p, lvl, D):
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
    END AS node, a.f1, a.f2, a.y, a.pred, a.yy, a.is_train, a.is_valid
  FROM {p}a{lvl} a LEFT JOIN {p}s{lvl} s ON s.node = a.node)"""


def round_ctes(t, g, D):
    p = f"t{t}g{g}"
    prev = "r0" if g == 1 else f"t{t}g{g - 1}next"
    parts = [
        f"{p}off AS (SELECT min(y - pred) AS o FROM {prev} WHERE is_train)",
        f"""{p}a0 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS node, f1, f2, y, pred,
    y - pred - (SELECT o FROM {p}off) AS yy, is_train, is_valid
  FROM {prev})""",
    ]
    parts += [level_ctes(p, l, D) for l in range(D)]
    parts += [
        f"""{p}leaf AS (SELECT node, count(*) AS c, sum(yy) AS sy
  FROM {p}a{D} WHERE is_train GROUP BY 1)""",
        f"""{p}next AS MATERIALIZED (
  SELECT a.f1, a.f2, a.y,
    a.pred + (l.sy // l.c) + (SELECT o FROM {p}off) AS pred,
    a.is_train, a.is_valid
  FROM {p}a{D} a JOIN {p}leaf l USING (node))""",
    ]
    return ",\n".join(parts)


def chain():
    parts = [
        f"base AS MATERIALIZED ({BASE})",
        """r0 AS MATERIALIZED (SELECT f1, f2, y,
  (SELECT sum(y) // count(*) FROM base WHERE is_train) AS pred,
  is_train, is_valid FROM base)""",
    ]
    for (t, R, D) in sample_candidates():
        for g in range(1, R + 1):
            parts.append(round_ctes(t, g, D))
    return ",\n".join(parts)


def trial_select(t, R, D):
    return f"""SELECT CAST({t} AS BIGINT) AS trial,
  CAST({R} AS BIGINT) AS rounds, CAST({D} AS BIGINT) AS max_depth,
  count(*) AS n_valid,
  CAST(sum((y - pred) * (y - pred)) AS BIGINT) AS sse_valid
FROM t{t}g{R}next WHERE is_valid"""


def tuner_sql():
    trials = "\nUNION ALL\n".join(
        trial_select(t, R, D) for (t, R, D) in sample_candidates())
    return f"""WITH {chain()},
trials AS MATERIALIZED (
{trials})
SELECT trial, rounds, max_depth, n_valid, sse_valid,
  row_number() OVER (ORDER BY sse_valid, trial) = 1 AS is_best
FROM trials"""


# ---------- pure-python replay ----------

def sse_i(c, sy, syy):
    m = sy // c
    return syy - 2 * m * sy + m * m * c


def fit_tree(rows, D):
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
    """rows: (f1, f2, y, is_train, is_valid)."""
    train = [r for r in rows if r[3]]
    p0 = sum(r[2] for r in train) // len(train)
    out = []
    for (t, R, D) in sample_candidates():
        preds = [p0] * len(rows)
        for g in range(1, R + 1):
            tresid = [rows[i][2] - preds[i] for i in range(len(rows))
                      if rows[i][3]]
            off = min(tresid)
            tyy = [(rows[i][0], rows[i][1], rows[i][2] - preds[i] - off)
                   for i in range(len(rows)) if rows[i][3]]
            tree = fit_tree(tyy, D)
            for i in range(len(rows)):
                leaf = assign(tree, rows[i][0], rows[i][1])
                preds[i] += tree[leaf]["mean"] + off
        ds = [rows[i][2] - preds[i] for i in range(len(rows)) if rows[i][4]]
        out.append(dict(trial=t, rounds=R, max_depth=D, n_valid=len(ds),
                        sse_valid=sum(d * d for d in ds)))
    ranked = sorted(out, key=lambda d: (d["sse_valid"], d["trial"]))
    for d in out:
        d["is_best"] = d is ranked[0]
    return out


def main():
    print("candidates:", sample_candidates())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    sql_rows = con.execute(tuner_sql()).fetchall()
    cols = [d[0] for d in con.description]
    sql_m = sorted([dict(zip(cols, r)) for r in sql_rows],
                   key=lambda d: d["trial"])
    raw = con.execute(
        f"SELECT f1, f2, y, is_train, is_valid FROM ({BASE})").fetchall()
    rows = [(int(a), int(b), int(c), bool(t), bool(v))
            for a, b, c, t, v in raw]
    py_m = sorted(replay(rows), key=lambda d: d["trial"])
    ok = sql_m == py_m
    if not ok:
        for a, b in zip(sql_m, py_m):
            if a != b:
                print("FAIL:\n  sql   ", a, "\n  replay", b)
    print(f"{'OK' if ok else 'FAIL'}: tuner trials (DuckDB vs replay) on {SF}")
    for m in sql_m:
        print("  ", m)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
