#!/usr/bin/env python3
"""Adversarial determinism stress: synthesize an events table with heavy
microsecond-timestamp collisions (including order-key ties: same us AND
event_ids congruent mod 1000), then run the events queries through the
normal Verify + DuckDB gate. Guards the RANGE-frame peer semantics and
every tie-break in the suite.

Usage:
  python3 tools/stress_collisions.py /tmp/colltest     # generate
  sbt "runMain graft.Verify /tmp/colltest /tmp/vcoll"
  python3 tools/check.py /tmp/colltest /tmp/vcoll      # ev_* must be OK
"""
import os, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/colltest"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(7)
    n = 4000
    base = 1704067200_000_000_000
    ts = base + (rng.integers(0, 800, n) * 1_000_000_000) + rng.integers(0, 1000, n)
    event_id = np.arange(n)
    ts[100] = ts[1100] = base + 123_000_000_000 + 456  # explicit okey tie
    t = pa.table({
        "event_id": pa.array(event_id, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "purchase", "click", "signup", "error"], n)),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        "props": pa.array(["{\"k\": %d}" % k for k in rng.integers(0, 100, n)]),
    })
    pq.write_table(t, f"{out}/events.parquet")
    us = ts // 1000
    ties = n - len(set(us * 1000 + event_id % 1000))
    print(f"wrote {out}/events.parquet: {n} rows, "
          f"{len(set(us))} distinct us, {ties} okey ties")


if __name__ == "__main__":
    main()
