#!/usr/bin/env python3
"""Embeddings-ONLY deterministic replication for deep-decade probes.

Same recipe as make_sf1eq.replicate_embeddings (per-replica seeded
gaussian noise at 0.35*sigma, id shift 1e6 per replica) but streamed in
chunks through a ParquetWriter with a zero-copy flat-buffer ListArray,
so a 10,000x replica set (20M x 64-d vectors from sf0.1) builds in
minutes instead of hours — the python list-of-floats path of the full
tool is fine at 1000x and prohibitive at 10,000x. Only
embeddings.parquet is written: the kNN/ANN probe queries read nothing
else, and skipping events/documents keeps a fifth-decade probe dir at
~5 GB instead of ~25 GB.

Usage: make_emb_only.py [src=/root/testdata/sf0.1] [out=/tmp/emb5]
                        [copies=10000] [chunk=250]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/emb5"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 250
    import os
    os.makedirs(out, exist_ok=True)

    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = np.array(t.column("label").to_pylist(), dtype=np.int32)
    n, dim = emb.shape
    sigma = emb.std()

    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ])
    writer = pq.ParquetWriter(f"{out}/embeddings.parquet", schema)
    total = 0
    for start in range(0, copies, chunk):
        cs = range(start, min(start + chunk, copies))
        ids, flats, labels = [], [], []
        for i in cs:
            rng = np.random.RandomState(1000 + i)
            v = emb if i == 0 else (emb + rng.normal(
                0, 0.35 * sigma, emb.shape).astype(np.float32))
            ids.append(vec_id + i * 1_000_000)
            flats.append(np.ascontiguousarray(v, dtype=np.float32).ravel())
            labels.append(label)
        rows = n * len(ids)
        # offsets computed in int64 first: at rows*dim >= 2^31 the old
        # int32 arange wrapped negative and ListArray.from_arrays either
        # failed or silently corrupted the file. Offsets restart at 0 per
        # written chunk, so int32 is safe iff THIS chunk stays under 2^31
        # values — assert that, then downcast.
        off64 = np.arange(rows + 1, dtype=np.int64) * dim
        assert off64[-1] < 2**31, (
            f"chunk too large for int32 list offsets: {rows} rows x {dim} "
            f"dims = {off64[-1]} values; lower --chunk")
        offsets = pa.array(off64.astype(np.int32))
        values = pa.array(np.concatenate(flats))
        lst = pa.ListArray.from_arrays(offsets, values)
        batch = pa.table({
            "vec_id": pa.array(np.concatenate(ids)),
            "embedding": lst,
            "label": pa.array(np.concatenate(labels)),
        }, schema=schema)
        writer.write_table(batch)
        total += rows
    writer.close()
    print(f"embeddings: {n} -> {total}")


if __name__ == "__main__":
    main()
