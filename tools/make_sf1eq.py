#!/usr/bin/env python3
"""Deterministic sf1-equivalent replication (builder-side scaling probe).

Replicates events/documents/embeddings from an sf dir N x (default 10,
sf0.1 -> ~sf1) with id-space shifts and content perturbation chosen so
the SHAPE of each workload scales the way real data would:

- events: ids and user_ids shift per replica (10x keys, same per-key
  density); timestamps unchanged (10x rows per time bucket -- the
  global/as-of paths see true density growth). ts stays INT64
  TIMESTAMP(NANOS) via pyarrow passthrough.
- documents: a replica-and-position-specific marker token is inserted
  every 5 words, so cross-replica trigram Jaccard lands ~0.33 -- far
  below the 0.8 dedup threshold. Near-dup structure is preserved
  WITHIN each replica (the seeded dups replicate), so pair counts grow
  linearly, not quadratically -- the realistic big-corpus regime.
- embeddings: per-replica seeded gaussian noise at 0.35*sigma.
  MEASURED: cross-replica cosine lands ~0.94 -- ABOVE the 0.9 near-dup
  threshold, so every replica group is a true dup cluster and
  emb_lsh_dups_realistic output grows ~94x at 10 copies (2000 ->
  188,773 pairs). Same for simhash: word-multiset signatures ignore
  the inserted markers, so replicas are true hamming<=6 pairs (189 ->
  708,488). The probe therefore doubles as a DUP-HEAVY stress for the
  signature families: their timings must be read against output
  growth, not row growth (SCALE.md does).

Usage: make_sf1eq.py [src=/root/testdata/sf0.1] [out=/tmp/sf1eq] [copies=10]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def replicate_events(src, out, copies):
    t = pq.read_table(f"{src}/events.parquet")
    parts = [t]
    for i in range(1, copies):
        cols = {name: t.column(name) for name in t.column_names}
        cols["event_id"] = pa.compute.add(cols["event_id"], i * 1_000_000)
        cols["user_id"] = pa.compute.add(cols["user_id"], i * 10_000)
        parts.append(pa.table(cols, schema=t.schema))
    merged = pa.concat_tables(parts)
    pq.write_table(merged, f"{out}/events.parquet")
    print(f"events: {t.num_rows} -> {merged.num_rows}")


def perturb_text(text, i, j):
    words = text.split()
    out = []
    for k, w in enumerate(words):
        out.append(w)
        if k % 5 == 4:
            out.append(f"zq{i}w{j}k{k}")
    return " ".join(out)


def replicate_documents(src, out, copies):
    t = pq.read_table(f"{src}/documents.parquet")
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    ids, txts, langs, srcs, ncs = [], [], [], [], []
    for i in range(copies):
        for j in range(len(doc_id)):
            ids.append(doc_id[j] + i * 1_000_000)
            nt = text[j] if i == 0 else perturb_text(text[j], i, j)
            txts.append(nt)
            langs.append(lang[j])
            srcs.append(source[j])
            ncs.append(len(nt))
    merged = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(txts),
         "lang": pa.array(langs), "source": pa.array(srcs),
         "n_chars": pa.array(ncs, pa.int64())})
    pq.write_table(merged, f"{out}/documents.parquet")
    print(f"documents: {t.num_rows} -> {merged.num_rows}")


def replicate_embeddings(src, out, copies):
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = np.array(t.column("label").to_pylist(), dtype=np.int32)
    sigma = emb.std()
    ids, vecs, labels = [], [], []
    for i in range(copies):
        rng = np.random.RandomState(1000 + i)
        v = emb if i == 0 else (emb + rng.normal(
            0, 0.35 * sigma, emb.shape).astype(np.float32))
        ids.append(vec_id + i * 1_000_000)
        vecs.append(v)
        labels.append(label)
    merged = pa.table(
        {"vec_id": pa.array(np.concatenate(ids)),
         "embedding": pa.array([list(map(float, r)) for v in vecs for r in v],
                               pa.list_(pa.float32())),
         "label": pa.array(np.concatenate(labels))})
    pq.write_table(merged, f"{out}/embeddings.parquet")
    print(f"embeddings: {t.num_rows} -> {merged.num_rows}")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1eq"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(out, exist_ok=True)
    replicate_events(src, out, copies)
    replicate_documents(src, out, copies)
    replicate_embeddings(src, out, copies)


if __name__ == "__main__":
    main()
