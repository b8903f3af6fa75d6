#!/usr/bin/env python3
"""Documents-ONLY deterministic replication for deep-decade probes.

Same recipe as make_sf1eq.replicate_documents (replica-and-position
marker token every 5 words, id shift 1e6 per replica) but streamed in
replica chunks through a ParquetWriter, so RAM stays bounded at
chunk x corpus instead of copies x corpus (the full tool materializes
every replica's text in Python lists — ~25 GB at 1000x, prohibitive
past it). Only documents.parquet is written: the doc-stream probe
queries read nothing else.

Usage: make_docs_only.py [src=/root/testdata/sf0.1] [out=/tmp/docs3k]
                         [copies=3000] [chunk=100]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def perturb_text(text, i, j):
    words = text.split()
    out = []
    for k, w in enumerate(words):
        out.append(w)
        if k % 5 == 4:
            out.append(f"zq{i}w{j}k{k}")
    return " ".join(out)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/docs3k"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 3000
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    os.makedirs(out, exist_ok=True)

    t = pq.read_table(f"{src}/documents.parquet")
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64()),
    ])
    writer = pq.ParquetWriter(f"{out}/documents.parquet", schema)
    total = 0
    for start in range(0, copies, chunk):
        ids, txts, langs, srcs, ncs = [], [], [], [], []
        for i in range(start, min(start + chunk, copies)):
            for j in range(len(doc_id)):
                ids.append(doc_id[j] + i * 1_000_000)
                nt = text[j] if i == 0 else perturb_text(text[j], i, j)
                txts.append(nt)
                langs.append(lang[j])
                srcs.append(source[j])
                ncs.append(len(nt))
        writer.write_table(pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(txts),
             "lang": pa.array(langs), "source": pa.array(srcs),
             "n_chars": pa.array(ncs, pa.int64())}, schema=schema))
        total += len(ids)
    writer.close()
    print(f"documents: {len(doc_id)} -> {total}")


if __name__ == "__main__":
    main()
