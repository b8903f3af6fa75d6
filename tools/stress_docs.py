#!/usr/bin/env python3
"""Adversarial determinism stress for the DOCUMENT/EMBEDDING suites:
synthesize hostile documents (exact duplicate texts, empty and
single-char docs, runs of repeated words, double/leading/trailing
spaces, mixed-case text the lowercasing must collapse, shared passages
for the boilerplate/paragraph df rules) plus embeddings with exact
duplicate vectors, a zero vector, and identical-label blocks — then run
the doc_*/emb_* queries through the normal Verify + DuckDB gate. Guards
tokenization parity (split-keeping-empties), digest/tie rules, df
boundaries, and every rank tie in the corpus suites.

Usage:
  python3 tools/stress_docs.py /tmp/doctest            # generate
  sbt "runMain graft.Verify /tmp/doctest /tmp/vdocs"
  python3 tools/check.py /tmp/doctest /tmp/vdocs       # doc_*/emb_* OK
(events-dependent queries report [MISS]/[ORACLE-ERR] there — expected;
a small events table is included so mixed pipelines still run.)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "merge", "batch", "spark", "line", "sort",
         "window", "the", "a", "big", "vector"]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/doctest"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    docs = []

    def add(text, lang, source):
        docs.append((len(docs), text, lang, source, len(text)))

    langs = ["en", "de", "fr", "es", "zh"]
    # ordinary docs
    for i in range(300):
        n = int(rng.integers(8, 60))
        text = " ".join(rng.choice(WORDS, n))
        add(text, langs[i % 5], f"src{i % 7}")
    # EXACT duplicates (dedup keeper elections, digest ties)
    for i in range(20):
        add(docs[i][1], langs[(i + 1) % 5], f"src{(i + 3) % 7}")
    # empty text, single word, single char
    add("", "en", "src0")
    add("key", "de", "src1")
    add("a", "fr", "src2")
    # DOUBLE spaces / leading / trailing (split-keeping-empties parity)
    add("key  agg   row", "en", "src3")
    add(" key agg", "en", "src4")
    add("key agg ", "en", "src5")
    # mixed case the lowercasing must collapse to a duplicate
    add("Key AGG Row Scan Slow Fast Table Value", "en", "src6")
    add("key agg row scan slow fast table value", "en", "src0")
    # heavy in-doc repetition (Gopher filters, trigram dedup)
    add(" ".join(["spam"] * 40), "en", "src1")
    add(" ".join(["a", "b"] * 30), "de", "src2")
    # shared 10-word passage across >= 3 docs (boilerplate df rule
    # fires; passage dedup keeper crosses docs)
    chrome = " ".join(WORDS[:10])
    for i in range(4):
        tail = " ".join(rng.choice(WORDS, 17))
        add(chrome + " " + tail, langs[i % 5], f"src{i % 7}")
    # near-duplicates: one word changed (MinHash/SimHash bands)
    base = " ".join(rng.choice(WORDS, 40))
    add(base, "en", "src2")
    flip = base.split(" ")
    flip[7] = "vector"
    add(" ".join(flip), "en", "src3")

    ids, texts, lgs, srcs, ncs = zip(*docs)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(lgs),
        "source": pa.array(srcs),
        "n_chars": pa.array(ncs, pa.int64()),
    }), f"{out}/documents.parquet")

    # embeddings: duplicates, zero vector, identical-label runs
    n_emb = len(docs)
    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    emb[50] = emb[10]            # exact duplicate vector
    emb[51] = emb[10]            # triple
    emb[60] = 0.0                # zero vector (norm guards)
    labels = (np.arange(n_emb) % 10).astype(np.int32)
    labels[50] = labels[51] = labels[10]  # co-labeled duplicates
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([e.tolist() for e in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), f"{out}/embeddings.parquet")

    # small plain events table so mixed pipelines still run
    n_ev = 2000
    base_ns = 1704067200_000_000_000
    ts = base_ns + rng.integers(0, 30 * 86400, n_ev) * 1_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, 20, n_ev), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "purchase", "click", "signup", "error"], n_ev)),
        "value": pa.array(np.round(rng.uniform(0, 500, n_ev), 2)),
        "props": pa.array(["{}"] * n_ev),
    }), f"{out}/events.parquet")

    dups = len(texts) - len(set(texts))
    print(f"wrote {out}: {len(docs)} docs ({dups} exact-dup texts), "
          f"{n_emb} embeddings, {n_ev} events")


if __name__ == "__main__":
    main()
