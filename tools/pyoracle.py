"""Exact Python oracles for the queries DuckDB cannot express
(the iterative BPE family, seeded-random LSH, path-dependent folds).

Each function recomputes the query's expected frame from the parquet
tables with bit-identical arithmetic to the Spark implementation:
  - java.util.Random's 48-bit LCG for the seeded SRP hyperplanes;
  - left-to-right double-accumulated dot products (graft_dot);
  - Spark's round() = shortest-repr decimal HALF_UP;
  - the throttle / order-book folds replayed row-for-row.

(The MinHash/SimHash families moved to full DuckDB SQL oracles when the
driver queries switched to the engine-portable md5-prefix base hash —
Dedup.Md5Prefix; the xxhash64 default stays pinned by ScalaTest.)

check.py compares these exactly like the DuckDB oracles (column-sorted,
row-sorted, cell-exact).
"""
import math
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pandas as pd

# ------------------------------------------------- java.util.Random LCG

class JavaRandom:
    def __init__(self, seed: int):
        self._s = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self._s = (self._s * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self._s >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) <= (1 << 31) - 1:
                return val

    def next_boolean(self) -> bool:
        return self._next(1) != 0


# ------------------------------------------------------------- helpers

def round_half_up(x: float, scale: int) -> float:
    """Spark round(): BigDecimal.valueOf(double) (shortest decimal
    repr) + HALF_UP."""
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return x
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))


def _events(sfdir: str) -> pd.DataFrame:
    df = pd.read_parquet(f"{sfdir}/events.parquet")
    ts = df['ts'].astype('int64')  # TIMESTAMP(NANOS) -> epoch ns
    df = df.copy()
    df['ts_us'] = ts // 1000
    return df


def _doc_words(text: str):
    # parity tokenization: lowercase, single-space split keeping empties
    return text.lower().split(' ')


def _dot(a, b) -> float:
    """Left-to-right double fold (graft_dot / Similarity.dot parity)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


# --------------------------------------------------------- emb_lsh_topk

def _hyperplanes(bits: int, dim: int, seed: int):
    rnd = JavaRandom(seed)
    return [[1.0 if rnd.next_boolean() else -1.0 for _ in range(dim)]
            for _ in range(bits)]


def _srp_buckets(emb, bits: int, dim: int, tables: int, seed: int = 42):
    """[(tbl, bucket)] for one embedding (Similarity.bucketArray / graft_srp)."""
    out = []
    for t in range(tables):
        planes = _PLANES_CACHE.setdefault((bits, dim, seed + t),
                                          _hyperplanes(bits, dim, seed + t))
        bkt = 0
        for j, p in enumerate(planes):
            if _dot(emb, p) >= 0:
                bkt |= 1 << j
        out.append((t, bkt))
    return out


_PLANES_CACHE = {}


def expected_emb_lsh_topk(sfdir: str) -> pd.DataFrame:
    k, bits, dim, tables = 5, 6, 64, 24
    emb = pd.read_parquet(f"{sfdir}/embeddings.parquet")
    ids = [int(v) for v in emb['vec_id']]
    vecs = {int(v): e for v, e in zip(emb['vec_id'], emb['embedding'])}
    buckets = {i: set(_srp_buckets(vecs[i], bits, dim, tables)) for i in ids}
    norms = {i: math.sqrt(_dot(vecs[i], vecs[i])) for i in ids}
    out = []
    for q in sorted(i for i in ids if i < 10):
        cands = [c for c in ids
                 if c != q and buckets[c] & buckets[q]]
        scored = [( _dot(vecs[q], vecs[c]) / (norms[q] * norms[c]), c)
                  for c in cands]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (cos, c) in enumerate(scored[:k], start=1):
            out.append((q, c, round_half_up(cos, 6), rnk))
    return pd.DataFrame(out, columns=['q_id', 'neighbor_id', 'cos_sim', 'rnk'])


# -------------------------------------------------- ev_throttle_elapsed

def expected_ev_throttle_elapsed(sfdir: str) -> pd.DataFrame:
    window_us = 6 * 3600000000
    ev = _events(sfdir)[['event_id', 'user_id', 'ts_us', 'value']]
    ev = ev.sort_values(['user_id', 'ts_us', 'event_id'], kind='mergesort')
    out = []
    cur_user, last_emit = None, None
    for r in ev.itertuples(index=False):
        if r.user_id != cur_user:
            cur_user, last_emit = r.user_id, None
        if last_emit is None or r.ts_us - last_emit >= window_us:
            last_emit = r.ts_us
            out.append(r)
    return pd.DataFrame(out, columns=['event_id', 'user_id', 'ts_us', 'value'])


# ------------------------------------------------------ l2_book_replay

def expected_l2_book_replay(sfdir: str) -> pd.DataFrame:
    depth, sampling_us = 5, 3600000000
    ev = _events(sfdir)
    upd = pd.DataFrame({
        'instrument': ev['event_type'],
        'ts_us': ev['ts_us'],
        'seq': ev['event_id'],
        'update_type': np.select(
            [ev['event_id'] % 50 == 0, ev['event_id'] % 3 == 0,
             ev['event_id'] % 3 == 1],
            ['SNAPSHOT', 'ADD', 'SET'], default='SUB'),
        'side': np.where(ev['event_id'] % 2 == 0, 'bid', 'ask'),
        'price': [round_half_up(v, 0) for v in ev['value']],
        'size': 1.0 + (ev['event_id'] % 5).astype('float64'),
    }).sort_values(['instrument', 'ts_us', 'seq'], kind='mergesort')

    out = []
    cur = None
    bids, asks, snap_ts = {}, {}, None

    def apply(u):
        nonlocal snap_ts
        book = bids if u.side == 'bid' else asks
        if u.update_type == 'SNAPSHOT':
            if u.ts_us != snap_ts:
                bids.clear(); asks.clear(); snap_ts = u.ts_us
            if u.size > 0:
                book[u.price] = u.size
            else:
                book.pop(u.price, None)
        elif u.update_type == 'ADD':
            snap_ts = None
            book[u.price] = book.get(u.price, 0.0) + u.size
        elif u.update_type == 'SET':
            snap_ts = None
            if u.size > 0:
                book[u.price] = u.size
            else:
                book.pop(u.price, None)
        else:  # SUB
            snap_ts = None
            nxt = book.get(u.price, 0.0) - u.size
            if nxt > 0:
                book[u.price] = nxt
            else:
                book.pop(u.price, None)

    def emit(instrument, ts):
        top_b = sorted(bids.items(), key=lambda kv: -kv[0])[:depth]
        top_a = sorted(asks.items())[:depth]
        b0 = top_b[0][0] if top_b else None
        a0 = top_a[0][0] if top_a else None
        mid = (b0 + a0) / 2 if b0 is not None and a0 is not None else None
        spread = None
        if b0 is not None and a0 is not None and a0 + b0 != 0.0:
            spread = abs(a0 - b0) * 2 / (a0 + b0)
        out.append((instrument, ts, len(top_b), len(top_a), mid, spread))

    rows = list(upd.itertuples(index=False))
    i, n = 0, len(rows)
    while i < n:
        u = rows[i]
        if u.instrument != cur:
            cur = u.instrument
            bids, asks, snap_ts = {}, {}, None
        ts = u.ts_us
        while i < n and rows[i].instrument == cur and rows[i].ts_us == ts:
            apply(rows[i])
            i += 1
        more = i < n and rows[i].instrument == cur
        if not more or rows[i].ts_us // sampling_us != ts // sampling_us:
            emit(cur, ts)
    return pd.DataFrame(out, columns=['instrument', 'ts_us', 'bid_depth',
                                      'ask_depth', 'mid_price', 'spread'])


# ------------------------------------------------------ doc_pack_greedy

def _token_count(text: str) -> int:
    import re
    return len(re.findall(r'[a-z]+|[0-9]+|[^a-z0-9\s]', text.lower()))


def expected_doc_pack_greedy(sfdir: str) -> pd.DataFrame:
    capacity = 512
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")
    rows = sorted(
        ((str(l), int(d), _token_count(t))
         for d, l, t in zip(docs['doc_id'], docs['lang'], docs['text'])),
        key=lambda r: (r[0], r[1]))
    out = []
    cur_lang, b, fill = None, 0, 0
    for lang, doc_id, t in rows:
        if lang != cur_lang:
            cur_lang, b, fill = lang, 0, 0
        if fill > 0 and fill + t > capacity:
            b += 1
            fill = 0
        fill += t
        out.append((doc_id, lang, t, b, fill))
    return pd.DataFrame(out, columns=['doc_id', 'lang', 'n_tokens', 'bin',
                                      'bin_fill'])


def expected_doc_bpe_merges(sfdir: str) -> pd.DataFrame:
    """BPE merge training, 16 merges: word-frequency table, arg-max
    adjacent pair by (freq desc, pair lex), greedy left-to-right merge
    application resuming AFTER each merged token. Mirrors
    TextAnalysis.bpeTrain exactly (integer counts -> exact compare)."""
    n_merges = 16
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")
    freq = {}
    for t in docs['text']:
        for w in _doc_words(t):
            freq[w] = freq.get(w, 0) + 1
    tbl = [([c for c in w], f) for w, f in freq.items()]
    out = []
    for rank in range(n_merges):
        counts = {}
        for syms, f in tbl:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, c))
        nxt = []
        for syms, f in tbl:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nxt.append((merged, f))
        tbl = nxt
    return pd.DataFrame(out, columns=['rank', 'left', 'right', 'freq'])


def expected_doc_bpe_encode(sfdir: str) -> pd.DataFrame:
    """BPE encode: train the 16-merge table (same replay as
    expected_doc_bpe_merges), then greedily apply the merges in rank
    order to every word of every doc. Mirrors
    TextAnalysis.bpeEncodeStats exactly (integer counts)."""
    merges = [(l, r) for _, l, r, _ in
              expected_doc_bpe_merges(sfdir).itertuples(index=False)]
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")
    out = []
    for doc_id, t in zip(docs['doc_id'], docs['text']):
        ws = _doc_words(t)
        n_sym0 = n_tok = 0
        for w in ws:
            syms = list(w)
            n_sym0 += len(syms)
            for l, r in merges:
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            n_tok += len(syms)
        out.append((doc_id, len(ws), n_sym0, n_tok))
    return pd.DataFrame(out, columns=['doc_id', 'n_words', 'n_sym0',
                                      'n_tokens'])


def expected_doc_pack_bpe(sfdir: str) -> pd.DataFrame:
    """Greedy packing (capacity 512, per-lang, doc_id order) over the
    REAL tokenizer's counts: doc token counts from the BPE encode
    replay, then the same (bin, fill) fold as doc_pack_greedy."""
    capacity = 512
    enc = expected_doc_bpe_encode(sfdir)
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")[['doc_id', 'lang']]
    tok = dict(zip(enc['doc_id'], enc['n_tokens']))
    rows = sorted(((str(l), int(d), int(tok[d]))
                   for d, l in zip(docs['doc_id'], docs['lang'])),
                  key=lambda r: (r[0], r[1]))
    out = []
    cur_lang, b, fill = None, 0, 0
    for lang, doc_id, t in rows:
        if lang != cur_lang:
            cur_lang, b, fill = lang, 0, 0
        if fill > 0 and fill + t > capacity:
            b += 1
            fill = 0
        fill += t
        out.append((doc_id, lang, t, b, fill))
    return pd.DataFrame(out, columns=['doc_id', 'lang', 'n_tokens', 'bin',
                                      'bin_fill'])


# ------------------------------------------ unigram-LM tokenizer family

_UNI_PIECE_LEN, _UNI_SEED, _UNI_VOCAB, _UNI_ROUNDS = 4, 64, 24, 2


def _uni_prune(cand: dict, cap: int) -> dict:
    """(cnt desc, piece asc) rank; keep rank < cap OR single code point
    (TextAnalysis.unigramPrune)."""
    ranked = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
    return {p: c for i, (p, c) in enumerate(ranked)
            if i < cap or len(p) == 1}


def _uni_segment(w: str, weights: dict, bl_total: int):
    """Viterbi under integer bit-length weights with the local tie rule
    (score desc, piece count asc, forward path lex asc) —
    TextAnalysis.unigramSegment."""
    n = len(w)
    if n == 0:
        return []
    best = [None] * (n + 1)  # (score, path)
    best[0] = (0, [])
    for i in range(1, n + 1):
        bp = None
        for l in range(1, min(_UNI_PIECE_LEN, i) + 1):
            if best[i - l] is None:
                continue
            piece = w[i - l:i]
            bl = weights.get(piece)
            if bl is None:
                continue
            sc = best[i - l][0] + bl - bl_total
            path = best[i - l][1] + [piece]
            if (bp is None or sc > bp[0] or
                    (sc == bp[0] and (len(path) < len(bp[1]) or
                     (len(path) == len(bp[1]) and path < bp[1])))):
                bp = (sc, path)
        best[i] = bp
    return best[n][1]


def _uni_train(sfdir: str) -> dict:
    """The full seed + EM loop (TextAnalysis.unigramTrainLoop):
    substring seeding, 2 rounds of (segment, recount, re-admit chars,
    prune) on integer bit-length scores."""
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")
    freq = {}
    for t in docs['text']:
        for w in _doc_words(t):
            freq[w] = freq.get(w, 0) + 1
    seed = {}
    chars = set()
    for w, f in freq.items():
        for i in range(len(w)):
            chars.add(w[i])
            for l in range(1, min(_UNI_PIECE_LEN, len(w) - i) + 1):
                p = w[i:i + l]
                seed[p] = seed.get(p, 0) + f
    vocab = _uni_prune(seed, _UNI_SEED)
    for _ in range(_UNI_ROUNDS):
        total = sum(vocab.values())
        bl_total = total.bit_length()
        weights = {p: max(c, 1).bit_length() for p, c in vocab.items()}
        counts = {}
        for w, f in freq.items():
            for p in _uni_segment(w, weights, bl_total):
                counts[p] = counts.get(p, 0) + f
        for c in chars:
            counts.setdefault(c, 1)
        vocab = _uni_prune(counts, _UNI_VOCAB)
    return vocab


def expected_doc_unigram_vocab(sfdir: str) -> pd.DataFrame:
    vocab = _uni_train(sfdir)
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(
        [(i + 1, p, c, max(c, 1).bit_length())
         for i, (p, c) in enumerate(ranked)],
        columns=['rank', 'piece', 'cnt', 'bl'])


def expected_doc_unigram_encode(sfdir: str) -> pd.DataFrame:
    vocab = _uni_train(sfdir)
    total = sum(vocab.values())
    bl_total = total.bit_length()
    weights = {p: max(c, 1).bit_length() for p, c in vocab.items()}
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")
    memo = {}
    out = []
    for doc_id, t in zip(docs['doc_id'], docs['text']):
        ws = _doc_words(t)
        n_cps = n_tok = 0
        for w in ws:
            if w not in memo:
                memo[w] = len(_uni_segment(w, weights, bl_total))
            n_cps += len(w)
            n_tok += memo[w]
        out.append((doc_id, len(ws), n_cps, n_tok))
    return pd.DataFrame(out, columns=['doc_id', 'n_words', 'n_cps',
                                      'n_tokens'])


def expected_doc_pack_unigram(sfdir: str) -> pd.DataFrame:
    """Greedy packing (capacity 512, per-lang, doc_id order) over the
    unigram tokenizer's counts — the doc_pack_bpe fold on the second
    tokenizer family."""
    capacity = 512
    enc = expected_doc_unigram_encode(sfdir)
    docs = pd.read_parquet(f"{sfdir}/documents.parquet")[['doc_id', 'lang']]
    tok = dict(zip(enc['doc_id'], enc['n_tokens']))
    rows = sorted(((str(l), int(d), int(tok[d]))
                   for d, l in zip(docs['doc_id'], docs['lang'])),
                  key=lambda r: (r[0], r[1]))
    out = []
    cur_lang, b, fill = None, 0, 0
    for lang, doc_id, t in rows:
        if lang != cur_lang:
            cur_lang, b, fill = lang, 0, 0
        if fill > 0 and fill + t > capacity:
            b += 1
            fill = 0
        fill += t
        out.append((doc_id, lang, t, b, fill))
    return pd.DataFrame(out, columns=['doc_id', 'lang', 'n_tokens', 'bin',
                                      'bin_fill'])


PY_ORACLES = {
    'doc_bpe_encode': expected_doc_bpe_encode,
    'doc_pack_bpe': expected_doc_pack_bpe,
    'doc_bpe_merges': expected_doc_bpe_merges,
    'doc_pack_greedy': expected_doc_pack_greedy,
    'doc_unigram_vocab': expected_doc_unigram_vocab,
    'doc_unigram_encode': expected_doc_unigram_encode,
    'doc_pack_unigram': expected_doc_pack_unigram,
    'emb_lsh_topk': expected_emb_lsh_topk,
    'ev_throttle_elapsed': expected_ev_throttle_elapsed,
    'l2_book_replay': expected_l2_book_replay,
}
