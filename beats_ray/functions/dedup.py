"""Deduplication operators — the scale-critical training-data cleaners.

All variants follow the same Ray-Data-first shape (ray_guide "Aggregation at
scale" / dedup pattern):

1. a vectorized ``map_batches`` stage computes per-document signatures
   (content hash / minhash bands / simhash bands) — embarrassingly parallel;
2. a ``groupby`` on the signature key co-locates candidates (band rows are
   TINY — signatures or keys only, never document text, and shingle sets
   travel at most twice via co-group joins rather than once per band);
3. per-group verification (exact compare / Jaccard / hamming) emits dup
   edges, each candidate pair verified ONCE; connected components resolve
   via iterative min-label propagation (bounded rounds of small groupbys) —
   union-find on the driver only for provably small candidate sets.

Exact dedup:     sha1(text) -> groupby(hash) -> min(doc_id) survivor.
MinHash+LSH:     word-shingle set -> k permutation-free minhashes (xor-mix
                 against seeds) -> b bands x r rows -> band-hash buckets ->
                 candidate pairs -> exact n-gram Jaccard verify >= threshold.
SimHash:         64-bit simhash of token hashes; hamming <= d via 4-band
                 exact-match blocking (pigeonhole: d<=3 -> one identical band).
Embedding:       cosine >= t near-dups; exact O(n^2) within blocks for the
                 oracle path, random-hyperplane LSH bucketing as the scale
                 path (documented recall characteristics).

Determinism: all hash seeds are fixed constants; no PYTHONHASHSEED exposure.

Composition order for copy-heavy corpora (measured, scripts/scale_probe.py
--dup): run EXACT dedup first and minhash only the unique survivors.  With
K exact copies per document, every LSH bucket of duplicated content is hot
in ALL bands and candidate verification degenerates toward all-pairs within
each clique — exact dedup removes the cliques for the price of one cheap
hash groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1
_N_HASH = 128
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def pc_ge2(t):
    import pyarrow.compute as _pc
    return _pc.greater_equal(t["n"], 2)


def _minhash_seeds(k: int = _N_HASH, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def _fold61(v: np.ndarray) -> np.ndarray:
    """Reduce uint64 values mod 2^61-1 (two folds + final conditional)."""
    p = np.uint64(_MERSENNE)
    v = (v & p) + (v >> np.uint64(61))
    v = (v & p) + (v >> np.uint64(61))
    return np.where(v >= p, v - p, v)


def _modmul61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a[:,None] * x[None,:]) mod 2^61-1, overflow-free in uint64:
    a = a_hi*2^32 + a_lo; a_lo*x < 2^64 (x < 2^32), and
    (a_hi*x)*2^32 == hi_part + low_part via 2^61 === 1 (mod p)."""
    a_lo = a & np.uint64(0xFFFFFFFF)           # < 2^32
    a_hi = a >> np.uint64(32)                  # < 2^29
    t1 = a_lo[:, None] * x[None, :]            # < 2^64, no overflow
    t2 = a_hi[:, None] * x[None, :]            # < 2^61
    t2_lo = t2 & np.uint64((1 << 29) - 1)      # < 2^29
    t2_hi = t2 >> np.uint64(29)                # < 2^32
    # t2 * 2^32 = t2_hi*2^61 + t2_lo*2^32 === t2_hi + (t2_lo << 32) (mod p)
    return _fold61(_fold61(t1) + t2_hi + (t2_lo << np.uint64(32)))


def _shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingle hashes (64-bit, deterministic)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = set()
    for g in grams:
        out.add(int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"))
    return out


_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _shingle_hash_array(text: str, k: int, memo: dict) -> np.ndarray:
    """Vectorized word-k-gram shingle hashes: per-word blake2b (memoized
    across the batch — vocab is small relative to tokens) combined by a
    rolling positional mix, unique'd.  Deterministic; ~10x faster than
    hashing each joined gram string."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    wh = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = memo.get(w)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            memo[w] = h
        wh[i] = h
    if len(words) < k:
        acc = np.uint64(0)
        for i in range(len(words)):
            acc = acc * _GRAM_MULT + wh[i]
        return np.array([acc], dtype=np.uint64)
    n = len(words) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * _GRAM_MULT + wh[j:j + n]
    return np.unique(acc)


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (the verify step)."""
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_signature(shingle_hashes: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """k minhashes via universal hashing ((a*x32+b) mod p), fully vectorized:
    one (k x n) broadcast multiply in int64 (no overflow by seed bounds)."""
    if isinstance(shingle_hashes, np.ndarray):
        x = shingle_hashes
    else:
        x = np.fromiter(shingle_hashes, dtype=np.uint64, count=len(shingle_hashes))
    if len(x) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = x & np.uint64(0xFFFFFFFF)
    mat = _fold61(_modmul61(a, x) + b[:, None])
    return mat.min(axis=1)


def _mix64(x: np.ndarray) -> np.ndarray:
    """murmur3 64-bit finalizer (vectorized, wrapping uint64 arithmetic)."""
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _band_keys(sig: np.ndarray, n_bands: int, r: int) -> np.ndarray:
    """One 64-bit bucket key per band: order-sensitive xor-mix chain over
    the band's r minhashes — replaces n_bands blake2b hexdigest calls per
    document with ~4 vectorized ops (collision prob ~2^-64 per bucket)."""
    m = sig[:n_bands * r].reshape(n_bands, r).astype(np.uint64)
    acc = np.full(n_bands, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    for j in range(r):
        acc = _mix64(acc ^ m[:, j])
    return acc


def _fnv1a64(s: str) -> int:
    """FNV-1a 64 of the utf-8 bytes — chosen for simhash token hashing
    because it is restatable in the DuckDB oracle as a recursive CTE
    (blake2b is not SQL-expressible)."""
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash64(tokens: list[str], memo: dict | None = None) -> int:
    """Charikar simhash over token 64-bit FNV-1a hashes — vectorized: one
    (n x 64) bit matrix per document; word hashes memoized across a batch."""
    if not tokens:
        return 0
    if memo is None:
        memo = {}
    wh = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = memo.get(t)
        if h is None:
            h = _fnv1a64(t)
            memo[t] = h
        wh[i] = h
    bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out_bits = (acc > 0).astype(np.uint64)
    return int((out_bits << np.arange(64, dtype=np.uint64)).sum())


# ----------------------------------------------------------------- pipelines

def sha1_key128(texts: list) -> tuple[pa.Array, pa.Array]:
    """First 16 SHA-1 digest bytes as two int64 arrays — a 128-bit
    exact-content key that shuffles as fixed-width Arrow ints (16 B/row)
    instead of a 40-byte hex string.  128 bits keeps the birthday-collision
    probability ~1e-15 at 10^12 rows (64 bits would all but guarantee
    collisions there).  None texts key to (0, 0); a real text colliding
    with that is a 2^-128 event."""
    buf = bytearray(16 * len(texts))
    for i, x in enumerate(texts):
        if x is not None:
            buf[16 * i:16 * i + 16] = hashlib.sha1(x.encode()).digest()[:16]
    hv = np.frombuffer(bytes(buf), dtype=np.int64).reshape(-1, 2)
    return pa.array(hv[:, 0]), pa.array(hv[:, 1])


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivors after exact-content dedup: min(id) per sha1-128(text)."""
    from ray.data.aggregate import Min

    def hash_stage(t: pa.Table) -> pa.Table:
        h1, h2 = sha1_key128(t[text_col].to_pylist())
        return pa.table({id_col: t[id_col], "h1": h1, "h2": h2})

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")
    return hashed.groupby(["h1", "h2"]) \
                 .aggregate(Min(id_col, alias_name=id_col)) \
                 .select_columns([id_col])


def _segment_all_pairs(ids: np.ndarray, seg: np.ndarray):
    """All (a<b) id pairs within each segment of ``seg`` (rows pre-sorted by
    (seg, id), (seg,id)-deduplicated).  Fully vectorized: segments are
    grouped BY SIZE, so each distinct size costs one gather + one
    ``triu_indices`` — no per-segment Python loop (a dup-heavy corpus has
    ~bands x clusters segments; looping them was the round-2 hot spot)."""
    starts = np.flatnonzero(np.concatenate([[True], seg[1:] != seg[:-1]]))
    counts = np.diff(np.concatenate([starts, [len(seg)]]))
    out_a, out_b = [], []
    for c in np.unique(counts):
        if c < 2:
            continue
        s = starts[counts == c]                       # (S,) segment starts
        m = ids[s[:, None] + np.arange(c)[None, :]]   # (S, c) ids ascending
        iu, ju = np.triu_indices(int(c), 1)
        out_a.append(m[:, iu].ravel())
        out_b.append(m[:, ju].ravel())
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def _jaccard_flat(P: int, la: np.ndarray, lb: np.ndarray,
                  va: np.ndarray, pid_a: np.ndarray,
                  vb: np.ndarray, pid_b: np.ndarray) -> np.ndarray:
    """Exact Jaccard for P (set, set) pairs given flat value runs in ONE
    numpy pass: tag every shingle value with its pair index
    ((pid<<32)|value), count distinct tags per pair via np.unique + bincount
    — |A∪B| directly, so jac = (|A|+|B|-|A∪B|) / |A∪B|.  No per-pair
    Python loop."""
    keys = np.concatenate([(pid_a.astype(np.uint64) << np.uint64(32))
                           | va.astype(np.uint64),
                           (pid_b.astype(np.uint64) << np.uint64(32))
                           | vb.astype(np.uint64)])
    uniq = np.unique(keys)
    union = np.bincount((uniq >> np.uint64(32)).astype(np.int64), minlength=P)
    inter = (la + lb) - union
    jac = np.ones(P, dtype=np.float64)        # both-empty -> 1.0
    nz = union > 0
    jac[nz] = inter[nz] / union[nz]
    return np.round(jac, 6)


def _jaccard_batch(sh_a: pa.Array, sh_b: pa.Array) -> np.ndarray:
    """`_jaccard_flat` over two aligned ``list<uint32>`` columns."""
    # list_flatten / list_value_length honour slice offsets (raw
    # .values/.offsets on a sliced ListArray would read the full buffer)
    la = pc.list_value_length(sh_a).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lb = pc.list_value_length(sh_b).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    va = pc.list_flatten(sh_a).to_numpy(zero_copy_only=False)
    vb = pc.list_flatten(sh_b).to_numpy(zero_copy_only=False)
    P = len(la)
    return _jaccard_flat(P, la, lb,
                         va, np.repeat(np.arange(P, dtype=np.int64), la),
                         vb, np.repeat(np.arange(P, dtype=np.int64), lb))


def _ragged_gather(idx: np.ndarray, offsets: np.ndarray, lens: np.ndarray,
                   values: np.ndarray):
    """Gather ragged value runs ``values[offsets[i]:offsets[i]+lens[i]]``
    for every i in ``idx`` into one flat array plus per-run ids — the
    vectorized ragged-arange trick (no per-run Python)."""
    l_ = lens[idx]
    cum = np.cumsum(l_)
    total = int(cum[-1]) if len(cum) else 0
    flat = (np.arange(total, dtype=np.int64)
            - np.repeat(cum - l_, l_)
            + np.repeat(offsets[idx], l_))
    return values[flat], np.repeat(np.arange(len(idx), dtype=np.int64), l_)


_EMPTY_EDGES = pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})


def _pair_dedup(a: np.ndarray, b: np.ndarray):
    """Sort + unique (a, b) pairs (both int64)."""
    o = np.lexsort((b, a))
    a, b = a[o], b[o]
    keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    return a[keep], b[keep]


def _broadcast_shingle_store(per_doc, id_col: str):
    """Gather the (doc_id, sh) columns into one flat searchable store and
    ``ray.put`` it ONCE: (sorted ids, offsets, lens, flat uint32 values).
    Small-corpus verify regime only (caller gates on row count)."""
    import ray
    refs = per_doc.select_columns([id_col, "sh"]).to_arrow_refs()
    blocks = [t for t in ray.get(refs) if len(t)] if refs else []
    # guard on the FILTERED list: refs can be non-empty while every block
    # is 0 rows (all-null / all-sub-k texts) — concat_tables([]) raises
    tbl = pa.concat_tables(blocks) if blocks else \
        pa.table({id_col: pa.array([], pa.int64()),
                  "sh": pa.array([], pa.list_(pa.uint32()))})
    ids_all = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids_all, kind="stable")
    sh_sorted = pc.take(tbl["sh"], pa.array(order))
    lens_s = pc.list_value_length(sh_sorted) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    offs_s = np.concatenate([[0], np.cumsum(lens_s)])[:-1]
    vals_s = pc.list_flatten(sh_sorted).to_numpy(zero_copy_only=False) \
        .astype(np.uint32)
    store = (ids_all[order], offs_s, lens_s, vals_s)
    return ray.put(store) if ray.is_initialized() else store


def _store_verify(store_ref, a: np.ndarray, b: np.ndarray, threshold: float):
    """Exact Jaccard for deduped (a, b) pairs against a broadcast store."""
    import ray
    sid, off, lens_, vals = store_ref if isinstance(store_ref, tuple) \
        else ray.get(store_ref)
    ia = np.searchsorted(sid, a)
    ib = np.searchsorted(sid, b)
    va, pa_ = _ragged_gather(ia, off, lens_, vals)
    vb, pb_ = _ragged_gather(ib, off, lens_, vals)
    jac = _jaccard_flat(len(a), lens_[ia], lens_[ib], va, pa_, vb, pb_)
    hit = jac >= threshold
    return pa.table({"a": pa.array(a[hit], pa.int64()),
                     "b": pa.array(b[hit], pa.int64()),
                     "jaccard": pa.array(jac[hit], pa.float64())})


def _verify_pairs_join(pairs, per_doc, id_col: str, threshold: float,
                       n_buckets: int):
    """Web-scale exact-Jaccard verify of a candidate (a, b) pair Dataset:
    two bucketed co-group joins against the (doc_id, sh) store — shingle
    sets ship at most twice, duplicate pairs collapse globally in the first
    co-group (every copy of (a, b) shares a).  Returns (a, b, jaccard)
    edges at ``jaccard >= threshold``."""
    empty = _EMPTY_EDGES

    def tag(key_col, side):
        def fn(t: pa.Table) -> pa.Table:
            k = t[key_col].to_numpy(zero_copy_only=False)
            t = t.append_column(
                "__bkt", pa.array((np.abs(k) % n_buckets).astype(np.int32)))
            return t.append_column("__side", pa.array(
                np.full(len(t), side, np.int8)))
        return fn

    docs_side = per_doc.map_batches(
        lambda t: tag(id_col, 1)(t.select([id_col, "sh"])),
        batch_format="pyarrow")

    def _doc_lookup(g: pa.Table, want_ids: np.ndarray):
        """(ids -> shingle lists) for the doc-side rows of a co-group."""
        d = g.filter(pc.equal(g["__side"], 1))
        idx = pc.index_in(pa.array(want_ids, pa.int64()),
                          value_set=d[id_col].combine_chunks())
        return pc.take(d["sh"], idx)

    def attach_a(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or len(g) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sh_a": pa.array([], pa.list_(pa.uint32()))})
        p = g.filter(pc.equal(g["__side"], 0))
        if len(p) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sh_a": pa.array([], pa.list_(pa.uint32()))})
        a = p["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = p["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # GLOBAL pair dedup: every source's copy of (a,b) hashed here by a
        a, b = _pair_dedup(a, b)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "sh_a": _doc_lookup(g, a)})

    p1_in = pairs.map_batches(tag("a", 0), batch_format="pyarrow") \
                 .union(docs_side)
    p1 = p1_in.groupby("__bkt").map_groups(attach_a, batch_format="pyarrow")

    def verify_b(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or len(g) == 0:
            return empty
        p = g.filter(pc.equal(g["__side"], 0))
        if len(p) == 0:
            return empty
        b = p["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = _jaccard_batch(p["sh_a"], _doc_lookup(g, b))
        hit = jac >= threshold
        return pa.table({
            "a": pa.array(p["a"].to_numpy(zero_copy_only=False)[hit],
                          pa.int64()),
            "b": pa.array(b[hit], pa.int64()),
            "jaccard": pa.array(jac[hit], pa.float64())})

    p2_in = p1.map_batches(tag("b", 0), batch_format="pyarrow") \
              .union(docs_side)
    return p2_in.groupby("__bkt").map_groups(verify_b, batch_format="pyarrow")


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      n_bands: int = 32, threshold: float = 0.8, shingle_k: int = 3,
                      n_shards: int = 64, n_buckets: int = 64,
                      mode: str = "auto", broadcast_rows: int = 200_000):
    """Near-dup candidate pairs via MinHash+LSH, verified with exact n-gram
    Jaccard >= threshold.  Returns a Dataset of (a, b, jaccard) edges, a < b.

    Banding: r = 128/n_bands rows per band; candidate probability at
    similarity j is 1-(1-j^r)^b.  The default 32 bands x 4 rows catches
    j >= ~0.45 reliably (verify discards the false candidates); for a 0.8+
    threshold at extreme scale use n_bands=16 to cut candidate volume.

    Two size regimes (``mode="auto"`` picks by corpus row count, mirroring
    connected_components_auto): below ``broadcast_rows`` the per-doc shingle
    store is ray.put ONCE and pairs verify inline in the pair-generation
    stage — two all-to-alls total; above it, the join path below keeps every
    stage fully distributed.

    Join-path shuffle profile (shingles move TWICE, not x n_bands):

    1. one vectorized signature pass stores each doc's compact shingle-hash
       SET once (``per_doc``, materialized — it feeds three consumers);
    2. tiny (doc_id, bucket-key) band rows — 20 bytes/row, NO shingles —
       shuffle once by key-shard; contiguous same-key segments emit
       candidate (a, b) pairs, vectorized by segment size;
    3. pairs co-group with per-doc shingle sets by hash(a) % n_buckets:
       duplicate pairs from multiple bands collapse HERE (every copy of
       (a,b) shares a, so the dedup is global), then sh_a attaches by
       vectorized index_in + list-take;
    4. the same co-group by hash(b) attaches sh_b and computes exact
       Jaccard for every surviving pair in one numpy pass.

    The round-2 shape tiled every shingle set x 32 band rows through a
    materialize + shuffle and re-verified each pair once PER BAND; this
    shape ships each shingle set twice and verifies each pair once.

    The bucket key is ONE int64 column ``bb`` = mix64(band_hash ^ band),
    reinterpreted signed: Ray's sort-based shuffle converts uint64 key values
    > 2^63 through Python ints and falls back to pickled-object blocks
    (reproduced in round 2 — the ArrowConversionError tail) — int64 keys keep
    the shuffle zero-copy Arrow.  Mixing band into the hash is a bijection of
    (bh ^ band), so bucket collisions stay at the ~2^-64 level of the band
    hash itself, and a collision can only MERGE buckets (extra candidates,
    removed by exact verify), never lose a candidate pair.

    Skew note: a giant cluster of IDENTICAL documents would emit O(m^2)
    pairs from one segment — run ``exact_dedup`` first (the catalogue does);
    LSH's job is the near-miss tail, where cluster sizes are bounded by the
    similarity threshold itself.
    """
    a_seed, b_seed = _minhash_seeds()
    rows_per_band = _N_HASH // n_bands

    def sig_doc(t: pa.Table) -> pa.Table:
        memo: dict = {}          # word-hash memo shared across the batch
        ids_list, band_hashes, sh_arrays = [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if txt is None:
                continue
            sh = _shingle_hash_array(txt, shingle_k, memo)
            sig = minhash_signature(sh, a_seed, b_seed)
            ids_list.append(did)
            band_hashes.append(_band_keys(sig, n_bands, rows_per_band))
            # re-unique after the 32-bit truncation: low-bit collisions
            # (birthday ~m^2/2^33 per doc) would leave duplicates in the
            # stored list, and _jaccard_flat's la+lb-union overstates J
            # for lists that aren't sets (can even exceed 1.0)
            sh_arrays.append(np.unique(
                (sh & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
        n = len(ids_list)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sh": pa.array([], pa.list_(pa.uint32())),
                             "bbs": pa.array([], pa.list_(pa.int64()))})
        bands = np.tile(np.arange(n_bands, dtype=np.uint64), n)
        bh = np.concatenate(band_hashes)                 # (n * n_bands,)
        bb = _mix64(bh ^ bands).view(np.int64)           # signed shuffle key
        bb_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * n_bands, n_bands, dtype=np.int32)),
            pa.array(bb, pa.int64()))
        lens = np.fromiter((len(s) for s in sh_arrays), dtype=np.int64, count=n)
        offsets = np.empty(n + 1, dtype=np.int32)
        offsets[0] = 0
        np.cumsum(lens, out=offsets[1:])
        sh_col = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(np.concatenate(sh_arrays) if n else np.empty(0, np.uint32),
                     pa.uint32()))
        return pa.table({id_col: pa.array(np.asarray(ids_list, np.int64)),
                         "sh": sh_col, "bbs": bb_col})

    per_doc = ds.map_batches(sig_doc, batch_format="pyarrow").materialize()

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), n_bands)
        # pc.list_flatten, NOT .values: Ray hands out zero-copy SLICED
        # batches, and raw .values on a sliced ListArray reads the full
        # underlying buffer (the file-wide slice-offset rule)
        bb = pc.list_flatten(t["bbs"]).to_numpy(zero_copy_only=False)
        shard = (np.abs(bb) % n_shards).astype(np.int32)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bb": pa.array(bb, pa.int64()),
                         "shard": pa.array(shard)})

    band = per_doc.map_batches(explode_bands, batch_format="pyarrow")
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    import ray
    if mode == "auto":
        mode = "broadcast" if per_doc.count() <= broadcast_rows else "join"

    if mode == "broadcast":
        # Small-corpus regime (counterpart of connected_components_auto's
        # driver union-find): the per-doc shingle store fits comfortably in
        # one object — ray.put it ONCE and verify candidate pairs inline in
        # the pair-generation stage.  Two all-to-alls total (band shuffle +
        # cross-band edge dedup) instead of the join path's four; at
        # web scale the join path engages and shingles never gather.
        store_ref = _broadcast_shingle_store(per_doc, id_col)

        def gen_verify(g: pa.Table) -> pa.Table:
            if g.num_columns == 0 or len(g) < 2:
                return empty
            bb = g["bb"].to_numpy(zero_copy_only=False)
            ids = g[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, bb))
            bb, ids = bb[order], ids[order]
            keep = np.concatenate(
                [[True], (bb[1:] != bb[:-1]) | (ids[1:] != ids[:-1])])
            a, b = _segment_all_pairs(ids[keep], bb[keep])
            # same (a,b) can surface from several bands IN THIS SHARD
            if len(a) == 0:
                return empty
            a, b = _pair_dedup(a, b)
            return _store_verify(store_ref, a, b, threshold)

        edges = band.groupby("shard").map_groups(gen_verify,
                                                 batch_format="pyarrow")
        # cross-shard duplicates (same pair from bands in different shards):
        # jaccard is computed identically everywhere, so Min is a pure dedup
        from ray.data.aggregate import Min
        return edges.groupby(["a", "b"]).aggregate(
            Min("jaccard", alias_name="jaccard"))

    def gen_pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or len(g) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        bb = g["bb"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bb))
        bb, ids = bb[order], ids[order]
        keep = np.concatenate([[True],
                               (bb[1:] != bb[:-1]) | (ids[1:] != ids[:-1])])
        a, b = _segment_all_pairs(ids[keep], bb[keep])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    pairs = band.groupby("shard").map_groups(
        gen_pairs, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        # Dataset, not a bare Table: the join path's consumers
        # (connected_components_auto and friends) call Dataset methods
        import ray.data as rd
        return rd.from_arrow(empty)
    return _verify_pairs_join(pairs, per_doc, id_col, threshold, n_buckets)


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, shingle_k: int = 3,
                        n_shards: int = 64, n_buckets: int = 64,
                        mode: str = "auto", broadcast_rows: int = 200_000):
    """EXACT n-gram-Jaccard near-dup pairs (no LSH approximation) via
    prefix-filtered AllPairs (Bayardo/Ma/Srikant, WWW'07; Chaudhuri's
    prefix filter) — the deterministic sibling of ``minhash_lsh_pairs``.
    Returns (a, b, jaccard) edges with jaccard >= threshold, a < b.

    Prefix filter (exact, no candidates lost): fix a global total order on
    shingle hashes (ascending uint32).  If J(A,B) >= t then, with the
    length filter |B| >= t|A| that J >= t implies, the overlap is
    o >= ceil(t * max(|A|,|B|)); if the smallest COMMON shingle sat outside
    A's first |A| - ceil(t|A|) + 1 shingles, all common shingles would sit
    in A's last ceil(t|A|) - 1 positions — fewer than o.  So every
    qualifying pair shares a token within both docs' prefixes, and indexing
    ONLY prefixes finds every edge.  Hash order is a valid total order;
    production corpora should order by ascending global token frequency
    (one extra count+join) to shrink hot postings — documented knob, not
    needed for exactness.

    Ray shape (mirrors minhash_lsh_pairs, shingles ship at most twice):

    1. vectorized signature pass: per doc, sorted unique uint32 shingle
       set + its prefix tokens (``per_doc`` materialized — feeds pair-gen
       and verify);
    2. tiny (token, doc_id, set_size) prefix rows shuffle once by token
       shard; contiguous same-token segments emit candidate pairs with the
       length filter min >= t*max applied vectorized;
    3. verify is EXACT Jaccard: broadcast store below ``broadcast_rows``
       docs (two all-to-alls total), else the two-co-group join path
       (``_verify_pairs_join``) — identical machinery to minhash.

    Skew: a shingle shared by f prefix entries emits O(f^2) candidate
    pairs.  The frequency ordering above is the standard mitigation (hot
    tokens leave every prefix); run ``exact_dedup`` first for copy-heavy
    corpora (same note as minhash).
    """
    def sig_doc(t: pa.Table) -> pa.Table:
        memo: dict = {}
        ids_list, sh_arrays, pref_arrays = [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if txt is None:
                continue
            sh64 = _shingle_hash_array(txt, shingle_k, memo)
            if len(sh64) == 0:
                continue
            sh = np.unique((sh64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            m = len(sh)
            # required overlap ceil(t*m); epsilon guards fp ceil overshoot
            # (a too-large req would shrink the prefix and LOSE candidates)
            req = int(np.ceil(threshold * m - 1e-9))
            pref = sh[:max(1, m - req + 1)].astype(np.int64)
            ids_list.append(did)
            sh_arrays.append(sh)
            pref_arrays.append(pref)
        n = len(ids_list)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sh": pa.array([], pa.list_(pa.uint32())),
                             "pref": pa.array([], pa.list_(pa.int64()))})

        def list_col(arrays, dtype):
            lens = np.fromiter((len(s) for s in arrays), np.int64, count=n)
            offs = np.empty(n + 1, dtype=np.int32)
            offs[0] = 0
            np.cumsum(lens, out=offs[1:])
            return pa.ListArray.from_arrays(
                pa.array(offs), pa.array(np.concatenate(arrays), dtype))

        return pa.table({id_col: pa.array(np.asarray(ids_list, np.int64)),
                         "sh": list_col(sh_arrays, pa.uint32()),
                         "pref": list_col(pref_arrays, pa.int64())})

    per_doc = ds.map_batches(sig_doc, batch_format="pyarrow").materialize()

    def explode_prefix(t: pa.Table) -> pa.Table:
        pref = t["pref"].combine_chunks() if isinstance(
            t["pref"], pa.ChunkedArray) else t["pref"]
        lens = pc.list_value_length(pref).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), lens)
        sizes = np.repeat(
            pc.list_value_length(t["sh"]).to_numpy(zero_copy_only=False)
            .astype(np.int32), lens)
        tok = pc.list_flatten(pref).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "tok": pa.array(tok, pa.int64()),
                         "m": pa.array(sizes, pa.int32()),
                         "shard": pa.array(
                             (tok % n_shards).astype(np.int32))})

    prefix_rows = per_doc.map_batches(explode_prefix, batch_format="pyarrow")
    empty = _EMPTY_EDGES
    if mode == "auto":
        mode = "broadcast" if per_doc.count() <= broadcast_rows else "join"

    def gen_candidates(g: pa.Table):
        """(a, b) deduped candidate pairs for one token shard."""
        if g.num_columns == 0 or len(g) < 2:
            return None
        tok = g["tok"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        msz = g["m"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tok))
        tok, ids, msz = tok[order], ids[order], msz[order]
        keep = np.concatenate(
            [[True], (tok[1:] != tok[:-1]) | (ids[1:] != ids[:-1])])
        tok, ids, msz = tok[keep], ids[keep], msz[keep]
        # pair POSITIONS so sizes come along for the length filter
        pos_a, pos_b = _segment_all_pairs(
            np.arange(len(ids), dtype=np.int64), tok)
        if len(pos_a) == 0:
            return None
        ma, mb = msz[pos_a].astype(np.float64), msz[pos_b].astype(np.float64)
        ok = np.minimum(ma, mb) >= threshold * np.maximum(ma, mb) - 1e-9
        if not ok.any():
            return None
        a, b = _pair_dedup(ids[pos_a[ok]], ids[pos_b[ok]])
        return a, b

    if mode == "broadcast":
        store_ref = _broadcast_shingle_store(per_doc, id_col)

        def gen_verify(g: pa.Table) -> pa.Table:
            cand = gen_candidates(g)
            if cand is None:
                return empty
            return _store_verify(store_ref, cand[0], cand[1], threshold)

        edges = prefix_rows.groupby("shard").map_groups(
            gen_verify, batch_format="pyarrow")
        # same pair can surface from tokens in different shards
        from ray.data.aggregate import Min
        return edges.groupby(["a", "b"]).aggregate(
            Min("jaccard", alias_name="jaccard"))

    def gen_pairs(g: pa.Table) -> pa.Table:
        cand = gen_candidates(g)
        if cand is None:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(cand[0], pa.int64()),
                         "b": pa.array(cand[1], pa.int64())})

    pairs = prefix_rows.groupby("shard").map_groups(
        gen_pairs, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        import ray.data as rd
        return rd.from_arrow(empty)
    return _verify_pairs_join(pairs, per_doc, id_col, threshold, n_buckets)


def cc_label_propagation(edges, max_rounds: int = 10, n_buckets: int = 32):
    """Distributed connected components by min-label propagation — the
    web-scale path when the edge list exceeds driver memory.

    Per round (TWO all-to-alls total, the minimum for a join-based BSP
    step): (1) ONE bucketed hash join of the pre-materialized symmetric
    edge list against the current labels produces neighbor messages;
    (2) one groupby(node) computes min(own, incoming) AND the node's own
    previous label in the same aggregate (own-label rows ride along with a
    marker column), so convergence is a per-block changed-count — the
    driver sees one small int per round, never the node set.  Converges in
    O(component diameter) rounds.  Returns a Dataset of (node, root)
    membership (row-proportional).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    from .joins import bucketed_join

    # symmetric edge list (node -> neighbor), built once
    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "other": pa.concat_arrays([b, a])})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    labels = sym.map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow")         .groupby("node").aggregate(Min("node", alias_name="label"))
    for _ in range(max_rounds):
        lab = labels.materialize()
        joined = bucketed_join(sym, lab, on="node", n_buckets=n_buckets)

        def msg(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or "other" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "label": pa.array([], pa.int64()),
                                 "own_label": pa.array([], pa.int64())})
            return pa.table(
                {"node": t["other"].combine_chunks().cast(pa.int64()),
                 "label": t["label"].combine_chunks().cast(pa.int64()),
                 "own_label": pa.nulls(len(t), pa.int64())})

        def own(t: pa.Table) -> pa.Table:
            lbl = t["label"].combine_chunks().cast(pa.int64())
            return pa.table({"node": t["node"].combine_chunks().cast(pa.int64()),
                             "label": lbl, "own_label": lbl})

        messages = joined.map_batches(msg, batch_format="pyarrow")                          .union(lab.map_batches(own, batch_format="pyarrow"))
        agg = messages.groupby("node").aggregate(
            Min("label", alias_name="label"),
            Max("own_label", alias_name="own_label")).materialize()

        def changed(t: pa.Table) -> pa.Table:
            mask = pc.fill_null(pc.not_equal(t["label"], t["own_label"]), True)
            return pa.table({"changed": pa.array(
                [pc.sum(pc.cast(mask, pa.int64())).as_py() or 0], pa.int64())})

        n_changed = sum(r["changed"] for r in
                        agg.map_batches(changed, batch_format="pyarrow").take_all())
        labels = agg.map_batches(lambda t: t.select(["node", "label"]),
                                 batch_format="pyarrow")
        if n_changed == 0:
            converged = True
            break
    else:
        converged = False
    if not converged:
        # min-label propagation needs O(component diameter) rounds; a
        # versioned-document chain longer than max_rounds would otherwise
        # SILENTLY return one true component split into several roots
        raise RuntimeError(
            f"cc_label_propagation did not converge in {max_rounds} rounds "
            "(a component's diameter exceeds the round budget); re-run with "
            "a larger max_rounds")

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"].combine_chunks().cast(pa.int64()),
                         "root": t["label"].combine_chunks().cast(pa.int64())})

    # (node, root) membership is row-proportional to the corpus: stream it
    return labels.map_batches(shape, batch_format="pyarrow")


def connected_components_auto(edges, driver_threshold: int = 2_000_000,
                              n_buckets: int = 32, max_rounds: int = 10):
    """Size-adaptive connected components over an (a, b) edge Dataset.

    The verified near-dup edge list is usually orders of magnitude smaller
    than the corpus; when it fits comfortably on the driver
    (< driver_threshold edges, ~100 MB) a union-find is both exact and
    cheaper than 2 all-to-alls per BSP round.  Larger edge lists route to
    the distributed min-label propagation.  Both paths are identity-tested
    against each other; returns (node, root) with int64 columns either way.
    """
    edges = edges.materialize()
    n_edges = edges.count()     # metadata-free on a materialized dataset
    if n_edges == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "root": pa.array([], pa.int64())}))
    if n_edges <= driver_threshold:
        df = edges.to_pandas()
        out = connected_components(df, id_col="node")
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {"node": pa.array(out["node"].to_numpy(), pa.int64()),
             "root": pa.array(out["root"].to_numpy(), pa.int64())}))
    return cc_label_propagation(edges, max_rounds=max_rounds,
                                n_buckets=n_buckets)


def connected_components(edges_df: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Driver-side union-find over a verified (small) edge list -> (id, root).
    For web-scale edge lists, run min-label propagation with groupbys
    instead; this helper is for candidate sets already reduced by verify."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges_df["a"], edges_df["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set(edges_df["a"]) | set(edges_df["b"])
    return pd.DataFrame({id_col: sorted(nodes),
                         "root": [find(x) for x in sorted(nodes)]})


def simhash64_batch(texts: list[str | None]) -> np.ndarray:
    """Vectorized batch simhash: factorize the token stream (C-speed vocab
    mapping), blake2b once per UNIQUE word, then 64 reduceat passes over the
    flat bit stream — no per-document Python loop, no (tokens x 64) matrix.
    Identical output to simhash64() per document."""
    tokens_per_doc = [t.split() if t else [] for t in texts]
    lens = np.fromiter((len(x) for x in tokens_per_doc), dtype=np.int64,
                       count=len(tokens_per_doc))
    flat = [w for doc in tokens_per_doc for w in doc]
    sigs = np.zeros(len(texts), dtype=np.uint64)
    if not flat:
        return sigs
    codes, uniques = pd.factorize(pd.Series(flat, dtype=object))
    uh = np.empty(len(uniques), dtype=np.uint64)
    for i, w in enumerate(uniques):
        uh[i] = _fnv1a64(w)
    wh_all = uh[codes]
    nonempty = np.where(lens > 0)[0]
    starts = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
    ne_lens = lens[nonempty]
    sig_ne = np.zeros(len(nonempty), dtype=np.uint64)
    for b in range(64):
        bit = ((wh_all >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bit, starts)
        # majority: sum(2*bit-1) > 0  <=>  2*ones > n_tokens
        sig_ne |= ((2 * ones > ne_lens).astype(np.uint64)) << np.uint64(b)
    sigs[nonempty] = sig_ne
    return sigs


def _simhash_verify_segments(ids: np.ndarray, ss: np.ndarray,
                             bb: np.ndarray, max_hamming: int):
    """Pairwise popcount verify over CONTIGUOUS (band,key) segments of a
    sorted row set: one small numpy pass per multi-member segment (no pandas
    slicing), each segment's xor matrix CHUNKED so peak memory is
    O(chunk x segment) — a pathological hot bucket (giant near-identical
    cluster) degrades to more iterations, never a multi-GB allocation
    (round-2 ADVICE: 64k members would need 32 GB as one matrix)."""
    out_a, out_b, out_d = [], [], []
    # segment boundaries of the sorted bb column
    starts = np.flatnonzero(np.concatenate([[True], bb[1:] != bb[:-1]]))
    ends = np.concatenate([starts[1:], [len(bb)]])
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        gi, gs = ids[s:e], ss[s:e]
        # dedup ids within the bucket (same doc can land twice pre-filter)
        order = np.argsort(gi, kind="stable")
        keep = np.concatenate([[True], gi[order][1:] != gi[order][:-1]])
        sel = order[keep]
        gi, gs = gi[sel], gs[sel]
        n = len(gi)
        if n < 2:
            continue
        chunk = max(64, min(8192, (1 << 26) // n))
        col_idx = np.arange(n)
        for s0 in range(0, n, chunk):
            s1 = min(s0 + chunk, n)
            x = gs[s0:s1, None] ^ gs[None, :]
            d = np.zeros(x.shape, dtype=np.uint8)
            for shift in range(0, 64, 8):
                d += _POPCNT8[((x >> np.uint64(shift))
                               & np.uint64(0xFF)).astype(np.uint8)]
            hit = (d <= max_hamming) & \
                (col_idx[None, :] > np.arange(s0, s1)[:, None])
            ia, ib = np.where(hit)
            if len(ia):
                out_a.append(gi[ia + s0])
                out_b.append(gi[ib])
                out_d.append(d[ia, ib].astype(np.int64))
    if not out_a:
        return (np.empty(0, np.int64),) * 3
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_d))


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, n_buckets: int = 256):
    """SimHash near-dup edges: 64-bit simhash, 4-band blocking (hamming<=3
    guarantees one identical 16-bit band), verify by popcount.

    Shuffle/verify shape (round-3): the (band, 16-bit key) pair packs into
    ONE exact int32 ``bb`` = band*65536 + key; a census prefilter (partial
    count per block -> one small groupby) drops the singleton buckets that
    dominate non-duplicated corpora; surviving rows shuffle ONCE by
    ``bb % n_buckets`` so each verify task handles MANY buckets with
    numpy segment processing — per-group Python overhead is O(n_buckets),
    not O(#hot buckets) (the round-2 shape spent ~90% of the dup-corpus
    wall time in ~250k per-group pandas calls)."""
    from ray.data.aggregate import Sum

    def sig_stage(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        dids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        valid = np.array([x is not None for x in texts], dtype=bool)
        sh = simhash64_batch(texts)[valid]
        dids = dids[valid]
        n = len(dids)
        ids = np.repeat(dids, 4)
        bands = np.tile(np.arange(4, dtype=np.int64), n)
        shifts = (16 * np.tile(np.arange(4, dtype=np.uint64), n))
        keys = ((np.repeat(sh, 4) >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        bb = (bands * 65536 + keys).astype(np.int32)     # exact packed key
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bb": pa.array(bb, pa.int32()),
                         "sig": pa.array(np.repeat(sh, 4), pa.uint64())})

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow").materialize()

    def bucket_partial(t: pa.Table) -> pa.Table:
        return t.select(["bb"]).group_by(["bb"]) \
                .aggregate([([], "count_all")]) \
                .rename_columns(["bb", "n_part"])

    hot = sigs.map_batches(bucket_partial, batch_format="pyarrow") \
              .groupby("bb").aggregate(Sum("n_part", alias_name="n")) \
              .map_batches(lambda t: t.filter(pc_ge2(t)),
                           batch_format="pyarrow").take_all()
    hot_keys = [r["bb"] for r in hot]
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if not hot_keys:
        import ray.data as rd
        return rd.from_arrow(empty)
    import ray
    hot_arr = pa.array(hot_keys, pa.int32())
    hot_ref = ray.put(hot_arr) if ray.is_initialized() else hot_arr

    def keep_hot(t: pa.Table) -> pa.Table:
        keys = hot_ref if isinstance(hot_ref, pa.Array) else ray.get(hot_ref)
        t = t.filter(pc.is_in(t["bb"], value_set=keys))
        shard = pc.cast(pc.bit_wise_and(t["bb"], n_buckets - 1), pa.int32()) \
            if (n_buckets & (n_buckets - 1)) == 0 else \
            pa.array((t["bb"].to_numpy(zero_copy_only=False)
                      % n_buckets).astype(np.int32))
        return t.append_column("shard", shard)

    hot_sigs = sigs.map_batches(keep_hot, batch_format="pyarrow")

    def verify_shard(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or len(g) < 2:
            return empty
        bb = g["bb"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        ss = g["sig"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(bb, kind="stable")
        a, b, d = _simhash_verify_segments(
            ids[order].astype(np.int64), ss[order].astype(np.uint64),
            bb[order], max_hamming)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "hamming": pa.array(d, pa.int64())})

    edges = hot_sigs.groupby("shard").map_groups(verify_shard,
                                                 batch_format="pyarrow")
    # pair surfaces from up to 4 bands -> distributed dedup (hamming is
    # identical across bands for a pair, so Min is a pure dedup)
    from ray.data.aggregate import Min
    return edges.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def _block_pairs(t1: pa.Table, t2: pa.Table | None, id_col: str,
                 threshold: float) -> pa.Table:
    """Exact cosine pairs within one block (t2 None) or across two blocks.

    The matmul is TILED (rows of u1 in bounded strips against all of u2) so
    peak per-task memory is O(tile x block) — round-2 ADVICE: a 50k x 50k
    float64 matrix is 20 GB; the strips stay under ~0.2 GB regardless of
    block size."""
    from .veclib import ids_to_numpy, list_to_matrix
    ids1 = ids_to_numpy(t1[id_col])
    u1 = list_to_matrix(t1["unit"])
    same = t2 is None
    if same:
        ids2, u2 = ids1, u1
    else:
        ids2 = ids_to_numpy(t2[id_col])
        u2 = list_to_matrix(t2["unit"])
    n2 = len(ids2)
    tile = max(64, min(8192, (1 << 25) // max(n2, 1)))
    out_a, out_b, out_v = [], [], []
    for s0 in range(0, len(ids1), tile):
        s1 = min(s0 + tile, len(ids1))
        cos = u1[s0:s1] @ u2.T
        hit = cos >= threshold
        if same:
            # global upper triangle only (pair each once)
            hit &= np.arange(n2)[None, :] > np.arange(s0, s1)[:, None]
        ia, ib = np.where(hit)
        if len(ia):
            out_a.append(ids1[ia + s0])
            out_b.append(ids2[ib])
            out_v.append(cos[ia, ib])
    if not out_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    v = np.concatenate(out_v)
    return pa.table({"a": pa.array(np.minimum(a, b), pa.int64()),
                     "b": pa.array(np.maximum(a, b), pa.int64()),
                     "cos": pa.array(np.round(v, 6), pa.float64())})


def embedding_near_dup(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                       threshold: float = 0.95, block: int | None = None):
    """Exact cosine near-dup pairs (a<b, cos>=threshold) via DISTRIBUTED
    block-nested-loop: normalize per block, pin the blocks in the object
    store, and spawn one Ray task per block pair (i<=j) — O(n^2/p) compute
    with no driver materialization (the old path concat'ed the whole dataset
    onto the driver).  Exact answer, so it stays the oracle-checked query;
    embedding_near_dup_lsh is the sub-quadratic approximate path."""
    import ray
    import ray.data as rd

    from .veclib import ids_to_numpy, list_to_matrix, matrix_to_list

    def prep(t: pa.Table) -> pa.Table:
        ids = ids_to_numpy(t[id_col])
        mat = list_to_matrix(t[vec_col])
        if block is not None:
            keep = ids < block
            ids, mat = ids[keep], mat[keep]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "unit": matrix_to_list(unit)})

    # coalesce to ~8k-row blocks: block-pair task count is O(B^2), so tiny
    # input blocks drown the matmuls in Ray task overhead, while big blocks
    # concentrate O(block^2) hits in one task — 8k keeps each pair task's
    # tiled strips ~0.2 GB (see _block_pairs) with useful matmul sizes
    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    n_total = prepped.count()   # metadata-free on a materialized dataset
    n_blocks = max(1, -(-n_total // 8_000))
    refs = prepped.repartition(n_blocks).to_arrow_refs()

    @ray.remote
    def cross(b1, b2, same: bool):
        t1 = b1 if isinstance(b1, pa.Table) else pa.Table.from_batches([b1])
        t2 = t1 if same else (b2 if isinstance(b2, pa.Table)
                              else pa.Table.from_batches([b2]))
        return _block_pairs(t1, None if same else t2, id_col, threshold)

    tasks = []
    for i in range(len(refs)):
        tasks.append(cross.remote(refs[i], refs[i], True))
        for j in range(i + 1, len(refs)):
            tasks.append(cross.remote(refs[i], refs[j], False))
    if not tasks:
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())}))
    # edge blocks stay in the object store; consumers stream them
    return rd.from_arrow_refs(tasks)


def embedding_near_dup_lsh(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                           threshold: float = 0.95, n_planes: int = 16,
                           n_tables: int = 8, seed: int = 42):
    """Approximate near-dup pairs via random-hyperplane LSH: n_tables
    signatures of n_planes sign bits; exact cosine verify within buckets.
    Recall rises with n_tables (collision prob per table = (1-theta/pi)^k)."""
    from .veclib import ids_to_numpy, list_to_matrix, matrix_to_list

    # hyperplanes are a pure function of (seed, dims): built lazily on the
    # first batch each worker sees and memoized by dims, so any embedding
    # dimension works (a fixed 64-row allocation would crash the matmul for
    # 128/384/768-dim models) and every worker derives identical planes
    plane_cache: dict[int, list[np.ndarray]] = {}

    def _planes_for(dims: int) -> list[np.ndarray]:
        got = plane_cache.get(dims)
        if got is None:
            rng = np.random.default_rng(seed)
            got = plane_cache[dims] = [
                rng.standard_normal((dims, n_planes)) for _ in range(n_tables)]
        return got

    def sig_stage(t: pa.Table) -> pa.Table:
        mat = list_to_matrix(t[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        ids_in = ids_to_numpy(t[id_col])
        n = len(ids_in)
        keys = np.empty((n_tables, n), dtype=np.int64)
        for ti, P in enumerate(_planes_for(mat.shape[1])):
            bits = (unit @ P) > 0
            keys[ti] = bits.dot(1 << np.arange(bits.shape[1]))
        return pa.table({id_col: pa.array(np.tile(ids_in, n_tables), pa.int64()),
                         "tbl": pa.array(np.repeat(
                             np.arange(n_tables, dtype=np.int32), n), pa.int32()),
                         "key": pa.array(keys.ravel(), pa.int64()),
                         "unit": matrix_to_list(np.tile(unit, (n_tables, 1)))})

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow")

    def verify(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if len(g) < 2:
            return empty
        ids = ids_to_numpy(g[id_col])
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        keep = np.concatenate([[True], ids_s[1:] != ids_s[:-1]])
        sel, ids = order[keep], ids_s[keep]
        if len(ids) < 2:
            return empty
        unit = list_to_matrix(g["unit"])[sel]
        cos = unit @ unit.T
        ia, ib = np.where(np.triu(cos >= threshold, k=1))
        if not len(ia):
            return empty
        return pa.table({"a": pa.array(ids[ia], pa.int64()),
                         "b": pa.array(ids[ib], pa.int64()),
                         "cos": pa.array(np.round(cos[ia, ib], 6), pa.float64())})

    edges = sigs.groupby(["tbl", "key"]).map_groups(verify, batch_format="pyarrow")
    # pair surfaces from several LSH tables -> distributed dedup (cos is
    # computed identically everywhere, so Min is a pure dedup)
    from ray.data.aggregate import Min
    return edges.groupby(["a", "b"]).aggregate(Min("cos", alias_name="cos"))
