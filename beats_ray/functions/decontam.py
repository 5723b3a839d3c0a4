"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out benchmark/eval corpus.

The standard LLM-data hygiene step (n-gram overlap decontamination as
popularized by GPT-3/PaLM data cards): build the set of all word n-grams
occurring in the benchmark corpus, then scan the training corpus and count,
per document, how many of its distinct n-grams collide.  Documents with any
collision are "contaminated" and typically dropped or redacted before
training.

Scale shape (100 TB corpus, benchmark side is SMALL by definition):
- The benchmark gram set is bounded by the eval suite size (~1e4-1e7
  grams).  It is aggregated per-batch (set union inside ``map_batches``),
  unioned on the driver, and broadcast ONCE via ``ray.put`` — every scan
  task reads the same object-store copy, nothing is re-shipped per batch.
- The training-side scan is a stateless ``map_batches`` stream: no
  shuffle, no materialization; output is only the contaminated doc ids.
- At extreme benchmark sizes swap the frozenset for a Bloom filter (bit
  array broadcast the same way) and accept a tunable false-positive rate;
  the exact-set variant here is the oracle-checkable baseline.

Tokenization matches the DuckDB oracle: lowercase, split on ``\\W+``,
empty tokens dropped, grams joined with single spaces.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray

_TOKEN = re.compile(r"\W+")


def _doc_grams(text: str, n: int) -> set[str]:
    words = [w for w in _TOKEN.split(text.lower()) if w]
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def benchmark_gram_set(bench: "ray.data.Dataset", n: int = 8,
                       text_col: str = "text") -> frozenset[str]:
    """Union of all word n-grams in the benchmark corpus.

    Per-batch set union inside the stream; the driver only unions the
    per-batch distinct sets (bounded by total distinct grams, which is
    small for a benchmark corpus — that boundedness is the operator's
    contract, mirrored by the broadcast-side build in lookup enrich)."""
    def batch_grams(b: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in b.column(text_col).to_pylist():
            if t:
                out |= _doc_grams(t, n)
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    grams: set[str] = set()
    for part in bench.map_batches(batch_grams,
                                  batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        grams.update(part.column("g").to_pylist())
    return frozenset(grams)


class _ContaminationScan:
    """Actor-pool stage: benchmark gram set fetched from the object store
    once per actor (``__init__``), per-batch work is tokenize + set
    membership."""

    def __init__(self, gram_ref, n: int, text_col: str, id_col: str):
        self.grams = ray.get(gram_ref)
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, counts = [], []
        texts = batch.column(self.text_col).to_pylist()
        doc_ids = batch.column(self.id_col).to_pylist()
        for did, t in zip(doc_ids, texts):
            if not t:
                continue
            hits = len(_doc_grams(t, self.n) & self.grams)
            if hits:
                ids.append(did)
                counts.append(hits)
        return pa.table({self.id_col: pa.array(ids, pa.int64()),
                         "contaminated": pa.array(counts, pa.int64())})


class BloomFilter:
    """Fixed-size Bloom filter over strings (numpy uint64 bit array).

    Memory/FP math (standard): for ``capacity`` items at false-positive
    rate ``p``, m = ceil(-capacity * ln(p) / ln(2)^2) bits and
    k = round(m/capacity * ln 2) hashes.  1e8 grams at p=1e-3 is
    m ≈ 1.44e9 bits ≈ **180 MB** — broadcastable via ``ray.put`` where the
    equivalent frozenset would be multi-GB per node.  Double hashing
    (Kirsch–Mitzenmacher) from one 16-byte blake2b digest; NO false
    negatives by construction — contamination scans may only over-flag.
    """

    def __init__(self, capacity: int, fp_rate: float = 1e-3):
        import math
        import numpy as np
        capacity = max(1, int(capacity))
        m = int(math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, round(self.m / capacity * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    @staticmethod
    def _h2(item: str) -> tuple[int, int]:
        import hashlib
        d = hashlib.blake2b(item.encode("utf-8"), digest_size=16).digest()
        return (int.from_bytes(d[:8], "little"),
                int.from_bytes(d[8:], "little") | 1)

    def _positions(self, item: str):
        h1, h2 = self._h2(item)
        for i in range(self.k):
            yield (h1 + i * h2) % self.m

    def add(self, item: str) -> None:
        import numpy as np
        for pos in self._positions(item):
            self.bits[pos >> 6] |= np.uint64(1 << (pos & 63))

    def __contains__(self, item: str) -> bool:
        for pos in self._positions(item):
            if not (int(self.bits[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def benchmark_gram_bloom(bench: "ray.data.Dataset", n: int = 8,
                         text_col: str = "text",
                         capacity: int = 1_000_000,
                         fp_rate: float = 1e-3) -> BloomFilter:
    """Bloom filter of all benchmark word n-grams.

    The scale path for 1e8+ gram eval unions: each batch task builds a
    PARTIAL filter of the same (m, k) shape and the driver ORs the bit
    arrays — driver memory is O(filter size), never O(#grams), and the
    broadcast object is the filter, not the strings."""
    import numpy as np
    shape = BloomFilter(capacity, fp_rate)

    def batch_bloom(b: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fp_rate)
        for t in b.column(text_col).to_pylist():
            if t:
                for g in _doc_grams(t, n):
                    bf.add(g)
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    for part in bench.map_batches(batch_bloom,
                                  batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in part.column("bits").to_pylist():
            shape.bits |= np.frombuffer(raw, dtype=np.uint64)
    return shape


class _BloomScan(_ContaminationScan):
    """Same per-batch scan against a broadcast Bloom filter; `hits` counts
    grams the filter ACCEPTS (>= the exact count, never below — no false
    negatives)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, counts = [], []
        texts = batch.column(self.text_col).to_pylist()
        doc_ids = batch.column(self.id_col).to_pylist()
        for did, t in zip(doc_ids, texts):
            if not t:
                continue
            hits = sum(1 for g in _doc_grams(t, self.n) if g in self.grams)
            if hits:
                ids.append(did)
                counts.append(hits)
        return pa.table({self.id_col: pa.array(ids, pa.int64()),
                         "contaminated": pa.array(counts, pa.int64())})


def ngram_contamination(docs: "ray.data.Dataset",
                        bench: "ray.data.Dataset",
                        n: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        method: str = "exact",
                        bloom_capacity: int = 1_000_000,
                        bloom_fp_rate: float = 1e-3) -> "ray.data.Dataset":
    """Per-document count of distinct word n-grams shared with the
    benchmark corpus (only contaminated docs are emitted).

    docs/bench are Datasets over (id_col, text_col); returns a Dataset of
    (id_col, contaminated) sorted by id_col.

    method="exact" broadcasts the frozenset (oracle-checkable baseline);
    method="bloom" broadcasts a BloomFilter — bounded memory for 1e8+ gram
    eval unions, tunable false positives, zero false negatives."""
    if method == "bloom":
        ref = ray.put(benchmark_gram_bloom(
            bench, n=n, text_col=text_col,
            capacity=bloom_capacity, fp_rate=bloom_fp_rate))
        cls = _BloomScan
    else:
        ref = ray.put(benchmark_gram_set(bench, n=n, text_col=text_col))
        cls = _ContaminationScan
    out = docs.map_batches(
        cls,
        fn_constructor_args=(ref, n, text_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return out.sort(id_col)
