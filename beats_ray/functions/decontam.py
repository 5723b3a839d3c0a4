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


def ngram_contamination(docs: "ray.data.Dataset",
                        bench: "ray.data.Dataset",
                        n: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document count of distinct word n-grams shared with the
    benchmark corpus (only contaminated docs are emitted).

    docs/bench are Datasets over (id_col, text_col); returns a Dataset of
    (id_col, contaminated) sorted by id_col."""
    gram_ref = ray.put(benchmark_gram_set(bench, n=n, text_col=text_col))
    out = docs.map_batches(
        _ContaminationScan,
        fn_constructor_args=(gram_ref, n, text_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return out.sort(id_col)
