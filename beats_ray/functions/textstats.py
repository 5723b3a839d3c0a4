"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized map_batches transforms over a string column:

- ``token_count``     — whitespace tokens + a BPE-ish regex token count
- ``lang_id``         — n-gram/stopword heuristic language guess (no model
                        downloads; profiles are small public function-word
                        lists compiled into the stage)
- ``quality_score``   — length / punctuation / stopword-ratio features and a
                        composite score (the C4/Gopher-style cheap filters)
- ``doc_fingerprint`` — 64-bit polynomial rolling hash over tokens (shift-add
                        over a prime base, mod 2^64) for cheap exact-ish
                        near-identity blocking

Everything is deterministic; no wall clock, no external data.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, set_column
from ..stages.base import Stage, register

# BPE-ish token pattern: words with optional leading space, numbers, punct runs
BPE_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "para"},
}


@register("token_count")
class TokenCount(Stage):
    """config: field, target (default "<field>_tokens"), mode:
    "whitespace" (single-space split, matches SQL string_split) |
    "bpe" (regex token count)."""

    name = "token_count"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.mode = self.config.get("mode", "whitespace")
        self.target = self.config.get("target", f"{self.field}_tokens")

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        if self.mode == "bpe":
            # count_substring_regex counts non-overlapping matches — exact
            # re.findall-length parity (verified on null/empty/mixed), and
            # it exists on the pinned pyarrow.  (The previous
            # extract_regex_span branch was dead here and would have been
            # wrong anyway: it needs named groups and spans only the FIRST
            # match.)
            counts = pc.cast(pc.count_substring_regex(col, BPE_RE), pa.int64())
        else:
            counts = pc.cast(pc.list_value_length(pc.split_pattern(col, " ")),
                             pa.int64())
        return set_column(batch, field_to_column(self.target), counts)


@register("lang_id")
class LangID(Stage):
    """Stopword-vote language guess: score = #tokens found in each language's
    function-word set; argmax wins, 'und' (undetermined) when all zero.
    config: field, target (default "lang_pred")."""

    name = "lang_id"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.target = self.config.get("target", "lang_pred")

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        langs = list(STOPWORDS)
        toks = pd.Series(col.to_pylist()).str.lower().str.split()
        preds = []
        for ws in toks:
            if not ws:
                preds.append(None)
                continue
            scores = [sum(w in STOPWORDS[lg] for w in ws) for lg in langs]
            best = max(range(len(langs)), key=lambda i: scores[i])
            preds.append(langs[best] if scores[best] > 0 else "und")
        return set_column(batch, field_to_column(self.target),
                          pa.array(preds, pa.string()))


@register("quality_score")
class QualityScore(Stage):
    """Cheap quality features + composite (fully vectorized):
    n_chars, n_tokens (single-space split), mean_token_len, punct_ratio,
    stopword_ratio (en), quality = stopword_ratio * 0.4
      + clip(n_tokens/100, 0, 1) * 0.3 + (1 - punct_ratio) * 0.3.
    config: field, prefix (default "q")."""

    name = "quality_score"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.prefix = self.config.get("prefix", "q")

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        n_chars = pc.cast(pc.utf8_length(col), pa.int64())
        toks = pc.split_pattern(col, " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        # punct count = chars remaining after stripping non-punct (vectorized)
        n_punct = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(col, r"[^.,;:!?]", "")), pa.int64())
        nf = pc.cast(n_chars, pa.float64())
        punct_ratio = pc.if_else(pc.greater(n_chars, 0),
                                 pc.divide(pc.cast(n_punct, pa.float64()),
                                           pc.max_element_wise(nf, 1.0)), 0.0)
        sw = STOPWORDS["en"]
        stop_counts = pa.array(
            [sum(1 for w in (v.lower().split(" ") if v else []) if w in sw)
             for v in col.to_pylist()], pa.int64())
        ntf = pc.max_element_wise(pc.cast(n_tokens, pa.float64()), 1.0)
        stop_ratio = pc.divide(pc.cast(stop_counts, pa.float64()), ntf)
        mean_tok = pc.divide(pc.cast(pc.subtract(n_chars,
                                                 pc.subtract(n_tokens, 1)), pa.float64()), ntf)
        quality = pc.add(
            pc.add(pc.multiply(stop_ratio, 0.4),
                   pc.multiply(pc.min_element_wise(
                       pc.divide(pc.cast(n_tokens, pa.float64()), 100.0), 1.0), 0.3)),
            pc.multiply(pc.subtract(1.0, punct_ratio), 0.3))
        p = self.prefix + "_"
        for name, vals in [("n_chars", n_chars), ("n_tokens", n_tokens),
                           ("punct_ratio", punct_ratio),
                           ("stopword_ratio", stop_ratio),
                           ("mean_token_len", mean_tok),
                           ("quality", quality)]:
            batch = set_column(batch, p + name, vals)
        return batch


ROLL_BASE = np.uint64(1099511628211)   # FNV prime as the polynomial base
ROLL_OFFSET = np.uint64(14695981039346656037)


def rolling_fingerprint(tokens: list[str]) -> int:
    """64-bit polynomial rolling hash over tokens (mod 2^64)."""
    h = ROLL_OFFSET
    for t in tokens:
        th = np.uint64(hash64(t))
        h = np.uint64((int(h) * int(ROLL_BASE) + int(th)) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def hash64(s: str) -> int:
    """Deterministic 64-bit FNV-1a of a string (no PYTHONHASHSEED dependence)."""
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


@register("doc_fingerprint")
class DocFingerprint(Stage):
    """Rolling-hash document fingerprint -> uint64 column
    (order-sensitive, whitespace tokens).  config: field, target."""

    name = "doc_fingerprint"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.target = self.config.get("target", "doc_fp")

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        out = [rolling_fingerprint(v.split()) if v is not None else None
               for v in col.to_pylist()]
        return set_column(batch, field_to_column(self.target),
                          pa.array(out, pa.uint64()))


@register("redact")
class Redact(Stage):
    """PII scrub — regex redaction over text columns (a training-data
    cleaning staple; fully vectorized replace_substring_regex).  config:
    fields[], rules: list of {pattern, replacement} (defaults: emails,
    IPv4s, long digit runs)."""

    name = "redact"
    DEFAULT_RULES = [
        {"pattern": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
         "replacement": "<EMAIL>"},
        {"pattern": r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "replacement": "<IP>"},
        {"pattern": r"\b\d{9,}\b", "replacement": "<NUM>"},
    ]

    def __init__(self, config=None):
        super().__init__(config)
        self.fields = list(self.config.get("fields", ["text"]))
        self.rules = list(self.config.get("rules", self.DEFAULT_RULES))

    def input_columns(self):
        return [field_to_column(f) for f in self.fields]

    def process(self, batch):
        for f in self.fields:
            col_name = field_to_column(f)
            if col_name not in batch.column_names:
                continue
            col = batch.column(col_name)
            for r in self.rules:
                col = pc.replace_substring_regex(col, r["pattern"],
                                                 replacement=r["replacement"])
            batch = set_column(batch, col_name, col)
        return batch
