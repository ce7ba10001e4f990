"""Text-analysis batch functions for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All are vectorized ``map_batches`` bodies over Arrow batches; the language-ID
stage is a callable class (actor pool) holding its compiled profiles.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketchlib.hashing import hash_str_u64, mix2, mix64


def token_count_column(texts) -> pa.Array:
    """Whitespace token count per row (vectorized: count separators).

    Matches SQL ``length(string_split(text, ' '))`` on single-spaced text:
    count = #spaces + 1 (and 1 for the empty string, as SQL's split does).
    """
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    spaces = pc.count_substring(arr, " ")
    return pc.add(spaces, 1)


class AddTokenStats:
    """Appends ``n_tokens`` (whitespace tokens) and ``n_chars_engine``."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        out = batch.append_column("n_tokens",
                                  token_count_column(t).cast(pa.int64()))
        return out.append_column("n_chars_engine",
                                 pc.utf8_length(t.combine_chunks()
                                                if isinstance(t, pa.ChunkedArray)
                                                else t).cast(pa.int64()))


_BPE_ISH = re.compile(r"[a-zA-Z]+|[0-9]{1,3}|[^\sa-zA-Z0-9]")

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from".split())


class QualityScore:
    """Heuristic document quality features + score in [0, 1]: length band,
    alpha ratio, stopword ratio, mean word length sanity, repetition ratio.
    (Stateful regexes compiled once per actor.)"""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"\S+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        alpha_ratio = np.zeros(n)
        stop_ratio = np.zeros(n)
        mean_wlen = np.zeros(n)
        rep_ratio = np.zeros(n)
        n_tok = np.zeros(n, dtype=np.int64)
        for i, s in enumerate(texts):
            if not s:
                continue
            toks = self.word_re.findall(s)
            n_tok[i] = len(toks)
            if not toks:
                continue
            alpha = sum(c.isalpha() for c in s)
            alpha_ratio[i] = alpha / len(s)
            stop_ratio[i] = sum(t.lower() in _STOPWORDS for t in toks) / len(toks)
            mean_wlen[i] = sum(len(t) for t in toks) / len(toks)
            rep_ratio[i] = 1.0 - len(set(toks)) / len(toks)
        len_ok = np.clip((n_tok - 5) / 45.0, 0.0, 1.0)
        wlen_ok = np.exp(-0.5 * ((mean_wlen - 5.0) / 3.0) ** 2)
        score = (0.3 * len_ok + 0.25 * alpha_ratio + 0.2 * (1 - rep_ratio)
                 + 0.25 * wlen_ok)
        out = batch
        for name, vals in [("alpha_ratio", alpha_ratio),
                           ("stop_ratio", stop_ratio),
                           ("repetition_ratio", rep_ratio),
                           ("quality_score", score)]:
            out = out.append_column(name, pa.array(vals, pa.float64()))
        return out


# character trigram profiles per language (tiny heuristic; real deployments
# load fasttext-style models in the actor __init__)
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", "is ", " th", "er ", "of "),
    "fr": ("le ", "de ", "es ", "ent", "la ", " et", "une", "ais"),
    "de": ("der", "die", "und", "ein", "sch", "ich", "en ", "cht"),
    "es": ("de ", "la ", "el ", "que", "os ", "ión", "ar ", " es"),
    "zh": tuple(),  # CJK detected by codepoint range, not trigrams
}


class LangId:
    """Character-trigram + script-range language classifier (actor pool;
    profiles built once in ``__init__``).  Appends ``lang_pred``."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def _classify(self, s: str) -> str:
        if not s:
            return "und"
        cjk = sum(1 for c in s[:200] if "一" <= c <= "鿿")
        if cjk > len(s[:200]) * 0.2:
            return "zh"
        low = s.lower()
        tris = {low[i:i + 3] for i in range(min(len(low), 400) - 2)}
        best, best_n = "und", 0
        for lang, prof in self.profiles.items():
            n = len(tris & prof)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._classify(s) for s in batch[self.text_col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def fingerprint_column(texts) -> pa.Array:
    """64-bit content fingerprint per row (hash of the full text; rolling-hash
    equivalent for exact dedup keys)."""
    lst = texts.to_pylist() if not isinstance(texts, list) else texts
    return pa.array(hash_str_u64(lst).astype(np.int64), pa.int64())


def simhash64(texts) -> np.ndarray:
    """64-bit SimHash over whitespace tokens: each token hash votes its bits;
    the sign of each bit-sum forms the fingerprint.  Near-dups differ in few
    bits (Hamming LSH over 4x16-bit bands finds them)."""
    lst = texts.to_pylist() if not isinstance(texts, list) else texts
    out = np.zeros(len(lst), dtype=np.uint64)
    for i, s in enumerate(lst):
        toks = s.split() if s else []
        if not toks:
            continue
        h = hash_str_u64(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(toks)
        v = (votes > 0).astype(np.uint64)
        out[i] = (v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
    return out
