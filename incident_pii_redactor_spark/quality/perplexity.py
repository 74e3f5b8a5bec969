"""KenLM-style perplexity via hashed word-n-gram log-probabilities.

Design (public knowledge: Heafield 2011 KenLM; CCNet/Wenzek et al. 2020
use a 5-gram KenLM LM to perplexity-filter Common Crawl — we use the same
shape at order 2 with hashed counts):

* unigram + bigram counts trained at import time on the English seed
  corpus (``langid.LANG_SEEDS['en']``), hashed into fixed-width tables
  (crc32 — deterministic, unlike salted ``hash()``),
* interpolated (backoff-style) conditional:
  p(w_i | w_{i-1}) = 0.5 * p_bigram + 0.5 * p_unigram, each add-k
  smoothed — in-vocabulary prose scores low even in unseen word orders,
  out-of-vocabulary junk scores high,
* doc pseudo-perplexity = exp(-mean log p) over its bigrams,
* fully batch-vectorized: one ``pd.factorize`` over the flattened word
  stream, crc32 only over the (small) unique-word set, grouped mean via
  ``np.bincount``.

Low perplexity == English-prose-like. Thresholds live in
``quality.scorer.QualityConfig``; agreement with the oracle (same code)
is the correctness metric, not agreement with a real KenLM model
(SURVEY.md §7 risks).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

from incident_pii_redactor_spark.quality.langid import LANG_SEEDS

N_BUCKETS = 1 << 18
_SMOOTH_K = 0.1
_LAMBDA = 0.5  # bigram/unigram interpolation weight
_WORD_RE = re.compile(r"[a-zà-öø-ÿ']+")
_MAX_LOGP = float(np.log(_SMOOTH_K / (_SMOOTH_K * N_BUCKETS)))


def _hash_words(words: "list[str]") -> np.ndarray:
    return np.array(
        [zlib.crc32(w.encode("utf-8")) % N_BUCKETS for w in words],
        dtype=np.int64,
    )


def _bigram_bucket(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    return (h1 * 1000003 + h2) % N_BUCKETS


def _train() -> tuple[np.ndarray, np.ndarray, float]:
    words = _WORD_RE.findall(LANG_SEEDS["en"].lower())
    h = _hash_words(words)
    uni = np.bincount(h, minlength=N_BUCKETS).astype(np.float64)
    bi = np.bincount(
        _bigram_bucket(h[:-1], h[1:]), minlength=N_BUCKETS
    ).astype(np.float64)
    return uni, bi, float(len(words))


_UNI, _BI, _N_TOKENS = _train()  # ~4 MB — rebuilt lazily per executor process


def tokenize_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch of texts into (words, doc_id_per_word, words_per_doc)."""
    tokens = texts.fillna("").str.lower().str.findall(_WORD_RE)
    counts = tokens.str.len().to_numpy(dtype=np.int64)
    flat = np.array(
        [w for lst in tokens for w in lst], dtype=object
    )
    doc_ids = np.repeat(np.arange(len(texts)), counts)
    return flat, doc_ids, counts


def factorized_tokens(
    texts: pd.Series,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(flat, doc_id_per_word, words_per_doc, codes, uniques) — ONE
    tokenize + factorize pass shared by perplexity / heuristics /
    toxicity (each used to redo both; ~14% of the whole fused-scrub
    batch profile)."""
    flat, doc_ids, counts = tokenize_batch(texts)
    if flat.size:
        codes, uniques = pd.factorize(flat)
        uniques = np.asarray(uniques, dtype=object)
    else:
        codes = np.empty(0, dtype=np.int64)
        uniques = np.empty(0, dtype=object)
    return flat, doc_ids, counts, codes, uniques


def perplexity_batch(texts: pd.Series, tok=None) -> np.ndarray:
    """Pseudo-perplexity per doc (float64). Docs with < 2 words get the
    worst (unsmoothed-unknown) perplexity so length rules stay decisive.
    ``tok``: optional precomputed ``factorized_tokens`` result."""
    n = len(texts)
    flat, doc_ids, counts, codes, uniques = (
        tok if tok is not None else factorized_tokens(texts)
    )
    out = np.full(n, float(np.exp(-_MAX_LOGP)), dtype=np.float64)
    if flat.size < 2:
        return out

    uh = _hash_words(list(uniques))  # crc32 only over unique words
    h = uh[codes]

    same_doc = doc_ids[:-1] == doc_ids[1:]
    h1, h2 = h[:-1][same_doc], h[1:][same_doc]
    bdoc = doc_ids[:-1][same_doc]
    p_bi = (_BI[_bigram_bucket(h1, h2)] + _SMOOTH_K) / (
        _UNI[h1] + _SMOOTH_K * N_BUCKETS
    )
    p_uni = (_UNI[h2] + _SMOOTH_K) / (_N_TOKENS + _SMOOTH_K * N_BUCKETS)
    logp = np.log(_LAMBDA * p_bi + (1.0 - _LAMBDA) * p_uni)
    sums = np.bincount(bdoc, weights=logp, minlength=n)
    ngrams = np.bincount(bdoc, minlength=n)
    has = ngrams > 0
    out[has] = np.exp(-sums[has] / ngrams[has])
    return out
