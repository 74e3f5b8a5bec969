"""Gopher/C4-style heuristic quality rules, batch-vectorized.

Public-knowledge rule set (Rae et al. 2021 "Scaling Language Models:
Gopher" Table A1; Raffel et al. 2020 C4):

* word-count bounds              (Gopher: 50..100k words)
* mean word length bounds        (Gopher: 3..10 chars)
* symbol-to-word ratio           (Gopher: '#' and '...' <= 0.1)
* stop-word requirement          (Gopher: >= 2 of a small stop list /
                                  ratio floor — keyword-stuffing guard)
* alphabetic-word fraction       (Gopher: >= 80% words contain a letter)
* duplicate-line fraction        (Gopher repetition rules / C4 boilerplate)
* duplicate-paragraph fraction   (Gopher repetition rules)
* top-bigram fraction            (Gopher: most frequent 2-gram bounded)
* ellipsis-line fraction         (Gopher: <= 30% lines end with '...')

All computed for a whole Arrow batch with pandas/numpy; the only per-doc
Python is a cheap line-dedup over already-split line lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from incident_pii_redactor_spark.quality.perplexity import factorized_tokens

# Per-language stop words (small, embedded; en list is the C4/Gopher-style
# core, others cover the fixture languages).
STOP_WORDS: dict[str, frozenset] = {
    "en": frozenset(
        "the be to of and a in that have i it for not on with he as you do "
        "at this but his by from they we say her she or an will my one all "
        "would there their what so up out if about who get which go me".split()
    ),
    "de": frozenset(
        "der die das und in den von zu mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat dass sie nach wird "
        "bei einer um am sind noch wie über".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al lo "
        "como más pero sus le ya o este sí porque esta entre cuando muy".split()
    ),
    "fr": frozenset(
        "de la le et les des en un du une que est pour qui dans a par plus "
        "pas au sur ne se ce il sont la avec son une nous vous ils".split()
    ),
}
_ALL_STOP = frozenset().union(*STOP_WORDS.values())

# top-bigram keys: single-pass (doc*v + w1)*v + w2 composite while it
# fits int64; batches with docs*vocab^2 beyond this compact bigram codes
# first (two factorize passes instead of one)
_KEY_FUSE_LIMIT = 2 ** 62


def heuristic_signals(texts: pd.Series, tok=None) -> pd.DataFrame:
    """Compute raw heuristic signals for a batch. Returns a DataFrame with:
    word_count, mean_word_len, stopword_ratio, symbol_ratio, alpha_frac,
    dup_line_frac, ellipsis_line_frac, n_chars.
    ``tok``: optional precomputed ``factorized_tokens`` result."""
    n = len(texts)
    s = texts.fillna("")
    flat, doc_ids, counts, codes, uniques = (
        tok if tok is not None else factorized_tokens(s)
    )

    word_count = counts.astype(np.int64)
    safe = np.maximum(word_count, 1).astype(np.float64)

    if flat.size:
        uniq_len = np.array([len(w) for w in uniques], dtype=np.float64)
        uniq_stop = np.array([w in _ALL_STOP for w in uniques], dtype=np.float64)
        char_sums = np.bincount(doc_ids, weights=uniq_len[codes], minlength=n)
        stop_sums = np.bincount(doc_ids, weights=uniq_stop[codes], minlength=n)
    else:
        char_sums = np.zeros(n)
        stop_sums = np.zeros(n)

    mean_word_len = char_sums / safe
    stopword_ratio = stop_sums / safe

    symbols = (s.str.count("#") + s.str.count(r"\.\.\.")).to_numpy(np.float64)
    symbol_ratio = symbols / safe

    if flat.size:
        uniq_alpha = np.array(
            [any(c.isalpha() for c in w) for w in uniques], dtype=np.float64
        )
        alpha_sums = np.bincount(doc_ids, weights=uniq_alpha[codes], minlength=n)
    else:
        alpha_sums = np.zeros(n)
    alpha_frac = alpha_sums / safe

    lines = s.str.split("\n")
    dup_line_frac = np.fromiter(
        (_dup_frac(lst) for lst in lines), dtype=np.float64, count=n
    )
    paragraphs = s.str.split("\n\n")
    dup_para_frac = np.fromiter(
        (_dup_frac(lst) for lst in paragraphs), dtype=np.float64, count=n
    )

    # Gopher repetition: fraction of bigram occurrences taken by the most
    # frequent bigram, per doc — vectorized via hash-factorized
    # (doc, bigram-code) composite keys. pd.factorize is a hash table
    # (O(n), no sort); the two np.unique sorts it replaces were ~30% of
    # the whole 4 KB-doc batch profile. Compacting bigram codes BEFORE
    # combining with doc ids also keeps a direct doc*(v*v)+bi key from
    # overflowing int64 on huge batches with large vocabularies.
    top_bigram_frac = np.zeros(n)
    if flat.size >= 2:
        same = doc_ids[:-1] == doc_ids[1:]
        if same.any():
            v = len(uniques) + 1
            # explicit int64 on the key operands: doc_ids is np.arange
            # (intp = int32 on Windows), and doc*v*v must not wrap
            # before the _KEY_FUSE_LIMIT guard's int64 assumption
            # (ADVICE round 4)
            docs64 = doc_ids[:-1][same].astype(np.int64)
            if n * v * v < _KEY_FUSE_LIMIT:  # key fits int64: 1 pass
                key = (docs64 * v
                       + codes[:-1][same]) * v + codes[1:][same]
                kcodes, kuniq = pd.factorize(key)
                owner = kuniq // (v * v)
            else:  # huge-vocab batch: compact bigrams first
                bi = (codes[:-1][same].astype(np.int64) * v
                      + codes[1:][same])
                bi_codes, bi_uniq = pd.factorize(bi)
                n_bi = len(bi_uniq)
                key = docs64 * n_bi + bi_codes
                kcodes, kuniq = pd.factorize(key)
                owner = kuniq // n_bi
            cnts = np.bincount(kcodes)
            np.maximum.at(top_bigram_frac, owner, cnts.astype(np.float64))
            totals = np.bincount(doc_ids[:-1][same], minlength=n).astype(
                np.float64
            )
            has = totals > 0
            top_bigram_frac[has] = top_bigram_frac[has] / totals[has]
    ellipsis_line_frac = np.fromiter(
        (
            (sum(1 for ln in lst if ln.rstrip().endswith("...")) / len(lst))
            if lst else 0.0
            for lst in lines
        ),
        dtype=np.float64,
        count=n,
    )

    return pd.DataFrame(
        {
            "word_count": word_count,
            "mean_word_len": mean_word_len,
            "stopword_ratio": stopword_ratio,
            "symbol_ratio": symbol_ratio,
            "alpha_frac": alpha_frac,
            "dup_line_frac": dup_line_frac,
            "dup_para_frac": dup_para_frac,
            "top_bigram_frac": top_bigram_frac,
            "ellipsis_line_frac": ellipsis_line_frac,
            "n_chars": s.str.len().to_numpy(np.int64),
        }
    )


def _dup_frac(lines: "list[str]") -> float:
    stripped = [ln.strip() for ln in lines if ln.strip()]
    if len(stripped) <= 1:
        return 0.0
    return 1.0 - len(set(stripped)) / len(stripped)
