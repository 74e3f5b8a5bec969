"""Toxicity scoring: block-list word ratio (LDNOOBW-style approach —
public: "List of Dirty, Naughty, Obscene, and Otherwise Bad Words", the
same mechanism C4 uses for its bad-words filter).

The embedded list is a small, deliberately mild stand-in (this sandbox
ships no external data); swap `BLOCK_WORDS` for the full published list
in production — the mechanism (vectorized factorize + set lookup, ratio
threshold, optional token masking) is what the engine provides.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from incident_pii_redactor_spark.quality.perplexity import factorized_tokens

BLOCK_WORDS = frozenset(
    """damn hell crap idiot stupid moron jerk loser scum filth trash
    hate kill destroy attack violent abuse slur bigot racist sexist""".split()
)

_MASK = "[TOXIC]"


def toxicity_ratio(texts: pd.Series, tok=None) -> np.ndarray:
    """Fraction of words in the block list, per doc. Vectorized: one
    factorize over the batch, set lookup only on unique words.
    ``tok``: optional precomputed ``factorized_tokens`` result."""
    n = len(texts)
    flat, doc_ids, counts, codes, uniques = (
        tok if tok is not None else factorized_tokens(texts)
    )
    if not flat.size:
        return np.zeros(n)
    bad = np.array([w in BLOCK_WORDS for w in uniques], dtype=np.float64)
    bad_counts = np.bincount(doc_ids, weights=bad[codes], minlength=n)
    return bad_counts / np.maximum(counts, 1)


_BLOCK_RE = re.compile(
    r"\b(" + "|".join(sorted(BLOCK_WORDS)) + r")\b", re.IGNORECASE
)


def mask_toxic(text: str) -> str:
    """Token-level toxicity scrub (the 'toxicity-scrub' half of the north
    star): replace block-listed words with a mask token, preserving all
    other bytes."""
    return _BLOCK_RE.sub(_MASK, text)
