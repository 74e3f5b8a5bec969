"""BPE vocabulary induction over a corpus — training the tokenizer ON
the data, the step every LLM pipeline runs between cleaning and packing
(Sennrich et al. 2016).

Architecture (the standard production split, e.g. HF tokenizers over a
Spark word-count export):

* The ONLY corpus-scale step is one map-side-combined groupBy producing
  the ``(word, count)`` table — Zipf guarantees it is tiny relative to
  the corpus (~10^6 distinct words at any web-corpus size, vs 10^12
  documents). The corpus is read exactly once.
* Merge selection then runs on that compressed table driver-side: with
  counts attached, one pass over distinct WORDS counts every symbol
  pair exactly as a pass over the raw corpus would. A 16-round loop
  over 10^6 words is milliseconds — pushing each round through a Spark
  job would pay ~seconds of scheduling per merge for no added
  correctness (measured 4.6 s/round vs <1 ms here at sf0.01).
* ``max_vocab_rows`` guards the driver collect: if the distinct-word
  table exceeds the budget the trainer raises instead of silently
  OOM-ing — at that point you pre-truncate (frequency floor) like every
  production trainer does.

Determinism: integer counts; argmax tie-break (count desc, left asc,
right asc). The driver oracle is a pure-Python replay fixture over the
same word counts.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incident_pii_redactor_spark.functions.text import words

END = "</w>"  # word-end marker, standard BPE


def _segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges in rank order to one word (shared by training,
    encoding, and the fixture replay)."""
    syms = list(word) + [END]
    for a, b in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def word_count_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — the Zipf-compressed training table; the one
    corpus-scale pass (map-side combined groupBy)."""
    return (
        df.select(F.explode(words(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n"))
    )


def train_bpe_from_counts(
    counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Pure-Python merge loop over (word, count) rows — deterministic
    for any input order. Shared verbatim with the fixture replay."""
    merges: list[tuple[str, str]] = []
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        acc: dict[tuple[str, str], int] = {}
        for w, n in counts:
            syms = _segment(w, merges)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                acc[p] = acc.get(p, 0) + int(n)
        if not acc:
            break
        (a, b), c = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        out.append((a, b, c))
    return out


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    max_vocab_rows: int = 2_000_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges: one Spark pass to (word, count), then
    the driver-side loop. Returns [(left, right, pair_count)] in merge
    order."""
    wc = word_count_table(df, text_col)
    # ONE job: over-fetch by one row — if the limit comes back full the
    # vocabulary exceeded the budget (a separate count() would re-run
    # the corpus aggregation just to validate)
    rows = [(r.w, int(r.n)) for r in wc.limit(max_vocab_rows + 1).collect()]
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"train_bpe: > {max_vocab_rows} distinct words; apply a "
            f"frequency floor first (filter n >= k on word_count_table)")
    return train_bpe_from_counts(rows, n_merges)


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """text -> (tokens array<string>, n_tokens) under a trained merge
    list; Arrow-batched, merges travel in the closure."""
    from pyspark.sql.functions import pandas_udf

    ms = list(merges)

    # ASCII \s+ split — str.split() treats U+00A0 etc. as separators
    # while training's words()/Java/RE2 \s does not (review round 3);
    # encode must tokenize exactly like training
    _ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("struct<tokens: array<string>, n_tokens: long>")
    def enc(text: pd.Series) -> pd.DataFrame:
        toks_col, n_col = [], []
        for t in text:
            toks: list[str] = []
            for w in _ws.split((t or "").lower()):
                if not w:
                    continue
                toks.extend(_segment(w, ms))
            toks_col.append(toks)
            n_col.append(len(toks))
        return pd.DataFrame({"tokens": toks_col, "n_tokens": n_col})

    return enc
