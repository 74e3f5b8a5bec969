"""Quality-filter scoring: language ID, perplexity, heuristic rules.

This is the north-rule generalization layer — ABSENT from the reference
(SURVEY.md §2.8): fastText-style hashed char-n-gram language ID,
KenLM-style hashed word-n-gram perplexity, and Gopher/C4-style heuristic
rules decide keep/drop before the arbitrated scrub runs on survivors.

Everything is deterministic (crc32/multiplicative hashing, seed corpora
embedded in source — no external model files, no RNG) and vectorized
(numpy over whole Arrow batches; zero per-row Python in the hot loops).
"""

from incident_pii_redactor_spark.quality.scorer import (
    QualityConfig,
    WEB_DEFAULT,
    quality_signals,
)

__all__ = ["QualityConfig", "WEB_DEFAULT", "quality_signals"]
