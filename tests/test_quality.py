"""Per-rule quality-filter unit tests on constructed docs (SURVEY.md §5
item 3) + langid/perplexity sanity."""

import numpy as np
import pandas as pd

from incident_pii_redactor_spark.quality.langid import LANG_SEEDS, predict_language
from incident_pii_redactor_spark.quality.perplexity import perplexity_batch
from incident_pii_redactor_spark.quality.scorer import (
    WEB_DEFAULT,
    QualityConfig,
    quality_signals,
)

GOOD = ("the quick brown fox jumps over the lazy dog and runs through the "
        "green field while the sun rises slowly over the quiet hills ") * 4


def _sig(texts, cfg=WEB_DEFAULT):
    return quality_signals(pd.Series(texts), cfg)


def test_clean_english_kept():
    s = _sig([GOOD])
    assert bool(s["keep"][0]), s["drop_reason"][0]


def test_langid_all_seeds():
    langs, conf = predict_language([LANG_SEEDS[l] for l in LANG_SEEDS])
    assert list(langs) == list(LANG_SEEDS)
    assert (conf > 0.5).all()


def test_wrong_language_dropped():
    s = _sig([LANG_SEEDS["de"] * 2])
    assert not bool(s["keep"][0])
    assert s["drop_reason"][0] == "lang_allowed"


def test_short_doc_dropped():
    s = _sig(["the cat sat on the mat"])
    assert s["drop_reason"][0] == "min_words"


def test_symbol_soup_dropped():
    s = _sig([GOOD + " ".join(["###"] * 60)])
    assert s["drop_reason"][0] == "symbol_ratio"


def test_duplicate_lines_dropped():
    s = _sig([GOOD + ("\nsubscribe to our newsletter now" * 12)])
    assert s["drop_reason"][0] == "dup_line_frac"


def test_stopword_floor():
    words = "widget gadget pricing review discount cheap best buy deal sale " * 8
    # junk vocab fails langid first; with langid disabled the stopword rule fires
    cfg = QualityConfig(min_lang_conf=0.0, allowed_langs=("en", "de", "es", "fr", "zh", "und"))
    s = _sig([words], cfg)
    assert not bool(s["keep"][0])
    assert s["drop_reason"][0] in ("stopword_ratio", "perplexity")


def test_perplexity_separates_vocab():
    ppl = perplexity_batch(pd.Series([GOOD, "zxqj vvkw qqpl mmzx " * 30]))
    assert ppl[0] < ppl[1]
    assert ppl[1] > WEB_DEFAULT.max_perplexity


def test_empty_and_null_texts():
    s = _sig(["", None])
    assert not s["keep"].any()
    assert list(s["lang_pred"]) == ["und", "und"]


def test_rule_flags_consistent_with_keep():
    s = _sig([GOOD, "x", LANG_SEEDS["fr"]])
    from incident_pii_redactor_spark.quality.scorer import RULES

    for _, row in s.iterrows():
        assert row["keep"] == all(row[f"rule_{r}"] for r in RULES)


def test_vectorized_batch_matches_single():
    texts = [GOOD, "short one", LANG_SEEDS["es"] * 2, "", GOOD + " extra tail"]
    batch = _sig(texts)
    for i, t in enumerate(texts):
        single = _sig([t])
        assert bool(batch["keep"][i]) == bool(single["keep"][0])
        assert batch["drop_reason"][i] == single["drop_reason"][0]
        assert np.isclose(batch["ppl"][i], single["ppl"][0])


def test_toxicity_rule_and_mask():
    from incident_pii_redactor_spark.quality.toxicity import mask_toxic, toxicity_ratio

    tox = GOOD + " " + ("idiot moron jerk scum " * 10)
    ratio = toxicity_ratio(pd.Series([GOOD, tox]))
    assert ratio[0] == 0.0 and ratio[1] > 0.05
    s = _sig([tox])
    assert not bool(s["keep"][0])
    assert s["drop_reason"][0] == "toxicity"
    masked = mask_toxic("You absolute moron, the Idiot said.")
    assert "moron" not in masked and "Idiot" not in masked
    assert masked.count("[TOXIC]") == 2


def test_top_bigram_repetition_dropped():
    rep = "the cat " * 100  # one bigram dominates
    s = _sig([rep])
    assert not bool(s["keep"][0])
    assert s["drop_reason"][0] in ("top_bigram_frac", "dup_line_frac")


def test_duplicate_paragraphs_dropped():
    para = "this is a perfectly ordinary paragraph about the quiet hills"
    s = _sig([GOOD + ("\n\n" + para) * 8])
    assert not bool(s["keep"][0])
    assert s["drop_reason"][0] in ("dup_para_frac", "dup_line_frac")


def test_top_bigram_fused_key_equals_compacted_key(monkeypatch):
    """The single-pass composite-key path (default) and the huge-vocab
    two-step compaction path must produce bit-identical top_bigram_frac
    — the branch only exists to dodge int64 overflow at extreme
    docs*vocab^2, never to change values."""
    import numpy as np
    import pandas as pd

    import incident_pii_redactor_spark.quality.heuristics as H

    texts = pd.Series([
        "the cat sat on the mat the cat sat again",
        "one two one two one two one two",
        "all unique words here today friend",
        "", "solo",
    ] * 40)
    fused = H.heuristic_signals(texts)["top_bigram_frac"].to_numpy()
    monkeypatch.setattr(H, "_KEY_FUSE_LIMIT", 0)  # force two-step branch
    compacted = H.heuristic_signals(texts)["top_bigram_frac"].to_numpy()
    assert np.array_equal(fused, compacted)
    assert fused[1] == 4 / 7  # "one two": top bigram 4 of 7 occurrences
