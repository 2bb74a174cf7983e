"""METEOR validation against hand-computed arithmetic (the same style of
validation CIDEr-D got), plus Porter-stemmer and aggregation checks.

Every expected value below is derived by hand from the Meteor 1.5
formulas with the English parameters alpha=0.85, beta=0.2, gamma=0.6,
delta=0.75 and module weights exact=1.0, stem=0.6 — the derivations are
in the comments."""

import math

import pytest

from gitax.evalcap.meteor import (
    MeteorStats,
    meteor,
    meteor_segment,
    porter_stem,
    score_from_stats,
    segment_stats,
)


@pytest.mark.parametrize(
    "word,stem",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("cats", "cat"),
        ("feed", "feed"),
        ("agreed", "agre"),
        ("plastered", "plaster"),
        ("motoring", "motor"),
        ("sing", "sing"),
        ("conflated", "conflat"),
        ("troubling", "troubl"),
        ("sized", "size"),
        ("hopping", "hop"),
        ("falling", "fall"),
        ("hissing", "hiss"),
        ("failing", "fail"),
        ("filing", "file"),
        ("happy", "happi"),
        ("relational", "relat"),
        ("conditional", "condit"),
        ("vietnamization", "vietnam"),
        ("triplicate", "triplic"),
        ("formative", "form"),
        ("hopefulness", "hope"),
        ("goodness", "good"),
        ("revival", "reviv"),
        ("adjustable", "adjust"),
        ("effective", "effect"),
        ("probate", "probat"),
        ("cease", "ceas"),
        ("controll", "control"),
        ("sitting", "sit"),
    ],
)
def test_porter_stemmer_classic_cases(word, stem):
    """Canonical examples from Porter's 1980 paper."""
    assert porter_stem(word) == stem


def test_identical_sentences_hand_computed():
    """cand = ref = "the cat sat on the mat".

    All 6 words exact-match in one chunk; m = 6, ch = 1.
    content (cat, sat, mat) weigh 0.75, function (the, on, the) 0.25:
    len = m_mass = 3*0.75 + 3*0.25 = 3.0 -> P = R = 1 -> Fmean = 1.
    Pen = 0.6 * (1/6)^0.2; score = 1 - Pen.
    """
    toks = "the cat sat on the mat".split()
    score, _ = meteor_segment(toks, [toks])
    expected = 1.0 - 0.6 * (1.0 / 6.0) ** 0.2
    assert math.isclose(score, expected, rel_tol=1e-12), (score, expected)


def test_disjoint_sentences_score_zero():
    score, _ = meteor_segment("dog runs".split(), ["blue sky".split()])
    assert score == 0.0


def test_stem_stage_hand_computed():
    """cand = "cats sit", ref = "cat sitting": no exact matches; both
    words match via Porter stems (cats->cat, sit/sitting->sit) at module
    weight 0.6, one chunk, m = 2.

    All four words are content words: len_cand = len_ref = 1.5,
    m_mass = 0.6*0.75*2 = 0.9 -> P = R = 0.6 -> Fmean = 0.6.
    Pen = 0.6 * (1/2)^0.2; score = 0.6 * (1 - Pen).
    """
    score, st = meteor_segment("cats sit".split(), ["cat sitting".split()])
    assert st.matches == 2 and st.chunks == 1
    expected = 0.6 * (1.0 - 0.6 * 0.5 ** 0.2)
    assert math.isclose(score, expected, rel_tol=1e-12), (score, expected)


def test_fragmentation_hand_computed():
    """cand = "dog runs fast home", ref = "dog fast runs home": all four
    words exact-match but the crossing order makes every match its own
    chunk: ch = 4, m = 4, frag = 1 -> Pen = 0.6 -> score = 0.4."""
    score, st = meteor_segment(
        "dog runs fast home".split(), ["dog fast runs home".split()]
    )
    assert st.matches == 4 and st.chunks == 4
    assert math.isclose(score, 0.4, rel_tol=1e-12), score


def test_function_word_discount():
    """Matching only a function word is worth far less than a content
    word: delta = 0.75 discounts "the" to 0.25 weight."""
    s_func, st_func = meteor_segment(
        "the dog".split(), ["the cat".split()]
    )
    s_cont, st_cont = meteor_segment(
        "a dog".split(), ["one dog".split()]
    )
    # "the": m_mass 0.25 over len 0.25+0.75 -> P=R=0.25
    assert math.isclose(st_func.m_cand, 0.25)
    # "dog": m_mass 0.75 -> P=R=0.75
    assert math.isclose(st_cont.m_cand, 0.75)
    assert s_cont > s_func > 0


def test_best_reference_selected():
    cand = "a dog in the park".split()
    bad = "blue ocean waves".split()
    good = "a dog in the park".split()
    score_multi, st = meteor_segment(cand, [bad, good])
    score_single, _ = meteor_segment(cand, [good])
    assert score_multi == score_single


def test_corpus_aggregates_stats_not_scores():
    """The corpus score comes from SUMMED sufficient statistics, not the
    mean of segment scores (the jar's aggregation)."""
    cands = {"a": "the cat sat on the mat".split(), "b": "dog runs".split()}
    refs = {"a": [cands["a"]], "b": [["blue", "sky"]]}
    corpus, seg = meteor(cands, refs)
    # summed stats: segment a contributes m=6 ch=1 mass 3.0; segment b
    # contributes nothing matched but adds its weighted lengths
    st = MeteorStats(3.0, 3.0 + 1.5, 3.0, 3.0 + 1.5, 1, 6)
    assert math.isclose(corpus, score_from_stats(st), rel_tol=1e-12)
    assert seg["b"] == 0.0 and seg["a"] > 0


def test_scorer_integration():
    from gitax.evalcap.evaluate import score_captions

    res = score_captions(
        {"1": "a cat sat on a mat", "2": "a dog"},
        {"1": ["a cat sat on a mat"], "2": ["a big dog", "the dog"]},
    )
    assert 0 < res["METEOR"] <= 1
    assert set(res) >= {"Bleu_4", "METEOR", "ROUGE_L", "CIDEr"}
