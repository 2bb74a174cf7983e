import json

import numpy as np
import pytest

from gitax.evalcap import CiderD, corpus_bleu, rouge_l, score_captions
from gitax.evalcap.evaluate import evaluate_on_coco_caption
from gitax.evalcap.tokenizer import tokenize_caption
from gitax.common import json_dump
from gitax.io.tsv import tsv_writer


def test_tokenizer():
    assert tokenize_caption("A dog, running!") == ["a", "dog", "running"]
    assert tokenize_caption("Don't stop.") == ["don't", "stop"]
    assert tokenize_caption("") == []


def test_cider_perfect_match_scores_high():
    cands = {"a": ["a", "dog", "runs"], "b": ["blue", "sky", "above"]}
    refs = {
        "a": [["a", "dog", "runs"], ["dog", "running", "fast"]],
        "b": [["blue", "sky", "above"], ["the", "sky", "is", "blue"]],
    }
    mean, scores = CiderD().compute(cands, refs)
    assert mean > 1.0
    # a perfect match must beat a mismatch
    bad = {"a": ["unrelated", "words", "here"], "b": cands["b"]}
    mean_bad, _ = CiderD().compute(bad, refs)
    assert mean > mean_bad


def test_cider_empty_candidate():
    mean, _ = CiderD().compute({"a": []}, {"a": [["dog"]]})
    assert mean == 0.0


def test_bleu_known_value():
    # single sentence, all 1-grams match, half the 2-grams
    cands = {"x": ["the", "cat", "sat"]}
    refs = {"x": [["the", "cat", "ran"]]}
    bleus = corpus_bleu(cands, refs)
    assert abs(bleus[0] - 2 / 3) < 1e-6
    assert bleus[3] < bleus[0]


def test_bleu_brevity_penalty():
    short = corpus_bleu({"x": ["the", "cat"]}, {"x": [["the", "cat", "sat", "down"]]})
    full = corpus_bleu(
        {"x": ["the", "cat", "sat", "down"]}, {"x": [["the", "cat", "sat", "down"]]}
    )
    assert full[0] > short[0]


def test_rouge_l_basic():
    mean, _ = rouge_l({"x": ["the", "cat", "sat"]}, {"x": [["the", "cat", "sat"]]})
    assert abs(mean - 1.0) < 1e-9
    mean2, _ = rouge_l({"x": ["sat", "cat", "the"]}, {"x": [["the", "cat", "sat"]]})
    assert mean2 < 1.0


def test_score_captions_keys():
    result = score_captions(
        {"1": "a dog runs"}, {"1": ["a dog runs fast", "dog running"]}
    )
    assert set(result) >= {"Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"}
    assert all(np.isfinite(v) for v in result.values())


def test_evaluate_on_coco_caption_tsv_roundtrip(tmp_path):
    """Full path: prediction TSV + gt TSV -> metrics json (reference
    inference.py:277-313 contract)."""
    res_tsv = str(tmp_path / "pred.tsv")
    gt_tsv = str(tmp_path / "gt.tsv")
    tsv_writer(
        [
            ["img1", json_dump([{"caption": "a dog runs in the park"}])],
            ["img2", json_dump([{"caption": "a red car"}])],
        ],
        res_tsv,
    )
    tsv_writer(
        [
            ["img1", json_dump([{"caption": "a dog running in a park"},
                                {"caption": "dog runs outside"}])],
            ["img2", json_dump([{"caption": "a red car parked"},
                                {"caption": "the red automobile"}])],
        ],
        gt_tsv,
    )
    result = evaluate_on_coco_caption(res_tsv, gt_tsv)
    assert "CIDEr" in result and result["CIDEr"] > 0
    outfile = str(tmp_path / "pred.eval.json")
    with open(outfile) as fp:
        assert json.load(fp) == result
