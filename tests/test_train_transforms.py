import numpy as np
import pytest
from PIL import Image

from gitax.preprocess.train_transforms import (
    TrainTransform,
    collate_samples,
    inception_crop,
    make_caption_sample,
    random_resized_crop_params,
)
from gitax.tokenization import BertTokenizer, build_tiny_vocab


def make_image(w=64, h=48):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))


def test_multi_scale_crop_sizes_match_reference():
    """sizes = range(160, 224+16-1, 16) (reference train.py:191-194)."""
    t = TrainTransform(min_size_range32=(160, 224), patch_size=16)
    assert t.crop_sizes == [160, 176, 192, 208, 224]
    assert t.crop_size_for(0) == 160
    assert t.crop_size_for(5) == 160
    assert t.crop_size_for(4) == 224


def test_single_scale():
    t = TrainTransform(train_crop_size=224, min_size_range32=None)
    assert t.crop_sizes == [224]


def test_inception_crop_shape():
    out = inception_crop(make_image(), 32, rng=np.random.RandomState(0) and None)
    assert out.size == (32, 32)


def test_random_resized_crop_params_bounds():
    import random

    rng = random.Random(0)
    for _ in range(50):
        left, top, w, h = random_resized_crop_params(64, 48, rng=rng)
        assert 0 <= left <= 64 - w and 0 <= top <= 48 - h
        assert w == h  # ratio (1,1)


def test_transform_call():
    t = TrainTransform(seed=0)
    out = t({"image": make_image(300, 200), "iteration": 2})
    assert out["image"].shape == (192, 192, 3)
    assert out["image"].dtype == np.float32


def test_make_caption_sample_protocol():
    tok = BertTokenizer(build_tiny_vocab(words=["a", "dog", "runs"]))
    t = TrainTransform(seed=0)
    s = make_caption_sample(tok, make_image(), "", "a dog runs", t)
    ids = s["caption_tokens"].tolist()
    need = s["need_predict"].tolist()
    assert ids[0] == tok.cls_token_id and ids[-1] == tok.sep_token_id
    assert need[0] == 0 and need[-1] == 1
    assert need[1:-1] == [1, 1, 1]  # all target tokens predicted


def test_make_caption_sample_prefix_not_predicted():
    tok = BertTokenizer(build_tiny_vocab(words=["a", "dog", "runs", "what"]))
    t = TrainTransform(seed=0)
    s = make_caption_sample(tok, make_image(), "what", "a dog", t)
    need = s["need_predict"].tolist()
    # [CLS]=0, prefix tokens 0, target tokens 1, [SEP]=1
    assert need[0] == 0 and need[1] == 0
    assert need[-1] == 1


def test_make_caption_sample_tail_truncation():
    tok = BertTokenizer(build_tiny_vocab(words=["a", "b"]))
    t = TrainTransform(seed=0)
    # reference quirk (train.py:40-53): prefix and target are EACH
    # tokenizer-truncated to 40 first, so a 60-token target yields payload
    # exactly 40, which is NOT > 40 -> final length 42, not 40
    s = make_caption_sample(tok, make_image(), "", " ".join(["a"] * 60), t,
                            max_text_len=40)
    assert len(s["caption_tokens"]) == 42
    # combined prefix+target over the limit hits the tail-truncate path:
    # last 38 payload tokens kept -> 1 + 38 + 1
    s2 = make_caption_sample(tok, make_image(), " ".join(["b"] * 20),
                             " ".join(["a"] * 30), t, max_text_len=40)
    assert len(s2["caption_tokens"]) == 40
    assert len(s2["need_predict"]) == 40
    # the kept tail is target-heavy: all 30 target tokens survive
    assert s2["need_predict"].tolist()[1:-1].count(1) == 30


def test_collate_pads_to_max():
    a = {"caption_tokens": np.asarray([1, 2, 3]), "image": np.zeros((4, 4, 3))}
    b = {"caption_tokens": np.asarray([1, 2]), "image": np.zeros((4, 4, 3))}
    out = collate_samples([a, b])
    assert out["caption_tokens"].shape == (2, 3)
    assert out["caption_tokens"][1].tolist() == [1, 2, 0]
    assert out["image"].shape == (2, 4, 4, 3)
