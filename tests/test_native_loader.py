"""Native C++ data loader: build, accuracy vs PIL, fallback handling."""

import base64
import io

import numpy as np
import pytest
from PIL import Image

from gitax import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain/libjpeg unavailable"
)


def jpeg_bytes(seed=0, size=(300, 200)):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_b64_decode():
    raw = b"hello native world"
    assert native.b64_decode(base64.b64encode(raw)) == raw
    assert native.b64_decode(b"!!!") is None


def test_decode_matches_pil_path():
    from gitax.preprocess.transforms import center_crop, resize_shorter

    raw = jpeg_bytes()
    arr, ok = native.decode_resize_crop_batch(
        [base64.b64encode(raw)], 64, fast_scale=False
    )
    assert ok.all()
    pil = np.asarray(
        center_crop(resize_shorter(Image.open(io.BytesIO(raw)).convert("RGB"), 64), 64)
    )
    diff = np.abs(arr[0].astype(int) - pil.astype(int))
    assert diff.max() <= 2, diff.max()  # fixed-point vs float rounding only


def test_fast_scale_close():
    raw = jpeg_bytes(1, size=(1200, 900))
    fast, _ = native.decode_resize_crop_batch([base64.b64encode(raw)], 64)
    exact, _ = native.decode_resize_crop_batch(
        [base64.b64encode(raw)], 64, fast_scale=False
    )
    assert np.abs(fast.astype(int) - exact.astype(int)).mean() < 4.0


def test_corrupt_rows_flagged():
    arr, ok = native.decode_resize_crop_batch(
        [b"not base64 at all!!", base64.b64encode(jpeg_bytes())], 32
    )
    assert ok.tolist() == [False, True]
    assert arr.shape == (2, 32, 32, 3)


def test_raw_jpeg_mode():
    arr, ok = native.decode_resize_crop_batch(
        [jpeg_bytes()], 48, is_base64=False
    )
    assert ok.all() and arr.shape == (1, 48, 48, 3)


def test_engine_native_path(tmp_path):
    """CaptionEngine end-to-end with the native decode + on-device
    normalization (uint8 transfer)."""
    import jax
    import jax.numpy as jnp

    from gitax.decode import BeamSearchConfig
    from gitax.io.tsv import TSVFile, tsv_writer
    from gitax.models import GitModel, GitConfig, ViTConfig
    from gitax.preprocess import TestTransform
    from gitax.runtime import CaptionEngine
    from gitax.tokenization import BertTokenizer, build_tiny_vocab

    cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=30522,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=32,
    )
    model = GitModel(cfg)
    engine = CaptionEngine(
        model,
        model.init_params(jax.random.PRNGKey(0)),
        BertTokenizer(build_tiny_vocab()),
        TestTransform(crop_size=32),
        batch_size=2,
        beam=BeamSearchConfig(num_beams=2, max_steps=8),
        dtype=jnp.float32,
        use_native=True,
    )
    img_tsv = str(tmp_path / "imgs.tsv")
    tsv_writer(
        [["k{}".format(i), base64.b64encode(jpeg_bytes(i))] for i in range(3)],
        img_tsv,
    )
    out = str(tmp_path / "out.tsv")
    engine.run_caption_tsv(img_tsv, out)
    t = TSVFile(out)
    assert len(t) == 3
    assert [t.get_key(i) for i in range(3)] == ["k0", "k1", "k2"]


def test_crop_origin_rounding_matches_python_round():
    """Odd crop margins with an even .5 half: Python round() is banker's
    (round-half-to-even) while lround is half-away-from-zero — the
    native crop must match the PIL path's origin exactly.  A 448x450
    source resized to shorter-side 224 gives a 224x225 image: margin
    0.5 -> top=0 in Python; lround would give top=1 (one-row shift)."""
    from gitax.preprocess.transforms import center_crop, resize_shorter

    rng = np.random.RandomState(7)
    img = Image.fromarray(rng.randint(0, 255, (450, 448, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    raw = buf.getvalue()

    arr, ok = native.decode_resize_crop_batch(
        [base64.b64encode(raw)], 224, fast_scale=False
    )
    assert ok.all()
    pil = np.asarray(
        center_crop(
            resize_shorter(Image.open(io.BytesIO(raw)).convert("RGB"), 224), 224
        )
    )
    diff = np.abs(arr[0].astype(np.int32) - pil.astype(np.int32))
    # exact-mode kernel parity is a few LSBs; a one-row crop shift over
    # random noise would push the MEAN difference to ~80
    assert diff.mean() < 2.0, diff.mean()
    assert diff.max() <= 8, diff.max()


def test_minmax_decode_matches_pil_path():
    """Native MinMax (aspect-preserving, ragged) decode: target sizes
    match min_max_resize_size exactly for every aspect class, pixels
    close to the PIL path (shared resampler; see the mild-downscale
    note below)."""
    from gitax.preprocess.transforms import min_max_resize

    rng = np.random.RandomState(3)
    for (w, h) in [(640, 480), (480, 640), (500, 500), (1280, 720),
                   (420, 980), (300, 200)]:
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        raw = buf.getvalue()
        got = native.decode_minmax_batch(
            [base64.b64encode(raw)], 420, 560, fast_scale=False
        )[0]
        ref = np.asarray(
            min_max_resize(Image.open(io.BytesIO(raw)).convert("RGB"), 420, 560)
        )
        assert got is not None and got.shape == ref.shape, (w, h)
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        # mild downscales carry PIL's fixed-point coefficient quantization
        # (same property as the fixed-size path, measured max 17 there on
        # noise); the mean stays at fractions of an LSB
        assert diff.mean() < 0.5, (w, h, diff.mean())
    # corrupt rows -> None
    assert native.decode_minmax_batch([b"!!!"], 420, 560) == [None]


def test_minmax_decode_fast_scale_targets_exact():
    """fast_scale's reduced IDCT must not change the TARGET size (it is
    computed from the original header dims, not the reduced ones)."""
    from gitax.preprocess.transforms import min_max_resize_size

    rng = np.random.RandomState(5)
    for (w, h) in [(1706, 1279), (1280, 720), (900, 1600)]:
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        got = native.decode_minmax_batch(
            [base64.b64encode(buf.getvalue())], 420, 560, fast_scale=True
        )[0]
        oh, ow = min_max_resize_size((w, h), 420, 560)
        assert got.shape == (oh, ow, 3), (w, h, got.shape, (oh, ow))
