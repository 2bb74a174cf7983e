import numpy as np
import pytest
from PIL import Image

from gitax.preprocess.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    TestTransform,
    center_crop,
    get_image_transform,
    min_max_resize_size,
    resize_shorter,
    to_normalized_array,
)


def make_image(w, h):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))


def test_resize_shorter_aspect():
    img = make_image(400, 200)
    out = resize_shorter(img, 100)
    assert out.size == (200, 100)
    img = make_image(200, 400)
    out = resize_shorter(img, 100)
    assert out.size == (100, 200)


def test_resize_noop_when_short_side_matches():
    img = make_image(100, 250)
    assert resize_shorter(img, 100) is img


def test_center_crop():
    img = make_image(300, 200)
    out = center_crop(img, 128)
    assert out.size == (128, 128)


def test_center_crop_pads_small_images():
    img = make_image(50, 60)
    out = center_crop(img, 100)
    assert out.size == (100, 100)


def test_min_max_resize_size_matches_reference_logic():
    # reference MinMaxResizeForTest.get_size (inference.py:34-54)
    assert min_max_resize_size((640, 480), 480, 640) == (480, 640)
    # very wide image: capped by max_size
    h, w = min_max_resize_size((2000, 500), 480, 640)
    assert (h, w) == (160, 640)
    # tall image whose long side would exceed max: short side shrinks below min
    assert min_max_resize_size((480, 700), 480, 640) == (640, 439)


def test_normalize_values():
    img = Image.new("RGB", (4, 4), (255, 255, 255))
    arr = to_normalized_array(img)
    expected = (1.0 - CLIP_MEAN) / CLIP_STD
    assert np.allclose(arr[0, 0], expected, atol=1e-6)
    assert arr.shape == (4, 4, 3)
    assert arr.dtype == np.float32


def test_default_transform_output_shape():
    t = TestTransform(crop_size=224)
    out = t(make_image(640, 480))
    assert out.shape == (224, 224, 3)


def test_high_res_transform_non_square():
    t = get_image_transform({"test_crop_size": 480, "test_respect_ratio_max": 640})
    out = t(make_image(640, 480))
    assert out.shape[2] == 3
    assert min(out.shape[:2]) == 480
    assert max(out.shape[:2]) <= 640


def test_param_dispatch():
    t = get_image_transform({})
    assert t.crop_size == 224 and t.respect_ratio_max is None
