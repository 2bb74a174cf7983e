"""functional.resize for MinMaxResizeForTest (reference inference.py:63):
called with an explicit (h, w) size tuple, mapped to PIL resize."""

from PIL import Image


def resize(img, size, interpolation=Image.BILINEAR):
    if isinstance(size, int):
        from . import Resize

        return Resize(size, interpolation)(img)
    h, w = size
    return img.resize((w, h), interpolation)
