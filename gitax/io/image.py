"""Host-side image decoding (reference process_image.py:4-13, common.py:213-221)."""

from __future__ import annotations

import base64
import io

from PIL import Image


def load_image(source):
    """Open an image from a path or raw bytes as RGB PIL."""
    if isinstance(source, str):
        return Image.open(source).convert("RGB")
    if isinstance(source, bytes):
        return Image.open(io.BytesIO(source)).convert("RGB")
    raise TypeError("expected path or bytes, got {}".format(type(source)))


def image_from_base64(b64string):
    """Decode a base64 jpeg/png payload to RGB PIL; None on failure
    (matches reference common.py:213-221 semantics used by the TSV
    pipelines)."""
    try:
        return load_image(base64.b64decode(b64string))
    except Exception:
        return None
