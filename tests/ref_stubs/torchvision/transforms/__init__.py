"""PIL/numpy re-implementations of the five torchvision transforms the
reference inference CLI uses (reference inference.py:15,124-132), with
torchvision's exact size arithmetic:

  * Resize(int): shorter side -> size, other side int(size * long/short)
    (truncating), no-op if already at size [torchvision F.resize int path]
  * CenterCrop(int): crop_top = int(round((h - th) / 2.)), same for left
  * ToTensor: HWC uint8 -> CHW float32 / 255
  * Normalize(mean, std)

These are behavioral stand-ins written against torchvision's documented
semantics so the reference can execute offline; no torchvision code is
copied."""

import numpy as np
import torch
from PIL import Image


class Compose(object):
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize(object):
    def __init__(self, size, interpolation=Image.BICUBIC):
        assert isinstance(size, int)
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img):
        w, h = img.size
        size = self.size
        if (w <= h and w == size) or (h <= w and h == size):
            return img
        if w < h:
            ow, oh = size, int(size * h / w)
        else:
            oh, ow = size, int(size * w / h)
        return img.resize((ow, oh), self.interpolation)


class CenterCrop(object):
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else size

    def __call__(self, img):
        w, h = img.size
        th, tw = self.size
        assert h >= th and w >= tw, "pad path not needed for these tests"
        top = int(round((h - th) / 2.0))
        left = int(round((w - tw) / 2.0))
        return img.crop((left, top, left + tw, top + th))


class ToTensor(object):
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy()).float().div(255.0)


class Normalize(object):
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std
