"""Driver that executes the REFERENCE CLI (`python -m
generativeimage2text.inference ...`) on a CPU-only, offline machine.

Usage: python run_reference_cli.py <module-suffix> -p "{...}"
  (module-suffix: inference | train | data_prepare)

It applies the minimal runtime patches the environment forces — nothing
about the reference's behavior is altered:
  * torch .cuda()/set_device become no-ops (no GPU here),
  * CLIP's _download skips the sha256 re-download when the file already
    exists locally (zero egress; the test fixture supplies the archive),
then runs the real reference module as __main__ via runpy, so the whole
dispatch -> transform -> model -> decode -> TSV chain is the reference's
own code."""

import runpy
import sys

import torch

torch.cuda.set_device = lambda *a, **k: None
torch.cuda.is_available = lambda: False
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

from generativeimage2text.layers.CLIP import clip as _clip  # noqa: E402

_orig_download = _clip._download


def _offline_download(url, root="./output/clip"):
    import os.path as op

    target = op.join(root, url.split("/")[-1])
    if op.isfile(target):
        return target
    return _orig_download(url, root)


_clip._download = _offline_download

module = "generativeimage2text." + sys.argv[1]
sys.argv = [sys.argv[0]] + sys.argv[2:]
runpy.run_module(module, run_name="__main__")
