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

import os  # noqa: E402

if os.environ.get("REF_TRIE"):
    # enable the reference's own commented-in trie-decoder option
    # (reference model.py:42-48) without editing the read-only checkout:
    # build the model normally, then swap the decoder exactly as the
    # commented recipe constructs it.
    from generativeimage2text import model as _ref_model  # noqa: E402

    _orig_get_git_model = _ref_model.get_git_model

    def _trie_get_git_model(tokenizer, param):
        m = _orig_get_git_model(tokenizer, param)
        from generativeimage2text.trie_decoder import (
            TrieAutoRegressiveBeamSearch,
            get_trie,
        )

        m.decoder = TrieAutoRegressiveBeamSearch(
            eos_index=tokenizer.sep_token_id,
            max_steps=1022,
            beam_size=1,
            trie=get_trie(tokenizer),
        )
        return m

    _ref_model.get_git_model = _trie_get_git_model

module = "generativeimage2text." + sys.argv[1]
sys.argv = [sys.argv[0]] + sys.argv[2:]
runpy.run_module(module, run_name="__main__")
