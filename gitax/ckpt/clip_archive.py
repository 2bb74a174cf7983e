"""Offline `clip.load` equivalent: published CLIP torchscript archives ->
gitax params, with sha256 pin verification.

The reference obtains its image encoder by downloading an OpenAI CLIP
torchscript archive, verifying its sha256 against a pinned value, and
rebuilding an eager model from the archive's state dict (reference
CLIP/clip.py:16-57,64-86 -> CLIP/model.py:402-439).  This module is the
zero-egress counterpart: the archive file is found locally (the
reference's own `./output/clip` download root first), its hash is
checked against the same published pins, and the state dict is converted
straight into gitax pytrees — visual tower (ViT or ModifiedResNet) and
text tower.
"""

from __future__ import annotations

import hashlib
import logging
import os.path as op

# sha256 pins of the published OpenAI CLIP archives — the leading path
# component of each download URL (reference CLIP/clip.py:16-25)
CLIP_ARCHIVE_SHA256 = {
    "RN50": "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762",
    "RN101": "8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599",
    "RN50x4": "7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd",
    "RN50x16": "52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa",
    "RN50x64": "be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c",
    "ViT-B/32": "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
    "ViT-B/16": "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f",
    "ViT-L/14": "b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836",
}

DEFAULT_ROOTS = ("output/clip", op.expanduser("~/.cache/clip"))


def _sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as fp:
        for chunk in iter(lambda: fp.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def resolve_archive(name_or_path, roots=DEFAULT_ROOTS):
    """Find the local archive file for a published model name (e.g.
    'ViT-B/16' -> <root>/ViT-B-16.pt, the reference's download layout) or
    pass a direct path through.  Returns (path, pinned_sha256|None)."""
    if op.isfile(name_or_path):
        pin = None
        base = op.basename(name_or_path)
        for name, sha in CLIP_ARCHIVE_SHA256.items():
            if name.replace("/", "-") + ".pt" == base:
                pin = sha
        return name_or_path, pin
    if name_or_path not in CLIP_ARCHIVE_SHA256:
        raise FileNotFoundError(
            "{!r} is neither a file nor a known CLIP model name {}".format(
                name_or_path, sorted(CLIP_ARCHIVE_SHA256)
            )
        )
    fname = name_or_path.replace("/", "-") + ".pt"
    for root in roots:
        cand = op.join(root, fname)
        if op.isfile(cand):
            return cand, CLIP_ARCHIVE_SHA256[name_or_path]
    raise FileNotFoundError(
        "CLIP archive {} not found under {} — download it once on a "
        "connected machine (reference CLIP/clip.py:28-57) and place it "
        "there".format(fname, roots)
    )


def load_clip_archive(name_or_path, roots=DEFAULT_ROOTS, verify="strict"):
    """torchscript CLIP archive -> dict with gitax params and configs.

    verify: 'strict' (default) = raise on pin mismatch, matching the
    reference's refusal to use unverified bytes (CLIP/clip.py:39-42 —
    it re-downloads, which a zero-egress host cannot, so gitax raises;
    torchscript archives are pickle containers, never deserialize
    unverified ones silently); 'warn' = log and continue (synthetic/test
    archives); False = skip hashing.

    Returns {'visual_kind', 'visual_config', 'visual', 'text_config',
    'text', 'input_resolution', 'sha256_verified'}.
    """
    import torch

    from ..models.clip import CLIPTextConfig, convert_clip_text_state_dict
    from .torch_convert import load_clip_visual

    path, pin = resolve_archive(name_or_path, roots)
    verified = False
    if verify and pin is None:
        # no published pin matches this file: 'strict' must REFUSE (the
        # docstring promises never to deserialize unverified pickle
        # bytes silently), not fall through to torch.jit.load
        msg = (
            "no published sha256 pin for {} — cannot verify "
            "(pass verify='warn' for synthetic/test archives)".format(path)
        )
        if verify == "strict":
            raise ValueError(msg)
        logging.warning(msg)
    elif verify:
        digest = _sha256(path)
        verified = digest == pin
        if not verified:
            msg = (
                "sha256 mismatch for {}: got {}, pinned {} "
                "(reference CLIP/clip.py:39-42)".format(path, digest, pin)
            )
            if verify == "strict":
                raise ValueError(msg)
            logging.warning(msg)
    jit_mod = torch.jit.load(path, map_location="cpu").eval()
    input_resolution = int(jit_mod.input_resolution.item())
    sd = dict(jit_mod.state_dict())
    # the archives carry these as int buffers; build_model drops them too
    # (CLIP/model.py:433-434)
    for k in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(k, None)
    kind, vcfg, vparams = load_clip_visual(sd, prefix="visual.")
    # infer the text tower like the reference (CLIP/model.py:420-426)
    width = sd["ln_final.weight"].shape[0]
    text_cfg = CLIPTextConfig(
        width=int(width),
        heads=int(width) // 64,
        layers=len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
        ),
        context_length=int(sd["positional_embedding"].shape[0]),
        vocab_size=int(sd["token_embedding.weight"].shape[0]),
    )
    text_params = convert_clip_text_state_dict(sd, text_cfg)
    return {
        "visual_kind": kind,
        "visual_config": vcfg,
        "visual": vparams,
        "text_config": text_cfg,
        "text": text_params,
        "input_resolution": input_resolution,
        "sha256_verified": verified,
    }


def load_image_encoder_from_archive(name_or_path, input_resolution=None,
                                    roots=DEFAULT_ROOTS, verify="strict"):
    """The reference get_image_encoder flow (model.py:63-91) offline:
    load the archive's visual tower and, when `input_resolution` differs
    from the archive's, statically resize the positional embedding
    (bicubic, torch_common.py:19-39).  Returns (ViTConfig, params)."""
    import numpy as np

    from ..ops.interp import resize_pos_embed_grid

    loaded = load_clip_archive(name_or_path, roots, verify)
    assert loaded["visual_kind"] == "vit", (
        "pos-emb resize applies to ViT encoders (reference model.py:76-88)"
    )
    cfg, params = loaded["visual_config"], loaded["visual"]
    if input_resolution and input_resolution != cfg.input_resolution:
        grid_before = cfg.grid
        cfg = cfg.with_resolution(input_resolution)
        pos = np.asarray(params["positional_embedding"])
        params = dict(params)
        params["positional_embedding"] = resize_pos_embed_grid(
            pos, grid_before, (cfg.grid, cfg.grid)
        )
    return cfg, params
