"""Workspace builder for the dual-framework end-to-end parity tests.

Creates a self-contained working directory from which BOTH the reference
CLI (`python tests/ref_stubs/run_reference_cli.py inference -p ...`,
torch CPU) and the gitax CLI (`python -m gitax.inference -p ...`, jax
CPU) can run the same commands on the same data with the same weights:

  * a full 30522-entry bert-base-uncased-shaped vocab, installed into a
    fake HuggingFace cache that BOTH tokenizers discover (HF slow
    BertTokenizer via TRANSFORMERS_OFFLINE, gitax via its HF-cache glob),
  * a synthetic CLIP torchscript archive at output/clip/ViT-B-16.pt that
    the reference's own clip.load -> torch.jit.load -> build_model chain
    consumes (reference CLIP/clip.py:64-86, CLIP/model.py:402-439),
  * a GIT checkpoint output/{model}/snapshot/model.pt produced by the
    reference's own get_git_model (reference model.py:9-61), seeded and
    EOS-biased so beam search terminates in a few steps,
  * base64-image / question / ground-truth TSVs.
"""

import base64
import io
import json as _json
import os
import os.path as op
import string
import subprocess
import sys

import numpy as np
from PIL import Image

TESTS_DIR = op.dirname(op.abspath(__file__))
REPO_ROOT = op.dirname(TESTS_DIR)
STUB_DIR = op.join(TESTS_DIR, "ref_stubs")
REFERENCE_ROOT = "/root/reference"

MODEL_NAME = "TEST_E2E"

COMMON_WORDS = """
a the of and in on with at by for to from man woman person boy girl dog
cat boat water sky tree house car street city park table chair food red
blue green yellow black white small large old young two three standing
sitting walking running playing holding wearing looking photo picture
image group field grass snow beach ocean mountain road bridge train bus
bird horse sheep cow elephant bear zebra giraffe hat shirt dress ball
game plate cup bottle glass fork knife spoon bowl banana apple orange
pizza donut cake bed couch plant television laptop mouse remote keyboard
phone book clock vase scissors toothbrush is are was were be been being
this that these those it its his her their there here what which who how
""".split()

WORD_PIECES = [
    "##s", "##ing", "##ed", "##er", "##est", "##ly", "##y", "##e", "##a",
    "##o", "##n", "##r", "##t", "##l", "##u", "##i", "##m", "##p", "##h",
    "##b", "##c", "##d", "##f", "##g", "##k", "##v", "##w", "##x", "##z",
    "##able", "##tion", "##ment", "##ness", "##ful",
]

EXTRA_TOKENS = [
    # accent/CJK/unk-exercising entries for tokenizer goldens
    "cafe", "uber", "naive", "中", "文", "日", "本", "语",
    "1930s", "co", "##op", "##rative",
]


def make_bert_vocab(path, total=30522):
    """Write a bert-base-uncased-shaped vocab.txt: the standard special
    tokens at the standard ids (PAD=0, UNK=100, CLS=101, SEP=102,
    MASK=103), then punctuation/digits/letters/words/pieces, padded to
    `total` with [unusedN] entries."""
    tokens = ["[PAD]"]
    tokens += ["[unused{}]".format(i) for i in range(99)]
    tokens += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += list(string.punctuation)
    tokens += list(string.digits)
    tokens += list(string.ascii_lowercase)
    seen = set(tokens)
    for w in COMMON_WORDS + WORD_PIECES + EXTRA_TOKENS:
        if w not in seen:
            tokens.append(w)
            seen.add(w)
    n_fill = total - len(tokens)
    assert n_fill > 0
    tokens += ["[unused{}]".format(99 + i) for i in range(n_fill)]
    with open(path, "w", encoding="utf-8") as fp:
        fp.write("\n".join(tokens) + "\n")
    return path


def make_hf_cache(ws, vocab_src):
    """Fake HF hub cache so BertTokenizer.from_pretrained
    ('bert-base-uncased') resolves offline — the same file gitax's
    HF-cache vocab glob discovers."""
    snap = op.join(
        ws, "hf", "hub", "models--bert-base-uncased", "snapshots", "pinned"
    )
    refs = op.join(ws, "hf", "hub", "models--bert-base-uncased", "refs")
    os.makedirs(snap, exist_ok=True)
    os.makedirs(refs, exist_ok=True)
    with open(op.join(refs, "main"), "w") as fp:
        fp.write("pinned")
    import shutil

    shutil.copy(vocab_src, op.join(snap, "vocab.txt"))
    return op.join(ws, "hf")


def make_clip_jit_archive(path, image_resolution=96, vision_width=192,
                          vision_layers=2, embed_dim=64):
    """Synthetic CLIP torchscript archive: a scripted module tree holding
    a (tiny, seeded) reference-CLIP state dict plus the int buffers the
    real OpenAI archives carry — consumable by the reference's
    torch.jit.load -> state_dict() -> build_model chain and by gitax's
    offline clip-archive loader.  With vision_width=768,
    vision_layers=12, image_resolution=224 the VISION tower is exactly
    ViT-B/16-sized (the text tower stays tiny — GIT only consumes
    model.visual, reference model.py:68-71)."""
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if STUB_DIR not in sys.path:
        sys.path.insert(0, STUB_DIR)
    import reference_compat

    clip_model, _ = reference_compat.import_reference_modules()
    torch.manual_seed(1234)
    clip = clip_model.CLIP(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=16,
        context_length=16,
        vocab_size=64,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
    )
    with torch.no_grad():
        # the reference CLIP leaves text positional_embedding and
        # text_projection as torch.empty garbage (initialize_parameters
        # does not cover them in this snapshot).  torch.empty contents
        # depend on allocator history (NaN, zeros, recycled data), so
        # seed them UNCONDITIONALLY for determinism.
        g = torch.Generator().manual_seed(4321)
        for p in (clip.positional_embedding, clip.text_projection):
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
        for p in clip.parameters():
            if torch.isnan(p).any():
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    sd = dict(clip.state_dict())
    root = torch.nn.Module()
    for name, tensor in sd.items():
        parts = name.split(".")
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p):
                mod.add_module(p, torch.nn.Module())
            mod = getattr(mod, p)
        mod.register_buffer(parts[-1], tensor.clone())
    root.register_buffer("input_resolution", torch.tensor(image_resolution))
    root.register_buffer("context_length", torch.tensor(16))
    root.register_buffer("vocab_size", torch.tensor(64))
    os.makedirs(op.dirname(path), exist_ok=True)
    torch.jit.save(torch.jit.script(root), path)
    return path


def make_git_checkpoint(ws, vocab_path, model_name=MODEL_NAME, param=None):
    """Build the reference GIT model (its own get_git_model, tiny CLIP
    encoder via the synthetic archive) and save its state dict as
    output/{model}/snapshot/model.pt, seeded so decoding terminates and
    produces nontrivial, INPUT-SENSITIVE text (different images -> mostly
    different captions; reversed video frames -> a different caption), so
    the dual-CLI byte-parity assertions cannot pass vacuously:

      * positional EOS ramp: a fixed random unit direction `dhat` is
        projected OUT of every positional embedding, then re-added as
        -K for positions < 10 and +K*ramp after; the EOS word embedding
        is K_sep*dhat, so through the tied output head the SEP logit is
        hard-gated by POSITION alone — captions terminate at ~10 tokens
        (VQA answers after a ~8-token prefix: 2-3 tokens) regardless of
        what the visual stream contributes,
      * the visual_projection LayerNorm gain (`linearLn`,
        decoder.py:30-37) is scaled 16x, which makes the decoder hidden
        states — and with them the argmax word — depend on the image
        content instead of on fixed bias structure (measured: without
        this, all inputs decode to the same caption),
      * the output bias flattens all purely-alphabetic words to one
        level (non-word junk well below), so the per-step winner is
        decided by the image-dependent hidden state (decode-side
        wordpiece merges stay covered by the trie CLI parity test),
      * video models: the reference initializes img_temperal_embedding
        to zeros (decoder.py:831-836) — a no-op that would hide
        temporal-embedding bugs.  Slots 0-2 get LARGE (norm-8) fixed
        directions — after the per-token visual_projection LayerNorm
        they SATURATE, erasing the content of whichever frames sit in
        those slots — and slots 3-5 get sigma-2 noise.  Forward order
        therefore shows the decoder frames 3-5, reversed order frames
        2-0: captions flip with frame order exactly when the pairing of
        `img_temperal_embedding[i]` with frame i (decoder.py:846-853)
        is applied."""
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if STUB_DIR not in sys.path:
        sys.path.insert(0, STUB_DIR)
    import reference_compat

    reference_compat.import_reference_modules()  # stubs azfuse etc.

    from generativeimage2text.layers.CLIP import clip as ref_clip

    orig_download = ref_clip._download

    def offline_download(url, root="./output/clip"):
        target = op.join(root, url.split("/")[-1])
        if op.isfile(target):
            return target
        return orig_download(url, root)

    ref_clip._download = offline_download
    try:
        from transformers import BertTokenizer

        tokenizer = BertTokenizer(vocab_path, do_lower_case=True)
        from generativeimage2text.model import get_git_model

        cwd = os.getcwd()
        os.chdir(ws)
        try:
            torch.manual_seed(99)
            model = get_git_model(tokenizer, param if param is not None else _param())
        finally:
            os.chdir(cwd)
    finally:
        ref_clip._download = orig_download
    sd = model.state_dict()
    # NOTE: sd's "textual.embedding.words.weight" and
    # "textual.output.weight" are the SAME tensor (tied, decoder.py:505)
    # — only mutate in place, never rebind, so both stay consistent.
    # (The reference's load_state_dict builds name_to_param from
    # named_parameters(), which dedups tied params, so only the
    # embedding-side key is ever loaded back.)
    with torch.no_grad():
        words = sd["textual.embedding.words.weight"]
        pos = sd["textual.embedding.positions.weight"]
        # positional EOS ramp (see docstring)
        gd = torch.Generator().manual_seed(19)
        dhat = torch.randn(pos.shape[1], generator=gd)
        dhat /= dhat.norm()
        pos.sub_((pos @ dhat)[:, None] * dhat[None, :])
        t = torch.arange(pos.shape[0], dtype=torch.float32)
        ramp = torch.where(t < 10, torch.full_like(t, -1.0),
                           ((t - 9.0) / 4.0).clamp(max=1.0))
        pos.add_(8.0 * ramp[:, None] * dhat[None, :])
        words[tokenizer.sep_token_id] = 10.0 * dhat
        with open(vocab_path, encoding="utf-8") as fp:
            lines = [ln.rstrip("\n") for ln in fp]
        # pure words only: a ##piece winning the (absorbing) step-0
        # choice would merge into a single long word and defeat the
        # multi-word caption sanity checks; decode-side ##-merges stay
        # covered by the trie CLI test ('cafes' -> cafe + ##s)
        alpha = torch.tensor(
            [i for i, tk in enumerate(lines) if tk.isalpha()]
        )
        g = torch.Generator().manual_seed(7)
        bias = torch.randn(30522, generator=g) * 0.5 - 6.0  # junk out
        bias[alpha] = 3.0  # words compete on the hidden state
        for special in (0, 100, 101, 103):  # PAD/UNK/CLS/MASK stay out
            bias[special] = -14.0
        bias[tokenizer.sep_token_id] = 0.0
        sd["textual.output.bias"].copy_(bias)
        # image-sensitivity: amplify the visual tokens post-LayerNorm
        sd["textual.visual_projection.1.weight"].mul_(16.0)
        # temporal embeddings (video models; see docstring)
        g2 = torch.Generator().manual_seed(11)
        for name, tensor in sd.items():
            if name.startswith("img_temperal_embedding."):
                slot = int(name.split(".")[1])
                if slot < 3:
                    g4 = torch.Generator().manual_seed(17 + slot)
                    e = torch.randn(tensor.shape, generator=g4)
                    tensor.copy_(8.0 * e / e.norm())
                else:
                    tensor.copy_(torch.randn(tensor.shape, generator=g2)
                                 * 2.0)
    out = op.join(ws, "output", model_name, "snapshot", "model.pt")
    os.makedirs(op.dirname(out), exist_ok=True)
    torch.save({"model": sd}, out)
    return out


def _param():
    return {
        "image_encoder_type": "CLIPViT_B_16",
        "visual_feature_size": 192,
        "test_crop_size": 64,
    }


VIDEO_MODEL_NAME = "TEST_E2E_VIDEO"
HIRES_MODEL_NAME = "TEST_E2E_HIRES"


def _param_video():
    # mirrors aux_data/models/GIT_BASE_VATEX/parameter.yaml (6 frames)
    return dict(_param(), num_image_with_embedding=6)


def _param_hires():
    # mirrors aux_data/models/GIT_BASE_TEXTVQA/parameter.yaml's
    # MinMaxResizeForTest family (test_respect_ratio_max), tiny sizes
    return dict(_param(), test_respect_ratio_max=104)


def make_param_yamls(ws, model_name=MODEL_NAME, param=None):
    import yaml

    if param is None:
        param = _param()
    for rel in (
        op.join("output", model_name, "parameter.yaml"),
        op.join("aux_data", "models", model_name, "parameter.yaml"),
    ):
        path = op.join(ws, rel)
        os.makedirs(op.dirname(path), exist_ok=True)
        with open(path, "w") as fp:
            yaml.safe_dump(param, fp)


def _jpeg_b64(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=90)
    return base64.b64encode(buf.getvalue()).decode()


def make_data_tsvs(ws, n_synth=2):
    """img.tsv (key, b64 jpeg) from the two reference demo images plus
    synthetic ones; question.tsv aligned by key; gt.caption.tsv."""
    sys.path.insert(0, REPO_ROOT)
    from gitax.io.tsv import tsv_writer

    from gitax.common import json_dump

    rows = []
    for i, name in enumerate(["1.jpg", "2.jpg"]):
        with open(op.join(REFERENCE_ROOT, "aux_data", "images", name), "rb") as fp:
            rows.append(("demo{}".format(i), base64.b64encode(fp.read()).decode()))
    rng = np.random.RandomState(5)
    for i in range(n_synth):
        x = np.linspace(0, 255, 96, dtype=np.float32)
        grad = np.stack(np.meshgrid(x, x)[i % 2 : i % 2 + 1] * 3, -1)[0]
        noise = rng.randint(0, 80, (96, 96, 3))
        rows.append(
            ("synth{}".format(i), _jpeg_b64((grad * 0.7 + noise).astype(np.uint8)))
        )
    tsv_writer(rows, op.join(ws, "img.tsv"))
    questions = [
        (
            key,
            json_dump(
                [
                    {"question": "what is the man holding ?", "question_id": 2 * i},
                    {"question": "how many dogs are there ?", "question_id": 2 * i + 1},
                ]
            ),
        )
        for i, (key, _) in enumerate(rows)
    ]
    tsv_writer(questions, op.join(ws, "question.tsv"))
    gt = [
        (key, json_dump([{"caption": "a man holding a dog"},
                         {"caption": "two dogs in the park"}]))
        for key, _ in rows
    ]
    tsv_writer(gt, op.join(ws, "gt.caption.tsv"))


def make_video_frames(ws, n_frames=6):
    """Six STRONGLY distinguishable jpeg frames for the reference's
    multi-frame single-image CLI (reference inference.py:75-80,
    decoder.py:846-853).  Each frame is a DIFFERENT image (two demo
    photos, their flips, two synthetic gradients) plus a moving bright
    square: the frame-order sanity test relies on reversed order pairing
    different whole-frame content with the content-erasing temporal
    slots 0-2 (see make_git_checkpoint), so frame-content differences
    must be at the scale where single-image captions are measured to
    differ — whole images, not a moved patch."""
    demo1 = np.asarray(
        Image.open(op.join(REFERENCE_ROOT, "aux_data", "images", "1.jpg"))
        .convert("RGB")
        .resize((96, 96))
    )
    demo2 = np.asarray(
        Image.open(op.join(REFERENCE_ROOT, "aux_data", "images", "2.jpg"))
        .convert("RGB")
        .resize((96, 96))
    )
    ramp = np.linspace(0, 255, 96, dtype=np.float32)
    vgrad = np.broadcast_to(ramp[:, None, None], (96, 96, 3))
    hgrad = np.broadcast_to(ramp[None, :, None], (96, 96, 3))
    rng = np.random.RandomState(23)
    bases = [
        demo1,
        demo2,
        demo1[::-1],
        demo2[:, ::-1],
        (vgrad * 0.6 + rng.randint(0, 90, (96, 96, 3))).clip(0, 255),
        (hgrad * 0.6 + rng.randint(0, 90, (96, 96, 3))).clip(0, 255),
    ]
    paths = []
    frame_dir = op.join(ws, "frames")
    os.makedirs(frame_dir, exist_ok=True)
    for f in range(n_frames):
        arr = np.ascontiguousarray(bases[f % len(bases)]).astype(np.uint8)
        x = 8 + 12 * f
        arr[20:44, x : x + 20] = [250, 240, 40]
        p = op.join(frame_dir, "f{}.jpg".format(f))
        Image.fromarray(arr).save(p, "JPEG", quality=90)
        paths.append(p)
    return paths


def make_imagenet_names(ws):
    """aux_data/imagenet/imagenet_unique_readable_names.txt — the file
    the reference's get_trie_vocab_texts reads relative to cwd
    (trie_decoder.py:12-17).  Names are built from the test vocab so
    they tokenize to 1..3 wordpieces (incl. ##-merges via 'cafes')."""
    names = [
        "dog", "cat", "boat", "horse", "sheep", "elephant", "zebra",
        "giraffe", "train", "bus", "red car", "blue boat", "small dog",
        "large cat", "man walking", "woman running", "cafes", "park tree",
        "yellow banana", "green apple",
    ]
    path = op.join(ws, "aux_data", "imagenet")
    os.makedirs(path, exist_ok=True)
    path = op.join(path, "imagenet_unique_readable_names.txt")
    with open(path, "w") as fp:
        fp.write("\n".join(names) + "\n")
    return path


def make_hires_tsv(ws):
    """img_wide.tsv: NON-square images (odd sizes exercising the MinMax
    resize rounding + patch-remainder truncation) incl. the real demo
    photos (640x480 etc.)."""
    sys.path.insert(0, REPO_ROOT)
    from gitax.io.tsv import tsv_writer

    rows = []
    for i, name in enumerate(["1.jpg", "2.jpg"]):
        with open(op.join(REFERENCE_ROOT, "aux_data", "images", name), "rb") as fp:
            rows.append(("demo{}".format(i), base64.b64encode(fp.read()).decode()))
    rng = np.random.RandomState(17)
    for i, (w, h) in enumerate([(120, 80), (77, 150), (104, 104), (65, 131)]):
        arr = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        arr[:, : w // 2, 0] = 220  # structure, so captions differ by image
        rows.append(("wide{}".format(i), _jpeg_b64(arr)))
    tsv_writer(rows, op.join(ws, "img_wide.tsv"))


def build_workspace(ws):
    os.makedirs(ws, exist_ok=True)
    vocab = make_bert_vocab(op.join(ws, "vocab.txt"))
    hf_home = make_hf_cache(ws, vocab)
    make_clip_jit_archive(op.join(ws, "output", "clip", "ViT-B-16.pt"))
    make_param_yamls(ws)
    make_git_checkpoint(ws, vocab)
    make_data_tsvs(ws)
    return {"ws": ws, "hf_home": hf_home, "vocab": vocab}


FULL_MODEL_NAME = "TEST_E2E_FULL"


def build_full_scale_workspace(ws):
    """GIT_BASE-SIZED workspace (VERDICT r2 next #1d): real ViT-B/16
    vision tower (12 layers, width 768, 224 px), the reference's
    fixed-size 6-layer/768-hidden decoder, full 30522 vocab — the
    reference factory's EXACT default geometry (reference model.py:9-40
    with param {}), seeded + EOS-gated like the tiny fixture.  Slow
    (minutes on 1 vCPU): used by the opt-in GITAX_E2E_FULL dual run."""
    os.makedirs(ws, exist_ok=True)
    vocab = make_bert_vocab(op.join(ws, "vocab.txt"))
    hf_home = make_hf_cache(ws, vocab)
    make_clip_jit_archive(
        op.join(ws, "output", "clip", "ViT-B-16.pt"),
        image_resolution=224, vision_width=768, vision_layers=12,
    )
    param = {}  # the reference's defaults: CLIPViT_B_16, 768, 224
    make_param_yamls(ws, FULL_MODEL_NAME, param)
    make_git_checkpoint(ws, vocab, FULL_MODEL_NAME, param)
    make_data_tsvs(ws)
    return {"ws": ws, "hf_home": hf_home, "vocab": vocab}


def extend_workspace_families(ws, vocab):
    """Add the video / trie / high-res assets + models to a workspace
    built by build_workspace (kept separate so the base caption/VQA
    tests don't pay for them)."""
    make_param_yamls(ws, VIDEO_MODEL_NAME, _param_video())
    make_git_checkpoint(ws, vocab, VIDEO_MODEL_NAME, _param_video())
    make_param_yamls(ws, HIRES_MODEL_NAME, _param_hires())
    make_git_checkpoint(ws, vocab, HIRES_MODEL_NAME, _param_hires())
    frames = make_video_frames(ws)
    names = make_imagenet_names(ws)
    make_hires_tsv(ws)
    return {"frames": frames, "imagenet_names": names}


def strip_remote_tpu_env(env):
    """Make a child interpreter immune to the remote-TPU relay.

    The container's sitecustomize registers a remote-TPU PJRT plugin in
    EVERY python process when PALLAS_AXON_POOL_IPS is set, and jax's
    backend init then dials the relay even under JAX_PLATFORMS=cpu
    (backends() initializes all registered plugins).  If the relay is
    wedged — e.g. a killed TPU client left the terminal session locked
    — every cpu-only child subprocess hangs until its timeout.  The
    parent pytest process is protected by conftest's
    jax.config.update('jax_platforms', 'cpu'); children get protection
    by removing the registration trigger before the interpreter starts.
    """
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "AXON_LOOPBACK_RELAY", "AXON_POOL_SVC_OVERRIDE"):
        env.pop(k, None)
    return env


def run_reference_cli(ws, hf_home, module, payload, timeout=600, extra_env=None):
    env = strip_remote_tpu_env(dict(os.environ))
    env["PYTHONPATH"] = REFERENCE_ROOT + os.pathsep + STUB_DIR
    env["HF_HOME"] = hf_home
    env["TRANSFORMERS_OFFLINE"] = "1"
    env["HF_HUB_OFFLINE"] = "1"
    env.pop("JAX_PLATFORMS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, op.join(STUB_DIR, "run_reference_cli.py"), module,
         "-p", _json.dumps(payload)],
        cwd=ws, env=env, capture_output=True, text=True, timeout=timeout,
    )


def run_gitax_cli(ws, hf_home, module, payload, timeout=900, extra_env=None):
    env = strip_remote_tpu_env(dict(os.environ))
    env["PYTHONPATH"] = REPO_ROOT
    env["HF_HOME"] = hf_home
    env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "gitax." + module, "-p", _json.dumps(payload)],
        cwd=ws, env=env, capture_output=True, text=True, timeout=timeout,
    )
