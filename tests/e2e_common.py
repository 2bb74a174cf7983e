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


def make_clip_jit_archive(path, image_resolution=96):
    """Synthetic CLIP torchscript archive: a scripted module tree holding
    a (tiny, seeded) reference-CLIP state dict plus the int buffers the
    real OpenAI archives carry — consumable by the reference's
    torch.jit.load -> state_dict() -> build_model chain and by gitax's
    offline clip-archive loader."""
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if STUB_DIR not in sys.path:
        sys.path.insert(0, STUB_DIR)
    import reference_compat

    clip_model, _ = reference_compat.import_reference_modules()
    torch.manual_seed(1234)
    clip = clip_model.CLIP(
        embed_dim=64,
        image_resolution=image_resolution,
        vision_layers=2,
        vision_width=192,
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


def make_git_checkpoint(ws, vocab_path):
    """Build the reference GIT model (its own get_git_model, tiny CLIP
    encoder via the synthetic archive) and save its state dict as
    output/{model}/snapshot/model.pt, seeded so decoding terminates and
    produces nontrivial text:

      * the EOS word embedding is aligned with the mean late-position
        (>=12) minus early-position direction of the positional table —
        through the tied output head this gates EOS strongly negative
        before position 12 and dominant after, so captions run ~11
        tokens and VQA answers (prefix ~7 tokens) a few tokens, then
        terminate (beam `is_done` fires quickly once EOS dominates),
      * the output bias favors the real-word/wordpiece/punctuation vocab
        region so decoded text exercises wordpiece merge + cleanup."""
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
            model = get_git_model(tokenizer, _param())
        finally:
            os.chdir(cwd)
    finally:
        ref_clip._download = orig_download
    sd = model.state_dict()
    with torch.no_grad():
        words = sd["textual.embedding.words.weight"]
        pos = sd["textual.embedding.positions.weight"]
        words.mul_(0.4)  # keep the tied-output self-token feedback small
        d = pos[12:20].mean(0) - pos[0:12].mean(0)
        words[tokenizer.sep_token_id] = 10.0 * d / d.norm()
        g = torch.Generator().manual_seed(7)
        bias = torch.randn(30522, generator=g) * 2.0
        with open(vocab_path, encoding="utf-8") as fp:
            lines = [ln.rstrip("\n") for ln in fp]
        real = torch.tensor(
            [
                i
                for i, t in enumerate(lines)
                if not t.startswith("[") and not t.endswith("]")
            ]
        )
        bias[real] += 3.0  # real words / ##pieces / punctuation on top
        for special in (0, 100, 101, 103):  # PAD/UNK/CLS/MASK stay out
            bias[special] -= 8.0
        bias[tokenizer.sep_token_id] = 0.0
        sd["textual.output.bias"].copy_(bias)
    out = op.join(ws, "output", MODEL_NAME, "snapshot", "model.pt")
    os.makedirs(op.dirname(out), exist_ok=True)
    torch.save({"model": sd}, out)
    return out


def _param():
    return {
        "image_encoder_type": "CLIPViT_B_16",
        "visual_feature_size": 192,
        "test_crop_size": 64,
    }


def make_param_yamls(ws):
    import yaml

    for rel in (
        op.join("output", MODEL_NAME, "parameter.yaml"),
        op.join("aux_data", "models", MODEL_NAME, "parameter.yaml"),
    ):
        path = op.join(ws, rel)
        os.makedirs(op.dirname(path), exist_ok=True)
        with open(path, "w") as fp:
            yaml.safe_dump(_param(), fp)


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


def build_workspace(ws):
    os.makedirs(ws, exist_ok=True)
    vocab = make_bert_vocab(op.join(ws, "vocab.txt"))
    hf_home = make_hf_cache(ws, vocab)
    make_clip_jit_archive(op.join(ws, "output", "clip", "ViT-B-16.pt"))
    make_param_yamls(ws)
    make_git_checkpoint(ws, vocab)
    make_data_tsvs(ws)
    return {"ws": ws, "hf_home": hf_home, "vocab": vocab}


def run_reference_cli(ws, hf_home, module, payload, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REFERENCE_ROOT + os.pathsep + STUB_DIR
    env["HF_HOME"] = hf_home
    env["TRANSFORMERS_OFFLINE"] = "1"
    env["HF_HUB_OFFLINE"] = "1"
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, op.join(STUB_DIR, "run_reference_cli.py"), module,
         "-p", _json.dumps(payload)],
        cwd=ws, env=env, capture_output=True, text=True, timeout=timeout,
    )


def run_gitax_cli(ws, hf_home, module, payload, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT
    env["HF_HOME"] = hf_home
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "gitax." + module, "-p", _json.dumps(payload)],
        cwd=ws, env=env, capture_output=True, text=True, timeout=timeout,
    )
