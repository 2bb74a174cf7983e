"""Full user workflow against a reference-layout checkpoint on disk:

  output/{model}/snapshot/model.pt (torch)  ->  CLI TSV caption inference
  ->  COCO-format conversion  ->  metric evaluation

This chains C28 (checkpoint load/alignment), C30 (TSV pipeline), C31
(evaluation) exactly as a reference user would run them, with a tiny
custom model so it stays CPU-fast."""

import base64
import io
import json

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gitax.common import json_dump
from gitax.io.tsv import TSVFile, tsv_writer


def make_checkpoint(tmp_path, model_name="TINY_TEST_MODEL"):
    """Build a tiny torch GIT checkpoint in the reference's on-disk
    layout using the reference modules as the writer."""
    from reference_compat import import_reference_modules

    clip_model, ref_decoder = import_reference_modules()
    torch.manual_seed(0)
    vit = clip_model.VisualTransformer(
        input_resolution=32, patch_size=16, width=64, layers=2, heads=2,
        output_dim=64, output_grid=True, grid_after_ln=True)
    txt = ref_decoder.TransformerDecoderTextualHead(
        visual_feature_size=64, vocab_size=30522, hidden_size=48, num_layers=2,
        attention_heads=4, feedforward_size=96, max_caption_length=32,
        mask_future_positions=True, padding_idx=0, decoder_type="bert_en",
        visual_projection_type="linearLn")
    sd = {}
    for k, v in vit.state_dict().items():
        sd["module.image_encoder." + k] = v
    for k, v in txt.state_dict().items():
        sd["module.textual." + k] = v
    ckpt_dir = tmp_path / "output" / model_name / "snapshot"
    ckpt_dir.mkdir(parents=True)
    torch.save({"model": sd}, str(ckpt_dir / "model.pt"))
    return model_name


def jpeg_b64(seed):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue())


def test_checkpoint_to_metrics_workflow(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    model_name = make_checkpoint(tmp_path)
    # the CLI resolves unknown model names to an empty param dict; supply
    # the tiny architecture via a parameter.yaml + monkeypatched config
    import gitax.inference as inf
    from gitax.models import GitModel, GitConfig, ViTConfig

    tiny_cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=30522,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=32,
    )
    monkeypatch.setattr(
        "gitax.models.git.config_from_param", lambda param=None: tiny_cfg
    )

    # data: 3-row base64 image TSV + gt captions
    tsv_writer([["im{}".format(i), jpeg_b64(i)] for i in range(3)], "test.img.tsv")
    tsv_writer(
        [
            ["im{}".format(i), json_dump([{"caption": "a a a"}, {"caption": "a a"}])]
            for i in range(3)
        ],
        "test.caption.tsv",
    )

    # CLI: checkpoint is found and loaded (not random init)
    import logging

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Capture()
    logging.getLogger().addHandler(handler)
    old_level = logging.getLogger().level
    logging.getLogger().setLevel(logging.INFO)
    try:
        inf.test_git_inference_single_tsv(
            "test.img.tsv", model_name, None, "pred.tsv", batch_size=2
        )
    finally:
        logging.getLogger().removeHandler(handler)
        logging.getLogger().setLevel(old_level)
    assert any("loading output/{}".format(model_name) in m for m in records), records

    out = TSVFile("pred.tsv")
    assert len(out) == 3
    preds = [json.loads(out[i][1]) for i in range(3)]
    assert all("caption" in p[0] for p in preds)

    # evaluation over the predictions
    result = inf.evaluate_on_coco_caption("pred.tsv", "test.caption.tsv")
    assert set(result) >= {"Bleu_1", "CIDEr", "ROUGE_L"}
    assert all(np.isfinite(v) for v in result.values())


def test_video_cli_multiframe(tmp_path, monkeypatch):
    """Multi-frame (video) single-image CLI path: list of image paths ->
    per-frame encode + temporal embeddings (reference inference.py:73-77,
    decoder.py:846-853)."""
    monkeypatch.chdir(tmp_path)
    import gitax.inference as inf
    from gitax.models import GitConfig, ViTConfig

    tiny_cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=30522,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=64,
        num_image_with_embedding=3,
    )
    monkeypatch.setattr(
        "gitax.models.git.config_from_param", lambda param=None: tiny_cfg
    )
    monkeypatch.setattr(inf, "_load_param", lambda name: {"test_crop_size": 32})
    rng = np.random.RandomState(0)
    frames = []
    for i in range(3):
        p = str(tmp_path / "f{}.jpg".format(i))
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
        frames.append(p)
    # patch beam to a small budget so the random-weight decode is quick
    from gitax.decode import BeamSearchConfig as BSC

    import gitax.models.git as gitmod

    real_generate = gitmod.GitModel.generate

    def small_generate(self, params, images, prefix_tokens=None, beam=None, **kw):
        beam = BSC(num_beams=2, max_steps=10)
        return real_generate(self, params, images, prefix_tokens, beam=beam, **kw)

    monkeypatch.setattr(gitmod.GitModel, "generate", small_generate)
    cap = inf.test_git_inference_single_image(frames, "SOME_VIDEO_MODEL", "")
    assert isinstance(cap, str)


def test_trie_cli_classification(tmp_path, monkeypatch):
    """vocab_file switches the single-image CLI to trie-constrained
    classification (reference model.py:42-48 commented-in option)."""
    monkeypatch.chdir(tmp_path)
    import gitax.inference as inf
    from gitax.models import GitConfig, ViTConfig
    from gitax.tokenization import BertTokenizer, build_tiny_vocab

    tiny_cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=30522,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=64,
    )
    monkeypatch.setattr(
        "gitax.models.git.config_from_param", lambda param=None: tiny_cfg
    )
    monkeypatch.setattr(inf, "_load_param", lambda name: {"test_crop_size": 32})
    tok = BertTokenizer(build_tiny_vocab(words=["dog", "cat", "truck"]))
    monkeypatch.setattr(inf, "_load_tokenizer", lambda: tok)
    (tmp_path / "names.txt").write_text("dog\ncat\ntruck\n")
    rng = np.random.RandomState(0)
    img_path = str(tmp_path / "x.jpg")
    Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(img_path)
    out = inf.test_git_inference_single_image(
        img_path, "CLS_MODEL", "", vocab_file=str(tmp_path / "names.txt")
    )
    assert out in {"dog", "cat", "truck"}, out


def test_vqa_cli_workflow(tmp_path, monkeypatch):
    """question_tsv path through the CLI: answers TSV -> evalai json
    (reference inference.py:171-199, 227-229)."""
    monkeypatch.chdir(tmp_path)
    model_name = make_checkpoint(tmp_path, "TINY_VQA_MODEL")
    import gitax.inference as inf
    from gitax.models import GitConfig, ViTConfig

    tiny_cfg = GitConfig(
        encoder=ViTConfig(16, 64, 2, 2, 32),
        visual_feature_size=64,
        vocab_size=30522,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        feedforward_size=96,
        max_caption_length=64,
    )
    monkeypatch.setattr(
        "gitax.models.git.config_from_param", lambda param=None: tiny_cfg
    )
    monkeypatch.setattr(inf, "_load_param", lambda name: {"test_crop_size": 32})
    tsv_writer([["im{}".format(i), jpeg_b64(i)] for i in range(2)], "img.tsv")
    tsv_writer(
        [
            ["im0", json_dump([{"question": "what color", "question_id": 1}])],
            ["im1", json_dump([{"question": "how many", "question_id": 2},
                               {"question": "is it red", "question_id": 3}])],
        ],
        "q.tsv",
    )
    inf.test_git_inference_single_tsv("img.tsv", model_name, "q.tsv", "ans.tsv",
                                      batch_size=2)
    rows = [json.loads(r[0]) for r in TSVFile("ans.tsv")]
    assert sorted(r["question_id"] for r in rows) == [1, 2, 3]
    inf.convert_tsv_to_vqa_json("ans.tsv", "vqa.json")
    with open("vqa.json") as fp:
        sub = json.load(fp)
    assert len(sub) == 3 and all("answer" in r for r in sub)
