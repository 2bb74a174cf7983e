"""Dual-framework byte-for-byte end-to-end parity.

Drives the REFERENCE's own CLI (python -m generativeimage2text.inference,
torch CPU, via tests/ref_stubs/run_reference_cli.py) and the gitax CLI
(python -m gitax.inference, jax CPU) as subprocesses over the same
workspace — same base64-image TSV, same question TSV, same converted GIT
checkpoint, same vocab (one file, discovered by HF's BertTokenizer and
gitax's tokenizer alike) — and asserts the outputs are byte-identical:
caption TSVs, VQA TSVs, COCO-format conversion jsons, VQA submission
jsons, and the single-image CLI caption.  This covers the whole
transform -> tokenize -> batch -> beam decode -> detokenize -> TSV ->
eval-conversion chain against the executing reference
(inference.py:67-109, 134-225, 227-252, 254-275).
"""

import json
import os
import os.path as op
import re
import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, op.dirname(op.abspath(__file__)))

import e2e_common as E
from reference_compat import skip_unless_reference_available

skip_unless_reference_available()


@pytest.fixture(scope="session")
def ws(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_ws"))
    info = E.build_workspace(root)
    return info


def _check(r, tag):
    assert r.returncode == 0, "{} failed:\n{}\n{}".format(
        tag, r.stdout[-2000:], r.stderr[-4000:]
    )


@pytest.fixture(scope="session")
def caption_outputs(ws):
    payload = {
        "type": "test_git_inference_single_tsv",
        "image_tsv": "img.tsv",
        "model_name": E.MODEL_NAME,
        "question_tsv": None,
    }
    r = E.run_reference_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, out_tsv="ref.caption.tsv"),
    )
    _check(r, "reference caption CLI")
    r = E.run_gitax_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, out_tsv="gitax.caption.tsv", dtype="float32",
             use_native=False, batch_size=4),
    )
    _check(r, "gitax caption CLI")
    return (op.join(ws["ws"], "ref.caption.tsv"),
            op.join(ws["ws"], "gitax.caption.tsv"))


@pytest.fixture(scope="session")
def vqa_outputs(ws):
    payload = {
        "type": "test_git_inference_single_tsv",
        "image_tsv": "img.tsv",
        "model_name": E.MODEL_NAME,
        "question_tsv": "question.tsv",
    }
    r = E.run_reference_cli(
        ws["ws"], ws["hf_home"], "inference", dict(payload, out_tsv="ref.vqa.tsv")
    )
    _check(r, "reference vqa CLI")
    r = E.run_gitax_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, out_tsv="gitax.vqa.tsv", dtype="float32",
             use_native=False, batch_size=4),
    )
    _check(r, "gitax vqa CLI")
    return op.join(ws["ws"], "ref.vqa.tsv"), op.join(ws["ws"], "gitax.vqa.tsv")


def _read(path):
    with open(path, "rb") as fp:
        return fp.read()


def test_caption_tsv_byte_parity(caption_outputs):
    ref, ours = caption_outputs
    a, b = _read(ref), _read(ours)
    assert a, "reference produced an empty caption TSV"
    # sanity: multi-token captions actually flowed through detok
    caps = [json.loads(line.split(b"\t")[1])[0]["caption"]
            for line in a.strip().split(b"\n")]
    assert all(len(c.split()) >= 3 for c in caps), caps
    # input-sensitivity: the fixture checkpoint is constructed so
    # captions depend on the image (e2e_common.make_git_checkpoint) —
    # if they collapse to one string, byte parity is passing vacuously
    assert len(set(caps)) >= 3, caps
    assert a == b


def test_vqa_tsv_byte_parity(vqa_outputs):
    ref, ours = vqa_outputs
    a, b = _read(ref), _read(ours)
    assert a, "reference produced an empty VQA TSV"
    rows = [json.loads(line.split(b"\t")[0]) for line in a.strip().split(b"\n")]
    assert {r["question_id"] for r in rows} == set(range(8))
    assert any(r["answer"] for r in rows)
    assert a == b


def test_coco_format_conversion_byte_parity(ws, caption_outputs):
    ref_tsv, _ = caption_outputs
    payload = {"type": "convert_tsv_to_coco_format", "res_tsv": "ref.caption.tsv"}
    r = E.run_reference_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, outfile="ref.coco.json"),
    )
    _check(r, "reference coco conversion")
    r = E.run_gitax_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, outfile="gitax.coco.json"),
    )
    _check(r, "gitax coco conversion")
    a = _read(op.join(ws["ws"], "ref.coco.json"))
    assert json.loads(a)[0]["image_id"] == "demo0"
    assert a == _read(op.join(ws["ws"], "gitax.coco.json"))


def test_vqa_json_conversion_byte_parity(ws, vqa_outputs):
    payload = {"type": "convert_tsv_to_vqa_json", "predict_file": "ref.vqa.tsv"}
    r = E.run_reference_cli(
        ws["ws"], ws["hf_home"], "inference", dict(payload, out_json="ref.vqa.json")
    )
    _check(r, "reference vqa conversion")
    r = E.run_gitax_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, out_json="gitax.vqa.json"),
    )
    _check(r, "gitax vqa conversion")
    a = _read(op.join(ws["ws"], "ref.vqa.json"))
    assert json.loads(a)
    assert a == _read(op.join(ws["ws"], "gitax.vqa.json"))


def test_gt_annotation_json_parity(ws, tmp_path):
    """iter_caption_to_json (inside evaluate_on_coco_caption,
    inference.py:288-293) — in-process, reference vs gitax."""
    if E.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, E.REFERENCE_ROOT)
    if E.STUB_DIR not in sys.path:
        sys.path.insert(0, E.STUB_DIR)
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_stub_azfuse", op.join(E.STUB_DIR, "azfuse.py")
    )
    stub = ilu.module_from_spec(spec)
    spec.loader.exec_module(stub)
    sys.modules.setdefault("azfuse", stub)
    from generativeimage2text import tsv_io as ref_tsv_io
    from generativeimage2text.inference import iter_caption_to_json as ref_fn

    # other test modules may have injected a bare type-stub azfuse
    # before this one ran; rebind the working File explicitly
    ref_tsv_io.File = stub.File
    RefTSV = ref_tsv_io.TSVFile

    from gitax.inference import iter_caption_to_json as our_fn
    from gitax.io.tsv import TSVFile

    gt = op.join(ws["ws"], "gt.caption.tsv")
    ref_out = str(tmp_path / "ref.gt.json")
    our_out = str(tmp_path / "ours.gt.json")
    ref_fn(RefTSV(gt), ref_out)
    our_fn(TSVFile(gt), our_out)
    a = _read(ref_out)
    assert json.loads(a)["annotations"]
    assert a == _read(our_out)


def test_single_image_cli_caption_parity(ws):
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": op.join(E.REFERENCE_ROOT, "aux_data", "images", "1.jpg"),
        "model_name": E.MODEL_NAME,
        "prefix": "",
    }
    r = E.run_reference_cli(ws["ws"], ws["hf_home"], "inference", payload)
    _check(r, "reference single-image CLI")
    ref_cap = re.search(r"output: (.*)", r.stdout + r.stderr).group(1).strip()
    r = E.run_gitax_cli(ws["ws"], ws["hf_home"], "inference", payload)
    _check(r, "gitax single-image CLI")
    our_cap = re.search(r"output: (.*)", r.stdout + r.stderr).group(1).strip()
    assert len(ref_cap.split()) >= 3
    assert ref_cap == our_cap


@pytest.fixture(scope="session")
def ws_ext(ws):
    """Video / trie / high-res assets + models, added lazily on top of
    the base workspace (round-3 rig extension, covering the reference's
    remaining task families at CLI level: multi-frame video
    inference.py:75-80 + decoder.py:846-853, trie classification
    trie_decoder.py:42-218 via the model.py:42-48 recipe, and the
    MinMaxResizeForTest family inference.py:29-64)."""
    extra = E.extend_workspace_families(ws["ws"], ws["vocab"])
    return dict(ws, **extra)


def _cli_output_line(r):
    m = re.search(r"output: (.*)", r.stdout + r.stderr)
    assert m, "no 'output:' line:\n{}\n{}".format(r.stdout[-2000:], r.stderr[-3000:])
    return m.group(1).strip()


@pytest.fixture(scope="session")
def video_fwd_ref_caption(ws_ext):
    """Forward-order reference-CLI video caption, shared by the parity
    test and the frame-order sanity test (one subprocess run)."""
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": ws_ext["frames"],
        "model_name": E.VIDEO_MODEL_NAME,
        "prefix": "",
    }
    r = E.run_reference_cli(ws_ext["ws"], ws_ext["hf_home"], "inference", payload)
    _check(r, "reference video CLI (forward)")
    return _cli_output_line(r)


def test_video_multiframe_cli_caption_parity(ws_ext, video_fwd_ref_caption):
    """6-frame video captioning on a num_image_with_embedding=6 model
    (randomized temporal embeddings, so frame ORDER matters) through
    both single-image CLIs (reference inference.py:75-80)."""
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": ws_ext["frames"],
        "model_name": E.VIDEO_MODEL_NAME,
        "prefix": "",
    }
    ref_cap = video_fwd_ref_caption
    r = E.run_gitax_cli(ws_ext["ws"], ws_ext["hf_home"], "inference", payload)
    _check(r, "gitax video CLI")
    assert len(ref_cap.split()) >= 3
    assert ref_cap == _cli_output_line(r)


def test_video_frame_order_matters(ws_ext, video_fwd_ref_caption):
    """Sanity for the video fixture itself: reversed frames change the
    reference caption (otherwise temporal-embedding bugs are invisible
    to the parity test above)."""
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": ws_ext["frames"][::-1],
        "model_name": E.VIDEO_MODEL_NAME,
        "prefix": "",
    }
    r = E.run_reference_cli(ws_ext["ws"], ws_ext["hf_home"], "inference", payload)
    _check(r, "reference video CLI (reversed)")
    rev_ref = _cli_output_line(r)
    r = E.run_gitax_cli(ws_ext["ws"], ws_ext["hf_home"], "inference", payload)
    _check(r, "gitax video CLI (reversed)")
    assert rev_ref == _cli_output_line(r)
    # the actual sanity claim: reversed frames produce a DIFFERENT
    # caption than forward frames (if the temporal embeddings ever
    # silently stop applying, frame order becomes a no-op and the
    # parity test above would go blind)
    assert rev_ref != video_fwd_ref_caption


def test_video_qa_cli_parity(ws_ext, video_fwd_ref_caption):
    """Video QA: 6 frames AND a nonempty question prefix through both
    CLIs (reference README.md:43-48; prefix tokenization
    inference.py:93-108 composing with frame concat decoder.py:846-853).
    The answer must match byte-for-byte AND differ from the no-prefix
    caption (else the prefix silently fell out of the program)."""
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": ws_ext["frames"],
        "model_name": E.VIDEO_MODEL_NAME,
        "prefix": "what is the man holding ?",
    }
    r = E.run_reference_cli(ws_ext["ws"], ws_ext["hf_home"], "inference", payload)
    _check(r, "reference video-QA CLI")
    ref_ans = _cli_output_line(r)
    r = E.run_gitax_cli(ws_ext["ws"], ws_ext["hf_home"], "inference", payload)
    _check(r, "gitax video-QA CLI")
    assert ref_ans == _cli_output_line(r)
    assert ref_ans != video_fwd_ref_caption


def test_trie_classification_cli_parity(ws_ext):
    """Trie-constrained classification: the reference CLI with its own
    TrieAutoRegressiveBeamSearch recipe enabled (REF_TRIE=1 swaps the
    decoder exactly as model.py:42-48 constructs it; class list read
    from aux_data/imagenet/... per trie_decoder.py:12-17) vs the gitax
    CLI's vocab_file trie path.  The output must be one of the class
    names, and identical across frameworks."""
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": op.join(E.REFERENCE_ROOT, "aux_data", "images", "1.jpg"),
        "model_name": E.MODEL_NAME,
        "prefix": "",
    }
    r = E.run_reference_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference", payload,
        extra_env={"REF_TRIE": "1"},
    )
    _check(r, "reference trie CLI")
    ref_out = _cli_output_line(r)
    with open(ws_ext["imagenet_names"]) as fp:
        names = [ln.strip() for ln in fp if ln.strip()]
    assert ref_out in names, (ref_out, names)
    r = E.run_gitax_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference",
        dict(payload, vocab_file=ws_ext["imagenet_names"]),
    )
    _check(r, "gitax trie CLI")
    assert ref_out == _cli_output_line(r)


MESH_ENV = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}


def test_caption_tsv_mesh_cli_byte_parity(ws, caption_outputs):
    """The gitax CLI's mesh_shape path (one SPMD program over an
    8-virtual-device DPxTP mesh) vs the REFERENCE CLI's caption TSV:
    byte-identical.  This is the dual-framework proof that enabling the
    mesh at the product surface changes nothing observable
    (VERDICT r4 next #1)."""
    ref_tsv, _ = caption_outputs
    payload = {
        "type": "test_git_inference_single_tsv",
        "image_tsv": "img.tsv",
        "model_name": E.MODEL_NAME,
        "question_tsv": None,
        "out_tsv": "gitax.caption.mesh.tsv",
        "dtype": "float32",
        "use_native": False,
        "batch_size": 4,
        "mesh_shape": [4, 2],
    }
    r = E.run_gitax_cli(
        ws["ws"], ws["hf_home"], "inference", payload, extra_env=MESH_ENV
    )
    _check(r, "gitax mesh caption CLI")
    assert _read(ref_tsv) == _read(op.join(ws["ws"], "gitax.caption.mesh.tsv"))


def test_trie_classification_mesh_cli_parity(ws_ext):
    """Trie-constrained classification through the single-image CLI's
    mesh_shape path vs the reference CLI (REF_TRIE=1): identical class
    string (VERDICT r4 next #1b — the trie family over the mesh at the
    CLI surface)."""
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": op.join(E.REFERENCE_ROOT, "aux_data", "images", "1.jpg"),
        "model_name": E.MODEL_NAME,
        "prefix": "",
    }
    r = E.run_reference_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference", payload,
        extra_env={"REF_TRIE": "1"},
    )
    _check(r, "reference trie CLI (mesh cmp)")
    ref_out = _cli_output_line(r)
    r = E.run_gitax_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference",
        dict(payload, vocab_file=ws_ext["imagenet_names"],
             mesh_shape=[4, 2]),
        extra_env=MESH_ENV,
    )
    _check(r, "gitax mesh trie CLI")
    assert ref_out == _cli_output_line(r)


@pytest.fixture(scope="session")
def hires_ref_tsv(ws_ext):
    payload = {
        "type": "test_git_inference_single_tsv",
        "image_tsv": "img_wide.tsv",
        "model_name": E.HIRES_MODEL_NAME,
        "question_tsv": None,
        "out_tsv": "ref.hires.tsv",
    }
    r = E.run_reference_cli(ws_ext["ws"], ws_ext["hf_home"], "inference", payload)
    _check(r, "reference hires CLI")
    return op.join(ws_ext["ws"], "ref.hires.tsv")


def test_hires_minmax_mesh_cli_byte_parity(ws_ext, hires_ref_tsv):
    """MinMax/high-res family through the CLI mesh path vs the reference
    CLI: ragged exact-grid buckets (1-3 rows) all pad up to the mesh's
    data axis — bytes must still match (VERDICT r4 next #1a at the CLI
    surface)."""
    payload = {
        "type": "test_git_inference_single_tsv",
        "image_tsv": "img_wide.tsv",
        "model_name": E.HIRES_MODEL_NAME,
        "question_tsv": None,
        "out_tsv": "gitax.hires.mesh.tsv",
        "dtype": "float32",
        "use_native": False,
        "batch_size": 4,
        "mesh_shape": [4, 2],
    }
    r = E.run_gitax_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference", payload,
        extra_env=MESH_ENV,
    )
    _check(r, "gitax mesh hires CLI")
    a = _read(hires_ref_tsv)
    b = _read(op.join(ws_ext["ws"], "gitax.hires.mesh.tsv"))
    assert a and a == b


def test_trie_second_image_cli_parity(ws_ext):
    """Same, on the second demo image (different winning class path
    through the trie exercises multi-token names)."""
    payload = {
        "type": "test_git_inference_single_image",
        "image_path": op.join(E.REFERENCE_ROOT, "aux_data", "images", "2.jpg"),
        "model_name": E.MODEL_NAME,
        "prefix": "",
    }
    r = E.run_reference_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference", payload,
        extra_env={"REF_TRIE": "1"},
    )
    _check(r, "reference trie CLI (2)")
    ref_out = _cli_output_line(r)
    r = E.run_gitax_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference",
        dict(payload, vocab_file=ws_ext["imagenet_names"]),
    )
    _check(r, "gitax trie CLI (2)")
    assert ref_out == _cli_output_line(r)


def test_hires_minmax_tsv_byte_parity(ws_ext, hires_ref_tsv):
    """MinMaxResizeForTest family (test_respect_ratio_max param,
    reference inference.py:29-64,112-117): NON-square inputs with odd
    sizes -> aspect-preserving resize, runtime pos-emb interpolation,
    patch-remainder truncation — caption TSVs byte-identical."""
    payload = {
        "type": "test_git_inference_single_tsv",
        "image_tsv": "img_wide.tsv",
        "model_name": E.HIRES_MODEL_NAME,
        "question_tsv": None,
    }
    r = E.run_gitax_cli(
        ws_ext["ws"], ws_ext["hf_home"], "inference",
        dict(payload, out_tsv="gitax.hires.tsv", dtype="float32",
             use_native=False, batch_size=3),
    )
    _check(r, "gitax hires CLI")
    a = _read(hires_ref_tsv)
    b = _read(op.join(ws_ext["ws"], "gitax.hires.tsv"))
    assert a, "reference produced an empty hires TSV"
    caps = [json.loads(line.split(b"\t")[1])[0]["caption"]
            for line in a.strip().split(b"\n")]
    assert len(caps) == 6 and all(len(c.split()) >= 3 for c in caps), caps
    assert a == b


@pytest.mark.skipif(
    not os.environ.get("GITAX_E2E_FULL"),
    reason="GIT_BASE-scale dual run is slow (minutes); set GITAX_E2E_FULL=1",
)
def test_full_scale_git_base_caption_byte_parity(tmp_path_factory):
    """GIT_BASE-SIZED dual run (VERDICT r2 next #1d): real ViT-B/16
    geometry (12 layers, width 768, 224 px), the reference's default
    6-layer/768 decoder, 30522 vocab — catches scale-dependent
    numerics/shape bugs the 96-px toy cannot.  Caption TSVs must be
    byte-identical."""
    ws = E.build_full_scale_workspace(
        str(tmp_path_factory.mktemp("e2e_full_ws"))
    )
    payload = {
        "type": "test_git_inference_single_tsv",
        "image_tsv": "img.tsv",
        "model_name": E.FULL_MODEL_NAME,
        "question_tsv": None,
    }
    r = E.run_reference_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, out_tsv="ref.caption.tsv"), timeout=3600,
    )
    _check(r, "reference full-scale caption CLI")
    r = E.run_gitax_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, out_tsv="gitax.caption.tsv", dtype="float32",
             use_native=False, batch_size=4), timeout=3600,
    )
    _check(r, "gitax full-scale caption CLI")
    a = _read(op.join(ws["ws"], "ref.caption.tsv"))
    b = _read(op.join(ws["ws"], "gitax.caption.tsv"))
    assert a, "reference produced an empty caption TSV"
    caps = [json.loads(line.split(b"\t")[1])[0]["caption"]
            for line in a.strip().split(b"\n")]
    assert all(len(c.split()) >= 3 for c in caps), caps
    assert a == b
    # GIT_BASE-scale MESH run (VERDICT r4 next #1c): the same CLI over an
    # 8-virtual-device DP mesh must also match the reference byte-for-byte
    # — real ViT-B/16 geometry exercises shardings the 96-px toy cannot.
    r = E.run_gitax_cli(
        ws["ws"], ws["hf_home"], "inference",
        dict(payload, out_tsv="gitax.caption.mesh.tsv", dtype="float32",
             use_native=False, batch_size=4, mesh_shape=[4, 2]),
        timeout=3600,
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    _check(r, "gitax full-scale mesh caption CLI")
    assert a == _read(op.join(ws["ws"], "gitax.caption.mesh.tsv"))


def test_native_eval_runs_on_e2e_outputs(ws, caption_outputs):
    """gitax evaluate_on_coco_caption over the (byte-identical) caption
    TSV + the gt TSV: all native metrics present and sane.  The
    reference's own metric computation needs pycocotools/pycocoevalcap
    (unavailable offline) — the conversion stages it shares are compared
    byte-for-byte above."""
    ref_tsv, _ = caption_outputs
    from gitax.evalcap.evaluate import evaluate_on_coco_caption

    out = op.join(ws["ws"], "e2e.eval.json")
    res = evaluate_on_coco_caption(ref_tsv, op.join(ws["ws"], "gt.caption.tsv"), out)
    assert {"Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"} <= set(res)
    for k, val in res.items():
        assert 0.0 <= val <= 10.0, (k, val)
    assert op.isfile(out)
