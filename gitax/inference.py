"""Inference CLI — mirrors the reference's public entry-point surface
(reference inference.py): the `-p "{'type': <function>, ...}"` YAML
dispatch convention and the same function names, so reference commands
run verbatim with the module swapped:

    python -m gitax.inference -p "{'type': 'test_git_inference_single_image',
        'image_path': 'aux_data/images/1.jpg', 'model_name': 'GIT_BASE',
        'prefix': ''}"
"""

from __future__ import annotations

import json
import logging
import os.path as op

import numpy as np

from .common import (
    dispatch_main,
    get_mpi_rank,
    get_mpi_size,
    json_dump,
    load_from_yaml_file,
    write_to_file,
)
from .io.image import load_image
from .io.tsv import tsv_reader
from .preprocess import get_image_transform
from .tokenization import BertTokenizer


def _load_param(model_name):
    """parameter.yaml for a model: from aux_data/ if present, else the
    built-in zoo table (reference inference.py:68-70)."""
    yaml_path = "aux_data/models/{}/parameter.yaml".format(model_name)
    if op.isfile(yaml_path):
        return load_from_yaml_file(yaml_path)
    from .models.config import MODEL_ZOO, get_model_param

    if model_name in MODEL_ZOO:
        return get_model_param(model_name)
    return {}


def _load_tokenizer():
    try:
        return BertTokenizer.bert_base_uncased()
    except FileNotFoundError:
        logging.warning(
            "bert-base-uncased vocab.txt not found; falling back to the "
            "built-in test vocabulary — decoded text will NOT match the "
            "published checkpoints"
        )
        from .tokenization import build_tiny_vocab

        return BertTokenizer(build_tiny_vocab())


def _build_model(model_name, param, dtype=None):
    """Model + params: converted torch checkpoint when available
    (output/{model}/snapshot/model.pt, reference inference.py:84-86),
    else random init with a warning."""
    import jax
    import jax.numpy as jnp

    from .ckpt import convert_git_state_dict, load_torch_checkpoint
    from .models import GitModel

    model = GitModel.from_param(param)
    ckpt_path = "output/{}/snapshot/model.pt".format(model_name)
    if op.isfile(ckpt_path):
        logging.info("loading %s", ckpt_path)
        sd = load_torch_checkpoint(ckpt_path)
        # the checkpoint defines the true encoder architecture (the
        # reference derives it from the CLIP archive shapes,
        # CLIP/model.py:402-425); override the zoo/param-derived encoder
        # when the shapes disagree so non-standard checkpoints load
        if any(k.startswith("image_encoder.conv1.") for k in sd):
            import dataclasses

            from .ckpt.torch_convert import infer_visual_config

            kind, enc = infer_visual_config(sd, prefix="image_encoder.")
            if kind == "vit":
                enc = dataclasses.replace(
                    enc, fast_softmax=model.cfg.encoder.fast_softmax
                )
            if kind == "vit" and enc != model.cfg.encoder:
                logging.info(
                    "encoder config from checkpoint: %s (param said %s)",
                    enc, model.cfg.encoder,
                )
                model = GitModel(dataclasses.replace(model.cfg, encoder=enc))
        params = convert_git_state_dict(sd, model.cfg)
    else:
        logging.warning(
            "checkpoint %s not found; using random init (outputs are "
            "mechanically valid but not meaningful)",
            ckpt_path,
        )
        # ONE compiled program, not hundreds of eager initializer ops —
        # on the remote-TPU relay each eager op pays a full round trip
        # (~14 ms), which made eager init the dominant CLI start cost
        # (measured: 76 s eager vs <2 s jitted on the axon backend)
        params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    if dtype is not None:
        cast = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype), t
            )
        )
        params = cast(params)
    return model, params


def test_git_inference_single_image(image_path, model_name, prefix="",
                                    vocab_file=None, mesh_shape=None):
    """Single image/video caption or QA (reference inference.py:67-109).

    vocab_file: optional path to a class-name list (one per line, e.g.
    aux_data/imagenet/imagenet_unique_readable_names.txt) — switches to
    trie-constrained classification decoding (the reference's
    commented-in option, model.py:42-48).

    mesh_shape: int N or [data, model] — run the (beam OR trie) decode
    as one SPMD program over an N-chip jax.sharding.Mesh, same contract
    as test_git_inference_single_tsv: params TP-shard over 'model', the
    batch row replicates over 'data' padding slots (B=1 here), and the
    output is row 0 — token-identical to the single-device run."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from .decode import BeamSearchConfig

    param = _load_param(model_name)
    tokenizer = _load_tokenizer()
    if isinstance(image_path, str):
        image_path = [image_path]
    transform = get_image_transform(param)
    imgs = np.stack([transform(load_image(p)) for p in image_path])

    model, params = _build_model(model_name, param)
    mesh = None
    if mesh_shape is not None:
        from .parallel import make_mesh_from_shape, shard_params

        mesh = make_mesh_from_shape(mesh_shape)
        params = shard_params(params, mesh)
    # high-res models (MinMaxResizeForTest) produce dimensions that are
    # not patch multiples; the reference's strided patchify conv simply
    # truncates the remainder pixels (CLIP/model.py:221), so do the same
    # (the TSV engine's dispatch_varshape already does)
    p = model.cfg.encoder.patch_size
    h, w = (imgs.shape[1] // p) * p, (imgs.shape[2] // p) * p
    imgs = imgs[:, :h, :w]
    if len(image_path) > 1:
        images = jnp.asarray(imgs)[None]  # [1, F, H, W, 3] video frames
    else:
        images = jnp.asarray(imgs)  # [1, H, W, 3]

    from .tokenization import encode_prefix

    input_ids = encode_prefix(tokenizer, prefix, max_text_len=40)
    prefix_ids = jnp.asarray([input_ids], jnp.int32)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            # every data shard needs equal rows: replicate the one real
            # row into the padding slots (dispatch_device_batch's rule)
            d = mesh.shape["data"]
            x = jnp.concatenate([x] * d, axis=0)
            return jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )

        images, prefix_ids = put(images), put(prefix_ids)
    ctx = (
        jax.sharding.set_mesh(mesh) if mesh is not None
        else contextlib.nullcontext()
    )

    # jit the WHOLE generate: eagerly the encoder alone is ~200 op
    # dispatches x ~14 ms relay round trip on the remote-TPU backend;
    # as one jitted program it is one dispatch, and the persistent
    # compile cache (enable_compile_cache) makes the compile a one-time
    # per-machine cost
    with ctx:
        if vocab_file:
            from .common import load_list_file
            from .decode import build_vocab_trie

            trie = build_vocab_trie(tokenizer, load_list_file(vocab_file))

            @jax.jit
            def gen_trie(p, im, pref):
                return model.generate(p, im, pref, mode="trie", trie=trie)

            seqs, _ = gen_trie(params, images, prefix_ids)
        else:
            beam = BeamSearchConfig(num_beams=4, max_steps=1024)

            @jax.jit
            def gen_beam(p, im, pref):
                return model.generate(p, im, pref, beam=beam)

            seqs, _ = gen_beam(params, images, prefix_ids)
    cap = tokenizer.decode(np.asarray(seqs)[0].tolist(), skip_special_tokens=True)
    logging.info("output: %s", cap)
    return cap


def test_git_inference_single_tsv(image_tsv, model_name, question_tsv, out_tsv,
                                  batch_size=32, dtype="bfloat16",
                                  use_native=None, int8=False,
                                  mesh_shape=None):
    """Sharded batch inference over a base64-image TSV
    (reference inference.py:134-225), batched on device.

    dtype: 'bfloat16' (production) or 'float32' (bit-parity with the
    torch reference).  use_native: force the native C++ decode path on
    (True) / off (False, exact PIL preprocessing) / auto (None).
    int8: weight-only int8 decoder/vocab matmuls (fastest; near-tie
    beams may pick different tokens than full precision).
    mesh_shape: int N or [data, model] — run the engine as one SPMD
    program over an N-chip mesh (all local chips share one process),
    replacing the reference's one-process-per-GPU mpirun pattern
    (inference.py:157-169); the rank/world row sharding still applies
    across HOSTS."""
    import jax.numpy as jnp

    from .decode import BeamSearchConfig
    from .runtime import CaptionEngine

    param = {}
    if op.isfile("output/{}/parameter.yaml".format(model_name)):
        param = load_from_yaml_file("output/{}/parameter.yaml".format(model_name))
    else:
        param = _load_param(model_name)
    mesh = None
    if mesh_shape is not None:
        from .parallel import make_mesh_from_shape

        mesh = make_mesh_from_shape(mesh_shape)
    jdtype = jnp.dtype(dtype)
    tokenizer = _load_tokenizer()
    model, params = _build_model(model_name, param, dtype=jdtype)
    engine = CaptionEngine(
        model,
        params,
        tokenizer,
        get_image_transform(param),
        batch_size=batch_size,
        beam=BeamSearchConfig(num_beams=4, max_steps=40),
        dtype=jdtype,
        use_native=use_native,
        int8=int8,
        mesh=mesh,
    )
    rank, world = get_mpi_rank(), get_mpi_size()
    if question_tsv:
        engine.run_vqa_tsv(image_tsv, question_tsv, out_tsv, rank, world)
    else:
        engine.run_caption_tsv(image_tsv, out_tsv, rank, world)


def convert_tsv_to_vqa_json(predict_file, out_json):
    """(reference inference.py:227-229)"""
    result = [json.loads(row[0]) for row in tsv_reader(predict_file)]
    write_to_file(json_dump(result), out_json)


def convert_tsv_to_coco_format(res_tsv, outfile, sep="\t", key_col=0, cap_col=1):
    """(reference inference.py:231-252)"""
    results = []
    with open(res_tsv) as fp:
        for line in fp:
            parts = line.strip().split(sep)
            key = parts[key_col]
            if cap_col < len(parts):
                caps = json.loads(parts[cap_col]) or [{"caption": ""}]
                assert len(caps) == 1, "cannot evaluate multiple captions per image"
                cap = caps[0]["caption"]
            else:
                cap = ""
            results.append({"image_id": key, "caption": cap})
    with open(outfile, "w") as fp:
        json.dump(results, fp)


def iter_caption_to_json(iter_caption, json_file):
    """gt caption TSV -> COCO annotation json (reference
    inference.py:254-275)."""
    key_captions = [(key, json.loads(p)) for key, p in iter_caption]
    info = {
        "info": "dummy",
        "licenses": "dummy",
        "type": "captions",
        "images": [{"file_name": k, "id": k} for k, _ in key_captions],
    }
    annotations = []
    for k, caps in key_captions:
        for cap in caps:
            annotations.append(
                {"image_id": k, "caption": cap["caption"], "id": len(annotations)}
            )
    info["annotations"] = annotations
    write_to_file(json.dumps(info), json_file)


def evaluate_on_coco_caption(res_file, label_file, outfile=None):
    """COCO caption metrics (reference inference.py:277-313).  Uses
    pycocoevalcap when installed (BLEU/METEOR/ROUGE/CIDEr/SPICE); else
    gitax's native scorers (BLEU/ROUGE-L/CIDEr-D)."""
    from .evalcap import evaluate_on_coco_caption as _eval

    return _eval(res_file, label_file, outfile)


if __name__ == "__main__":
    dispatch_main(globals())
