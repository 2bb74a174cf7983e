"""Training CLI — mirrors the reference's entry surface (train.py):

    python -m gitax.train -p "{'type': 'forward_backward_example',
        'image_files': [...], 'captions': [...]}"
"""

from __future__ import annotations

import logging
import time

import numpy as np

from .common import dispatch_main
from .io.image import load_image
from .preprocess.train_transforms import (
    TrainTransform,
    collate_samples,
    make_caption_sample,
)


def _tokenizer():
    from .inference import _load_tokenizer

    return _load_tokenizer()


def _build_batch(image_files, captions, prefixs, tokenizer, iteration=0, seed=0):
    transform = TrainTransform(seed=seed)
    samples = [
        make_caption_sample(
            tokenizer, load_image(f), p, t, transform, iteration=iteration
        )
        for f, p, t in zip(image_files, prefixs, captions)
    ]
    return collate_samples(samples)


def forward_backward_example(image_files, captions, prefixs=None):
    """One fwd+bwd step with the GIT_BASE recipe (reference
    train.py:209-244)."""
    import jax
    import jax.numpy as jnp
    import optax

    from .models import GitModel
    from .training import init_train_state, make_train_step

    prefixs = prefixs or [""] * len(captions)
    tokenizer = _tokenizer()
    batch = _build_batch(image_files, captions, prefixs, tokenizer)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = GitModel.from_param({})
    tx = optax.adamw(1e-5)
    state = init_train_state(model, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(model, tx))
    state, metrics = step(state, batch)
    logging.info("loss = %s", float(metrics["loss"]))
    return float(metrics["loss"])


def speed_test_forward_backward(duplicate=32, iterations=1000, dtype="bfloat16",
                                fast_softmax=None, model_name=None,
                                remat=False):
    """Throughput of the train step, batch 2*duplicate, reduced precision
    (reference train.py:246-303 used fp16 on GPU; bf16 + compute-dtype
    score math is the TPU equivalent — the reference's model.half() ran
    the softmax in fp16 too).  fast_softmax defaults to on for bf16.

    model_name picks a zoo config (default: the reference protocol's
    GIT_BASE); GIT_LARGE with duplicate=16 covers the other published
    model size.  remat=True checkpoints the encoder blocks (trades
    FLOPs for activation memory — GIT_LARGE at larger batches)."""
    import jax
    import jax.numpy as jnp
    import optax

    from .models import GitModel
    from .models.config import get_model_param
    from .training import init_train_state, make_train_step

    import os.path as op

    img_dir = (
        "aux_data/images"
        if op.isfile("aux_data/images/1.jpg")
        else "/root/reference/aux_data/images"
    )
    image_files = [op.join(img_dir, "1.jpg"), op.join(img_dir, "2.jpg")] * duplicate
    captions = [
        "a couple of boats in a large body of water.",
        "a view of a mountain with a tree",
    ] * duplicate
    tokenizer = _tokenizer()
    batch = _build_batch(image_files, captions, [""] * len(captions), tokenizer)
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["image"] = batch["image"].astype(compute_dtype)

    model = GitModel.from_param(get_model_param(model_name) if model_name else {})
    tx = optax.adamw(1e-5)
    state = init_train_state(model, jax.random.PRNGKey(0), tx)
    if fast_softmax is None:
        fast_softmax = dtype == "bfloat16"
    # donate the state (the real trainer, finetune.py, does): without
    # donation XLA holds argument AND output copies of the f32
    # params+moments — GIT_LARGE OOMs on 16 GB from that alone
    step = jax.jit(
        make_train_step(model, tx, dtype=compute_dtype,
                        fast_softmax=fast_softmax, remat=remat),
        donate_argnums=(0,),
    )

    # warmup (host transfer forces completion — block_until_ready does not
    # reliably block on relayed TPU backends)
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    bsz = batch["image"].shape[0]
    start = time.time()
    logged_at = 0
    for iteration in range(1, iterations + 1):
        state, metrics = step(state, batch)
        if iteration % 10 == 0:
            loss_now = float(metrics["loss"])  # device sync
            end = time.time()
            window = iteration - logged_at
            logging.info(
                "speed = %.1f images/s (loss %.4f)",
                bsz * window / (end - start), loss_now,
            )
            logged_at = iteration
            start = time.time()
    logging.info("final loss %s", float(metrics["loss"]))


def _load_checkpoint_params(checkpoint, model):
    """Checkpoint dispatch shared by the finetune/SCST CLIs: a reference
    torch `model.pt` (converted on load) or an Orbax directory."""
    if not checkpoint:
        return None
    import jax

    if checkpoint.endswith(".pt"):
        from .ckpt import convert_git_state_dict, load_torch_checkpoint

        return convert_git_state_dict(load_torch_checkpoint(checkpoint), model.cfg)
    from .ckpt.serialization import restore_params

    return restore_params(
        checkpoint, template=model.init_params(jax.random.PRNGKey(0))
    )


def finetune(
    image_tsv,
    caption_tsv,
    model_name="GIT_BASE",
    checkpoint=None,
    num_steps=1000,
    batch_size=8,
    learning_rate=1e-5,
    save_dir=None,
    save_every=500,
    resume=True,
    dtype="bfloat16",
    remat=False,
    data_parallel=None,
    **kwargs,
):
    """Fine-tune a zoo model on a TSV caption dataset (gitax-native; the
    reference leaves the trainer to the user, README.md:235-237).

        python -m gitax.train -p "{'type': 'finetune',
            'image_tsv': 'data/coco/train.img.tsv',
            'caption_tsv': 'data/coco/train.caption.tsv',
            'model_name': 'GIT_BASE_COCO', 'checkpoint':
            'output/GIT_BASE_COCO/snapshot/model.pt', 'num_steps': 10000,
            'save_dir': 'output/ft'}"

    checkpoint accepts a reference torch `model.pt` (converted on load)
    or an Orbax directory.  data_parallel=N shards the batch over the
    first N local devices (ZeRO-1 moments included).
    """
    import jax
    import jax.numpy as jnp

    from .models import GitModel
    from .models.config import get_model_param
    from .training.finetune import run_finetune

    param = get_model_param(model_name) if model_name else {}
    model = GitModel.from_param(param)
    params = _load_checkpoint_params(checkpoint, model)

    mesh = None
    if data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh(data=int(data_parallel), model=1)

    state = run_finetune(
        image_tsv,
        caption_tsv,
        model,
        params=params,
        num_steps=num_steps,
        batch_size=batch_size,
        learning_rate=learning_rate,
        save_dir=save_dir,
        save_every=save_every,
        resume=resume,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        remat=remat,
        mesh=mesh,
        **kwargs,
    )
    logging.info("finetune done at step %d", int(state.step))
    return state


def scst_finetune(
    image_tsv,
    caption_tsv,
    model_name="GIT_BASE",
    checkpoint=None,
    num_steps=1000,
    batch_size=8,
    learning_rate=2e-6,
    save_dir=None,
    **kwargs,
):
    """Self-critical (CIDEr-reward) fine-tuning CLI (gitax-native; the
    reference's SCST path raises NotImplementedError, decoder.py:804-813).

        python -m gitax.train -p "{'type': 'scst_finetune',
            'image_tsv': 'data/coco/train.img.tsv',
            'caption_tsv': 'data/coco/train.caption.tsv',
            'model_name': 'GIT_BASE_COCO',
            'checkpoint': 'output/ft', 'num_steps': 4000,
            'save_dir': 'output/scst'}"
    """
    import jax

    from .models import GitModel
    from .models.config import get_model_param
    from .training.finetune import run_scst

    param = get_model_param(model_name) if model_name else {}
    model = GitModel.from_param(param)
    params = _load_checkpoint_params(checkpoint, model)

    state = run_scst(
        image_tsv,
        caption_tsv,
        model,
        params=params,
        num_steps=num_steps,
        batch_size=batch_size,
        learning_rate=learning_rate,
        save_dir=save_dir,
        **kwargs,
    )
    logging.info("scst_finetune done at step %d", int(state.step))
    return state


if __name__ == "__main__":
    dispatch_main(globals())
