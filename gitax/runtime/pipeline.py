"""Batched TSV inference runtime.

The reference's distributed batch inference (inference.py:134-225) runs
batch-size-1 forwards and scales by mpirun process count, with a
filesystem barrier.  The gitax engine is TPU-native:

  * rows are range-sharded per process exactly like the reference
    (ceil(N/W) contiguous rows per rank, inference.py:157-169), so
    multi-host runs stay embarrassingly parallel over hosts,
  * within a host, images are decoded/preprocessed by a host thread pool
    that PREFETCHES ahead of the device, and captions run as one jitted
    batched beam search per fixed-size batch (padded at the tail) — the
    device never waits on Python between steps,
  * VQA prefixes are BUCKETED by token length so every compiled program
    sees a static [B, Tp] shape (the reference simply asserts B == 1,
    decoder.py:988),
  * per-rank output shards and the rank-0 wait+concat barrier keep the
    reference's on-disk contract (out.{rank}.{world}.tsv,
    inference.py:213-225).
"""

from __future__ import annotations

import collections
import json
import logging
import os
import os.path as op
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..common import json_dump
from ..decode import BeamSearchConfig
from ..io import fileio
from ..io.image import image_from_base64
from ..io.tsv import TSVFile, concat_tsv_files, tsv_writer
from ..models.git import GitModel


def shard_range(total: int, rank: int, world_size: int) -> Tuple[int, int]:
    """Contiguous ceil-split row range (reference inference.py:165-169)."""
    per = (total + world_size - 1) // world_size
    start = per * rank
    return start, min(start + per, total)


def wait_and_concat_shards(out_tsv: str, world_size: int,
                           poll_s: Optional[float] = None,
                           timeout_s: Optional[float] = None):
    """Rank-0 filesystem barrier + concat (reference inference.py:214-225),
    with an optional timeout instead of the reference's infinite wait.

    Defaults come from GITAX_SHARD_POLL_S (5s) and
    GITAX_SHARD_WAIT_TIMEOUT_S (unset: wait forever, like the reference)
    so multi-process CLI launches can bound the barrier without code
    changes."""
    if poll_s is None:
        poll_s = float(os.environ.get("GITAX_SHARD_POLL_S", "5"))
    if timeout_s is None:
        env_t = os.environ.get("GITAX_SHARD_WAIT_TIMEOUT_S")
        timeout_s = float(env_t) if env_t else None
    shards = [
        "{}.{}.{}.tsv".format(out_tsv, r, world_size) for r in range(world_size)
    ]
    deadline = None if timeout_s is None else time.time() + timeout_s
    while True:
        # the shards are WRITTEN through the fileio backend seam, so the
        # barrier must poll through it too (a remote backend's files
        # never exist as local paths)
        missing = [s for s in shards if not fileio.isfile(s)]
        if not missing:
            break
        if deadline and time.time() > deadline:
            raise TimeoutError("missing shards: {}".format(missing))
        logging.info("waiting for %s", ",".join(missing))
        time.sleep(poll_s)
    concat_tsv_files(shards, out_tsv)


def finish_shards(out_tsv: str, rank: int, world_size: int):
    """Post-shard-write sync + rank-0 concat.

    When `jax.distributed` is live the sync is the TPU-native collective
    barrier (distributed.barrier — every rank's shard file is closed
    before it enters, so rank 0 can concat immediately, no polling).
    Otherwise it falls back to the reference's poll-the-filesystem
    barrier (inference.py:214-225) so plain mpirun/env-var launches keep
    working unchanged."""
    if world_size <= 1:
        return
    from . import distributed

    if distributed.is_active():
        distributed.barrier("gitax_tsv_shards:" + op.basename(out_tsv))
        if rank == 0:
            shards = [
                "{}.{}.{}.tsv".format(out_tsv, r, world_size)
                for r in range(world_size)
            ]
            concat_tsv_files(shards, out_tsv)
    elif rank == 0:
        wait_and_concat_shards(out_tsv, world_size)


class CaptionEngine(object):
    """Batched caption/VQA engine around a GitModel."""

    def __init__(
        self,
        model: GitModel,
        params,
        tokenizer,
        transform,
        batch_size: int = 32,
        beam: Optional[BeamSearchConfig] = None,
        dtype=jnp.bfloat16,
        max_text_len: int = 40,
        decode_workers: int = 8,
        use_native: Optional[bool] = None,
        int8: bool = False,
        fast_prefill: Optional[bool] = None,
        decode_kernel: Optional[bool] = None,
        mesh=None,
    ):
        self.model = model
        if int8:
            # weight-only int8 decoder/vocab matmuls (gitax.ops.quant):
            # ~half the per-step HBM traffic; output tokens can differ
            # from full precision in near-tie beams
            from ..ops.quant import quantize_git_params

            params = quantize_git_params(params)
        # production fast mode: bf16 prefill score math rides with int8
        # (both trade exactness); override with fast_prefill=True when
        # passing pre-quantized params
        self._fast_prefill = bool(int8) if fast_prefill is None else bool(fast_prefill)
        # fused Pallas decode-step attention (ops/decode_attention.py):
        # auto-on for real TPU backends, token-exact with the XLA path.
        # (decode_kernel='int8' additionally quantizes the prefill
        # memory K/V — measured neutral on v5e, the in-kernel dequant
        # costs back the halved DMA; available for bandwidth-poorer
        # parts.)
        if decode_kernel is None:
            from ..ops.flash_attention import use_pallas

            decode_kernel = use_pallas()
            # Mosaic tiles the lane (last) dim at 128: the kernel's
            # fused-KV layout slices [.., 2*head_dim] per head, so
            # head_dim must be a multiple of 64 (every published GIT
            # model is 64; toy/custom configs fall back to the
            # token-exact XLA path instead of a Mosaic compile error)
            head_dim = model.cfg.hidden_size // model.cfg.num_heads
            if decode_kernel and head_dim % 64 != 0:
                logging.info(
                    "decode kernel disabled: head_dim %d not 64-aligned",
                    head_dim,
                )
                decode_kernel = False
        self._decode_kernel = decode_kernel
        # SPMD over a jax.sharding.Mesh: batches shard over the 'data'
        # axis (params replicated, or TP-sharded over 'model'), so ONE
        # jitted program drives every chip — the TPU-native replacement
        # for the reference's mpirun-times-8 process sharding
        # (inference.py:157-169; SURVEY.md §2 parallelism table).  The
        # per-process TSV row sharding above this still applies across
        # HOSTS; the mesh scales the chips within one.
        self.mesh = mesh
        if mesh is not None:
            d = mesh.shape["data"]
            assert batch_size % d == 0, (
                "batch_size %d must divide over the mesh data axis %d"
                % (batch_size, d)
            )
            from ..parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.tokenizer = tokenizer
        self.transform = transform
        self.batch_size = batch_size
        self.beam = beam or BeamSearchConfig(num_beams=4, max_steps=40)
        self.dtype = dtype
        self.max_text_len = max_text_len
        self.pool = ThreadPoolExecutor(max_workers=decode_workers)
        self._jitted = {}
        # native C++ decode path (fixed resize+crop AND MinMax variants);
        # normalization then runs fused on device and the host->device
        # transfer is uint8 (4x smaller).  The MinMax engine is otherwise
        # PIL-decode-bound (15.2 img/s native vs 10.8 PIL on a 1-vCPU
        # host, measured round 2).
        if use_native is None:
            from .. import native

            use_native = native.available()
        self.use_native = use_native

    # -- compiled programs, one per (prefix_len, image_hw) ---------------
    def _caption_fn(self, prefix_len: int, hw):
        key = (prefix_len, hw)
        if key not in self._jitted:
            model, dtype = self.model, self.dtype
            # buffer sized per prefix bucket; length-norm keeps the
            # reference's 1024 constant for is_done parity
            import dataclasses

            beam = dataclasses.replace(
                self.beam,
                max_steps=max(self.beam.max_steps, prefix_len + self.max_text_len),
                norm_max_length=self.beam.norm_max_length
                or max(self.beam.max_steps, 1024),
            )

            from ..preprocess.transforms import CLIP_MEAN, CLIP_STD

            # fused normalization must use the transform's configured
            # constants (a TestTransform may carry IMAGENET or custom
            # mean/std), falling back to CLIP only if absent
            mean = jnp.asarray(getattr(self.transform, "mean", CLIP_MEAN))
            std = jnp.asarray(getattr(self.transform, "std", CLIP_STD))

            @jax.jit
            def fn(params, images, prefix):
                if images.dtype == jnp.uint8:
                    # fused on-device normalization for the native path
                    x = images.astype(dtype) / 255.0
                    images = (x - mean.astype(dtype)) / std.astype(dtype)
                return model.generate(
                    params, images, prefix, beam=beam, dtype=dtype,
                    fast_prefill=self._fast_prefill,
                    decode_kernel=self._decode_kernel,
                )

            self._jitted[key] = fn
        return self._jitted[key]

    # -- host-side preprocessing ------------------------------------------
    def _decode_row(self, b64):
        img = image_from_base64(b64)
        if img is None:
            return None
        return self.transform(img)

    def _decode_chunk(self, payloads):
        """Decode a list of base64 payloads to a list of arrays (None for
        failures).  Native C++ path when enabled, PIL fallback per row
        (e.g. PNG payloads — libjpeg only handles JPEG)."""
        if not self.use_native:
            return [self._decode_row(p) for p in payloads]
        from .. import native
        from ..preprocess.transforms import (
            center_crop,
            min_max_resize,
            resize_shorter,
        )

        raw = [p.encode() if isinstance(p, str) else p for p in payloads]
        crop = self.transform.crop_size
        ratio_max = getattr(self.transform, "respect_ratio_max", None)
        if ratio_max is not None:
            # MinMax (high-res) family: ragged aspect-preserving outputs
            decoded = native.decode_minmax_batch(raw, crop, ratio_max)
        else:
            arrs, ok = native.decode_resize_crop_batch(raw, crop)
            decoded = [arrs[i] if good else None for i, good in enumerate(ok)]
        out = []
        for i, arr in enumerate(decoded):
            if arr is not None:
                out.append(arr)
                continue
            # PIL fallback per row (e.g. PNG payloads)
            img = image_from_base64(payloads[i])
            if img is None:
                out.append(None)
            elif ratio_max is not None:
                out.append(np.asarray(min_max_resize(img, crop, ratio_max), np.uint8))
            else:
                out.append(
                    np.asarray(center_crop(resize_shorter(img, crop), crop), np.uint8)
                )
        return out

    def encode_prefix(self, text: str) -> List[int]:
        """[CLS] + last (max_text_len-2) question tokens
        (reference inference.py:92-101; shared helper in tokenization)."""
        from ..tokenization import encode_prefix

        return encode_prefix(self.tokenizer, text, self.max_text_len)

    # -- variable-resolution batching --------------------------------------
    def dispatch_varshape(self, images: List[np.ndarray], prefixes: List[List[int]]):
        """Asynchronously dispatch generation over images of varying
        shapes (the MinMaxResizeForTest models, reference
        inference.py:29-64): images are truncated to patch multiples —
        exactly what the reference's strided patchify conv does to
        remainder pixels — and grouped into exact-grid buckets, each
        running as one static-shape program with runtime pos-embedding
        interpolation (CLIP/model.py:245-251).

        Returns an opaque handle; resolve() blocks on the device and
        detokenizes.  jax dispatch is async, so callers can overlap
        host work for batch i with device compute for batch i+1."""
        p = self.model.cfg.encoder.patch_size
        groups = collections.defaultdict(list)
        for i, a in enumerate(images):
            h, w = (a.shape[0] // p) * p, (a.shape[1] // p) * p
            groups[(h, w)].append(i)
        dispatched = []
        for (h, w), idxs in sorted(groups.items()):
            seqs = self._dispatch_batch(
                [images[i][:h, :w] for i in idxs], [prefixes[i] for i in idxs]
            )
            dispatched.append((idxs, seqs))
        return len(images), dispatched

    def resolve(self, handle):
        n, dispatched = handle
        results = [None] * n
        for idxs, seqs in dispatched:
            arr = np.concatenate([np.asarray(s) for s in seqs], axis=0)[: len(idxs)]
            for i, row in zip(idxs, arr):
                results[i] = self.tokenizer.decode(
                    row.tolist(), skip_special_tokens=True
                )
        return results

    def generate_varshape(self, images, prefixes):
        return self.resolve(self.dispatch_varshape(images, prefixes))

    # -- batched generate --------------------------------------------------
    def dispatch_device_batch(self, imgs: np.ndarray, pref: np.ndarray):
        """Upload ONE same-shape batch and dispatch the jitted beam
        search (async).  imgs: [B,H,W,3] uint8 (native layout, fused
        on-device normalization) or float; pref: [B,Tp] int32.  Returns
        the device sequences array with >= B rows (mesh padding can add
        rows — callers already slice back to their real count).

        This is the single host->device seam: the TSV loops AND the
        serving DynamicBatcher both come through here, so enabling the
        mesh makes every product surface SPMD at once."""
        if imgs.dtype != np.uint8:
            # np.asarray is a no-op when already float32 — _dispatch_batch
            # feeds pre-cast arrays, so avoid a full extra host memcpy on
            # the host-bound e2e path
            imgs = np.asarray(imgs, np.float32)
        pref = np.asarray(pref, np.int32)
        fn = self._caption_fn(pref.shape[1], imgs.shape[1:3])
        if self.mesh is None:
            dev_imgs = (
                jnp.asarray(imgs)
                if imgs.dtype == np.uint8
                else jnp.asarray(imgs, self.dtype)
            )
            seqs, _ = fn(self.params, dev_imgs, jnp.asarray(pref))
            return seqs
        from jax.sharding import NamedSharding, PartitionSpec as P

        d = self.mesh.shape["data"]
        pad_n = (-len(imgs)) % d
        if pad_n:  # every data shard needs equal rows
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad_n, axis=0)])
            pref = np.concatenate([pref, np.repeat(pref[-1:], pad_n, axis=0)])
        if imgs.dtype != np.uint8:
            # cast on host so the transfer is already activation-width
            imgs = np.asarray(imgs, self.dtype)

        def sharding(nd):
            return NamedSharding(self.mesh, P("data", *([None] * (nd - 1))))

        dev_imgs = jax.device_put(imgs, sharding(imgs.ndim))
        dev_pref = jax.device_put(pref, sharding(2))
        with jax.sharding.set_mesh(self.mesh):
            seqs, _ = fn(self.params, dev_imgs, dev_pref)
        return seqs

    def _dispatch_batch(self, images: List[np.ndarray], prefixes: List[List[int]]):
        """Dispatch same-shape images to the device (async); returns a
        list of device sequence arrays covering >= len(images) rows."""
        n = len(images)
        assert n > 0
        b = self.batch_size
        tp = len(prefixes[0])
        assert all(len(p) == tp for p in prefixes)
        pad_n = (-n) % b
        imgs = np.stack(images + [images[-1]] * pad_n)
        if imgs.dtype != np.uint8:
            imgs = np.asarray(imgs, np.float32)
        pref = np.asarray(prefixes + [prefixes[-1]] * pad_n, np.int32)
        outs = []
        for i in range(0, len(imgs), b):
            outs.append(self.dispatch_device_batch(imgs[i : i + b], pref[i : i + b]))
        return outs

    def generate_batch(self, images: List[np.ndarray], prefixes: List[List[int]]):
        """images: list of HWC arrays (same shape); prefixes: same length
        each.  Returns list of decoded strings."""
        seqs = self._dispatch_batch(images, prefixes)
        arr = np.concatenate([np.asarray(s) for s in seqs], axis=0)[: len(images)]
        return [
            self.tokenizer.decode(s.tolist(), skip_special_tokens=True) for s in arr
        ]

    def _prefetched_chunks(self, image_tsv, idxs, granule, depth=2):
        """Iterate (chunk_row_indices, decoded_arrays) with `depth`
        chunks of host decode in flight on the thread pool while the
        device runs — the host stage shared by both TSV loops."""
        chunks = [idxs[i : i + granule] for i in range(0, len(idxs), granule)]
        futures = collections.deque()

        def submit(batch_idxs):
            payloads = [image_tsv[j][1] for j in batch_idxs]
            futures.append(
                (batch_idxs, self.pool.submit(self._decode_chunk, payloads))
            )

        for c in chunks[:depth]:
            submit(c)
        ci = depth
        while futures:
            batch_idxs, fut = futures.popleft()
            decoded = fut.result()
            if ci < len(chunks):
                submit(chunks[ci])
                ci += 1
            yield batch_idxs, decoded

    # -- TSV caption pipeline ---------------------------------------------
    def run_caption_tsv(self, image_tsv_path, out_tsv, rank=0, world_size=1):
        image_tsv = TSVFile(image_tsv_path)
        start, end = shard_range(len(image_tsv), rank, world_size)
        cur_out = (
            "{}.{}.{}.tsv".format(out_tsv, rank, world_size)
            if world_size > 1
            else out_tsv
        )
        cls = self.tokenizer.cls_token_id

        def rows():
            from .profiling import ThroughputMeter

            idxs = list(range(start, end))
            meter = ThroughputMeter(name="caption_tsv", unit="images")
            # three-stage pipeline: host decode of chunk i+1 (thread pool)
            # || device beam search of chunk i (async jax dispatch) ||
            # detokenization of chunk i-1 (this thread)
            pending = None  # (keys, dispatch handle)
            for batch_idxs, decoded in self._prefetched_chunks(
                image_tsv, idxs, self.batch_size
            ):
                arrs, keys = [], []
                for j, a in zip(batch_idxs, decoded):
                    if a is not None:
                        arrs.append(a)
                        keys.append(image_tsv.get_key(j))
                handle = (
                    self.dispatch_varshape(arrs, [[cls]] * len(arrs))
                    if arrs
                    else None
                )
                if pending is not None:
                    pkeys, phandle = pending
                    for k, cap in zip(pkeys, self.resolve(phandle)):
                        yield k, json_dump([{"caption": cap}])
                    meter.update(len(pkeys))
                pending = (keys, handle) if handle is not None else None
            if pending is not None:
                pkeys, phandle = pending
                for k, cap in zip(pkeys, self.resolve(phandle)):
                    yield k, json_dump([{"caption": cap}])
                meter.update(len(pkeys))

        tsv_writer(rows(), cur_out)
        finish_shards(out_tsv, rank, world_size)

    # -- TSV VQA pipeline ---------------------------------------------------
    def run_vqa_tsv(self, image_tsv_path, question_tsv_path, out_tsv,
                    rank=0, world_size=1):
        """Batched VQA over aligned image/question TSVs.

        Pipelined like the caption path: images are decoded ONCE each by
        the prefetching thread pool while the device runs, (image,
        prefix) pairs are bucketed by prefix length so every compiled
        program sees a static [B, Tp] shape, full buckets dispatch
        asynchronously, and answers are emitted in the REFERENCE row
        order — image-major, question order within an image
        (inference.py:178-199) — so output TSVs match byte-for-byte.
        """
        image_tsv = TSVFile(image_tsv_path)
        question_tsv = TSVFile(question_tsv_path)
        assert len(image_tsv) == len(question_tsv)
        start, end = shard_range(len(image_tsv), rank, world_size)
        cur_out = (
            "{}.{}.{}.tsv".format(out_tsv, rank, world_size)
            if world_size > 1
            else out_tsv
        )

        def rows():
            idxs = list(range(start, end))
            dchunk = max(1, self.batch_size // 4)  # decode-prefetch granule
            buckets = {}  # tp -> (arrays, prefixes, [(order, qid)])
            # dispatched-but-unresolved handles, BOUNDED: each handle
            # pins its input batch in device HBM until resolved, so an
            # unbounded list would grow the device-side backlog with the
            # shard (the caption path keeps exactly one pending)
            pending = collections.deque()
            max_inflight = 2
            results = {}
            order = 0

            def drain(to_len):
                while len(pending) > to_len:
                    handle, meta = pending.popleft()
                    for (pos, qid), ans in zip(meta, self.resolve(handle)):
                        results[pos] = (qid, ans)

            for batch_idxs, decoded in self._prefetched_chunks(
                image_tsv, idxs, dchunk
            ):
                for i, arr in zip(batch_idxs, decoded):
                    ik = image_tsv.get_key(i)
                    qrow = question_tsv[i]
                    # key alignment (inference.py:176)
                    assert ik == qrow[0], (ik, qrow[0])
                    questions = json.loads(qrow[1])
                    if arr is None:
                        order += len(questions)
                        continue
                    for q in questions:
                        prefix = self.encode_prefix(q["question"])
                        b = buckets.setdefault(len(prefix), ([], [], []))
                        b[0].append(arr)
                        b[1].append(prefix)
                        b[2].append((order, q["question_id"]))
                        order += 1
                        if len(b[0]) == self.batch_size:
                            pending.append(
                                (self.dispatch_varshape(b[0], b[1]), b[2])
                            )
                            buckets[len(prefix)] = ([], [], [])
                            drain(max_inflight)
            for tp in sorted(buckets):
                arrs, prefs, meta = buckets[tp]
                if arrs:
                    pending.append((self.dispatch_varshape(arrs, prefs), meta))
            drain(0)
            for pos in sorted(results):
                qid, ans = results[pos]
                yield (json_dump({"answer": ans, "question_id": qid}),)

        tsv_writer(rows(), cur_out)
        finish_shards(out_tsv, rank, world_size)
