"""GIT model assembly: ViT encoder + unified decoder + task heads.

Mirrors the reference CaptioningModel orchestration (decoder.py:774-1054)
and factory defaults (model.py:9-61): multi-frame encoding with learned
per-frame temporal embeddings and token-axis concat (decoder.py:846-853),
the label-smoothed CE training path with `need_predict` shift-masking
(decoder.py:916-975), and the inference entry that decode/ modules drive.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .config import GitConfig, config_from_param
from .textual import (
    init_textual_params,
    prefill,
    decode_step,
    textual_forward,
)
from .vit import init_vit_params, vit_forward


class GitModel(object):
    """Bundles a GitConfig with pure functions over a params pytree.

    params = {'image_encoder': <vit>, 'textual': <decoder>,
              'img_temporal_embedding': [num_frames, Dv] (video models)}
    """

    def __init__(self, cfg: GitConfig):
        self.cfg = cfg

    @classmethod
    def from_param(cls, param: Optional[dict] = None) -> "GitModel":
        return cls(config_from_param(param))

    # -- params ----------------------------------------------------------
    def init_params(self, key, dtype=jnp.float32):
        k_enc, k_txt = jax.random.split(key)
        params = {
            "image_encoder": init_vit_params(k_enc, self.cfg.encoder, dtype),
            "textual": init_textual_params(k_txt, self.cfg, dtype),
        }
        if self.cfg.num_image_with_embedding:
            params["img_temporal_embedding"] = jnp.zeros(
                (self.cfg.num_image_with_embedding, self.cfg.visual_feature_size),
                dtype,
            )
        return params

    # -- encoder ---------------------------------------------------------
    def encode_images(self, params, images, dtype=jnp.float32, flash=None,
                      fast=None, remat=False):
        """images: [B,H,W,3] single image, or [B,F,H,W,3] video frames.

        Video frames are encoded per frame, each offset by its learned
        temporal embedding, then concatenated on the token axis
        (decoder.py:846-851).  Frames beyond num_image_with_embedding are
        DROPPED, matching the reference's zip truncation (decoder.py:849
        rebinds `features` to the zip result, so an 8-frame batch into a
        6-embedding model silently uses the first 6 frames).  flash:
        None/False = the XLA attention path (measured faster than the
        Pallas kernel at GIT encoder shapes); True opts into the kernel.
        """
        if images.ndim == 4:
            return vit_forward(
                params["image_encoder"], images, self.cfg.encoder, dtype,
                flash=flash, fast=fast, remat=remat,
            )
        b, f = images.shape[:2]
        if self.cfg.num_image_with_embedding:
            f = min(f, self.cfg.num_image_with_embedding)
            images = images[:, :f]
        flat = images.reshape((b * f,) + images.shape[2:])
        feats = vit_forward(
            params["image_encoder"], flat, self.cfg.encoder, dtype,
            flash=flash, fast=fast, remat=remat,
        )
        feats = feats.reshape(b, f, feats.shape[1], feats.shape[2])
        if self.cfg.num_image_with_embedding:
            emb = params["img_temporal_embedding"][:f].astype(feats.dtype)
            feats = feats + emb[None, :, None, :]
        if self.cfg.pooling_images == "avg":
            return feats.mean(axis=1)
        assert self.cfg.pooling_images is None, self.cfg.pooling_images
        return feats.reshape(b, f * feats.shape[2], feats.shape[3])

    def append_text_context(self, params, visual, context_tokens, context_lengths,
                            dtype=jnp.float32):
        """Concat embedded text context(s) onto the visual memory with a
        validity mask (reference batch['context'] path,
        decoder.py:859-871).  The reference embeds each context with the
        decoder's word+positional embedding (the shared
        WordAndPositionalEmbedding — positions restart at 0 per context)
        and concatenates it to the RAW visual features before the visual
        projection — which only type-checks when visual_feature_size ==
        hidden_size (GIT_BASE); we keep that constraint.  (The
        `context_not_share_embedding` branch, decoder.py:824-825, calls a
        nonexistent nn.Module.clone() and cannot execute; not carried.)

        context_tokens: [B, Tc] int32, or a list of such arrays (the
        reference's list-of-contexts); context_lengths: [B] int32 per
        context.  Returns (memory [B, M+sum(Tc), D],
        memory_valid [B, M+sum(Tc)])."""
        from .textual import embed_captions

        assert self.cfg.visual_feature_size == self.cfg.hidden_size, (
            "text context requires visual_feature_size == hidden_size "
            "(as in the reference, decoder.py:863-870)"
        )
        if not isinstance(context_tokens, (list, tuple)):
            context_tokens = [context_tokens]
            context_lengths = [context_lengths]
        b = visual.shape[0]
        parts = [visual.astype(dtype)]
        valids = [jnp.ones((b, visual.shape[1]), bool)]
        for tokens, lengths in zip(context_tokens, context_lengths):
            tc = tokens.shape[1]
            parts.append(
                embed_captions(params["textual"], tokens, self.cfg).astype(dtype)
            )
            valids.append(jnp.arange(tc)[None, :] < lengths[:, None])
        return jnp.concatenate(parts, axis=1), jnp.concatenate(valids, axis=1)

    def build_memory(self, params, images, context_tokens=None,
                     context_lengths=None, dtype=jnp.float32, flash=None,
                     fast=None, remat=False):
        """Encode images and, when text context is given, append it —
        the memory-construction half of the reference forward_one
        (decoder.py:843-871).  Returns (memory, memory_valid|None)."""
        visual = self.encode_images(
            params, images, dtype, flash=flash, fast=fast, remat=remat
        )
        if context_tokens is None:
            return visual, None
        return self.append_text_context(
            params, visual, context_tokens, context_lengths, dtype
        )

    # -- training forward -------------------------------------------------
    def forward_logits(
        self,
        params,
        images,
        caption_tokens,
        memory_valid=None,
        bi_valid_mask=None,
        context_tokens=None,
        context_lengths=None,
        dtype=jnp.float32,
        fast=None,
        remat=False,
    ):
        """[B,T] caption logits given images; the training/teacher-forcing
        path (decoder.py:926-932).  Optional text context is appended to
        the memory (decoder.py:859-871).  Uses the differentiable XLA
        attention (no Pallas) so it is safe under jax.grad.

        fast=True keeps attention score math in the activation dtype in
        BOTH towers — the bf16 counterpart of the reference speed test's
        model.half() protocol (train.py:270); parity mode (default)
        keeps f32 scores."""
        visual, ctx_valid = self.build_memory(
            params, images, context_tokens, context_lengths, dtype, flash=False,
            fast=fast, remat=remat,
        )
        if ctx_valid is not None:
            assert memory_valid is None, "pass context XOR memory_valid"
            memory_valid = ctx_valid
        return textual_forward(
            params["textual"],
            visual,
            caption_tokens,
            self.cfg,
            memory_valid=memory_valid,
            bi_valid_mask=bi_valid_mask,
            dtype=dtype,
            fast=bool(fast),
        )

    # -- decode glue -------------------------------------------------------
    def prefill(
        self,
        params,
        visual_features,
        prefix_tokens,
        max_text_len,
        memory_valid=None,
        dtype=jnp.float32,
        fast=False,
        kernel_memory=False,
        flash=None,
    ):
        return prefill(
            params["textual"],
            visual_features,
            prefix_tokens,
            self.cfg,
            max_text_len,
            memory_valid=memory_valid,
            dtype=dtype,
            fast=fast,
            kernel_memory=kernel_memory,
            flash=flash,
        )

    def decode_step(self, params, tokens, cache, dtype=jnp.float32, kernel=False,
                    vocab_kernel=False):
        return decode_step(
            params["textual"], tokens, cache, self.cfg, dtype=dtype, kernel=kernel,
            vocab_kernel=vocab_kernel,
        )

    # -- generation --------------------------------------------------------
    def generate(
        self,
        params,
        images,
        prefix_tokens=None,
        beam: Optional["BeamSearchConfig"] = None,
        memory_valid=None,
        dtype=jnp.float32,
        sos_id=101,
        mode="beam",
        max_steps=None,
        num_return_sequences=1,
        rng=None,
        trie=None,
        context_tokens=None,
        context_lengths=None,
        fast_prefill=False,
        decode_kernel=False,
        vocab_kernel=False,
    ):
        """Caption/answer generation (reference infer, decoder.py:977-1011).
        Optional text context is appended to the memory with a validity
        mask (decoder.py:859-871) before decoding.

        prefix_tokens: [B, Tp] ([CLS] alone for captioning; [CLS]+question
        for VQA).  Returns (sequences, logprobs); when prefix_tokens is
        given explicitly it is stripped from the output — the reference
        strips only in prefix (VQA) mode and keeps the [CLS] in plain
        caption mode (decoder.py:980-1006) — for beam mode with
        num_keep_best==1 the keep axis is squeezed like the reference
        (decoder.py:1288-1289).  num_return_sequences>1 replicates each
        input R times on the batch axis (decoder.py:1093-1096) — outputs
        stay flat [B*R, ...].

        decode_kernel: False | True | 'int8' — route the beam loop's
        per-layer attention through the fused Pallas kernel
        (ops/decode_attention.py; TPU only).  True is token-exact with
        the XLA path; 'int8' additionally stores the prefill-computed
        memory K/V int8 (the decode loop's dominant HBM stream),
        quantization-noise-level differences only.

        vocab_kernel: False | True | 'interpret' — fuse the tied output
        projection with the beam prefilter's block-max + sum-exp passes
        (ops/vocab_topk.py).  Requires the int8-quantized head and the
        plain greedy-beam config; silently falls back otherwise (same
        contract as decode_kernel's gates).  lse comes from a two-level
        reduction — token-equality vs the XLA path asserted on-chip,
        f32-summation-order differences only.
        """
        from ..decode import BeamSearchConfig, beam_search, greedy_search

        visual, ctx_valid = self.build_memory(
            params, images, context_tokens, context_lengths, dtype
        )
        if ctx_valid is not None:
            assert memory_valid is None, "pass context XOR memory_valid"
            memory_valid = ctx_valid
        bsz = visual.shape[0]
        strip = prefix_tokens is not None
        if prefix_tokens is None:
            prefix_tokens = jnp.full((bsz, 1), sos_id, jnp.int32)
        if num_return_sequences > 1:
            visual = jnp.repeat(visual, num_return_sequences, axis=0)
            prefix_tokens = jnp.repeat(prefix_tokens, num_return_sequences, axis=0)
            if memory_valid is not None:
                memory_valid = jnp.repeat(memory_valid, num_return_sequences, axis=0)
        tp = prefix_tokens.shape[1] if strip else 0
        if mode == "beam":
            beam = beam or BeamSearchConfig()
            if decode_kernel:
                # gate BEFORE prefill: shapes are static here, and when
                # decode_step will fall back (batch alignment, a memory
                # past the bf16 auto-enable crossover, or an extreme
                # t_max*beams VMEM blowup) building the kernel-layout
                # memory K/V would duplicate the whole memory in HBM for
                # nothing (~900 MB for a B=32 video batch).  decode_step
                # re-derives the same choice from the cache shapes.
                from ..ops.decode_attention import (
                    kernel_fits,
                    kernel_pays,
                    pad_m8_len,
                )

                mem_isz = 1 if decode_kernel == "int8" else jnp.dtype(dtype).itemsize
                # evaluate on the PADDED M — exactly what decode_step
                # will see in the cache shapes, so the two gates cannot
                # diverge near a boundary
                m_kernel = pad_m8_len(visual.shape[1])
                if not (
                    kernel_pays(m_kernel, decode_kernel == "int8")
                    and kernel_fits(
                        visual.shape[0], beam.num_beams, self.cfg.num_heads,
                        self.cfg.head_dim, m_kernel, beam.max_steps,
                        mem_itemsize=mem_isz,
                        act_itemsize=jnp.dtype(dtype).itemsize,
                    )
                ):
                    decode_kernel = False
            logits, cache = self.prefill(
                params, visual, prefix_tokens, beam.max_steps, memory_valid, dtype,
                fast=fast_prefill, kernel_memory=decode_kernel,
            )
            if vocab_kernel:
                from ..ops.vocab_topk import TILE

                nblk = (self.cfg.vocab_size + TILE - 1) // TILE
                if (
                    beam.do_sample
                    or beam.repetition_penalty != 1.0
                    or "output_words_q8_t" not in params["textual"]
                    # the prefilter needs at least max(C, 4) blocks to
                    # cover the candidates (decode/beam._top_k_blocked)
                    or nblk < max(beam.per_node_beam_size * beam.num_beams, 4)
                ):
                    vocab_kernel = False
            step = partial_decode_step(
                self, params, dtype, kernel=decode_kernel,
                vocab_kernel=vocab_kernel,
            )
            decoded, logprobs = beam_search(
                step, logits, cache, prefix_tokens, beam, rng=rng,
                vocab_stats=bool(vocab_kernel),
            )
            decoded = decoded[:, :, tp:]
            if beam.num_keep_best == 1:
                decoded, logprobs = decoded[:, 0], logprobs[:, 0]
            return decoded, logprobs
        elif mode == "greedy":
            max_steps = max_steps or 40
            logits, cache = self.prefill(
                params, visual, prefix_tokens, max_steps, memory_valid, dtype
            )
            step = partial_decode_step(self, params, dtype)
            seqs, logprobs = greedy_search(
                step, logits, cache, prefix_tokens, max_steps
            )
            return seqs[:, tp:], logprobs
        elif mode == "trie":
            # classification-as-generation (the reference's commented-in
            # TrieAutoRegressiveBeamSearch option, model.py:42-48)
            from ..decode import trie_greedy_search

            assert trie is not None, "mode='trie' requires a TokenTrie"
            max_steps = max_steps or 40
            logits, cache = self.prefill(
                params, visual, prefix_tokens, max_steps, memory_valid, dtype
            )
            step = partial_decode_step(self, params, dtype)
            seqs, logprobs = trie_greedy_search(
                step, logits, cache, prefix_tokens, trie, max_steps
            )
            return seqs[:, tp:], logprobs
        raise ValueError(mode)


def partial_decode_step(model: GitModel, params, dtype, kernel=False,
                        vocab_kernel=False):
    def step(tokens, cache):
        return model.decode_step(
            params, tokens, cache, dtype, kernel=kernel,
            vocab_kernel=vocab_kernel,
        )

    return step
