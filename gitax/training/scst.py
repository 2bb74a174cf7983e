"""SCST (self-critical sequence training, Rennie et al. 2017) for GIT.

The reference ships only a disabled skeleton (decoder.py:804-813 raises
NotImplementedError; forward_one_scst at decoder.py:879-914 sketches the
flow).  gitax implements the full loop TPU-natively:

  device:  greedy baseline decode + N sampled decodes per image
           (both jitted lax.while_loop searches)
  host:    CIDEr-D rewards vs ground-truth captions (gitax.evalcap)
  device:  REINFORCE step — teacher-forced log-probs of the sampled
           sequences weighted by (reward - greedy baseline), jitted
           fwd+bwd

so the only host work per step is detokenization + n-gram scoring.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..decode import BeamSearchConfig
from ..evalcap.cider import CiderD
from ..evalcap.tokenizer import tokenize_caption
from ..models.git import GitModel
from .trainer import TrainState


def sequence_logprob_loss(model: GitModel, params, images, seqs, advantages,
                          eos_id=102, dtype=jnp.float32):
    """-mean(advantage * sum log p(sampled token)), teacher-forced.

    seqs: [N, L] sampled sequences starting with [CLS]; tokens after the
    first EOS are excluded (the EOS itself is scored)."""
    logits = model.forward_logits(params, images, seqs, dtype=dtype)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = seqs[:, 1:]
    tok_lp = jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    # valid: up to and including the first EOS in the generated part
    is_eos = targets == eos_id
    after_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(
        jnp.int32
    )
    mask = (after_eos == 0).astype(jnp.float32)
    seq_lp = jnp.sum(tok_lp * mask, axis=1)
    return -jnp.mean(advantages * seq_lp)


class ScstTrainer(object):
    def __init__(
        self,
        model: GitModel,
        tokenizer,
        tx: optax.GradientTransformation,
        num_samples: int = 5,
        max_steps: int = 40,
        temperature: float = 1.0,
        dtype=jnp.float32,
        sos_id: int = 101,
        eos_id: int = 102,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.tx = tx
        self.num_samples = num_samples
        self.max_steps = max_steps
        self.dtype = dtype
        self.sos_id, self.eos_id = sos_id, eos_id
        self.cider = CiderD()
        self.sample_cfg = BeamSearchConfig(
            num_beams=1,
            per_node_beam_size=2,
            max_steps=max_steps,
            do_sample=True,
            temperature=temperature,
            top_p=1.0,
            eos_id=eos_id,
        )

        model_ref, dt = self.model, self.dtype

        def _greedy(params, images):
            return model_ref.generate(
                params, images, mode="greedy", max_steps=max_steps, dtype=dt,
                sos_id=sos_id,
            )

        def _sample(params, images, rng):
            return model_ref.generate(
                params,
                images,
                beam=self.sample_cfg,
                dtype=dt,
                sos_id=sos_id,
                num_return_sequences=num_samples,
                rng=rng,
            )

        def _grad_step(state: TrainState, images, seqs, advantages):
            loss, grads = jax.value_and_grad(
                lambda p: sequence_logprob_loss(
                    model_ref, p, images, seqs, advantages, eos_id, dt
                )
            )(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, params, opt_state), loss

        self._greedy = jax.jit(_greedy)
        self._sample = jax.jit(_sample)
        self._grad_step = jax.jit(_grad_step)

    def _decode(self, seq) -> str:
        return self.tokenizer.decode(
            [int(t) for t in seq], skip_special_tokens=True
        )

    def _rewards(self, captions: List[str], gts: Sequence[Sequence[str]]):
        cands = {str(i): tokenize_caption(c) for i, c in enumerate(captions)}
        refs = {
            str(i): [tokenize_caption(r) for r in g] for i, g in enumerate(gts)
        }
        _, scores = self.cider.compute(cands, refs)
        return np.asarray(scores, np.float32)

    def step(self, state: TrainState, images, gt_captions: Sequence[Sequence[str]],
             rng):
        """One SCST update.  images [B,...]; gt_captions: per-image list of
        reference captions.  Returns (state, metrics)."""
        b = images.shape[0]
        n = self.num_samples
        greedy_seqs, _ = self._greedy(state.params, images)
        sampled_seqs, _ = self._sample(state.params, images, rng)

        greedy_caps = [self._decode(s) for s in np.asarray(greedy_seqs)]
        sample_caps = [self._decode(s) for s in np.asarray(sampled_seqs)]
        baseline = self._rewards(greedy_caps, gt_captions)
        gts_rep = [gt_captions[i // n] for i in range(b * n)]
        sample_r = self._rewards(sample_caps, gts_rep)
        advantages = sample_r - np.repeat(baseline, n)

        # teacher-forcing input: sampled sequences already start with
        # [CLS] (generate keeps it when no explicit prefix is given)
        seqs = np.asarray(sampled_seqs)
        images_rep = jnp.repeat(images, n, axis=0)
        state, loss = self._grad_step(
            state, images_rep, jnp.asarray(seqs), jnp.asarray(advantages)
        )
        return state, {
            "loss": float(loss),
            "reward_sample": float(sample_r.mean()),
            "reward_greedy": float(baseline.mean()),
        }
