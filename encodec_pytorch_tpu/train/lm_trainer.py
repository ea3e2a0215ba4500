"""Entropy-LM training — a capability the reference LACKS (it only consumes
the pretrained fbaipublicfiles LMs, reference model.py:221-240; there is no
LM training code anywhere in /root/reference).

The LM (models/lm.py) is trained teacher-forced on RVQ code sequences
produced by a frozen codec: input at step t is ``1 + codes[t-1]`` (0 = first
step), target is ``codes[t]`` — exactly the conditioning the compression
loop replays at inference (compress.py:_compress_frame_lm), so a trained
checkpoint plugs straight into ``compress(use_lm=True)``.

The headline metric is **bits per code**: cross-entropy / ln 2. The packed
baseline is ``log2(card)`` (10 bits); anything below that is bitstream
shrinkage at exactly that ratio.
"""

import logging
import time
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.lm import LMModel

logger = logging.getLogger('encodec_pytorch_tpu')


class LMTrainState(NamedTuple):
    params: Any
    opt: Any
    step: jnp.ndarray


def lm_loss(lm: LMModel, params, codes: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced cross-entropy (nats/code). codes: [B, K, T] int32."""
    inp = jnp.concatenate(
        [jnp.zeros_like(codes[:, :, :1]), 1 + codes[:, :, :-1]], axis=2)
    logits, _, _ = lm.apply({'params': params}, inp, return_logits=True)
    # logits [B, card, K, T] → log-softmax over card, gather targets
    logp = jax.nn.log_softmax(logits, axis=1)
    tgt = jax.nn.one_hot(codes, lm.card, axis=1, dtype=logp.dtype)
    return -jnp.mean(jnp.sum(logp * tgt, axis=1))


def _make_opt():
    """THE optimizer — built in one place so the state created by
    init_lm_state and the transform applied by the train step can never
    drift apart (same pytree structure would hide a hyperparameter
    mismatch)."""
    return optax.adam(learning_rate=1.0, b1=0.9, b2=0.98, eps=1e-9)


def build_lm_train_step(lm: LMModel, schedule):
    opt = _make_opt()

    def step_fn(state: LMTrainState, codes: jnp.ndarray
                ) -> Tuple[LMTrainState, Dict[str, jnp.ndarray]]:
        loss, grads = jax.value_and_grad(
            lambda p: lm_loss(lm, p, codes))(state.params)
        lr = schedule(state.step)
        updates, new_opt = opt.update(grads, state.opt, state.params)
        updates = jax.tree.map(lambda u: lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {'ce': loss, 'bits_per_code': loss / jnp.log(2.0), 'lr': lr}
        return LMTrainState(new_params, new_opt, state.step + 1), metrics

    return step_fn


def init_lm_state(lm: LMModel, key: jax.Array, example_t: int = 16
                  ) -> LMTrainState:
    dummy = jnp.zeros((1, lm.n_q, example_t), jnp.int32)
    params = lm.init(key, dummy)['params']
    return LMTrainState(params=params, opt=_make_opt().init(params),
                        step=jnp.zeros((), jnp.int32))


def save_lm_checkpoint(path: str, state: LMTrainState, lm: LMModel):
    """Self-describing native LM checkpoint: {config, params} msgpack.
    Loadable without knowing hyperparameters (load_lm_checkpoint), and
    accepted by compress.get_lm_model / the codec CLI's --lm_checkpoint."""
    from flax.serialization import msgpack_serialize
    blob = {
        'config': {'n_q': lm.n_q, 'card': lm.card, 'dim': lm.dim,
                   'num_heads': lm.num_heads, 'num_layers': lm.num_layers,
                   'past_context': lm.past_context},
        'params': jax.device_get(state.params),
    }
    with open(path, 'wb') as f:
        f.write(msgpack_serialize(blob))


def load_lm_checkpoint(path: str) -> Tuple[LMModel, Any]:
    """→ (LMModel definition, params pytree)."""
    from flax.serialization import msgpack_restore
    with open(path, 'rb') as f:
        blob = msgpack_restore(f.read())
    cfg = {k: int(v) for k, v in blob['config'].items()}
    return LMModel(**cfg), jax.tree.map(jnp.asarray, blob['params'])


class LMTrainer:
    """Train the entropy LM on codes from a frozen codec.

    ``codec_model``/``codec_variables``: a trained EncodecModel (bandwidth
    already set — its n_q defines the LM's K). ``loader`` yields wav batches
    ``[B, C, T]`` (numpy). The codec encode runs jitted on device; codes are
    teacher-forced through the LM step.
    """

    def __init__(self, codec_model, codec_variables, lr: float = 3e-4,
                 warmup_steps: int = 500, total_steps: int = 100_000,
                 num_layers: int = 5, dim: int = 200, num_heads: int = 8):
        self.codec = codec_model
        self.codec_variables = codec_variables
        self.n_q = codec_model.quantizer.num_quantizers_for_bandwidth(
            codec_model.frame_rate, codec_model.bandwidth)
        self.lm = LMModel(
            n_q=self.n_q, card=codec_model.quantizer.bins,
            num_layers=num_layers, dim=dim, num_heads=num_heads,
            past_context=int(3.5 * codec_model.frame_rate))
        warmup_steps = min(warmup_steps, max(total_steps - 1, 1))
        self.schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1),
            end_value=lr * 0.1)
        self.state = init_lm_state(self.lm, jax.random.PRNGKey(0))
        self._step = jax.jit(build_lm_train_step(self.lm, self.schedule),
                             donate_argnums=(0,))
        # codec encode compiled ONCE (per wav-batch shape, which is fixed
        # across a training run). The previous eager per-op dispatch of the
        # full encoder every step churned one remote buffer per primitive
        # through the device relay and was observed leaking host RSS until
        # the OOM killer fired ~3000 steps into a run (round 5); one jitted
        # program per shape also removes thousands of per-step dispatches.
        self._encode = jax.jit(
            lambda wav: self.codec.encode(self.codec_variables, wav))

    def codes_for(self, wav_batch: np.ndarray) -> jnp.ndarray:
        """[B, C, T] wav → [F·B, K, Tf] codes. Segmented codecs yield one
        frame per window; each is its own LM training sequence (segments
        overlap, so concatenating them along time would stitch together
        audio the LM never sees contiguously at compress time). The last
        (ragged) frame is dropped only if its length differs."""
        frames = self._encode(jnp.asarray(wav_batch))
        tf0 = frames[0][0].shape[-1]
        codes = [c for c, _ in frames if c.shape[-1] == tf0]
        if len(codes) < len(frames):
            logger.debug('dropping %d ragged tail frame(s) from LM batch',
                         len(frames) - len(codes))
        return jnp.asarray(jnp.concatenate(codes, axis=0), jnp.int32)

    def train_epoch(self, loader, epoch: int, log_interval: int = 50):
        t0 = time.time()
        last = {}
        for idx, batch in enumerate(loader):
            codes = self.codes_for(batch)
            self.state, last = self._step(self.state, codes)
            if idx % log_interval == 0:
                logger.info(
                    'LM epoch %d step %d  ce %.4f  bits/code %.3f '
                    '(packed baseline %.1f)  %.3fs/step',
                    epoch, idx, float(last['ce']),
                    float(last['bits_per_code']),
                    np.log2(self.codec.quantizer.bins),
                    (time.time() - t0) / (idx + 1))
        return {k: float(v) for k, v in last.items()}
