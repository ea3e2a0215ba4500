"""Entropy-LM training loop: teacher-forced CE drops on predictable code
streams, and the trained LM plugs into compress() producing a SMALLER
byte stream that still roundtrips exactly (the 20-30% LM gain claim,
reference compress.py:42-43 — here actually trainable, which the reference
cannot do)."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu import compress as C
from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.train.lm_trainer import LMTrainer, lm_loss


def _codec(n_filters=4):
    model = EncodecModel._get_model(
        [1.5], 24_000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_filters=n_filters,
        name='encodec_24khz')
    variables = model.init(jax.random.PRNGKey(0), example_length=4800)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(1.5)
    return model, variables


def test_lm_training_reduces_bits_and_shrinks_stream():
    model, variables = _codec()
    t = np.arange(4800) / 24000.0
    wav = (0.5 * np.sin(2 * np.pi * 331 * t)).astype(np.float32)[None]
    batch = np.repeat(wav[None], 4, axis=0)   # [4, 1, T]

    trainer = LMTrainer(model, variables, lr=3e-3, warmup_steps=10,
                        total_steps=400, num_layers=1, dim=32, num_heads=2)
    codes = trainer.codes_for(batch)
    init_ce = float(lm_loss(trainer.lm, trainer.state.params, codes))
    assert abs(init_ce / np.log(2) - 10.0) < 1.5   # ~uniform at init

    metrics = {}
    for epoch in range(4):
        metrics = trainer.train_epoch([batch] * 25, epoch, log_interval=1000)
    assert metrics['bits_per_code'] < 6.0, metrics  # periodic codes compress

    # ---- plug the trained LM into the compressor
    lm_obj = C.LM(trainer.lm, trainer.state.params)
    packed = C.compress(model, variables, wav)
    lm_bytes = C.compress(model, variables, wav, use_lm=True, lm=lm_obj)
    assert len(lm_bytes) < len(packed), (len(lm_bytes), len(packed))

    out_lm, _ = C.decompress(model, variables, lm_bytes, lm=lm_obj)
    out_packed, _ = C.decompress(model, variables, packed)
    np.testing.assert_array_equal(out_lm, out_packed)


def test_lm_checkpoint_roundtrip(tmp_path):
    from encodec_pytorch_tpu.train.lm_trainer import (load_lm_checkpoint,
                                                      save_lm_checkpoint)
    model, variables = _codec()
    trainer = LMTrainer(model, variables, num_layers=1, dim=32, num_heads=2)
    path = str(tmp_path / 'lm.msgpack')
    save_lm_checkpoint(path, trainer.state, trainer.lm)
    lm2, params = load_lm_checkpoint(path)
    assert (lm2.n_q, lm2.dim, lm2.num_layers) == (trainer.n_q, 32, 1)
    codes = jnp.zeros((1, trainer.n_q, 8), jnp.int32)
    a = lm_loss(trainer.lm, trainer.state.params, codes)
    b = lm_loss(lm2, params, codes)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    # the native checkpoint loads through the compress-side entry point
    lm_obj = C.get_lm_model(model, checkpoint=path)
    assert lm_obj.model.n_q == trainer.n_q
