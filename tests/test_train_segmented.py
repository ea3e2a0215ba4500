"""Training forward through the segmented (48k-style) path: multiple frames,
per-frame normalization, overlap-add — with gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.models.model import EncodecModel


def test_forward_train_segmented_normalized():
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 2, causal=False, model_norm='time_group_norm',
        audio_normalize=True, segment=0.05, n_q=2, n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=1200)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 3000)) * 0.2

    out, loss_w, new_cb = model.forward_train(variables, x,
                                              jax.random.PRNGKey(2))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert float(loss_w) >= 0

    # gradient flows through the segmented overlap-add path
    def loss_fn(params):
        v = {'params': params, 'quantizer': variables['quantizer']}
        out, loss_w, _ = model.forward_train(v, x, jax.random.PRNGKey(2))
        return jnp.mean(jnp.square(out - x)) + loss_w

    g = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
