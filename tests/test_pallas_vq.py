"""Pallas fused RVQ encode == XLA scan rvq_encode (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.ops.pallas_vq import rvq_encode_pallas
from encodec_pytorch_tpu.quantization.core_vq import init_rvq_state, rvq_encode


def test_pallas_rvq_matches_xla():
    key = jax.random.PRNGKey(0)
    state = init_rvq_state(key, 8, 256, 128, kmeans_init=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 75, 128))
    ref = rvq_encode(state, x, 8)
    got = rvq_encode_pallas(state, x, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_rvq_group_chunking():
    # n_q > MAX_GROUP exercises the residual carry between group launches
    key = jax.random.PRNGKey(2)
    state = init_rvq_state(key, 12, 128, 128, kmeans_init=False)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 300, 128))
    ref = rvq_encode(state, x, 12)
    got = rvq_encode_pallas(state, x, 12, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
