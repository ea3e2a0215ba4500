"""RVQ EMA statistics under data parallelism: sharded == single-device.

This is the fix for the reference's disabled cross-worker codebook sync
(core_vq.py:157,175 "FIXME not working"): under GSPMD the batch is one global
array, so k-means init, assignment counts and embed sums are global
reductions — replicas cannot diverge. Verified by running the same training
forward with the batch sharded over 8 devices and unsharded.
"""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                               replicated_sharding)
from encodec_pytorch_tpu.quantization.core_vq import init_rvq_state, rvq_forward


def test_sharded_ema_state_matches_single_device():
    mesh = create_mesh()
    state = init_rvq_state(jax.random.PRNGKey(0), 4, 64, 16, kmeans_init=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 10, 16))

    fn = lambda s, x: rvq_forward(s, x, jnp.int32(4), jax.random.PRNGKey(2),
                                  training=True, kmeans_iters=5,
                                  threshold_ema_dead_code=0)

    # single device
    q1, c1, p1, st1 = jax.jit(fn)(state, x)

    # batch sharded over 8 devices, state replicated
    repl = replicated_sharding(mesh)
    sharded = jax.jit(fn, in_shardings=(repl, batch_sharding(mesh)),
                      out_shardings=repl)
    q2, c2, p2, st2 = sharded(jax.device_put(state, repl),
                              jax.device_put(x, batch_sharding(mesh)))

    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(float(p1), float(p2), atol=1e-6)
    # the EMA buffers — the thing the reference could never keep in sync
    np.testing.assert_allclose(np.asarray(st1.cluster_size),
                               np.asarray(st2.cluster_size), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st1.embed),
                               np.asarray(st2.embed), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st1.embed_avg),
                               np.asarray(st2.embed_avg), atol=1e-4)
    assert float(st2.inited.sum()) == 4.0  # kmeans ran (globally)
