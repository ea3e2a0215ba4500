"""Fused im2col disc-conv kernel: exact vs lax.conv_general_dilated
(interpret mode — the kernel is experimental-unwired; see PERF_NOTES
"Fused im2col Pallas disc conv" for the measured rejection)."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.ops.pallas_conv2d import conv2d_im2col


def test_conv2d_im2col_matches_xla():
    rng = np.random.RandomState(0)
    for (B, T, F, C, KT, KF, dt) in [(2, 13, 33, 4, 3, 9, 1),
                                     (1, 20, 65, 8, 3, 9, 2),
                                     (2, 11, 33, 4, 3, 9, 4),
                                     (1, 12, 17, 4, 3, 3, 1)]:
        pt, pf = ((KT - 1) * dt) // 2, (KF - 1) // 2
        x = jnp.asarray(rng.randn(B, T, F, C).astype(np.float32))
        w = jnp.asarray(rng.randn(KT, KF, C, C).astype(np.float32) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 2), ((pt, pt), (pf, pf)), rhs_dilation=(dt, 1),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        got = conv2d_im2col(x, w, (pt, pf), (dt, 1), interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
