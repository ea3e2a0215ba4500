"""Exactness of the pipelined fpack-im2col disc conv kernel (v2).

Runs in interpret mode on CPU (conftest forces the cpu backend); the same
code path compiles on TPU. Compared against ``lax.conv_general_dilated``
at float32 — the kernel's matmul reassociates reductions, so tolerance is
fp-reduction-order (~1e-5 relative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu.ops.pallas_conv2d_v2 import conv2d_v2


def _ref_conv(x, w, stride, dilation, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=dilation,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


CASES = [
    # (T, F, cin, cout, kt, kf, stride, dilation, padding) — disc geometries
    (37, 129, 32, 32, 3, 9, (1, 2), (1, 1), (1, 4)),   # conv_1 (scale-3-ish)
    (37, 129, 32, 32, 3, 9, (1, 2), (2, 1), (2, 4)),   # conv_2
    (23, 67, 32, 32, 3, 9, (1, 2), (4, 1), (4, 4)),    # conv_3, odd F
    (23, 65, 32, 32, 3, 3, (1, 1), (1, 1), (1, 1)),    # conv_4 (stride 1)
    (16, 257, 32, 32, 3, 9, (1, 2), (1, 1), (1, 4)),   # production-ish F
]


@pytest.mark.parametrize('case', CASES)
def test_conv2d_v2_matches_lax(case):
    T, F, cin, cout, kt, kf, stride, dilation, padding = case
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, T, F, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(kt, kf, cin, cout).astype(np.float32) * 0.1)
    ref = _ref_conv(x, w, stride, dilation, padding)
    got = conv2d_v2(x, w, stride, dilation, padding, interpret=True)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv2d_v2_phases2():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 19, 97, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 9, 32, 32).astype(np.float32) * 0.1)
    ref = _ref_conv(x, w, (1, 2), (1, 1), (1, 4))
    got = conv2d_v2(x, w, (1, 2), (1, 1), (1, 4), phases=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv2d_v2_bf16_close():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 21, 129, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 9, 32, 32).astype(np.float32) * 0.1)
    ref = _ref_conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (1, 2), (1, 1), (1, 4)).astype(np.float32)
    got = conv2d_v2(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (1, 2), (1, 1), (1, 4), interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=0.15, atol=0.15)


@pytest.mark.parametrize('dil,sf', [(1, 2), (2, 2), (4, 2), (1, 1)])
def test_conv2d_v2_dx_matches_autodiff(dil, sf):
    from encodec_pytorch_tpu.ops.pallas_conv2d_v2 import conv2d_v2_dx

    kf = 9 if sf == 2 else 3
    pad = (dil, (kf - 1) // 2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 25, 97, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, kf, 32, 32).astype(np.float32) * 0.1)

    def f(x_):
        return _ref_conv(x_, w, (1, sf), (dil, 1), pad)

    y, vjp = jax.vjp(f, x)
    g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    (ref_dx,) = vjp(g)
    got_dx = conv2d_v2_dx(g, w, (1, sf), (dil, 1), pad, x.shape,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=3e-5, atol=3e-5)


def test_disc_pallas_v2_matches_fpack():
    """Full sub-discriminator forward + backward with the v2 kernel routed
    through NormConv2d (pallas_v2=True) vs the shipped fpack path — logits,
    fmaps, input grads and param grads must agree to fp reduction order."""
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator

    def build(v2):
        return MultiScaleSTFTDiscriminator(
            filters=32, n_ffts=(128,), hop_lengths=(32,), win_lengths=(128,),
            fpack=4, fpack_dx=True, pallas_v2=v2)

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 1, 1600).astype(np.float32) * 0.1)
    params = build(False).init(jax.random.PRNGKey(0), x)['params']

    def loss(disc, params, x):
        logits, fmaps = disc.apply({'params': params}, x)
        return (sum(jnp.sum(l) for l in logits)
                + 0.1 * sum(jnp.sum(jnp.abs(f)) for fm in fmaps for f in fm))

    ref_v, (ref_gp, ref_gx) = jax.value_and_grad(
        lambda p, x_: loss(build(False), p, x_), argnums=(0, 1))(params, x)
    got_v, (got_gp, got_gx) = jax.value_and_grad(
        lambda p, x_: loss(build(True), p, x_), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               rtol=1e-4, atol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got_gp))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), np.asarray(leaf),
            rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_v2_taps_overflow_falls_back_to_fpack():
    """fpack large enough that (P-1)*sf + kf > N_MF must route to the XLA
    fpack path instead of tripping pack_weights' assert (the gate in
    ops/conv.py must include taps_fit)."""
    from encodec_pytorch_tpu.ops.conv import NormConv2d
    from encodec_pytorch_tpu.ops.pallas_conv2d_v2 import N_MF, taps_fit

    assert not taps_fit(8, 2, 9)       # (8-1)*2+9 = 23 > 16
    assert taps_fit(4, 2, 9)           # (4-1)*2+9 = 15 <= 16

    conv = NormConv2d(in_channels=32, out_channels=32, kernel_size=(3, 9),
                      stride=(1, 2), padding=(1, 4), norm='weight_norm',
                      fpack=8, pallas_v2=True)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 8, 64, 32).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), x)
    y = conv.apply(params, x)          # would AssertionError without the gate
    assert y.shape[0] == 1 and y.shape[-1] == 32
    del N_MF
