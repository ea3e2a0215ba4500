"""F-phase packed conv2d: exactness vs lax.conv_general_dilated across the
discriminator's layer shapes (entry, strided-dilated mids, square tail) and
gradient equivalence (pure-XLA lowering → autodiff must match)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu.ops.conv2d_pack import conv2d_fpack


def _ref_conv(x, k, stride, dilation, padding):
    ph, pw = padding
    return jax.lax.conv_general_dilated(
        x, k, window_strides=stride, padding=((ph, ph), (pw, pw)),
        rhs_dilation=dilation, dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)


CASES = [
    # (name, H, W, cin, cout, (kh, kw), stride, dilation, padding, phases)
    ('entry', 17, 65, 2, 8, (3, 9), (1, 1), (1, 1), (1, 4), 8),
    ('mid_d1', 17, 65, 8, 8, (3, 9), (1, 2), (1, 1), (1, 4), 8),
    ('mid_d2', 17, 65, 8, 8, (3, 9), (1, 2), (2, 1), (2, 4), 8),
    ('mid_d4', 17, 33, 8, 8, (3, 9), (1, 2), (4, 1), (4, 4), 8),
    ('tail', 17, 33, 8, 8, (3, 3), (1, 1), (1, 1), (1, 1), 8),
    ('post', 17, 33, 8, 1, (3, 3), (1, 1), (1, 1), (1, 1), 8),
    ('w_not_multiple', 11, 29, 4, 4, (3, 9), (1, 2), (1, 1), (1, 4), 8),
    ('phases_4', 11, 29, 4, 4, (3, 9), (1, 2), (1, 1), (1, 4), 4),
]


@pytest.mark.parametrize('case', CASES, ids=[c[0] for c in CASES])
def test_fpack_matches_plain_conv(case):
    _, H, W, cin, cout, ks, stride, dil, pad, P = case
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(*ks, cin, cout).astype(np.float32) * 0.1)
    ref = _ref_conv(x, k, stride, dil, pad)
    got = conv2d_fpack(x, k, stride, dil, pad, phases=P)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fpack_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 33, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 9, 4, 4).astype(np.float32) * 0.1)
    stride, dil, pad = (1, 2), (1, 1), (1, 4)

    def loss_ref(x, k):
        y = _ref_conv(x, k, stride, dil, pad)
        return jnp.sum(jnp.sin(y))

    def loss_pack(x, k):
        y = conv2d_fpack(x, k, stride, dil, pad, phases=8)
        return jnp.sum(jnp.sin(y))

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_p, gk_p = jax.grad(loss_pack, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('case', CASES, ids=[c[0] for c in CASES])
def test_custom_dx_vjp_matches_plain_autodiff(case):
    """The phase-packed input-gradient formulation (conv2d_fpack_dx via the
    custom VJP) must match plain-conv autodiff for BOTH dx and dW on every
    disc layer shape, including dilated and non-multiple widths."""
    _, H, W, cin, cout, ks, stride, dil, pad, P = case
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, H, W, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(*ks, cin, cout).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(*_ref_conv(x, k, stride, dil, pad).shape)
                    .astype(np.float32))

    def loss_ref(x, k):
        return jnp.sum(_ref_conv(x, k, stride, dil, pad) * g)

    def loss_cdx(x, k):
        return jnp.sum(conv2d_fpack(x, k, stride, dil, pad, phases=P,
                                    custom_dx=True) * g)

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_c, gk_c = jax.grad(loss_cdx, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_r),
                               atol=1e-4, rtol=1e-4)


def test_custom_dx_auto_mode_matches():
    """Auto mode (custom_dx=None) must give the same gradients regardless of
    which backward implementation it selects."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 9, 65, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 9, 32, 32).astype(np.float32) * 0.1)
    stride, dil, pad = (1, 2), (1, 1), (1, 4)
    g = jnp.asarray(rng.randn(*_ref_conv(x, k, stride, dil, pad).shape)
                    .astype(np.float32))

    def loss(mode):
        def f(x, k):
            return jnp.sum(conv2d_fpack(x, k, stride, dil, pad, phases=4,
                                        custom_dx=mode) * g)
        return f

    gx_a, gk_a = jax.grad(loss(None), argnums=(0, 1))(x, k)
    gx_f, gk_f = jax.grad(loss(False), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_f),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_a), np.asarray(gk_f),
                               atol=1e-4, rtol=1e-4)
