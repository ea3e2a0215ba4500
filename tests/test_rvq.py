"""Residual VQ: parity vs reference torch implementation + masking/STE props."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from encodec_pytorch_tpu import convert
from encodec_pytorch_tpu.quantization.core_vq import (
    CodebookState, init_rvq_state, rvq_decode, rvq_encode, rvq_forward)
from encodec_pytorch_tpu.quantization.vq import ResidualVectorQuantizer

REF = '/root/reference'


def _ref_rvq(n_q, dim, bins, kmeans_init=False, threshold=0):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from quantization.core_vq import ResidualVectorQuantization
    return ResidualVectorQuantization(
        num_quantizers=n_q, dim=dim, codebook_size=bins,
        kmeans_init=kmeans_init, threshold_ema_dead_code=threshold)


def _sync_state(trvq, n_q):
    sd = {k: v.detach().numpy() for k, v in trvq.state_dict().items()}
    return CodebookState(**{k: jnp.asarray(v) for k, v in
                            convert.rvq_state_from_torch(sd, n_q).items()})


def test_encode_decode_parity():
    torch.manual_seed(0)
    n_q, dim, bins, B, T = 4, 16, 64, 2, 11
    trvq = _ref_rvq(n_q, dim, bins)
    trvq.eval()
    state = _sync_state(trvq, n_q)

    x = torch.randn(B, dim, T)
    with torch.no_grad():
        ref_codes = trvq.encode(x, n_q=n_q).numpy()          # [K, B, T]
        ref_dec = trvq.decode(torch.from_numpy(ref_codes)).numpy()  # [B, D, T]

    codes = rvq_encode(state, jnp.asarray(x.numpy().transpose(0, 2, 1)), n_q)
    np.testing.assert_array_equal(np.asarray(codes), ref_codes)
    dec = rvq_decode(state, codes)
    np.testing.assert_allclose(np.asarray(dec).transpose(0, 2, 1), ref_dec,
                               atol=1e-5, rtol=1e-5)


def test_train_forward_parity_ema_update():
    """Full training-mode parity: quantized output, commit penalty, and the
    EMA buffer updates after one step (threshold=0 → no expiry path)."""
    torch.manual_seed(1)
    n_q, dim, bins, B, T = 3, 8, 32, 2, 13
    trvq = _ref_rvq(n_q, dim, bins)
    trvq.train()
    state = _sync_state(trvq, n_q)

    x = torch.randn(B, dim, T)
    q_ref, idx_ref, loss_ref = trvq(x, n_q=n_q)
    penalty_ref = torch.mean(loss_ref).item()

    quantized, codes, penalty, new_state = rvq_forward(
        state, jnp.asarray(x.numpy().transpose(0, 2, 1)), n_q,
        jax.random.PRNGKey(0), training=True, threshold_ema_dead_code=0)

    np.testing.assert_array_equal(np.asarray(codes),
                                  idx_ref.detach().numpy())
    np.testing.assert_allclose(np.asarray(quantized).transpose(0, 2, 1),
                               q_ref.detach().numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(penalty), penalty_ref, atol=1e-6)

    # buffers after the EMA update
    ref_after = convert.rvq_state_from_torch(
        {k: v.detach().numpy() for k, v in trvq.state_dict().items()}, n_q)
    np.testing.assert_allclose(np.asarray(new_state.cluster_size),
                               ref_after['cluster_size'], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.embed_avg),
                               ref_after['embed_avg'], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.embed),
                               ref_after['embed'], atol=1e-5)


def test_masked_scan_matches_smaller_n_q():
    key = jax.random.PRNGKey(3)
    state = init_rvq_state(key, 8, 16, 4, kmeans_init=False)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 4))
    q2, codes2, p2, st2 = rvq_forward(state, x, jnp.int32(2), key, training=False)
    # stages >= n_q contribute nothing
    assert np.all(np.asarray(codes2)[2:] == 0)
    # same as statically slicing 2 stages
    small = jax.tree.map(lambda a: a[:2], state)
    q2s, _, _, _ = rvq_forward(small, x, jnp.int32(2), key, training=False)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q2s), atol=1e-6)


def test_straight_through_gradient():
    state = init_rvq_state(jax.random.PRNGKey(0), 4, 16, 4, kmeans_init=False)

    def f(x):
        q, _, _, _ = rvq_forward(state, x, jnp.int32(4), jax.random.PRNGKey(1),
                                 training=True, threshold_ema_dead_code=0)
        return jnp.sum(q)

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4))
    g = jax.grad(f)(x)
    # Reference STE semantics: quantized_out = Σ_k (residual_k + sg(q_k -
    # residual_k)) and every residual_k carries an identity gradient wrt x
    # (the subtraction is detached, core_vq.py:348), so d(sum)/dx == n_q.
    np.testing.assert_allclose(np.asarray(g), 4.0 * np.ones_like(g), atol=1e-6)


def test_kmeans_init_runs_once_and_marks_inited():
    state = init_rvq_state(jax.random.PRNGKey(0), 2, 8, 4, kmeans_init=True)
    assert float(state.inited.sum()) == 0.0
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 4))
    _, _, _, st = rvq_forward(state, x, jnp.int32(2), jax.random.PRNGKey(2),
                              training=True, kmeans_iters=5)
    assert float(st.inited.sum()) == 2.0
    # codebook rows should now live near the data (not all zeros)
    assert float(jnp.abs(st.embed).sum()) > 0.0


def test_bandwidth_policy():
    rvq = ResidualVectorQuantizer(dimension=128, n_q=32, bins=1024)
    # 0.75 kbps per codebook at 75 Hz (vq.py:110-113)
    assert rvq.bandwidth_per_quantizer(75) == 0.75
    assert rvq.num_quantizers_for_bandwidth(75, 1.5) == 2
    assert rvq.num_quantizers_for_bandwidth(75, 6.0) == 8
    assert rvq.num_quantizers_for_bandwidth(75, 24.0) == 32
    assert rvq.num_quantizers_for_bandwidth(75, None) == 32
    assert rvq.num_quantizers_for_bandwidth(75, 0.1) == 1  # max(1, ...)
