"""Residual vector quantization — TPU-native rebuild of
/root/reference/quantization/core_vq.py.

Design (SURVEY.md §7):
- Codebook state (``inited``, ``cluster_size``, ``embed``, ``embed_avg``,
  core_vq.py:141-144) is an explicit pytree stacked over RVQ stages, threaded
  through the train step — no hidden buffers.
- The training forward is a ``lax.scan`` over a FIXED number of stages with a
  ``stage < n_q`` mask, so one compiled program serves every bandwidth
  (variable-bandwidth training samples n_q per step).
- Nearest-codebook search is a single MXU matmul + argmax per stage
  (``2·x@Eᵀ − ‖E‖²`` — same argmax as the reference's expanded form,
  core_vq.py:181-189, without materializing the [M,N,D] difference tensor).
- EMA updates (decay 0.99), Laplace smoothing (ε=1e-5, core_vq.py:59-60,
  227-235), k-means init on the first training batch (core_vq.py:146-157),
  and dead-code expiry (core_vq.py:159-175) are pure functions of
  ``(state, batch, rng)``.
- Under GSPMD data parallelism the batch is a global array, so the EMA
  statistics (`one-hot sums`, `xᵀ@onehot`) are global sums — XLA inserts the
  cross-chip collectives. This *fixes* the reference's disabled codebook
  broadcast (core_vq.py:157,175 "FIXME not working"): replicas can no longer
  diverge.

Deliberate deviations, documented:
- Dead-code expiry in the reference is a no-op: ``expire_codes_`` rewrites
  ``embed`` (core_vq.py:165-175), which the same call then overwrites with
  ``embed_normalized`` (core_vq.py:235). We make expiry effective (replace the
  normalized row with a fresh batch sample while a code stays dead).
- The commitment-loss direction bug (facebookresearch/encodec#25) is KEPT for
  reproducibility, as the reference does (core_vq.py:313-320).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class CodebookState(NamedTuple):
    """EMA codebook state, stacked over RVQ stages.

    inited:       [n_q]           1.0 once k-means init ran
    cluster_size: [n_q, bins]     EMA of assignment counts
    embed:        [n_q, bins, d]  the codebook
    embed_avg:    [n_q, bins, d]  EMA of per-code vector sums
    """
    inited: jnp.ndarray
    cluster_size: jnp.ndarray
    embed: jnp.ndarray
    embed_avg: jnp.ndarray


def _kaiming_uniform(key, shape):
    # torch nn.init.kaiming_uniform_ default: a=sqrt(5) → gain=sqrt(2/(1+5)),
    # bound = gain * sqrt(3/fan_in); fan_in = shape[1]
    fan_in = shape[-1]
    gain = (2.0 / (1.0 + 5.0)) ** 0.5
    bound = gain * (3.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_rvq_state(key: jax.Array, n_q: int, bins: int, dim: int,
                   kmeans_init: bool = True) -> CodebookState:
    """Mirror of EuclideanCodebook buffer init (core_vq.py:130-144)."""
    if kmeans_init:
        embed = jnp.zeros((n_q, bins, dim), jnp.float32)
        inited = jnp.zeros((n_q,), jnp.float32)
    else:
        embed = _kaiming_uniform(key, (n_q, bins, dim))
        inited = jnp.ones((n_q,), jnp.float32)
    return CodebookState(
        inited=inited,
        cluster_size=jnp.zeros((n_q, bins), jnp.float32),
        embed=embed,
        embed_avg=jnp.copy(embed),  # distinct buffer (donation-safe)
    )


# ------------------------------------------------------------------ search

def _nearest(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Indices of nearest codebook rows. x: [M, D], embed: [N, D] → [M] int32.

    argmax of ``-(‖x‖² − 2x·E + ‖E‖²)`` == argmax of ``2x·E − ‖E‖²``.
    """
    scores = 2.0 * jnp.dot(x, embed.T, preferred_element_type=jnp.float32)
    scores = scores - jnp.sum(jnp.square(embed), axis=-1)[None, :]
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def _sample_vectors(key: jax.Array, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    """Random rows from ``samples`` (core_vq.py:69-77): a random permutation
    prefix when enough samples exist, with-replacement draws otherwise."""
    m = samples.shape[0]
    if m >= num:
        idx = jax.random.permutation(key, m)[:num]
    else:
        idx = jax.random.randint(key, (num,), 0, m)
    return samples[idx]


def _kmeans(key: jax.Array, samples: jnp.ndarray, num_clusters: int,
            num_iters: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-means via matmul distances (core_vq.py:80-102 semantics)."""
    dim = samples.shape[-1]
    means = _sample_vectors(key, samples, num_clusters)

    def body(_, means):
        buckets = _nearest(samples, means)           # [M]
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(onehot, axis=0)                # [C]
        bins_clamped = jnp.where(bins == 0, 1.0, bins)
        sums = jnp.dot(onehot.T, samples,
                       preferred_element_type=jnp.float32)  # [C, D]
        new_means = sums / bins_clamped[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    buckets = _nearest(samples, means)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32), axis=0)
    return means, bins


# ------------------------------------------------------- single-stage train

def _stage_train_forward(state_k, x, key, *, bins: int, decay: float,
                         epsilon: float, threshold: int, kmeans_iters: int,
                         update: jnp.ndarray):
    """One VQ stage on flattened inputs ``x: [M, D]``.

    Returns (quantized [M, D] pre-STE, indices [M], new stage state).
    ``update`` masks all state mutation (False for stages beyond n_q or eval).
    """
    inited, cluster_size, embed, embed_avg = state_k
    k_init, k_expire = jax.random.split(key)

    # -- k-means init on first training batch (core_vq.py:146-157)
    def do_init(_):
        means, bins_count = _kmeans(k_init, x, bins, kmeans_iters)
        return means, means, bins_count, jnp.float32(1.0)

    def no_init(_):
        return embed, embed_avg, cluster_size, inited

    run_init = jnp.logical_and(update, inited == 0.0)
    embed, embed_avg, cluster_size, inited = jax.lax.cond(
        run_init, do_init, no_init, operand=None)

    # -- nearest neighbour + dequantize with the pre-update codebook
    idx = _nearest(x, embed)
    quantized = jnp.take(embed, idx, axis=0)

    # -- EMA codebook update (core_vq.py:223-235)
    onehot = jax.nn.one_hot(idx, bins, dtype=jnp.float32)      # [M, N]
    counts = jnp.sum(onehot, axis=0)                            # global under GSPMD
    embed_sum = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)

    new_cluster = cluster_size * decay + (1 - decay) * counts
    new_avg = embed_avg * decay + (1 - decay) * embed_sum
    smoothed = (new_cluster + epsilon) / (jnp.sum(new_cluster) + bins * epsilon) \
        * jnp.sum(new_cluster)
    embed_normalized = new_avg / smoothed[:, None]

    # -- dead-code expiry, made effective (see module docstring)
    if threshold > 0:
        expired = new_cluster < threshold                       # [N]
        fresh = _sample_vectors(k_expire, x, bins)              # [N, D]
        embed_normalized = jnp.where(expired[:, None], fresh, embed_normalized)
        new_avg = jnp.where(expired[:, None], fresh * smoothed[:, None], new_avg)

    upd = update.astype(jnp.float32)
    new_state = CodebookState(
        inited=inited * upd + state_k.inited * (1 - upd),
        cluster_size=new_cluster * upd + state_k.cluster_size * (1 - upd),
        embed=embed_normalized * upd + state_k.embed * (1 - upd),
        embed_avg=new_avg * upd + state_k.embed_avg * (1 - upd),
    )
    return quantized, idx, new_state


# --------------------------------------------------------------- RVQ public

def rvq_forward(state: CodebookState, x: jnp.ndarray, n_q, key: jax.Array, *,
                training: bool = True, decay: float = 0.99,
                epsilon: float = 1e-5, threshold_ema_dead_code: int = 2,
                kmeans_iters: int = 50, commitment_weight: float = 1.0):
    """Residual VQ training forward over ``n_q`` (traced int) stages.

    x: [B, T, D]. Returns (quantized [B, T, D] with straight-through gradient,
    codes [K, B, T] (masked stages hold 0), penalty scalar, new state).

    Mirrors ResidualVectorQuantization.forward (core_vq.py:337-355) with the
    masked fixed-stage scan replacing the python loop, and VectorQuantization
    STE/commit-loss semantics (core_vq.py:301-324).
    """
    B, T, D = x.shape
    n_q_max = state.embed.shape[0]
    bins = state.embed.shape[1]
    flat = lambda a: a.reshape(B * T, D)
    keys = jax.random.split(key, n_q_max)
    stage_idx = jnp.arange(n_q_max)

    def scan_body(carry, inp):
        residual, quantized_out, total_loss = carry
        state_k, key_k, k = inp
        mask = k < n_q
        update = jnp.logical_and(mask, jnp.asarray(training))

        q_flat, idx, new_state_k = _stage_train_forward(
            state_k, flat(residual), key_k, bins=bins, decay=decay,
            epsilon=epsilon, threshold=threshold_ema_dead_code,
            kmeans_iters=kmeans_iters, update=update)
        q = q_flat.reshape(B, T, D)
        if training:
            # straight-through estimator (core_vq.py:309)
            q_ste = residual + jax.lax.stop_gradient(q - residual)
            # commitment loss — upstream bug kept for reproducibility
            # (core_vq.py:313-320): mse(stop_grad(q), residual)
            commit = jnp.mean(jnp.square(jax.lax.stop_gradient(q) - residual))
            loss_k = commit * commitment_weight
        else:
            q_ste = q
            loss_k = jnp.float32(0.0)

        m = mask.astype(x.dtype)
        quantized_out = quantized_out + m * q_ste
        residual = residual - m * jax.lax.stop_gradient(q_ste)
        total_loss = total_loss + m * loss_k
        codes_k = jnp.where(mask, idx.reshape(B, T), 0)
        return (residual, quantized_out, total_loss), (codes_k, new_state_k)

    init = (x, jnp.zeros_like(x), jnp.float32(0.0))
    (_, quantized_out, total_loss), (codes, new_state) = jax.lax.scan(
        scan_body, init, (state, keys, stage_idx))
    # reference penalty = mean of per-stage losses over the n_q used stages
    penalty = total_loss / jnp.maximum(jnp.asarray(n_q, jnp.float32), 1.0)
    return quantized_out, codes, penalty, new_state


def rvq_encode(state: CodebookState, x: jnp.ndarray, n_q: int) -> jnp.ndarray:
    """Eval encode (core_vq.py:357-367): greedy residual argmin per stage.

    x: [B, T, D], static ``n_q`` → codes [K, B, T] int32.
    """
    B, T, D = x.shape

    def body(residual, state_k):
        idx = _nearest(residual.reshape(B * T, D), state_k.embed)
        q = jnp.take(state_k.embed, idx, axis=0).reshape(B, T, D)
        return residual - q, idx.reshape(B, T)

    sliced = jax.tree.map(lambda a: a[:n_q], state)
    _, codes = jax.lax.scan(body, x, sliced)
    return codes


def rvq_decode(state: CodebookState, codes: jnp.ndarray) -> jnp.ndarray:
    """Decode codes [K, B, T] → [B, T, D] (core_vq.py:369-375)."""
    K = codes.shape[0]

    def body(acc, inp):
        state_embed, codes_k = inp
        return acc + jnp.take(state_embed, codes_k, axis=0), None

    B, T = codes.shape[1], codes.shape[2]
    D = state.embed.shape[-1]
    acc0 = jnp.zeros((B, T, D), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (state.embed[:K], codes))
    return acc
