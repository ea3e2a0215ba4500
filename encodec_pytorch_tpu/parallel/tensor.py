"""Tensor-parallel (channel-sharded) codec inference via GSPMD.

The third parallelism axis after dp (parallel/mesh.py) and segment
parallelism (parallel/segment.py): parameters are sharded across chips
on their channel axes and XLA/GSPMD inserts the collectives. This is the
scaling-book recipe verbatim — pick a mesh, annotate shardings, compile —
and deliberately NOT a hand-written Megatron-style rewrite: sharding is a
*placement property of the variables pytree*, the model code is untouched,
and the compiler chooses all-gather/psum placement. The reference has no
analogue (its only parallelism is DDP data parallel,
train_multi_gpu.py:244-266).

For an EnCodec-scale model (~15 M params) TP is a latency/throughput play,
not a memory one: the 512-channel bottleneck convs, the LSTM gate matmuls
(``[H, 4H]``) and the RVQ distance computations split across chips over
ICI. It composes with the ``data`` axis — a 2-D ``('data', 'model')`` mesh
batch-shards dim 0 while channel-sharding the params.

Sharding rule: for every parameter leaf, shard the *last* axis whose size
is divisible by the mesh's model-axis size (biases and norm gains ride
along with the output channels they scale; conv kernels ``[k, in, out]``
shard out; conv-transpose kernels ``[k, out, in]`` shard in — GSPMD
re-shards at boundaries as needed). Leaves with no divisible axis stay
replicated, so any model works on any mesh; a model with all-divisible
channel widths gets the full split.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec(shape, n_shards: int, axis_name: str = 'model') -> P:
    """PartitionSpec sharding the last divisible axis of ``shape``.

    Scalars / shapes with no axis divisible by ``n_shards`` replicate.
    """
    if n_shards <= 1:
        return P()
    for ax in reversed(range(len(shape))):
        if shape[ax] >= n_shards and shape[ax] % n_shards == 0:
            spec = [None] * len(shape)
            spec[ax] = axis_name
            return P(*spec)
    return P()


def tp_shardings(tree, mesh: Mesh, axis_name: str = 'model'):
    """Pytree of NamedShardings implementing the channel-sharding rule."""
    n = mesh.shape[axis_name]
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, tp_spec(jnp.shape(leaf), n, axis_name)), tree)


def shard_variables_tp(variables, mesh: Mesh, axis_name: str = 'model'):
    """Place a variables pytree channel-sharded over ``mesh``'s model axis.

    Returns the same pytree with every leaf committed to its TP sharding;
    jit calls consuming it inherit the placements (GSPMD propagates from
    the committed inputs — no in_shardings needed at the call site).
    """
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s), variables,
        tp_shardings(variables, mesh, axis_name))


def count_sharded(tree, mesh: Mesh, axis_name: str = 'model') -> int:
    """How many leaves the rule actually shards (diagnostics/tests)."""
    n = mesh.shape[axis_name]
    return sum(1 for leaf in jax.tree.leaves(tree)
               if tp_spec(jnp.shape(leaf), n, axis_name) != P())


def roundtrip_tp(model, variables, x: jnp.ndarray, mesh: Mesh,
                 axis_name: str = 'model',
                 data_axis: Optional[str] = None) -> jnp.ndarray:
    """Eval forward (encode→quantize→decode) with channel-sharded params.

    ``variables`` are committed to TP shardings, ``x`` is batch-sharded on
    ``data_axis`` if given (2-D dp×tp mesh) else replicated, and the whole
    forward compiles as one SPMD program. Output matches the single-device
    ``model(variables, x)`` up to collective-reduction reassociation.
    """
    variables = shard_variables_tp(variables, mesh, axis_name)
    x_sharding = NamedSharding(
        mesh, P(data_axis) if data_axis is not None else P())
    x = jax.device_put(x, x_sharding)

    # model.bandwidth is read at TRACE time (it selects n_q) — key the
    # compiled program on it so set_target_bandwidth takes effect
    cache_key = (axis_name, data_axis, model.bandwidth)
    cache: Any = model.__dict__.setdefault('_tp_cache', {})
    fn = cache.get(cache_key)
    if fn is None:
        fn = jax.jit(lambda v, x: model(v, x))
        cache[cache_key] = fn
    return fn(variables, x)
