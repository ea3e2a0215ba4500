"""Tensor-parallel (channel-sharded) inference — parallel/tensor.py.

GSPMD correctness: the eval forward with parameters sharded over a
('model',) mesh (and over the model axis of a 2-D dp×tp mesh) must match
the single-device forward up to collective-reduction reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.parallel.mesh import create_mesh
from encodec_pytorch_tpu.parallel.tensor import (
    count_sharded, roundtrip_tp, shard_variables_tp, tp_spec)


def _model_and_vars(n_filters=16, channels=1, normalize=False):
    # n_filters=16 → conv widths 16..256, dimension 128, LSTM H=256:
    # every channel axis divisible by 8 so the rule shards the whole net
    model = EncodecModel._get_model(
        [1.5, 3., 6.], 24_000, channels, causal=True,
        model_norm='weight_norm', audio_normalize=normalize, segment=None,
        n_q=8, n_filters=n_filters)
    model.set_target_bandwidth(6.)
    variables = model.init(jax.random.PRNGKey(0), example_length=1920)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    return model, variables


def test_tp_spec_rule():
    assert tp_spec((7, 16, 256), 8) == P(None, None, 'model')
    assert tp_spec((7, 256, 30), 8) == P(None, 'model', None)  # last divisible
    assert tp_spec((3, 5, 7), 8) == P()                        # none divisible
    assert tp_spec((8,), 8) == P('model')
    assert tp_spec((), 8) == P()
    assert tp_spec((256,), 1) == P()                           # 1 shard → repl


def test_tp_roundtrip_matches_single_device():
    model, variables = _model_and_vars()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1920)) * 0.1
    y_ref = np.asarray(model(variables, x))

    mesh = create_mesh(8, ('model',))
    n_sharded = count_sharded(variables, mesh)
    assert n_sharded > 30, n_sharded  # the rule splits the bulk of the net
    y_tp = np.asarray(roundtrip_tp(model, variables, x, mesh))
    np.testing.assert_allclose(y_tp, y_ref, atol=2e-5, rtol=1e-5)


def test_tp_sharding_is_committed():
    model, variables = _model_and_vars()
    mesh = create_mesh(8, ('model',))
    sharded = shard_variables_tp(variables, mesh)
    # a 256-out conv kernel really lives split across the 8 devices
    leaf = sharded['params']['encoder']['layer_9']['conv']['v']
    assert leaf.sharding.spec == P(None, None, 'model')
    assert len({s.device for s in leaf.addressable_shards}) == 8
    assert leaf.addressable_shards[0].data.shape[-1] == leaf.shape[-1] // 8


def test_tp_with_data_axis():
    """2-D (data=2, model=4) mesh: batch sharded on data, params on model."""
    model, variables = _model_and_vars(normalize=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 1920)) * 0.1
    y_ref = np.asarray(model(variables, x))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ('data', 'model'))
    y_tp = np.asarray(roundtrip_tp(model, variables, x, mesh,
                                   data_axis='data'))
    np.testing.assert_allclose(y_tp, y_ref, atol=2e-5, rtol=1e-5)


def test_tp_tracks_bandwidth():
    """Regression: roundtrip_tp's jit cache is keyed on model.bandwidth
    (read at trace time to select n_q); switching bandwidths must not
    serve the first compiled program."""
    model, variables = _model_and_vars()
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 1920)) * 0.1
    mesh = create_mesh(8, ('model',))
    model.set_target_bandwidth(1.5)
    y_lo = np.asarray(roundtrip_tp(model, variables, x, mesh))
    ref_lo = np.asarray(model(variables, x))
    model.set_target_bandwidth(6.)
    y_hi = np.asarray(roundtrip_tp(model, variables, x, mesh))
    ref_hi = np.asarray(model(variables, x))
    assert not np.allclose(ref_lo, ref_hi)
    np.testing.assert_allclose(y_lo, ref_lo, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(y_hi, ref_hi, atol=2e-5, rtol=1e-5)


def test_tp_indivisible_widths_replicate():
    """A model whose widths don't divide the mesh still runs (replicated
    leaves), and the output is unchanged."""
    model, variables = _model_and_vars(n_filters=6)  # widths 6,12,24,48,96
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 1920)) * 0.1
    y_ref = np.asarray(model(variables, x))
    mesh = create_mesh(8, ('model',))
    y_tp = np.asarray(roundtrip_tp(model, variables, x, mesh))
    np.testing.assert_allclose(y_tp, y_ref, atol=2e-5, rtol=1e-5)


if __name__ == '__main__':
    pytest.main([__file__, '-v'])
