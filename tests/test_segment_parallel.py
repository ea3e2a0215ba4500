"""Segment-parallel inference == sequential segment loop, incl. over a mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.parallel.mesh import create_mesh
from encodec_pytorch_tpu.parallel.segment import roundtrip_parallel


def _model():
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=False, model_norm='time_group_norm',
        audio_normalize=True, segment=0.1, n_q=2, n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)
    return model, variables


def test_segment_parallel_matches_sequential():
    model, variables = _model()
    # 8 full segments + a partial tail
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 2400 * 8 + 1000)) * 0.2
    seq = model(variables, x)
    par = roundtrip_parallel(model, variables, x)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=2e-5)


def test_segment_parallel_sharded_over_mesh():
    model, variables = _model()
    mesh = create_mesh()
    # segment count divisible by 8 devices; stride < segment (overlap) means
    # offsets= n*stride; choose length for exactly 16 full segments
    stride = model.segment_stride
    length = stride * 15 + model.segment_length
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, length)) * 0.2
    seq = model(variables, x)
    par = roundtrip_parallel(model, variables, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=2e-5)
