"""Fused Pallas resblock == SEANetResnetBlock (interpret mode; experimental
kernel, see ops/pallas_resblock.py STATUS note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu.models.seanet import SEANetResnetBlock
from encodec_pytorch_tpu.ops.conv import _weight_norm_kernel
from encodec_pytorch_tpu.ops.pallas_resblock import resblock_pallas


def _materialize(params):
    def wk(q):
        return _weight_norm_kernel(q['v'], q['g'], axis=2)
    return (wk(params['block_1']['conv']), params['block_1']['conv']['bias'],
            wk(params['block_3']['conv'])[0], params['block_3']['conv']['bias'],
            wk(params['shortcut']['conv'])[0], params['shortcut']['conv']['bias'])


@pytest.mark.parametrize("causal,d", [(True, 1), (False, 1), (True, 2)])
def test_fused_resblock_matches_xla(causal, d):
    C, T, B = 32, 300, 2
    blk = SEANetResnetBlock(C, causal=causal, norm='weight_norm',
                            true_skip=False, dilations=(d, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
    p = blk.init(jax.random.PRNGKey(1), x)['params']
    ref = blk.apply({'params': p}, x)
    k1, b1, k2, b2, ks, bs = _materialize(p)
    got = resblock_pallas(x, k1, b1, k2, b2, ks, bs, dilation=d,
                          causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
