"""Padding math parity with the worked example in reference conv.py:69-74."""

import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.ops.pad import (
    get_extra_padding_for_conv1d, pad1d, pad_for_conv1d, unpad1d)


def test_extra_padding_worked_example():
    # conv.py docstring: total padding = 4, kernel = 4, stride = 2, len = 5
    # ideal length pads one extra step
    assert get_extra_padding_for_conv1d(5, kernel_size=4, stride=2, padding_total=4) == 1


def test_extra_padding_exact_multiple():
    # 24000 samples, hop 320 stack: every strided conv should need no pad when
    # length is already ideal
    assert get_extra_padding_for_conv1d(16, kernel_size=4, stride=2, padding_total=2) == 0


def test_pad_for_conv1d_makes_full_windows():
    for length in range(5, 40):
        for k, s in [(4, 2), (7, 1), (10, 5), (16, 8)]:
            pt = k - s
            x = jnp.zeros((1, length, 1))
            y = pad_for_conv1d(x, k, s, pt)
            n_frames = (y.shape[1] - k + pt) / s + 1
            assert n_frames == int(n_frames)  # last window is full


def test_pad1d_zero_and_unpad_roundtrip():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 12, 1)
    y = pad1d(x, (3, 2), mode='zero')
    assert y.shape == (1, 17, 1)
    assert float(y[0, 0, 0]) == 0.0 and float(y[0, -1, 0]) == 0.0
    z = unpad1d(y, (3, 2))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_pad1d_reflect_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    for length, pl, pr in [(12, 3, 2), (5, 6, 6), (2, 6, 3), (1, 4, 4)]:
        xn = rng.randn(2, length, 3).astype(np.float32)
        ours = np.asarray(pad1d(jnp.asarray(xn), (pl, pr), mode='reflect'))
        # reference semantics: zero right-pad to len max_pad+1 before reflect
        xt = torch.from_numpy(xn).permute(0, 2, 1)
        max_pad = max(pl, pr)
        extra = max(0, max_pad - length + 1)
        if extra:
            xt = F.pad(xt, (0, extra))
        theirs = F.pad(xt, (pl, pr), mode='reflect')
        theirs = theirs[..., :theirs.shape[-1] - extra]
        np.testing.assert_allclose(ours, theirs.permute(0, 2, 1).numpy(), atol=0)
