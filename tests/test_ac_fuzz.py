"""Adversarial fuzzing of the C++ arithmetic coder against the Python oracle.

Round-1 tests used random uniform/softmax pdfs; these push the edge cases the
`.ecdc` wire format must survive byte-identically (reference semantics:
/root/reference/quantization/ac.py:18-53 CDF quantization, 56-260 coder):
delta distributions, near-zero mass, cardinality 1 and 4000, and mixed
streams where the pdf changes shape every step.
"""

import io

import numpy as np
import pytest

from encodec_pytorch_tpu.bitstream import ac as ac_mod
from encodec_pytorch_tpu.bitstream import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native ecdc lib unavailable')


def _adversarial_pdfs(rng, card):
    """A generator of nasty pdfs of the given cardinality."""
    eye = np.zeros(card, np.float32)
    eye[rng.randint(card)] = 1.0
    yield eye                                           # delta
    tiny = np.full(card, 1e-12, np.float32)
    tiny[rng.randint(card)] = 1.0
    yield tiny / tiny.sum()                             # near-zero mass
    u = rng.rand(card).astype(np.float32) ** 20
    yield u / u.sum()                                   # extreme skew
    z = rng.rand(card).astype(np.float32)
    z[rng.rand(card) < 0.9] = 0.0                       # mostly-zero support
    if z.sum() == 0:
        z[0] = 1.0
    yield z / z.sum()
    yield np.full(card, 1.0 / card, np.float32)         # uniform


@pytest.mark.parametrize('card', [1, 2, 17, 1024, 4000])
def test_native_matches_python_oracle_bytes_and_symbols(card):
    rng = np.random.RandomState(card)
    pdfs, symbols = [], []
    for _ in range(8):
        for pdf in _adversarial_pdfs(rng, card):
            pdfs.append(pdf)
            # bias the symbol choice toward the pdf but sometimes pick a
            # zero-probability symbol (min_range guarantees it a slot)
            if rng.rand() < 0.3:
                symbols.append(rng.randint(card))
            else:
                symbols.append(int(np.argmax(
                    pdf * rng.rand(card).astype(np.float32) + 1e-9)))

    # --- python oracle encode
    fo = io.BytesIO()
    coder = ac_mod.ArithmeticCoder(fo)
    py_cdfs = [ac_mod.build_stable_quantized_cdf(p, 24, check=False)
               for p in pdfs]
    for sym, cdf in zip(symbols, py_cdfs):
        coder.push(sym, cdf)
    coder.flush()
    py_bytes = fo.getvalue()

    # --- native encode (scalar pushes)
    enc = native.NativeAcEncoder(24)
    for sym, pdf in zip(symbols, pdfs):
        enc.push(sym, native.build_cdf(pdf, 24))
    assert enc.finish() == py_bytes

    # --- native encode (batched pushes, same card per batch here)
    enc2 = native.NativeAcEncoder(24)
    enc2.push_batch(np.asarray(symbols, np.int32),
                    native.build_cdf_batch(np.stack(pdfs), 24))
    assert enc2.finish() == py_bytes

    # --- CDF quantization parity
    nat_cdfs = native.build_cdf_batch(np.stack(pdfs), 24)
    np.testing.assert_array_equal(np.stack(py_cdfs), nat_cdfs)

    # --- decode (both ways) restores the symbols
    dec = native.NativeAcDecoder(py_bytes, 24)
    got = [dec.pull(c) for c in nat_cdfs]
    assert got == symbols
    dec2 = native.NativeAcDecoder(py_bytes, 24)
    got2 = dec2.pull_batch(nat_cdfs)
    np.testing.assert_array_equal(got2, np.asarray(symbols))
    py_dec = ac_mod.ArithmeticDecoder(io.BytesIO(py_bytes))
    got3 = [py_dec.pull(c) for c in py_cdfs]
    assert got3 == symbols


def test_native_decoder_exhausts_cleanly():
    """Decoding more symbols than encoded returns None / short batch, matching
    the python oracle's end-of-stream behavior (reference ac.py:283-288)."""
    rng = np.random.RandomState(0)
    pdf = rng.rand(64).astype(np.float32)
    pdf /= pdf.sum()
    cdf = native.build_cdf(pdf, 24)
    enc = native.NativeAcEncoder(24)
    for s in (3, 60, 1):
        enc.push(s, cdf)
    data = enc.finish()

    dec = native.NativeAcDecoder(data, 24)
    py = ac_mod.ArithmeticDecoder(io.BytesIO(data))
    py_cdf = ac_mod.build_stable_quantized_cdf(pdf, 24, check=False)
    n_native = 0
    while dec.pull(cdf) is not None:
        n_native += 1
        assert n_native < 1000
    n_py = 0
    while py.pull(py_cdf) is not None:
        n_py += 1
    assert n_native == n_py >= 3
