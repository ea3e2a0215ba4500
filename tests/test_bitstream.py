"""Bitstream: ECDC header, BitPacker/Unpacker, arithmetic coder — including
byte-exactness of the C++ fast path vs the pure-Python implementation and
byte-compatibility with the reference torch implementation."""

import io
import random
import sys

import numpy as np
import pytest

from encodec_pytorch_tpu.bitstream import (
    ArithmeticCoder, ArithmeticDecoder, BitPacker, BitUnpacker,
    build_stable_quantized_cdf, read_ecdc_header, write_ecdc_header)
from encodec_pytorch_tpu.bitstream import native

REF = '/root/reference'


def test_ecdc_header_roundtrip():
    fo = io.BytesIO()
    meta = {'m': 'encodec_24khz', 'al': 48000, 'nc': 8, 'lm': False, 'fr': 150}
    write_ecdc_header(fo, meta)
    fo.seek(0)
    assert read_ecdc_header(fo) == meta
    # wire format starts with the magic
    assert fo.getvalue()[:4] == b'ECDC'


def test_bitpacker_roundtrip_ghost_values():
    # mirrors reference binary.py:126-150
    rng = random.Random(1234)
    for rep in range(8):
        length = rng.randrange(10, 2000)
        bits = rng.randrange(1, 16)
        tokens = [rng.randrange(2 ** bits) for _ in range(length)]
        buf = io.BytesIO()
        packer = BitPacker(bits, buf)
        for token in tokens:
            packer.push(token)
        packer.flush()
        buf.seek(0)
        unpacker = BitUnpacker(bits, buf)
        rebuilt = []
        while True:
            value = unpacker.pull()
            if value is None:
                break
            rebuilt.append(value)
        assert len(tokens) <= len(rebuilt) <= len(tokens) + 8 // bits
        assert rebuilt[:len(tokens)] == tokens


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_bitpack_matches_python():
    rng = random.Random(7)
    for bits in [1, 3, 7, 10, 16]:
        tokens = [rng.randrange(2 ** bits) for _ in range(501)]
        buf_py = io.BytesIO()
        p = BitPacker(bits, buf_py)
        for t in tokens:
            p.push(t)
        p.flush()
        buf_nat = io.BytesIO()
        p2 = BitPacker(bits, buf_nat)
        p2.push_all(tokens)
        p2.flush()
        assert buf_py.getvalue() == buf_nat.getvalue()
        # native unpack
        vals = native.unpack_bits(buf_py.getvalue(), bits, len(tokens))
        assert list(vals) == tokens


def test_arithmetic_coder_roundtrip():
    # mirrors reference ac.py:263-288
    rng = np.random.RandomState(1234)
    pyrng = random.Random(1234)
    for _ in range(3):
        cardinality = pyrng.randrange(2, 4000)
        steps = pyrng.randrange(100, 300)
        fo = io.BytesIO()
        encoder = ArithmeticCoder(fo)
        symbols, pdfs = [], []
        for _ in range(steps):
            logits = rng.randn(cardinality)
            pdf = np.exp(logits - logits.max())
            pdf = (pdf / pdf.sum()).astype(np.float32)
            pdfs.append(pdf)
            q_cdf = build_stable_quantized_cdf(pdf, encoder.total_range_bits)
            p64 = pdf.astype(np.float64)
            p64 /= p64.sum()
            symbol = int(rng.choice(cardinality, p=p64))
            symbols.append(symbol)
            encoder.push(symbol, q_cdf)
        encoder.flush()

        fo.seek(0)
        decoder = ArithmeticDecoder(fo)
        for idx, (pdf, symbol) in enumerate(zip(pdfs, symbols)):
            q_cdf = build_stable_quantized_cdf(pdf, decoder.total_range_bits)
            assert decoder.pull(q_cdf) == symbol, idx
        assert decoder.pull(np.zeros(1, np.int64)) is None


def test_cdf_matches_reference_torch():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    sys.modules.setdefault('binary', __import__('importlib').import_module('binary'))
    from quantization.ac import build_stable_quantized_cdf as ref_cdf
    rng = np.random.RandomState(0)
    for card in [7, 101, 1024]:
        pdf = rng.rand(card).astype(np.float32)
        pdf /= pdf.sum()
        ours = build_stable_quantized_cdf(pdf, 24)
        theirs = ref_cdf(torch.from_numpy(pdf), 24).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_ac_bytes_match_reference_torch():
    """Our AC must produce byte-identical streams to the reference coder."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from quantization.ac import (ArithmeticCoder as RefCoder,
                                 build_stable_quantized_cdf as ref_cdf)
    rng = np.random.RandomState(42)
    card, steps = 1024, 200
    fo_ref, fo_ours = io.BytesIO(), io.BytesIO()
    ref_enc = RefCoder(fo_ref)
    our_enc = ArithmeticCoder(fo_ours)
    for _ in range(steps):
        pdf = rng.rand(card).astype(np.float32)
        pdf /= pdf.sum()
        sym = int(rng.randint(card))
        ref_enc.push(sym, ref_cdf(torch.from_numpy(pdf), 24, check=False))
        our_enc.push(sym, build_stable_quantized_cdf(pdf, 24, check=False))
    ref_enc.flush()
    our_enc.flush()
    assert fo_ref.getvalue() == fo_ours.getvalue()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_ac_matches_python():
    rng = np.random.RandomState(3)
    card, steps = 512, 300
    pdfs = rng.rand(steps, card).astype(np.float32)
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    symbols = rng.randint(0, card, steps).astype(np.int32)

    cdfs_py = np.stack([build_stable_quantized_cdf(p, 24, check=False)
                        for p in pdfs])
    cdfs_nat = np.stack([native.build_cdf(p, 24) for p in pdfs])
    np.testing.assert_array_equal(cdfs_py, cdfs_nat)

    fo = io.BytesIO()
    enc = ArithmeticCoder(fo)
    for s, cdf in zip(symbols, cdfs_py):
        enc.push(int(s), cdf)
    enc.flush()

    nat = native.NativeAcEncoder(24)
    nat.push_batch(symbols, cdfs_py)
    nat_bytes = nat.finish()
    assert fo.getvalue() == nat_bytes

    dec = native.NativeAcDecoder(nat_bytes, 24)
    out = dec.pull_batch(cdfs_py)
    np.testing.assert_array_equal(out, symbols)
    dec.close()
