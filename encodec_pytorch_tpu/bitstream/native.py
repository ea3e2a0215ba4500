"""ctypes bindings for the native .ecdc hot loops (native/ecdc.cpp).

The shared library is built lazily with g++ on first use and cached next to
the source; every entry point has a pure-Python fallback in binary.py/ac.py,
so ``available()`` gating is the only contract.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'native', 'ecdc.cpp')
_SO = os.path.join(os.path.dirname(_SRC), 'libecdc.so')


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(['g++', '-O3', '-fPIC', '-shared', _SRC, '-o', _SO],
                       check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        c = ctypes
        lib.ecdc_pack_bits.restype = c.c_size_t
        lib.ecdc_pack_bits.argtypes = [c.c_void_p, c.c_size_t, c.c_int,
                                       c.c_void_p, c.POINTER(c.c_uint64),
                                       c.POINTER(c.c_int)]
        lib.ecdc_unpack_bits.restype = c.c_size_t
        lib.ecdc_unpack_bits.argtypes = [c.c_void_p, c.c_size_t, c.c_int,
                                         c.c_void_p, c.c_size_t]
        lib.ecdc_ac_encoder_new.restype = c.c_void_p
        lib.ecdc_ac_encoder_new.argtypes = [c.c_int]
        lib.ecdc_ac_encoder_push.argtypes = [c.c_void_p, c.c_int, c.c_void_p]
        lib.ecdc_ac_encoder_push_batch.argtypes = [
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_size_t, c.c_size_t]
        lib.ecdc_ac_encoder_flush_size.restype = c.c_size_t
        lib.ecdc_ac_encoder_flush_size.argtypes = [c.c_void_p]
        lib.ecdc_ac_encoder_copy.argtypes = [c.c_void_p, c.c_void_p]
        lib.ecdc_ac_encoder_free.argtypes = [c.c_void_p]
        lib.ecdc_ac_decoder_new.restype = c.c_void_p
        lib.ecdc_ac_decoder_new.argtypes = [c.c_void_p, c.c_size_t, c.c_int]
        lib.ecdc_ac_decoder_pull.restype = c.c_int
        lib.ecdc_ac_decoder_pull.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
        lib.ecdc_ac_decoder_pull_batch.restype = c.c_size_t
        lib.ecdc_ac_decoder_pull_batch.argtypes = [
            c.c_void_p, c.c_void_p, c.c_size_t, c.c_size_t, c.c_void_p]
        lib.ecdc_ac_decoder_free.argtypes = [c.c_void_p]
        lib.ecdc_build_cdf.argtypes = [c.c_void_p, c.c_size_t, c.c_int,
                                       c.c_float, c.c_int, c.c_void_p]
        lib.ecdc_build_cdf_batch.argtypes = [
            c.c_void_p, c.c_size_t, c.c_size_t, c.c_int, c.c_float, c.c_int,
            c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------- bit packing

def pack_bits(values, bits: int) -> Tuple[bytes, int, int]:
    """→ (complete bytes, tail_value, tail_bits)."""
    lib = _load()
    vals = np.ascontiguousarray(values, dtype=np.int32)
    out = np.empty(len(vals) * bits // 8 + 8, np.uint8)
    tail_value = ctypes.c_uint64()
    tail_bits = ctypes.c_int()
    n = lib.ecdc_pack_bits(vals.ctypes.data, len(vals), bits, out.ctypes.data,
                           ctypes.byref(tail_value), ctypes.byref(tail_bits))
    return out[:n].tobytes(), int(tail_value.value), int(tail_bits.value)


def unpack_bits(data: bytes, bits: int, max_out: int) -> np.ndarray:
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(max_out, np.int32)
    n = lib.ecdc_unpack_bits(buf.ctypes.data, len(buf), bits,
                             out.ctypes.data, max_out)
    return out[:n]


# -------------------------------------------------------- arithmetic coder

class NativeAcEncoder:
    def __init__(self, total_range_bits: int = 24):
        self._lib = _load()
        self._h = self._lib.ecdc_ac_encoder_new(total_range_bits)

    def push(self, symbol: int, cdf: np.ndarray):
        cdf = np.ascontiguousarray(cdf, np.int64)
        self._lib.ecdc_ac_encoder_push(self._h, symbol, cdf.ctypes.data)

    def push_batch(self, symbols: np.ndarray, cdfs: np.ndarray):
        symbols = np.ascontiguousarray(symbols, np.int32)
        cdfs = np.ascontiguousarray(cdfs, np.int64)
        self._lib.ecdc_ac_encoder_push_batch(
            self._h, symbols.ctypes.data, cdfs.ctypes.data,
            len(symbols), cdfs.shape[-1])

    def finish(self) -> bytes:
        n = self._lib.ecdc_ac_encoder_flush_size(self._h)
        out = np.empty(n, np.uint8)
        self._lib.ecdc_ac_encoder_copy(self._h, out.ctypes.data)
        self._lib.ecdc_ac_encoder_free(self._h)
        self._h = None
        return out.tobytes()


class NativeAcDecoder:
    def __init__(self, data: bytes, total_range_bits: int = 24):
        self._lib = _load()
        self._buf = np.frombuffer(data, np.uint8)
        self._h = self._lib.ecdc_ac_decoder_new(
            self._buf.ctypes.data, len(self._buf), total_range_bits)

    def pull(self, cdf: np.ndarray) -> Optional[int]:
        cdf = np.ascontiguousarray(cdf, np.int64)
        sym = self._lib.ecdc_ac_decoder_pull(self._h, cdf.ctypes.data, len(cdf))
        if sym == -2:
            raise RuntimeError("Binary search failed")
        return None if sym < 0 else sym

    def pull_batch(self, cdfs: np.ndarray) -> np.ndarray:
        cdfs = np.ascontiguousarray(cdfs, np.int64)
        out = np.empty(cdfs.shape[0], np.int32)
        n = self._lib.ecdc_ac_decoder_pull_batch(
            self._h, cdfs.ctypes.data, cdfs.shape[0], cdfs.shape[-1],
            out.ctypes.data)
        return out[:n]

    def close(self):
        if self._h is not None:
            self._lib.ecdc_ac_decoder_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def build_cdf_batch(pdfs: np.ndarray, total_range_bits: int = 24,
                    roundoff: float = 1e-8, min_range: int = 2) -> np.ndarray:
    """[n, card] pdfs → [n, card] quantized CDFs in one native call."""
    lib = _load()
    pdfs = np.ascontiguousarray(pdfs, np.float32)
    n, card = pdfs.shape
    out = np.empty((n, card), np.int64)
    lib.ecdc_build_cdf_batch(pdfs.ctypes.data, n, card, total_range_bits,
                             roundoff, min_range, out.ctypes.data)
    return out


def build_cdf(pdf: np.ndarray, total_range_bits: int = 24,
              roundoff: float = 1e-8, min_range: int = 2) -> np.ndarray:
    lib = _load()
    pdf = np.ascontiguousarray(pdf, np.float32)
    out = np.empty(len(pdf), np.int64)
    lib.ecdc_build_cdf(pdf.ctypes.data, len(pdf), total_range_bits,
                       roundoff, min_range, out.ctypes.data)
    return out
