"""Serving runtime: dynamic micro-batching over one device-owning worker.

The TPU serves one program at a time; throughput comes from batch size
(docs/PERF_NOTES.md: single-stream vs batched RTF). This module turns
concurrent single-clip requests into padded device batches:

- :class:`LiveCodec` — a jit-cached encode/decode/roundtrip facade over a
  live ``(model, variables)`` pair with the exact same calling interface
  as :class:`encodec_pytorch_tpu.deploy.DeployedCodec`, so a server can
  run from a checkpoint or from a StableHLO artifact interchangeably.
- :class:`CodecServer` — a thread-safe front over either backend: callers
  block on ``roundtrip``/``encode``/``decode`` (or get a Future via
  ``submit``); a single worker thread owns the device, coalesces
  compatible queued requests (same kind/bandwidth/shape) into one batch,
  pads to a bounded set of bucket sizes (so XLA compiles per bucket, not
  per arrival pattern), dispatches, and fans results back out.

The reference has no serving runtime at all — its inference surface is a
one-file-at-a-time CLI (main.py:141-155). Design follows the standard
dynamic-batching recipe (max_batch + max_wait deadline) used by serving
systems; batching axis is always axis 0 of every array leaf.
"""

import collections
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from .deploy import _decode_fn, _encode_fn, _roundtrip_fn

_KINDS = ('encode', 'decode', 'roundtrip')


class LiveCodec:
    """DeployedCodec-compatible facade over a live model.

    Calls are jit-compiled and cached per (kind, bandwidth, output
    length); XLA additionally specializes per input shape. NOT
    thread-safe (``set_target_bandwidth`` mutates the model around
    tracing) — :class:`CodecServer` serializes access; for direct
    multi-threaded use, wrap calls in your own lock.
    """

    def __init__(self, model, variables,
                 default_bandwidth: Optional[float] = None):
        self.model = model
        self.variables = variables
        # snapshot: requests with bandwidth=None must not depend on what
        # earlier requests set the (shared, mutable) model to
        self.default_bandwidth = (default_bandwidth
                                  if default_bandwidth is not None
                                  else model.bandwidth)
        self._jitted: Dict[Tuple, Any] = {}

    def _fn(self, kind: str, bandwidth: Optional[float],
            length: Optional[int]):
        bw = bandwidth if bandwidth is not None else self.default_bandwidth
        key = (kind, bw, length)
        fn = self._jitted.get(key)
        if fn is None:
            if kind == 'encode':
                fn = jax.jit(_encode_fn(self.model, self.variables))
            elif kind == 'roundtrip':
                fn = jax.jit(_roundtrip_fn(self.model, self.variables))
            else:
                fn = jax.jit(_decode_fn(self.model, self.variables, length))
            self._jitted[key] = fn
        # the model's bandwidth is read at TRACE time (it selects n_q);
        # set it for every call — jit traces lazily per input shape
        if bw is not None:
            self.model.set_target_bandwidth(bw)
        return fn

    def encode(self, x, bandwidth: Optional[float] = None):
        return self._fn('encode', bandwidth, None)(np.asarray(x))

    def decode(self, codes, scales=None, bandwidth: Optional[float] = None,
               length: Optional[int] = None):
        fn = self._fn('decode', bandwidth, length)
        codes = tuple(codes)
        if self.model.normalize:
            if scales is None:
                raise ValueError("this model normalizes: pass scales")
            return fn(codes, tuple(scales))
        return fn(codes)

    def roundtrip(self, x, bandwidth: Optional[float] = None):
        return self._fn('roundtrip', bandwidth, None)(np.asarray(x))


class _Request:
    __slots__ = ('kind', 'args', 'bandwidth', 'length', 'future', 't0')

    def __init__(self, kind, args, bandwidth, length):
        self.kind = kind
        self.args = args          # pytree; every array leaf is ONE item
        self.bandwidth = bandwidth
        self.length = length
        self.future: Future = Future()
        self.t0 = time.monotonic()

    def batch_key(self):
        leaves, treedef = jax.tree.flatten(self.args)
        shapes = tuple((np.shape(l), np.asarray(l).dtype.str) for l in leaves)
        return (self.kind, self.bandwidth, self.length, treedef, shapes)


class CodecServer:
    """Dynamic micro-batching server over a LiveCodec or DeployedCodec.

    - ``max_batch``: hard cap on items per dispatch.
    - ``max_wait_ms``: after the first request of a batch arrives, how
      long to hold the dispatch open for more compatible requests.
    - ``bucket_sizes``: batches are padded (by repeating the last item)
      up to the next bucket so the compiler sees a bounded set of batch
      shapes; results for pad rows are dropped.
    """

    def __init__(self, backend, *, max_batch: int = 8,
                 max_wait_ms: float = 2.0,
                 bucket_sizes: Sequence[int] = (1, 2, 4, 8, 16, 32)):
        self.backend = backend
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.buckets = sorted(b for b in bucket_sizes if b <= max_batch) \
            or [max_batch]
        self._queue: collections.deque = collections.deque()
        self._cv = threading.Condition()
        self._stop = False
        self._thread: Optional[threading.Thread] = None
        self._stats = {'requests': 0, 'batches': 0, 'batched_items': 0,
                       'padded_items': 0}
        self._latencies: collections.deque = collections.deque(maxlen=1000)

    # ------------------------------------------------------------ lifecycle

    def start(self) -> 'CodecServer':
        if self._thread is None:
            self._stop = False
            self._thread = threading.Thread(target=self._worker,
                                            name='codec-server', daemon=True)
            self._thread.start()
        return self

    def stop(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------ submit

    def submit(self, kind: str, args, bandwidth: Optional[float] = None,
               length: Optional[int] = None) -> Future:
        """Enqueue one item; the Future resolves to its un-batched result."""
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {_KINDS}")
        req = _Request(kind, args, bandwidth, length)
        with self._cv:
            self._stats['requests'] += 1
            self._queue.append(req)
            self._cv.notify()
        return req.future

    def roundtrip(self, x, bandwidth: Optional[float] = None,
                  timeout: Optional[float] = None):
        """x: ONE clip [C, T] → [C, T]."""
        return self.submit('roundtrip', np.asarray(x),
                           bandwidth).result(timeout)

    def encode(self, x, bandwidth: Optional[float] = None,
               timeout: Optional[float] = None):
        """x: ONE clip [C, T] → per-frame codes tuple ([K, Tf_i], ...)
        (plus a scales tuple for normalizing models)."""
        return self.submit('encode', np.asarray(x),
                           bandwidth).result(timeout)

    def decode(self, codes, scales=None, bandwidth: Optional[float] = None,
               length: Optional[int] = None,
               timeout: Optional[float] = None):
        """codes: ONE clip's per-frame tuple ([K, Tf_i], ...) → [C, T]."""
        args = (tuple(codes), tuple(scales)) if scales is not None \
            else (tuple(codes),)
        return self.submit('decode', args, bandwidth,
                           length).result(timeout)

    def stats(self) -> dict:
        with self._cv:
            s = dict(self._stats)
            lats = sorted(self._latencies)
        if lats:
            s['latency_p50_ms'] = 1e3 * lats[len(lats) // 2]
            s['latency_p99_ms'] = 1e3 * lats[min(len(lats) - 1,
                                                 int(len(lats) * 0.99))]
        s['mean_batch'] = (s['batched_items'] / s['batches']
                           if s['batches'] else 0.0)
        return s

    # ------------------------------------------------------------ worker

    def _take_batch(self) -> List[_Request]:
        """Block for the first request, then hold the dispatch open up to
        max_wait for more requests with the same batch key (FIFO order;
        incompatible requests stay queued)."""
        with self._cv:
            while not self._queue and not self._stop:
                self._cv.wait(timeout=0.1)
            if self._stop and not self._queue:
                return []
            head = self._queue.popleft()
            key = head.batch_key()
            batch = [head]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                # pull every currently-queued compatible request
                rest = []
                for r in self._queue:
                    if len(batch) < self.max_batch and r.batch_key() == key:
                        batch.append(r)
                    else:
                        rest.append(r)
                self._queue = collections.deque(rest)
                if len(batch) >= self.max_batch:
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0 or self._stop:
                    break
                self._cv.wait(timeout=remaining)
            return batch

    def _dispatch(self, batch: List[_Request]):
        n = len(batch)
        padded = next((b for b in self.buckets if b >= n), self.max_batch)
        padded = max(padded, n)
        # stack items on a new axis 0; pad by repeating the last item
        rows = [r.args for r in batch] + [batch[-1].args] * (padded - n)
        leaves = [jax.tree.leaves(r) for r in rows]
        treedef = jax.tree.structure(batch[0].args)
        stacked = treedef.unflatten(
            [np.stack([row[i] for row in leaves])
             for i in range(len(leaves[0]))])

        head = batch[0]
        if head.kind == 'roundtrip':
            out = self.backend.roundtrip(stacked, bandwidth=head.bandwidth)
        elif head.kind == 'encode':
            out = self.backend.encode(stacked, bandwidth=head.bandwidth)
        else:
            codes = stacked[0]
            scales = stacked[1] if len(stacked) > 1 else None
            out = self.backend.decode(codes, scales,
                                      bandwidth=head.bandwidth,
                                      length=head.length)
        out = jax.tree.map(np.asarray, out)

        now = time.monotonic()
        with self._cv:
            self._stats['batches'] += 1
            self._stats['batched_items'] += n
            self._stats['padded_items'] += padded - n
            for r in batch:
                self._latencies.append(now - r.t0)
        for i, r in enumerate(batch):
            r.future.set_result(jax.tree.map(lambda a: a[i], out))

    def _worker(self):
        while True:
            batch = self._take_batch()
            if not batch:
                return
            try:
                self._dispatch(batch)
            except Exception as e:  # noqa: BLE001 — fan the error out
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
