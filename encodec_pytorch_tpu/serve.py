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
import jax.numpy as jnp
import numpy as np

from .deploy import _decode_fn, _encode_fn, _roundtrip_fn

_KINDS = ('encode', 'decode', 'roundtrip')


class LiveCodec:
    """DeployedCodec-compatible facade over a live model.

    Calls are jit-compiled and cached per (kind, bandwidth, output
    length); XLA additionally specializes per input shape. Accepts int8
    weight-only variables (prepare.quantize_weights): dequantization
    runs inside the program so HBM keeps int8. NOT thread-safe
    (``set_target_bandwidth`` mutates the model around tracing) —
    :class:`CodecServer` serializes access; for direct multi-threaded
    use, wrap calls in your own lock.
    """

    def __init__(self, model, variables,
                 default_bandwidth: Optional[float] = None,
                 segment_major: Optional[bool] = None):
        self.model = model
        self.variables = variables
        # None → auto: segment-major batching for segmented models (flatten
        # the S per-segment subgraphs into the batch axis — fixes the 48 kHz
        # B>1 aggregate regression, docs/PERF_NOTES.md); False restores the
        # reference-shaped per-frame loop
        self.segment_major = segment_major
        # snapshot a CONCRETE default: requests with bandwidth=None must not
        # depend on what earlier requests set the (shared, mutable) model to
        # — and a None default would trace with whatever bandwidth the last
        # call left behind (model.bandwidth starts as None, models/model.py)
        self.default_bandwidth = (default_bandwidth
                                  if default_bandwidth is not None
                                  else model.bandwidth
                                  if model.bandwidth is not None
                                  else model.target_bandwidths[-1])
        self._jitted: Dict[Tuple, Any] = {}

    def _fn(self, kind: str, bandwidth: Optional[float],
            length: Optional[int]):
        bw = bandwidth if bandwidth is not None else self.default_bandwidth
        key = (kind, bw, length)
        fn = self._jitted.get(key)
        if fn is None:
            model, variables = self.model, self.variables

            def build(*args):
                # int8 weight-only trees (prepare.quantize_weights)
                # dequantize INSIDE the program: HBM keeps int8, the
                # convert+scale fuses into each op's operand load
                from .prepare import dequantize_weights
                vars_ = dict(variables,
                             params=dequantize_weights(variables['params']))
                sm = self.segment_major
                if kind == 'encode':
                    return _encode_fn(model, vars_, segmajor=sm)(*args)
                if kind == 'roundtrip':
                    return _roundtrip_fn(model, vars_, segmajor=sm)(*args)
                return _decode_fn(model, vars_, length, segmajor=sm)(*args)

            fn = jax.jit(build)
            self._jitted[key] = fn
        # the model's bandwidth is read at TRACE time (it selects n_q);
        # set it for every call — jit traces lazily per input shape
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

    @property
    def length_pad_exact(self) -> bool:
        """True when right-zero-padding the time axis provably cannot change
        any output VALUE before the pad point — the strictest condition for
        CodecServer length bucketing. Requires causal, non-normalizing,
        single-frame models (normalizing models compute a whole-segment
        volume scale, models/model.py:125; segmented models add frames) AND
        ``pad_mode='constant'``: then the padding an unpadded encode would
        add to complete its last window is zeros too (ops/pad.py), so code
        indices are identical and wavs agree to per-shape XLA compilation
        fp noise (~1e-7: different lengths compile different fusions; a
        code index could in principle flip on an exact argmin tie). With
        the reference default ``pad_mode='reflect'`` the unpadded call
        reflects REAL samples into the last window while the bucketed call
        sees zeros, so the final frame can differ — see
        :attr:`length_pad_tail_exact`."""
        from .lengthpad import exact_gate
        m = self.model
        return exact_gate(m.encoder.causal, m.normalize, m.segment,
                          m.encoder.pad_mode, m.decoder.pad_mode)

    @property
    def length_pad_tail_exact(self) -> bool:
        """True when right-zero-padding can change at most the FINAL frame
        of codes (and hence the final hop of decoded audio): causal,
        non-normalizing, single-frame models of any pad_mode, for clips of
        at least :attr:`length_pad_min_samples`. Every layer is causal, so
        padding differences live only in each layer's last-window
        completion, whose causal cone is the last output frame. Neither
        the zero- nor the reflect-completed last window is more 'correct'
        — both are edge paddings of the same clip."""
        from .lengthpad import tail_exact_gate
        m = self.model
        return tail_exact_gate(m.encoder.causal, m.normalize, m.segment)

    @property
    def hop_length(self) -> int:
        return self.model.encoder.hop_length

    @property
    def length_pad_min_samples(self) -> int:
        """Shortest clip for which the reflect-pad tail-exactness guarantee
        holds. Below it some layer's input is shorter than its own padding
        and the reference's short-input reflect guard (reference
        conv.py:94-97: extra zero pad before the reflect) makes that
        layer's semantics length-dependent — padding the clip then changes
        outputs beyond the final frame. Constant-pad models have no such
        guard (no minimum). The horizon equals streaming's minimum first
        chunk (the deepest left-padding, ~2240 samples for the 24 kHz
        flavor)."""
        if not hasattr(self, '_pad_min'):
            from .lengthpad import pad_min_samples
            self._pad_min = pad_min_samples(self.model)
        return self._pad_min


class _Request:
    __slots__ = ('kind', 'args', 'bandwidth', 'length', 'future', 't0',
                 'batch_key', 'out_tail')

    def __init__(self, kind, args, bandwidth, length, out_tail=None):
        self.kind = kind
        self.args = args          # pytree; every array leaf is ONE item
        self.bandwidth = bandwidth
        self.length = length
        self.out_tail = out_tail  # slice every output leaf to [..., :n]
        self.future: Future = Future()
        self.t0 = time.monotonic()
        # computed once: _take_batch rescans the queue on every wakeup
        leaves, treedef = jax.tree.flatten(args)
        shapes = tuple((np.shape(l), np.asarray(l).dtype.str) for l in leaves)
        self.batch_key = (kind, bandwidth, length, treedef, shapes)


class CodecServer:
    """Dynamic micro-batching server over a LiveCodec or DeployedCodec.

    - ``max_batch``: hard cap on items per dispatch.
    - ``max_wait_ms``: after the first request of a batch arrives, how
      long to hold the dispatch open for more compatible requests.
    - ``bucket_sizes``: batches are padded (by repeating the last item)
      up to the next bucket so the compiler sees a bounded set of batch
      shapes; results for pad rows are dropped.
    - ``length_buckets``: optional sorted sample lengths. When set,
      wav/codes inputs are right-zero-padded on the time axis up to the
      next bucket BEFORE keying, so mixed-length traffic coalesces into
      one batch (without this, the exact-shape batch key degenerates to
      serial dispatch under realistic traffic). Per-item results are
      sliced back to the true length. Requires a backend whose padding is
      provably exact (``backend.length_pad_exact`` — constant-pad causal
      models: bit-identical to direct calls) or tail-exact
      (``backend.length_pad_tail_exact`` — reflect-pad causal models: at
      most the final code frame / final hop of audio differs from a
      direct unpadded call; see LiveCodec). Requests longer than the
      largest bucket, or decode requests with an explicit ``length``,
      fall back to exact-shape keying.
    """

    def __init__(self, backend, *, max_batch: int = 8,
                 max_wait_ms: float = 2.0,
                 bucket_sizes: Sequence[int] = (1, 2, 4, 8, 16, 32),
                 length_buckets: Optional[Sequence[int]] = None):
        self.backend = backend
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.buckets = sorted(b for b in bucket_sizes if b <= max_batch) \
            or [max_batch]
        self.length_buckets = (sorted(length_buckets)
                               if length_buckets else None)
        if self.length_buckets:
            if not (getattr(backend, 'length_pad_exact', False)
                    or getattr(backend, 'length_pad_tail_exact', False)):
                raise ValueError(
                    'length_buckets requires a backend whose time-axis '
                    'padding is exact or tail-exact (causal, '
                    'non-normalizing, single-frame models — '
                    'backend.length_pad_exact / length_pad_tail_exact); '
                    f'{type(backend).__name__} does not qualify')
            self._hop = int(backend.hop_length)
            # below this, the short-input reflect guard makes padding
            # non-exact (see LiveCodec.length_pad_min_samples) — such
            # requests fall back to exact-shape keying
            self._min_len = int(getattr(backend, 'length_pad_min_samples',
                                        0))
            if (self._min_len < 0
                    and not getattr(backend, 'length_pad_exact', False)):
                # -1 = lengthpad's streaming walker could not analyze the
                # architecture, so the short-input horizon below which
                # tail-exactness fails is unknown; refuse bucketing
                # (lengthpad.py docstring) instead of silently serving
                # non-exact results — same gate DeployedCodec applies
                # (deploy.py length_pad_tail_exact)
                raise ValueError(
                    'length_buckets: backend reports '
                    'length_pad_min_samples < 0 (short-input exactness '
                    'horizon unknown) on a tail-exact-only backend; '
                    'refusing length bucketing')
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

    def _length_bucket(self, kind: str, args, length: Optional[int]):
        """(padded args, out_tail) — right-zero-pad the time axis to the
        next length bucket so mixed-length requests share a batch key.
        out_tail = how much of each output leaf's last axis is real."""
        if not self.length_buckets or length is not None:
            return args, None
        if kind in ('roundtrip', 'encode'):
            x = np.asarray(args)
            T = x.shape[-1]
            b = next((b for b in self.length_buckets if b >= T), None)
            if b is None or T < self._min_len:
                return args, None
            pad = [(0, 0)] * (x.ndim - 1) + [(0, b - T)]
            frames = -(-T // self._hop)
            return (np.pad(x, pad),
                    frames if kind == 'encode' else T)
        # decode: args = (codes_tuple,) — single-frame models only (the
        # length_pad_exact gate excludes segmented ones)
        codes = args[0]
        if len(args) > 1 or len(codes) != 1:
            return args, None
        c = np.asarray(codes[0])
        Tc = c.shape[-1]
        fb = next((-(-b // self._hop) for b in self.length_buckets
                   if -(-b // self._hop) >= Tc), None)
        if fb is None or Tc * self._hop < self._min_len:
            return args, None
        padded = np.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, fb - Tc)])
        return ((padded,),), Tc * self._hop

    def submit(self, kind: str, args, bandwidth: Optional[float] = None,
               length: Optional[int] = None) -> Future:
        """Enqueue one item; the Future resolves to its un-batched result."""
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {_KINDS}")
        args, out_tail = self._length_bucket(kind, args, length)
        req = _Request(kind, args, bandwidth, length, out_tail)
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
            key = head.batch_key
            batch = [head]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                # pull every currently-queued compatible request
                rest = []
                for r in self._queue:
                    if len(batch) < self.max_batch and r.batch_key == key:
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
            res = jax.tree.map(lambda a: a[i], out)
            if r.out_tail is not None:   # length-bucketed: drop pad tail
                res = jax.tree.map(lambda a, n=r.out_tail: a[..., :n], res)
            r.future.set_result(res)

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


# ===================================================================== live
# streaming multiplexer


def _batch_axes(tree_n, tree_1, n: int):
    """Pytree of ints: which axis of each state leaf is the batch axis,
    discovered by comparing init_state(n) against init_state(1) shapes
    (conv carries batch on axis 0, LSTM h/c on axis 1 — streaming.py)."""
    def find(a, b):
        axes = [i for i, (x, y) in enumerate(zip(a.shape, b.shape))
                if x == n and y == 1 and x != y]
        if len(axes) != 1:
            raise ValueError(
                f"ambiguous batch axis for state leaf {a.shape} vs {b.shape}"
                f" (n={n}); pick max_streams != any state dimension")
        return axes[0]
    return jax.tree.map(find, tree_n, tree_1)


def _mask_select(mask, new, old, axes):
    """Per-leaf where(mask) with the mask broadcast onto each leaf's batch
    axis; inactive slots keep their old state."""
    def sel(n, o, ax):
        shape = [1] * n.ndim
        shape[ax] = mask.shape[0]
        return jnp.where(mask.reshape(shape), n, o)
    return jax.tree.map(sel, new, old, axes)


class StreamSession:
    """One live stream inside a :class:`StreamingServer`. ``process`` blocks
    until the chunk's decoded audio is ready; chunks after the first must
    be exactly ``server.chunk_samples`` long."""

    def __init__(self, server: 'StreamingServer', slot: int):
        self._server = server
        self.slot = slot
        self.started = False
        self.closed = False

    def process(self, wav_chunk, timeout: Optional[float] = None):
        """wav_chunk [C, T] → decoded [C, T] (bit-equal to the offline
        model on the concatenated stream). First chunk: T ≥
        ``server.min_first_chunk_samples``, multiple of the hop."""
        if self.closed:
            raise RuntimeError('stream is closed')
        return self._server._process(self, np.asarray(wav_chunk),
                                     timeout=timeout)

    def close(self):
        if not self.closed:
            self.closed = True
            self._server._release(self)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class StreamingServer:
    """Multiplexes up to ``max_streams`` concurrent chunked streams through
    ONE fixed-shape jitted step (encode→quantize→decode with carried conv/
    LSTM state, streaming.py math — outputs are bit-equal to each stream
    running alone).

    TPU rationale: batch-1 streaming is weight-bandwidth/dispatch-bound
    (docs/PERF_NOTES.md "Streaming inference latency"), so serving N
    streams as N programs wastes nearly the whole chip. Here every slot
    lives at a fixed index of a batched state pytree (donated, updated in
    place); each tick runs ALL slots and an active mask keeps the state of
    idle slots frozen — one compiled program regardless of which subset of
    streams has a chunk pending. Joins run their (longer) first chunk
    through the B=1 ``first=True`` program, then the fresh state is
    spliced into the slot (``dynamic_update_slice`` on the discovered
    batch axis of every leaf).

    Constraints inherited from streaming.py: causal, unnormalized models;
    steady chunks exactly ``chunk_hops`` latent frames (320 samples each
    at 24 kHz); one bandwidth per server (the shared program bakes n_q).
    """

    def __init__(self, model, variables, *, max_streams: int = 8,
                 chunk_hops: int = 1, max_wait_ms: float = 2.0,
                 bandwidth: Optional[float] = None):
        from .streaming import StreamingCodec
        if max_streams < 2:
            raise ValueError('max_streams must be >= 2 (a 1-slot server '
                             'is StreamingCodec itself)')
        if bandwidth is not None:
            model.set_target_bandwidth(bandwidth)
        self.model = model
        self.variables = variables
        self.codec = StreamingCodec(model)
        self.max_streams = max_streams
        self.chunk_samples = chunk_hops * self.codec.hop
        self.max_wait = max_wait_ms / 1e3
        self.n_q = int(model.quantizer.num_quantizers_for_bandwidth(
            model.frame_rate, model.bandwidth))

        self._enc_state, self._dec_state = self.codec.init_state(max_streams)
        enc1, dec1 = self.codec.init_state(1)
        self._enc_axes = _batch_axes(self._enc_state, enc1, max_streams)
        self._dec_axes = _batch_axes(self._dec_state, dec1, max_streams)
        self._mux = self._build_mux()

        self._free = list(range(max_streams - 1, -1, -1))
        self._pending: Dict[int, Tuple[np.ndarray, Future, 'StreamSession']] \
            = {}
        self._sessions: Dict[int, 'StreamSession'] = {}
        self._cv = threading.Condition()
        self._stop = False
        self._thread: Optional[threading.Thread] = None
        self._stats = {'chunks': 0, 'ticks': 0, 'joins': 0, 'resets': 0}

    @property
    def min_first_chunk_samples(self) -> int:
        return self.codec.min_first_chunk_samples

    # ---------------------------------------------------------- lifecycle

    def start(self) -> 'StreamingServer':
        if self._thread is None:
            self._stop = False
            self._thread = threading.Thread(target=self._worker,
                                            name='streaming-server',
                                            daemon=True)
            self._thread.start()
        return self

    def stop(self):
        with self._cv:
            self._stop = True
            # fail chunks still waiting — their callers block on futures
            # that no tick will ever serve
            for _chunk, fut, _sess in self._pending.values():
                if not fut.done():
                    fut.set_exception(RuntimeError('streaming server '
                                                   'stopped'))
            self._pending.clear()
            self._cv.notify_all()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def stats(self) -> dict:
        with self._cv:
            s = dict(self._stats)
            s['active_streams'] = self.max_streams - len(self._free)
        return s

    # ---------------------------------------------------------- sessions

    def open_stream(self) -> StreamSession:
        with self._cv:
            if not self._free:
                raise RuntimeError(
                    f"all {self.max_streams} stream slots are in use")
            slot = self._free.pop()
            session = StreamSession(self, slot)
            self._sessions[slot] = session
        return session

    def _release(self, session: StreamSession):
        with self._cv:
            dropped = self._pending.pop(session.slot, None)
            if dropped is not None and not dropped[1].done():
                dropped[1].set_exception(
                    RuntimeError('stream closed with a chunk in flight'))
            if self._sessions.get(session.slot) is session:
                del self._sessions[session.slot]
                self._free.append(session.slot)

    def _process(self, session: StreamSession, chunk: np.ndarray,
                 timeout: Optional[float]):
        if session.started and chunk.shape[-1] != self.chunk_samples:
            raise ValueError(
                f"steady chunks must be exactly {self.chunk_samples} "
                f"samples, got {chunk.shape[-1]}")
        fut: Future = Future()
        with self._cv:
            if self._stop:
                raise RuntimeError('streaming server stopped')
            assert session.slot not in self._pending, \
                'one in-flight chunk per stream (process() blocks)'
            self._pending[session.slot] = (chunk, fut, session)
            self._stats['chunks'] += 1
            self._cv.notify()
        return fut.result(timeout)

    # ---------------------------------------------------------- the step

    def _build_mux(self):
        from .prepare import dequantize_weights
        from .quantization.core_vq import rvq_decode
        codec, enc_axes, dec_axes = self.codec, self._enc_axes, self._dec_axes
        rvq_encode_impl = self.model._rvq_encode_impl

        def _fn(params, qstate, enc_state, dec_state, x, mask, n_q):
            params = dequantize_weights(params)  # no-op on plain params
            emb, new_enc = codec.encoder.apply(params['encoder'], enc_state,
                                               x, first=False)
            codes = rvq_encode_impl(qstate, emb, n_q)  # [K, B, t]
            deq = rvq_decode(qstate, codes)
            y, new_dec = codec.decoder.apply(params['decoder'], dec_state,
                                             deq, first=False)
            new_enc = _mask_select(mask, new_enc, enc_state, enc_axes)
            new_dec = _mask_select(mask, new_dec, dec_state, dec_axes)
            return jnp.swapaxes(y, 1, 2), new_enc, new_dec

        # raw (un-jitted) step kept for scan-chained benchmarking/tests
        self._mux_fn = _fn
        return jax.jit(_fn, static_argnums=6, donate_argnums=(2, 3))

    def _splice_slot(self, storage, axes, state1, slot: int):
        """Write a B=1 state into slot ``slot`` along each leaf's batch
        axis (after a first-chunk join)."""
        return jax.tree.map(
            lambda S, s, ax: jax.lax.dynamic_update_slice_in_dim(
                S, s.astype(S.dtype), slot, axis=ax),
            storage, state1, axes)

    def _first_chunk(self, slot: int, chunk: np.ndarray) -> np.ndarray:
        enc1, dec1 = self.codec.init_state(1)
        wav, _codes, enc1, dec1 = self.codec.roundtrip_chunk(
            self.variables, enc1, dec1, chunk[None], first=True)
        self._enc_state = self._splice_slot(self._enc_state, self._enc_axes,
                                            enc1, slot)
        self._dec_state = self._splice_slot(self._dec_state, self._dec_axes,
                                            dec1, slot)
        return np.asarray(wav)[0]

    def _worker(self):
        channels = self.model.channels
        while True:
            with self._cv:
                while not self._pending and not self._stop:
                    self._cv.wait(timeout=0.1)
                if self._stop:
                    for _c, fut, _s in self._pending.values():
                        if not fut.done():
                            fut.set_exception(
                                RuntimeError('streaming server stopped'))
                    self._pending.clear()
                    return
                deadline = time.monotonic() + self.max_wait
                # hold the tick open briefly for more streams' chunks
                while (len(self._pending) <
                       self.max_streams - len(self._free)):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._stop:
                        break
                    self._cv.wait(timeout=remaining)
                pending, self._pending = dict(self._pending), {}
                self._stats['ticks'] += 1

            firsts = {s: v for s, v in pending.items() if not v[2].started}
            steady = {s: v for s, v in pending.items() if v[2].started}

            for slot, (chunk, fut, sess) in firsts.items():
                try:
                    out = self._first_chunk(slot, chunk)
                    sess.started = True
                    with self._cv:
                        self._stats['joins'] += 1
                    fut.set_result(out)
                except Exception as e:  # noqa: BLE001
                    fut.set_exception(e)

            if not steady:
                continue
            try:
                xs = np.zeros((self.max_streams, channels,
                               self.chunk_samples), np.float32)
                mask = np.zeros((self.max_streams,), bool)
                for slot, (chunk, _f, _s) in steady.items():
                    xs[slot] = chunk
                    mask[slot] = True
                wav, self._enc_state, self._dec_state = self._mux(
                    self.variables['params'], self.variables['quantizer'],
                    self._enc_state, self._dec_state,
                    jnp.swapaxes(jnp.asarray(xs), 1, 2), jnp.asarray(mask),
                    self.n_q)
                wav = np.asarray(wav)
                for slot, (_c, fut, _s) in steady.items():
                    fut.set_result(wav[slot])
            except Exception as e:  # noqa: BLE001
                # reset FIRST so callers waking on the error already see
                # their session closed and the slot pool rebuilt
                self._reset_after_failure(e)
                for _c, fut, _s in steady.values():
                    if not fut.done():
                        fut.set_exception(e)

    def _reset_after_failure(self, err: Exception):
        """A failed mux call may have consumed the DONATED carry buffers,
        so the old state is unusable. Recover the server: close every
        active stream (their carries are lost — callers see the error and
        must rejoin) and rebuild fresh slot state so new streams work."""
        self._enc_state, self._dec_state = self.codec.init_state(
            self.max_streams)
        with self._cv:
            for slot, sess in list(self._sessions.items()):
                sess.closed = True
                dropped = self._pending.pop(slot, None)
                if dropped is not None and not dropped[1].done():
                    dropped[1].set_exception(err)
                del self._sessions[slot]
                self._free.append(slot)
            self._stats['resets'] += 1
