"""Benchmark: encode+decode real-time factor at 24 kHz, n_q=8 (bandwidth 6).

North-star from BASELINE.json: > 10× real-time per chip. Prints one JSON
line: {"metric", "value", "unit", "vs_baseline"} with vs_baseline = RTF / 10.
Runs on whatever device jax sees (the driver runs it on a real TPU chip).

Measures the shipped TPU serving configuration: the end-to-end bfloat16
activation pipeline (f32 master weights/quantizer; quality bound tested in
tests/test_bf16.py — >95 % of RVQ code indices identical to the f32 path,
small relative waveform delta). Measured context: f32 ≈ 1470×, bf16 ≈
1900× on one v5e chip (docs/PERF_NOTES.md).

Methodology: the host↔device dispatch+sync overhead (a ~33 ms relay
round-trip in the dev environment) would otherwise swamp the measurement, so
the codec round-trip is iterated inside ONE jitted `lax.scan` (each iteration
consumes the previous output, so nothing can be elided) and a scalar checksum
is fetched to force completion; per-iteration time =
(total − measured dispatch overhead) / iters.
"""

import json
import os
import subprocess
import sys
import time

ITERS = 10


def _wait_for_backend(max_wait_s: float = 900.0) -> None:
    """Bounded wait for the TPU to answer before importing jax here.

    The axon backend blocks indefinitely at first use when the tunnel is
    down, so probe it in a SUBPROCESS with a timeout and retry for up to
    ``max_wait_s``. If the pool env isn't set (plain CPU run) or the TPU
    never answers, just proceed — the main measurement behaves exactly as
    before (the driver's own timeout is the final backstop).
    """
    if not os.environ.get('PALLAS_AXON_POOL_IPS'):
        return
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, '-c',
                 "import jax; assert jax.default_backend() == 'tpu'"],
                timeout=240, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print('bench: TPU did not answer within '
                  f'{max_wait_s:.0f}s — proceeding anyway', file=sys.stderr)
            return
        time.sleep(30)


def _measure_dispatch_overhead() -> float:
    """One dispatch+sync of a trivial jitted op — the fixed host↔device cost
    that chained iterations amortize. Median of 5."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: jnp.sum(x) * 2)
    x = jnp.ones((8, 128))
    float(f(x))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from encodec_pytorch_tpu.models.model import EncodecModel

    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=False, segment=None,
        name='encodec_24khz', dtype=jnp.bfloat16)
    model.set_target_bandwidth(6.)  # n_q = 8

    seconds = 30
    T = 24_000 * seconds
    variables = model.init(jax.random.PRNGKey(0), example_length=24000)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))

    def body(x, _):
        return model(variables, x), None

    @jax.jit
    def chained(x):
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y, jnp.sum(y)

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, T)) * 0.1

    # warmup/compile
    _, chk = chained(x)
    float(chk)
    overhead = _measure_dispatch_overhead()

    # Best of 3 timed repeats: the dev-environment host<->TPU relay adds
    # jittery (purely additive) latency, so min is the faithful estimator
    # of the device cost (same rationale as timeit's min).
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, chk = chained(x)
        float(chk)  # forces a real device round-trip
        dts.append(time.perf_counter() - t0)
    dt = max(min(dts) - overhead, 1e-9) / ITERS

    rtf = seconds / dt
    print(json.dumps({
        "metric": "encode_decode_rtf_24khz_nq8",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
    }))


if __name__ == '__main__':
    main()
