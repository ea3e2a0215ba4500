"""Benchmark: encode+decode real-time factor at 24 kHz, n_q=8 (bandwidth 6).

North-star from BASELINE.json: > 10× real-time per chip. Prints one JSON
line: {"metric", "value", "unit", "vs_baseline"} with vs_baseline = RTF / 10.
Runs on whatever device jax sees (the driver runs it on a real TPU chip).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from encodec_pytorch_tpu.models.model import EncodecModel

    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=False, segment=None,
        name='encodec_24khz')
    model.set_target_bandwidth(6.)  # n_q = 8

    seconds = 30
    T = 24_000 * seconds
    variables = model.init(jax.random.PRNGKey(0), example_length=24000)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))

    @jax.jit
    def roundtrip(variables, x):
        wav = model(variables, x)
        # tiny checksum forces a real device round-trip when fetched —
        # block_until_ready alone under-blocks through the axon relay
        return wav, jnp.sum(wav)

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, T)) * 0.1

    # warmup/compile
    _, chk = roundtrip(variables, x)
    float(chk)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        _, chk = roundtrip(variables, x)
        float(chk)  # synchronize
    dt = (time.perf_counter() - t0) / iters

    rtf = seconds / dt
    print(json.dumps({
        "metric": "encode_decode_rtf_24khz_nq8",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
    }))


if __name__ == '__main__':
    main()
