"""Decompose the production train step into timed components.

Answers "where do the 568 ms go?" (docs/PERF_NOTES.md "Training step
profile"): generator forward/backward, discriminator passes, the 7-scale
mel loss, and each balancer VJP are timed in isolation with the same
chained-`lax.scan` harness as bench.py (per-step host sync would swamp
sub-10 ms components through the axon relay).

Usage: python scripts/bench_step_components.py [--batch 12] [--cut 72000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 4


def timed(label, fn, *args):
    """Median of 3 runs of `ITERS` chained applications of fn."""

    @jax.jit
    def chained(*a):
        def body(c, _):
            out = fn(*c[1:], c[0])
            return (out, *c[1:]), None

        # thread a scalar through fn to make iterations data-dependent
        (acc, *_), _ = jax.lax.scan(body, (jnp.float32(0.0), *a), None,
                                    length=ITERS)
        return acc

    acc = chained(*args)
    float(acc)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1] / ITERS * 1e3
    print(f'{label:<46s} {dt:8.2f} ms', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=12)
    p.add_argument('--cut', type=int, default=72000)
    p.add_argument('--dtype', default='float32',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--stft_method', default='fft', choices=['fft', 'matmul'])
    p.add_argument('--only', nargs='*', default=None,
                   help='subset of components: gen disc mel vjp discupd')
    args = p.parse_args()

    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from encodec_pytorch_tpu.train.losses import (spectral_reconstruction_loss,
                                                  total_loss)

    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]
    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=True, segment=None,
        name='my_encodec', dtype=dtype)
    disc = MultiScaleSTFTDiscriminator(
        filters=32, n_ffts=(1024, 2048, 512), hop_lengths=(256, 512, 128),
        win_lengths=(1024, 2048, 512), stft_method=args.stft_method,
        dtype=dtype)

    variables = model.init(jax.random.PRNGKey(0), example_length=args.cut)
    batch = jnp.asarray(np.random.RandomState(0).randn(
        args.batch, 1, args.cut).astype(np.float32) * 0.1)
    params_d = disc.init(jax.random.PRNGKey(1), batch)['params']
    rng = jax.random.PRNGKey(2)

    print(f'config: batch={args.batch} cut={args.cut} dtype={args.dtype} '
          f'stft={args.stft_method}', flush=True)

    def want(tag):
        return args.only is None or tag in args.only

    # ---- generator
    def gen_fwd(x, eps):
        out, loss_w, _ = model.forward_train(variables, x + eps, rng)
        return jnp.sum(out) * 1e-6 + loss_w

    if want('gen'):
        timed('generator forward_train (fwd only)', gen_fwd, batch)

    def gen_fwd_bwd(x, eps):
        def f(params):
            out, loss_w, _ = model.forward_train(
                {'params': params, 'quantizer': variables['quantizer']},
                x + eps, rng)
            return jnp.sum(out) * 1e-6 + loss_w

        val, grads = jax.value_and_grad(f)(variables['params'])
        return val + jax.tree.leaves(grads)[0].ravel()[0] * 1e-9

    if want('gen'):
        timed('generator fwd + param backward', gen_fwd_bwd, batch)

    # fixed fake output for the loss components (not needed for disc-only)
    output = None
    if want('mel') or want('vjp') or want('discupd'):
        output, _, _ = model.forward_train(variables, batch, rng)
        output = jax.block_until_ready(output)

    # ---- discriminator
    def disc_fwd(x, eps):
        logits, fmaps = disc.apply({'params': params_d}, x + eps)
        return sum(jnp.sum(l) for l in logits) * 1e-6

    if want('disc'):
        timed('disc forward (one signal)', disc_fwd, batch)

    # ---- mel loss
    def mel_fwd(x, y, eps):
        return spectral_reconstruction_loss(x + eps, y, 24_000, args.stft_method)

    if want('mel'):
        timed('7-scale mel loss l_f (fwd)', mel_fwd, batch, output)

    def mel_fwd_bwd(x, y, eps):
        val, vjp = jax.vjp(
            lambda o: spectral_reconstruction_loss(x, o + eps, 24_000,
                args.stft_method), y)
        (g,) = vjp(jnp.float32(1.0))
        return val + jnp.sum(g) * 1e-9

    if want('mel'):
        timed('7-scale mel loss l_f (fwd + bwd wrt output)', mel_fwd_bwd,
              batch, output)

    # ---- the 4 balancer VJPs (mirrors step.py:100-131)
    logits_real, fmap_real = disc.apply({'params': params_d}, batch)
    logits_real = jax.block_until_ready(logits_real)

    def losses_of(out):
        logits_fake, fmap_fake = disc.apply({'params': params_d}, out)
        return total_loss(fmap_real, logits_fake, fmap_fake, batch, out,
                          sample_rate=24_000, stft_method=args.stft_method)

    names = ['l_t', 'l_f', 'l_g', 'l_feat']
    for name in (names if want('vjp') else []):
        def one_vjp(y, eps, _name=name):
            loss_vals, loss_vjp = jax.vjp(losses_of, y + eps)
            cot = {k: (jnp.float32(1.0) if k == _name else jnp.float32(0.0))
                   for k in loss_vals}
            (g,) = loss_vjp(cot)
            return jnp.sum(g) * 1e-9 + loss_vals[_name]

        timed(f'losses fwd + VJP[{name}]', one_vjp, output)

    def all_vjps(y, eps):
        loss_vals, loss_vjp = jax.vjp(losses_of, y + eps)
        acc = jnp.float32(0.0)
        for name in names:
            cot = {k: (jnp.float32(1.0) if k == name else jnp.float32(0.0))
                   for k in loss_vals}
            (g,) = loss_vjp(cot)
            acc = acc + jnp.sum(g) * 1e-9
        return acc

    if want('vjp'):
        timed('losses fwd + all 4 sequential VJPs', all_vjps, output)

    # ---- disc update
    from encodec_pytorch_tpu.train.losses import disc_loss

    def disc_update(x, y, eps):
        def d_loss(pd):
            lr_, _ = disc.apply({'params': pd}, x + eps)
            lf_, _ = disc.apply({'params': pd}, y)
            return disc_loss(lr_, lf_)

        ld, grads = jax.value_and_grad(d_loss)(params_d)
        return ld + jax.tree.leaves(grads)[0].ravel()[0] * 1e-9

    if want('discupd'):
        timed('disc update (2 fwd + backward)', disc_update, batch, output)


if __name__ == '__main__':
    main()
