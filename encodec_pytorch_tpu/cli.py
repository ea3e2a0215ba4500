"""Command-line for audio compression — rebuild of /root/reference/main.py.

    python -m encodec_pytorch_tpu.cli in.wav out.ecdc -b 6
    python -m encodec_pytorch_tpu.cli in.wav out.wav -r -b 6   # round-trip
    python -m encodec_pytorch_tpu.cli in.ecdc out.wav          # decompress
    python -m encodec_pytorch_tpu.cli in_dir/ out_dir/ -b 6    # directory mode
"""

import argparse
import os
import sys
from pathlib import Path

import jax
import numpy as np

SUFFIX = '.ecdc'


def get_parser():
    parser = argparse.ArgumentParser(
        'encodec_tpu',
        description='High fidelity neural audio codec (TPU-native). '
                    'If input is a .ecdc, decompresses it. '
                    'If input is .wav, compresses it. If output is also wav, '
                    'do a compression/decompression cycle.')
    parser.add_argument('input', type=Path, help='Input file (.wav or .ecdc) or directory.')
    parser.add_argument('output', type=Path, nargs='?',
                        help='Output file, otherwise inferred from input file.')
    parser.add_argument('-b', '--bandwidth', type=float, default=6,
                        choices=[1.5, 3., 6., 12., 24.],
                        help='Target bandwidth (1.5, 3, 6, 12 or 24).')
    parser.add_argument('-q', '--hq', action='store_true',
                        help='Use HQ stereo model operating on 48 kHz audio.')
    parser.add_argument('-l', '--lm', action='store_true',
                        help='Use a language model to reduce the stream size '
                             '(5x slower though).')
    parser.add_argument('-f', '--force', action='store_true',
                        help='Overwrite output file if it exists.')
    parser.add_argument('-s', '--decompress_suffix', type=str,
                        default='_decompressed',
                        help='Suffix for the decompressed output file '
                             '(if no output path specified)')
    parser.add_argument('-r', '--rescale', action='store_true',
                        help='Automatically rescale the output to avoid clipping.')
    parser.add_argument('-m', '--model_name', type=str, default='encodec_24khz',
                        help='encodec_24khz | encodec_48khz | my_encodec | encodec_bw')
    parser.add_argument('-c', '--checkpoint', type=str,
                        help='torch checkpoint path (required for my_encodec/'
                             'encodec_bw, optional converted weights otherwise)')
    parser.add_argument('--lm_checkpoint', type=str,
                        help='local torch checkpoint for the entropy LM')
    parser.add_argument('--lm_backend', type=str, default='jax',
                        choices=['jax', 'torch'],
                        help="'torch' replays the reference's LM "
                             'probabilities bit-exactly on the host '
                             '(models/lm_replay.py) — required to decode LM '
                             'streams written by the reference '
                             'implementation, or to write streams it can '
                             'decode. Implies the host coder (no fused '
                             'on-device codec).')
    parser.add_argument('--lm_host', action='store_true',
                        help='Entropy-code with the host (step-by-step) LM '
                             'path instead of the fully on-device fused '
                             'codec. Fused is the default: it is the only '
                             'path that decodes faster than real-time, and '
                             'streams are self-describing (an `lmv` header '
                             'key picks the matching decoder), but '
                             'host-encoded and fused-encoded streams are '
                             'not interchangeable across implementations.')
    parser.add_argument('--weights', type=str, default='raw',
                        choices=['raw', 'fold'],
                        help="'fold' collapses weight-norm into plain "
                             'kernels at load (prepare.py) — bit-equal '
                             'output, fewer ops per call; weight_norm '
                             'flavors only.')
    parser.add_argument('--compile_cache_dir', type=str,
                        default=os.environ.get('ENCODEC_TPU_COMPILE_CACHE',
                                               ''),
                        help='Persistent XLA compilation cache directory '
                             '(or env ENCODEC_TPU_COMPILE_CACHE): repeat '
                             'invocations skip the cold jit compile.')
    return parser


def fatal(*args):
    print(*args, file=sys.stderr)
    sys.exit(1)


def check_output_exists(args):
    if not args.output.parent.exists():
        fatal(f"Output folder for {args.output} does not exist.")
    if args.output.exists() and not args.force:
        fatal(f"Output file {args.output} exist. Use -f / --force to overwrite.")


def check_clipping(wav, args):
    if args.rescale:
        return
    mx = float(np.abs(wav).max())
    limit = 0.99
    if mx > limit:
        print(f"Clipping!! max scale {mx}, limit is {limit}. "
              "To avoid clipping, use the `-r` option to rescale the output.",
              file=sys.stderr)


def run_one(args, model, variables, lm):
    from . import compress as C
    from .data.audio_io import read_wav
    from .utils import convert_audio, save_audio

    if args.input.suffix.lower() == SUFFIX:
        if args.output is None:
            args.output = args.input.with_name(
                args.input.stem + args.decompress_suffix).with_suffix('.wav')
        elif args.output.suffix.lower() != '.wav':
            fatal("Output extension must be .wav")
        check_output_exists(args)
        out, sr = C.decompress(model, variables, args.input.read_bytes(), lm=lm)
        check_clipping(out, args)
        save_audio(out, args.output, sr, rescale=args.rescale)
    else:
        if args.output is None:
            args.output = args.input.with_suffix(SUFFIX)
        elif args.output.suffix.lower() not in [SUFFIX, '.wav']:
            fatal(f"Output extension must be .wav or {SUFFIX}")
        check_output_exists(args)

        wav, sr = read_wav(args.input)
        wav = convert_audio(wav, sr, model.sample_rate, model.channels)
        lm_fused = (args.lm and not args.lm_host
                    and args.lm_backend != 'torch')
        compressed = C.compress(model, variables, wav, use_lm=args.lm, lm=lm,
                                lm_fused=lm_fused)
        if args.output.suffix.lower() == SUFFIX:
            args.output.write_bytes(compressed)
        else:
            out, out_sr = C.decompress(model, variables, compressed, lm=lm)
            check_clipping(out, args)
            save_audio(out, args.output, out_sr, rescale=args.rescale)


def cli_main(args):
    from . import compress as C
    from .models.model import MODELS
    from .utils import enable_compile_cache

    enable_compile_cache(args.compile_cache_dir)

    model_name = 'encodec_48khz' if args.hq else args.model_name
    if model_name in ('my_encodec', 'encodec_bw'):
        if not args.checkpoint:
            fatal(f"{model_name} requires -c/--checkpoint")
        if model_name == 'encodec_bw':
            model, variables = MODELS[model_name](args.checkpoint, args.bandwidth)
        else:
            model, variables = MODELS[model_name](args.checkpoint)
    else:
        model, variables = MODELS[model_name](checkpoint=args.checkpoint)
        if variables is None:
            fatal(f"{model_name} needs converted weights: pass -c with the "
                  "released torch checkpoint (no network access for downloads).")
    print(f"-------------USE {model_name} MODEL-------------")

    if args.bandwidth not in model.target_bandwidths:
        fatal(f"Bandwidth {args.bandwidth} is not supported by {model_name}")
    model.set_target_bandwidth(args.bandwidth)

    if args.weights == 'fold':
        from .prepare import fold_weight_norm
        if model.encoder.norm != 'weight_norm':
            fatal(f"--weights fold requires a weight_norm model; "
                  f"{model_name} uses '{model.encoder.norm}'")
        model, variables = fold_weight_norm(model, variables)

    # the LM is needed for compression when -l is passed, and for
    # decompression whenever the stream's header says lm=True — so build it
    # if a checkpoint was supplied even without -l
    lm = None
    if args.lm or args.lm_checkpoint:
        lm = C.get_lm_model(model, checkpoint=args.lm_checkpoint,
                            backend=args.lm_backend)

    if args.input.is_dir():
        output_root = args.output
        input_root = args.input
        if not output_root.exists():
            output_root.mkdir(parents=True)
        for wav in sorted(input_root.glob('**/*.wav')):
            print(f"Processing {wav}")
            relative_path = wav.relative_to(input_root)
            args.input = wav
            output_path = output_root.joinpath(relative_path)
            output_path.parent.mkdir(parents=True, exist_ok=True)
            args.output = output_path.with_name(
                output_path.stem + f"_bw{int(args.bandwidth)}.wav")
            run_one(args, model, variables, lm)
    elif args.input.is_file():
        run_one(args, model, variables, lm)
    else:
        fatal(f"Input {args.input} does not exist.")


def main(argv=None):
    args = get_parser().parse_args(argv)
    if not args.input.exists():
        fatal(f"Input file {args.input} does not exist.")
    cli_main(args)


if __name__ == '__main__':
    main()
