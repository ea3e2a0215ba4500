"""`encodec-tpu-deploy`: write a self-contained StableHLO serving artifact.

Pairs with `deploy.py`: loads a model the same way the codec CLI does
(MODELS registry + optional converted checkpoint, reference
main.py:121-132 / compress.py:22-27), optionally folds weight norm, then
exports encode/decode/roundtrip programs — weights baked in — for the
requested clip lengths × bandwidths into one zip.

    python -m encodec_pytorch_tpu.deploy_cli out.ecdz \\
        -m encodec_24khz -c ckpt.th --seconds 1 30 --bandwidths 6 24
"""

import argparse
import os
import sys

from .models.model import MODELS


def get_parser():
    parser = argparse.ArgumentParser(
        'encodec-tpu-deploy',
        description='Export a self-contained StableHLO codec artifact.')
    parser.add_argument('output', help='Artifact path to write (.ecdz zip).')
    parser.add_argument('-m', '--model_name', default='encodec_24khz',
                        choices=list(MODELS.keys()))
    parser.add_argument('-c', '--checkpoint', default=None,
                        help='Converted/trainer checkpoint (required for '
                             'my_encodec / encodec_bw).')
    parser.add_argument('--seconds', type=float, nargs='+', default=[1.0],
                        help='Clip lengths to export (each is one static-'
                             'shape entry; batch stays polymorphic).')
    parser.add_argument('--bandwidths', type=float, nargs='+', default=None,
                        help='Bandwidths to export (default: the model\'s '
                             'current bandwidth, else its highest — ONE '
                             'entry set; list every bandwidth you serve).')
    parser.add_argument('--weights', default='raw', choices=['raw', 'fold'],
                        help="'fold' bakes folded weight-norm kernels "
                             '(bit-equal, fewer ops; weight_norm models '
                             'only).')
    parser.add_argument('--platforms', nargs='+', default=['cpu', 'tpu'],
                        help='Lowering platforms recorded in the artifact.')
    parser.add_argument('--kinds', nargs='+',
                        default=['encode', 'decode', 'roundtrip'],
                        choices=['encode', 'decode', 'roundtrip'],
                        help='Entry kinds to export. Weights are baked per '
                             'entry, so dropping roundtrip (the loader '
                             'composes encode+decode instead) shrinks the '
                             'artifact by ~a third.')
    parser.add_argument('-f', '--force', action='store_true',
                        help='Overwrite the output file.')
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    if os.path.exists(args.output) and not args.force:
        print(f"{args.output} exists. Use -f to overwrite.", file=sys.stderr)
        sys.exit(1)

    # mirror cli.py:141-153's loading rules: trainer-checkpoint factories
    # take positional args; released factories return variables=None when
    # no converted checkpoint is supplied (no network access for downloads)
    if args.model_name in ('my_encodec', 'encodec_bw'):
        if not args.checkpoint:
            print(f"{args.model_name} requires -c/--checkpoint",
                  file=sys.stderr)
            sys.exit(1)
        model, variables = MODELS[args.model_name](args.checkpoint)
    else:
        model, variables = MODELS[args.model_name](checkpoint=args.checkpoint)
        if variables is None:
            print(f"{args.model_name} needs converted weights: pass -c with "
                  "the released torch checkpoint.", file=sys.stderr)
            sys.exit(1)

    if args.weights == 'fold':
        from .prepare import fold_weight_norm
        if model.encoder.norm != 'weight_norm':
            print(f"--weights fold requires a weight_norm model; "
                  f"{args.model_name} uses '{model.encoder.norm}'",
                  file=sys.stderr)
            sys.exit(1)
        model, variables = fold_weight_norm(model, variables)

    bandwidths = args.bandwidths
    if bandwidths is not None:
        bad = [b for b in bandwidths if b not in model.target_bandwidths]
        if bad:
            print(f"unsupported bandwidths {bad}; {args.model_name} serves "
                  f"{model.target_bandwidths}", file=sys.stderr)
            sys.exit(1)

    lengths = [int(round(s * model.sample_rate)) for s in args.seconds]
    from .deploy import save_artifact
    meta = save_artifact(args.output, model, variables, lengths,
                         bandwidths, platforms=args.platforms,
                         kinds=args.kinds)
    n = len(meta['entries'])
    size = os.path.getsize(args.output)
    print(f"wrote {args.output}: {n} entries "
          f"({len(lengths)} lengths x "
          f"{len(bandwidths) if bandwidths else 'default'} "
          f"bandwidths x {'/'.join(args.kinds)}), "
          f"{size / 1e6:.1f} MB, platforms={meta['platforms']}")
    return meta


if __name__ == '__main__':
    main()
