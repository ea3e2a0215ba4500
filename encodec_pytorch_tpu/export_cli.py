"""Export a trainer checkpoint to a reference-loadable torch ``.th`` file.

The handoff the reference ecosystem expects (reference model.py:332-368,
utils.py:132-148): a model trained with this framework becomes a checkpoint
the reference's torch runtime — ``my_encodec_model``, ``encodec_model_bw``,
or the released-repository loader — consumes unchanged.

    python -m encodec_pytorch_tpu.export_cli \
        checkpoints/epoch50.ckpt out/my_encodec.pt            # trainer style
    python -m encodec_pytorch_tpu.export_cli \
        checkpoints/epoch50.ckpt out/model_24khz.th \
        --style released --checksum                           # released style
    python -m encodec_pytorch_tpu.export_cli ... --disc out/disc.pt

Config resolution matches the train CLI: ``--config`` names a yaml under
``configs/`` (or a path) and must describe the architecture the checkpoint
was trained with — the checkpoint is restored into that template.
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('checkpoint', help='trainer checkpoint (.ckpt)')
    parser.add_argument('output', help='output torch checkpoint path')
    parser.add_argument('--config', default='config',
                        help='config name under configs/ or a yaml path '
                             '(the architecture the checkpoint was trained '
                             'with)')
    parser.add_argument('--style', choices=('trainer', 'released'),
                        default='trainer',
                        help="'trainer': {'epoch','model_state_dict'} with "
                             "quantizer.model keys (loads via the "
                             "reference's my_encodec_model / "
                             "encodec_model_bw); 'released': flat released-"
                             "checkpoint layout")
    parser.add_argument('--checksum', action='store_true',
                        help='rename the output to embed the sha256 prefix '
                             'the reference repository loader verifies '
                             '(released style)')
    parser.add_argument('--disc', default='',
                        help='also export the discriminator to this path')
    parser.add_argument('--lm', action='store_true',
                        help='the input is a native entropy-LM checkpoint '
                             '(lm_train_cli output); export it as the flat '
                             'state dict the reference get_lm_model loads '
                             '(reference model.py:236-239). --checksum '
                             'applies; --style/--disc are ignored')
    parser.add_argument('overrides', nargs='*',
                        help='dot-path config overrides: key.path=value')
    args = parser.parse_args(argv)

    import jax

    from . import export
    from .config import load_config

    if args.lm:
        import torch

        from .train.lm_trainer import load_lm_checkpoint
        _lm, params = load_lm_checkpoint(args.checkpoint)
        sd = export.lm_state_dict(params)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   args.output)
        out = (export._checksum_rename(args.output) if args.checksum
               else args.output)
        print(f'wrote {out} (entropy LM, {len(sd)} tensors)')
        return out

    from .train.balancer import Balancer
    from .train.checkpoint import load_checkpoint
    from .train.step import init_train_state
    from .train.trainer import build_disc_from_config, build_model_from_config

    config = load_config(args.config, args.overrides)
    model = build_model_from_config(config)
    disc = build_disc_from_config(config)
    balancer = Balancer(config.balancer.weights.to_dict())
    template = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                                example_length=int(config.datasets.tensor_cut))
    state, epoch = load_checkpoint(args.checkpoint, template)

    variables = {'params': state.params_g, 'quantizer': state.quantizer}
    out = export.save_torch_checkpoint(
        variables, args.output, style=args.style, epoch=epoch,
        add_checksum=args.checksum)
    print(f'wrote {out} (style={args.style}, epoch={epoch})')

    if args.disc:
        path = export.save_torch_disc(state.params_d, args.disc,
                                      win_lengths=tuple(disc.win_lengths),
                                      epoch=epoch)
        print(f'wrote {path} (discriminator)')
    return out


if __name__ == '__main__':
    main(sys.argv[1:])
