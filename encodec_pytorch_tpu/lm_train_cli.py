"""Entropy-LM training CLI — a capability the reference lacks entirely
(it only downloads pretrained LMs, reference model.py:221-240).

    python -m encodec_pytorch_tpu.lm_train_cli \
        --codec my_encodec --codec_checkpoint ckpt.pt --bandwidth 6 \
        --train_csv train.csv --epochs 10 --out lm.msgpack

The produced checkpoint plugs into the codec CLI:
    python -m encodec_pytorch_tpu.cli in.wav out.ecdc -l \
        --lm_checkpoint lm.msgpack ...
"""

import argparse
import logging
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--codec', default='my_encodec',
                   help='codec factory: encodec_24khz | my_encodec | ...')
    p.add_argument('--codec_checkpoint', required=True)
    p.add_argument('--bandwidth', type=float, default=6.0)
    p.add_argument('--train_csv', required=True)
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--tensor_cut', type=int, default=72000)
    p.add_argument('--epochs', type=int, default=10)
    p.add_argument('--lr', type=float, default=3e-4)
    p.add_argument('--num_layers', type=int, default=5)
    p.add_argument('--dim', type=int, default=200)
    p.add_argument('--num_heads', type=int, default=8)
    p.add_argument('--out', default='lm.msgpack')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s: %(levelname)s: %(message)s')

    from .config import Config
    from .data.dataset import CustomAudioDataset, DataLoader
    from .models.model import MODELS
    from .train.lm_trainer import LMTrainer, save_lm_checkpoint

    model, variables = MODELS[args.codec](checkpoint=args.codec_checkpoint) \
        if args.codec in ('encodec_24khz', 'encodec_48khz') \
        else MODELS[args.codec](args.codec_checkpoint)
    if variables is None:
        sys.exit(f'{args.codec} needs converted weights (pass a checkpoint)')
    model.set_target_bandwidth(args.bandwidth)

    ds_config = Config({
        'datasets': {'train_csv_path': args.train_csv,
                     'test_csv_path': args.train_csv,
                     'tensor_cut': args.tensor_cut, 'fixed_length': 0},
        'model': {'sample_rate': model.sample_rate,
                  'channels': model.channels}})
    dataset = CustomAudioDataset(ds_config, mode='train')
    loader = DataLoader(dataset, args.batch_size, shuffle=True,
                        fixed_length=args.tensor_cut, seed=args.seed)

    steps_per_epoch = max(1, len(loader))
    trainer = LMTrainer(model, variables, lr=args.lr,
                        warmup_steps=min(500, steps_per_epoch),
                        total_steps=args.epochs * steps_per_epoch,
                        num_layers=args.num_layers, dim=args.dim,
                        num_heads=args.num_heads)
    logging.info('training %d-layer dim-%d LM over n_q=%d codes, %d steps',
                 args.num_layers, args.dim, trainer.n_q,
                 args.epochs * steps_per_epoch)
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        metrics = trainer.train_epoch(
            iter(loader), epoch, log_interval=max(1, steps_per_epoch // 4))
        logging.info('epoch %d done: bits/code %.3f (packed %.1f)',
                     epoch, metrics.get('bits_per_code', float('nan')),
                     np.log2(model.quantizer.bins))
    save_lm_checkpoint(args.out, trainer.state, trainer.lm)
    logging.info('saved LM params to %s', args.out)


if __name__ == '__main__':
    main(sys.argv[1:])
