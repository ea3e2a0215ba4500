"""Fetch epoch checkpoints from a wandb run's logged artifacts.

Rebuild of /root/reference/download_checkpoint.py (defaults mirror its
entity/project/run, download_checkpoint.py:83-87). Requires the optional
``wandb`` package and network access; both are gated with clear errors.

    python -m encodec_pytorch_tpu.download_checkpoint \
        --entity madhudorai24 --project mono-encodec-nq2 --run_id s2pnxx7w \
        --epoch 74 --output_dir ./checkpoints
"""

import argparse
import os
import sys


def download_checkpoint(entity: str, project: str, run_id: str, epoch: int,
                        output_dir: str = './checkpoints') -> list:
    try:
        import wandb
    except ImportError:
        raise RuntimeError(
            "the optional `wandb` package is not installed in this image; "
            "install it (or copy checkpoints manually) to use this tool")
    api = wandb.Api()
    run = api.run(f'{entity}/{project}/{run_id}')
    os.makedirs(output_dir, exist_ok=True)
    downloaded = []
    for artifact in run.logged_artifacts():
        if f'epoch{epoch}' in artifact.name:
            path = artifact.download(root=output_dir)
            print(f'downloaded {artifact.name} -> {path}')
            downloaded.append(path)
    if not downloaded:
        print(f'no artifacts matching epoch {epoch} in run {run_id}',
              file=sys.stderr)
    return downloaded


def main(argv=None):
    parser = argparse.ArgumentParser('download_checkpoint')
    parser.add_argument('--entity', default='madhudorai24')
    parser.add_argument('--project', default='mono-encodec-nq2')
    parser.add_argument('--run_id', default='s2pnxx7w')
    parser.add_argument('--epoch', type=int, default=74)
    parser.add_argument('--output_dir', default='./checkpoints')
    args = parser.parse_args(argv)
    download_checkpoint(args.entity, args.project, args.run_id, args.epoch,
                        args.output_dir)


if __name__ == '__main__':
    main()
