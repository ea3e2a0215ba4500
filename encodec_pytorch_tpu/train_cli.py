"""Training entry point — the hydra-main analogue of train_multi_gpu.py /
train_single_gpu.py.

    python -m encodec_pytorch_tpu.train_cli                        # config.yaml
    python -m encodec_pytorch_tpu.train_cli --config config_mono_nq2
    python -m encodec_pytorch_tpu.train_cli datasets.batch_size=24 \
        model.norm=weight_norm distributed.world_size=8

There is no mp.spawn: one process drives the SPMD step over the whole mesh
(train_multi_gpu.py:355-375 became ~20 lines).
"""

import argparse
import os
import sys

from .config import load_config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config', default='config',
                        help='config name under configs/ or a yaml path')
    parser.add_argument('overrides', nargs='*',
                        help='dot-path overrides: key.path=value')
    args = parser.parse_args(argv)

    config = load_config(args.config, args.overrides)
    os.makedirs(str(config.checkpoint.save_folder), exist_ok=True)

    from .utils import enable_compile_cache
    enable_compile_cache(config.tpu.get('compile_cache_dir', ''))

    from .train.trainer import Trainer
    Trainer(config).run()


if __name__ == '__main__':
    main(sys.argv[1:])
