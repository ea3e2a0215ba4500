"""E2e trainer run through the multi-channel scene dataset — the
reference's single-GPU mono trainer path (train_single_gpu.py +
multi_channel_dataset.py, config_mono_nq2.yaml)."""

import numpy as np
import pytest
from scipy.io import wavfile


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('scenes')
    rng = np.random.RandomState(0)
    sr = 24_000
    for folder, n in [('Beach', 3), ('Park', 3), ('Woodland', 2)]:
        d = root / folder
        d.mkdir()
        for i in range(n):
            # 2-second 4-channel scene files
            x = (rng.randn(2 * sr, 4) * 0.1 * 32767).astype(np.int16)
            wavfile.write(str(d / f'scene{i}.wav'), sr, x)
    return root


def test_trainer_epoch_with_multichannel_dataset(scene_dir, tmp_path):
    from encodec_pytorch_tpu.config import Config
    from encodec_pytorch_tpu.train.trainer import Trainer

    cfg = {
        'common': {'save_interval': 1, 'test_interval': 1, 'log_interval': 1,
                   'max_epoch': 1, 'seed': 7},
        'datasets': {'dataset': 'multi_channel', 'data_root': str(scene_dir),
                     'batch_size': 2, 'tensor_cut': 4800, 'num_workers': 0,
                     'fixed_length': 4},
        'checkpoint': {'resume': False, 'checkpoint_path': '',
                       'save_folder': str(tmp_path) + '/',
                       'save_location': str(tmp_path) + '/run_'},
        'optimization': {'lr': 3e-4, 'disc_lr': 3e-4},
        'lr_scheduler': {'warmup_epoch': 0},
        'model': {'target_bandwidths': [1.5], 'sample_rate': 24_000,
                  'channels': 1, 'train_discriminator': True,
                  'audio_normalize': False, 'n_filters': 4, 'n_q': 2,
                  'filters': 4, 'ratios': [8, 5, 4, 2],
                  'disc_win_lengths': [256, 128],
                  'disc_hop_lengths': [64, 32],
                  'disc_n_ffts': [256, 128],
                  'causal': True, 'norm': 'weight_norm', 'segment': None,
                  'name': 'my_encodec'},
        'distributed': {'data_parallel': False, 'world_size': 1},
        'balancer': {'weights': {'l_t': 0.1, 'l_f': 1, 'l_g': 3,
                                 'l_feat': 3}},
    }
    trainer = Trainer(Config(cfg))
    # the scene walker found the train folders and built fixed validation
    assert len(trainer.trainset) == 4          # fixed_length cap
    assert len(trainer.testset.fixed_segments) > 0
    trainer.run()
    ckpts = list(tmp_path.glob('run_epoch1*.ckpt'))
    assert ckpts, list(tmp_path.iterdir())
