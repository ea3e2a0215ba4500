"""Config system: loading, overrides, interpolation, quirk-free parsing."""

import pytest

from encodec_pytorch_tpu.config import (load_config, parse_probability,
                                        parse_segment)


def test_load_base_config_surface():
    c = load_config('config')
    # the reference's hydra groups (config/config.yaml)
    for group in ['common', 'datasets', 'checkpoint', 'optimization',
                  'lr_scheduler', 'model', 'distributed', 'balancer']:
        assert group in c, group
    assert c.model.target_bandwidths == [1.5, 3., 6., 12., 24.]
    assert c.model.sample_rate == 24000
    assert c.balancer.weights.l_t == 0.1


def test_overrides_and_interpolation():
    c = load_config('config', [
        'datasets.batch_size=24',
        'model.norm=time_group_norm',
        'model.disc_n_ffts=[256,128]',
        'checkpoint.save_folder=/tmp/ck',
    ])
    assert c.datasets.batch_size == 24
    assert c.model.norm == 'time_group_norm'
    assert c.model.disc_n_ffts == [256, 128]
    # ${...} interpolation in save_location (config.yaml:23 analogue)
    assert c.checkpoint.save_location.startswith('/tmp/ck/bs24_cut')


def test_parse_segment_no_eval():
    assert parse_segment('None') is None
    assert parse_segment(None) is None
    assert parse_segment(1.0) == 1.0
    assert parse_segment('0.5') == 0.5


def test_parse_probability():
    assert parse_probability(True) == 1.0
    assert parse_probability(False) == 0.0
    assert parse_probability(0.5) == 0.5
    assert abs(parse_probability('2/3') - 2 / 3) < 1e-9
    with pytest.raises(ValueError):
        parse_probability(object())


def test_mono_nq2_config():
    c = load_config('config_mono_nq2')
    assert c.model.n_q == 2
    assert c.datasets.dataset == 'multi_channel'
    assert parse_probability(c.model.train_discriminator) == 0.5
