"""Config system tests (SURVEY.md §2.1 analogue of hparams plumbing)."""

import pytest

from tacotron_multispeaker_tpu.config import Config, get_config, parse_overrides, PRESETS


def test_default_matches_tacotron1_hparams():
    cfg = Config()
    assert cfg.audio.num_mels == 80
    assert cfg.audio.num_freq == 1025
    assert cfg.audio.n_fft == 2048
    assert cfg.model.outputs_per_step == 5
    assert cfg.model.embed_depth == 256
    assert cfg.train.initial_learning_rate == 0.002
    assert cfg.train.grad_clip_norm == 1.0


def test_hop_win_lengths():
    cfg = Config()
    # 12.5 ms hop / 50 ms window at 20 kHz
    assert cfg.audio.hop_length == 250
    assert cfg.audio.win_length == 1000


def test_all_presets_construct():
    for name, fn in PRESETS.items():
        cfg = fn()
        assert cfg.audio.num_mels == 80, name
        assert cfg.to_json()
        assert "Hyperparameters" in cfg.debug_string()


def test_override_dotted():
    cfg = parse_overrides(Config(), "model.outputs_per_step=2,train.batch_size=4")
    assert cfg.model.outputs_per_step == 2
    assert cfg.train.batch_size == 4


def test_override_undotted_unique():
    cfg = parse_overrides(Config(), "outputs_per_step=3")
    assert cfg.model.outputs_per_step == 3


def test_override_tuple_and_bool():
    cfg = parse_overrides(Config(), "model.prenet_depths=(128,64),parallel.use_pallas=true")
    assert cfg.model.prenet_depths == (128, 64)
    assert cfg.parallel.use_pallas is True


def test_override_errors():
    with pytest.raises(KeyError):
        parse_overrides(Config(), "nonexistent_param=1")
    with pytest.raises(ValueError):
        parse_overrides(Config(), "model.outputs_per_step")


def test_get_config_unknown():
    with pytest.raises(KeyError):
        get_config("nope")
