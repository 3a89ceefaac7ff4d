"""Config system + shipped config-port tests."""

import glob

import pytest

from owl_audio_exps_tpu.configs import Config, transformer_config


def test_open_schema_roundtrip():
    cfg = Config.from_dict({
        "model": {"model_id": "game_rft", "totally_new_key": [1, 2],
                  "nested": {"a": 1}},
        "train": {"trainer_id": "rft", "custom_flag": True},
        "wandb": {"run_name": "x"},
    })
    # declared defaults present
    assert cfg.model.n_layers == 12
    assert cfg.train.target_batch_size == 128
    # open keys preserved, attribute + get access
    assert cfg.model.totally_new_key == [1, 2]
    assert cfg.model.nested.a == 1
    assert cfg.train.get("custom_flag") is True
    assert cfg.train.get("missing", "d") == "d"
    with pytest.raises(AttributeError):
        _ = cfg.model.nonexistent
    d = cfg.to_dict()
    assert d["model"]["nested"] == {"a": 1}


def test_mutation_and_copy():
    c = transformer_config(n_layers=4)
    c.local_idx = 2
    c2 = c.copy()
    c2.local_idx = 8
    assert c.local_idx == 2 and c2.local_idx == 8


@pytest.mark.parametrize("path", sorted(glob.glob("configs/*.yml")))
def test_shipped_configs_parse(path):
    cfg = Config.from_yaml(path)
    assert cfg.model.model_id or cfg.train.trainer_id
    # trainer/sampler ids resolve in the registries when present
    from owl_audio_exps_tpu.trainers import get_trainer_cls
    from owl_audio_exps_tpu.sampling import get_sampler_cls
    if cfg.train.trainer_id:
        get_trainer_cls(cfg.train.trainer_id)
    if cfg.train.sampler_id:
        get_sampler_cls(cfg.train.sampler_id)
    if cfg.model.model_id and cfg.model.model_id != "audio_vae":
        from owl_audio_exps_tpu.models import get_model_cls
        get_model_cls(cfg.model.model_id)
