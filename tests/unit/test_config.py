import json

from uig.config import Config, apply_overrides, config_from_dict, config_to_dict, get_preset


def test_roundtrip():
    cfg = get_preset("cyclegan256_dp")
    d = config_to_dict(cfg)
    cfg2 = config_from_dict(json.loads(json.dumps(d)))
    assert cfg == cfg2


def test_overrides_dotted():
    cfg = Config()
    cfg = apply_overrides(cfg, ["opt.lr=1e-3", "model.image_size=128",
                                "data.augment=xla", "run.tensorboard=true",
                                "model.nce_layers=1,2,3"])
    assert cfg.opt.lr == 1e-3
    assert cfg.model.image_size == 128
    assert cfg.data.augment == "xla"
    assert cfg.run.tensorboard is True
    assert cfg.model.nce_layers == (1, 2, 3)


def test_override_unknown_field_raises():
    import pytest

    with pytest.raises(KeyError):
        apply_overrides(Config(), ["opt.nope=1"])


def test_presets_exist():
    for name in ("smoke64", "cyclegan128", "cyclegan256_dp",
                 "cut256_multihost", "unit256", "discogan64", "vqgan512"):
        cfg = get_preset(name)
        assert cfg.model.image_size in (64, 128, 256, 512)
