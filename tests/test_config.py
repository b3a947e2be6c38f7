import pytest

from surreal_tpu.config import Config, ConfigError, REQUIRED, extend_config


def test_attr_access():
    c = Config({"a": 1, "b": {"c": 2}})
    assert c.a == 1
    assert c.b.c == 2
    c.b.d = 3
    assert c["b"]["d"] == 3


def test_extend_config_merges_and_validates():
    base = Config(lr=1e-3, net={"hidden": [64, 64], "act": "tanh"}, env=REQUIRED("env name"))
    out = extend_config({"net": {"act": "relu"}, "env": "cheetah-run"}, base)
    assert out.lr == 1e-3
    assert out.net.act == "relu"
    assert out.net.hidden == [64, 64]
    assert out.env == "cheetah-run"


def test_extend_config_missing_required():
    base = Config(env=REQUIRED("env name"))
    with pytest.raises(ConfigError, match="required"):
        extend_config({}, base)


def test_extend_config_unknown_key():
    with pytest.raises(ConfigError, match="Unknown config key"):
        extend_config({"typo": 1}, Config(lr=1e-3))


def test_dotted_set_and_roundtrip():
    c = Config(algo={"lr": 1e-3})
    c.set_dotted("algo.lr", "3e-4")
    assert c.algo.lr == 3e-4
    c2 = Config.loads(c.dumps())
    assert c2.algo.lr == 3e-4
