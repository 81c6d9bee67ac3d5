import pytest

from gluefactory_tpu.core.config import (
    Config,
    ConfigKeyError,
    ConfigReadOnlyError,
    MandatoryValueError,
)


def test_merge_nested():
    a = Config({"model": {"name": "lg", "dim": 256}, "lr": 1e-4})
    b = Config({"model": {"dim": 128}})
    c = Config.merge(a, b)
    assert c.model.dim == 128
    assert c.model.name == "lg"
    assert c.lr == 1e-4
    # inputs untouched
    assert a.model.dim == 256


def test_struct_mode_rejects_unknown():
    a = Config({"model": {"name": "lg"}})
    a.set_struct(True)
    with pytest.raises(ConfigKeyError):
        a.merge_({"model": {"typo_key": 1}})
    a.merge_({"model": {"name": "gs"}})
    assert a.model.name == "gs"


def test_readonly():
    a = Config({"x": 1}).set_readonly(True)
    with pytest.raises(ConfigReadOnlyError):
        a.x = 2


def test_mandatory():
    a = Config({"data": {"name": "???"}})
    with pytest.raises(MandatoryValueError):
        a.check_mandatory()
    with pytest.raises(MandatoryValueError):
        _ = a.data.name
    a.merge_({"data": {"name": "homographies"}})
    a.check_mandatory()


def test_dotlist():
    c = Config.from_dotlist(["a.b.c=3", "x=[1, 2]", "name=foo", "f=1e-3"])
    assert c.a.b.c == 3
    assert list(c.x) == [1, 2]
    assert c.name == "foo"
    assert c.f == 1e-3


def test_yaml_roundtrip(tmp_path):
    c = Config({"m": {"n": [1, 2, {"k": "v"}]}})
    p = tmp_path / "c.yaml"
    c.save(p)
    c2 = Config.load(p)
    assert c2 == c


def test_all_shipped_configs_construct():
    """Every YAML in gluefactory_tpu/configs must load and, when it defines a
    model, build it through the struct-checked conf merge (catches stale or
    misspelled keys in the config zoo)."""
    from pathlib import Path

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.models import get_model

    cfg_dir = Path(__file__).parent.parent / "gluefactory_tpu" / "configs"
    paths = sorted(cfg_dir.glob("*.yaml"))
    assert len(paths) >= 25
    for path in paths:
        conf = Config.load(path)
        if "model" in conf:
            model = get_model(conf.model["name"]).from_conf(conf.model)
            assert model is not None, path.name
