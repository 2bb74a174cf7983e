import os

import pytest

from gitax.common import (
    Config,
    dict_ensure_path_key_converted,
    dict_get_path_value,
    dict_has_path,
    dict_update_path_value,
    get_all_path,
    json_dump,
    load_from_yaml_file,
    parse_general_args,
)


def test_dict_path_helpers():
    d = {"a": {"b": {"c": 1}}, "l": [10, {"x": 2}]}
    assert dict_has_path(d, "a$b$c")
    assert dict_get_path_value(d, "a$b$c") == 1
    assert dict_get_path_value(d, "l$1$x") == 2
    assert not dict_has_path(d, "a$b$missing")
    dict_update_path_value(d, "a$b$d", 5)
    assert d["a"]["b"]["d"] == 5
    dict_update_path_value(d, "new$nested", 7)
    assert d["new"]["nested"] == 7


def test_get_all_path():
    d = {"a": {"b": 1}, "c": 2}
    paths = set(get_all_path(d, with_list=False))
    assert paths == {"a$b", "c"}


def test_config_missing_returns_none():
    cfg = Config({"x": 1, "nested": {"y": 2}}, {"x": 3})
    assert cfg.x == 3
    assert cfg.get("nested$y") == 2
    assert cfg.not_there is None


def test_config_dict_merge():
    cfg = Config({"d": {"a": 1, "b": 2}}, {"d": {"b": 3}})
    assert cfg.d == {"a": 1, "b": 3}


def test_yaml_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnested:\n  x: 10\n  y: 20\n")
    child = tmp_path / "child.yaml"
    child.write_text("_base_: base.yaml\nnested:\n  x: 99\nb: 2\n")
    data = load_from_yaml_file(str(child))
    assert data == {"a": 1, "b": 2, "nested": {"x": 99, "y": 20}}


def test_parse_general_args_merge(tmp_path):
    cfgfile = tmp_path / "c.yaml"
    cfgfile.write_text("type: foo\nalpha: 1\n")
    kwargs = parse_general_args(
        ["-c", str(cfgfile), "-p", "{'alpha': 2, 'beta': 3}"]
    )
    assert kwargs == {"type": "foo", "alpha": 2, "beta": 3}


def test_path_key_expansion():
    d = {"a$b": 1, "plain": 2}
    dict_ensure_path_key_converted(d)
    assert d == {"a": {"b": 1}, "plain": 2}


def test_json_dump_deterministic():
    assert json_dump({"b": 1, "a": 2}) == '{"a":2,"b":1}'


def test_mpi_rank_env_surface(monkeypatch):
    """Env-var surface matches the reference (RANK/OMPI_COMM_WORLD_RANK,
    common.py:106-119); an initialised jax.distributed runtime would
    take precedence (not initialisable in-process here, so the env path
    is what this pins)."""
    from gitax.common import get_mpi_rank, get_mpi_size

    for var in ("RANK", "WORLD_SIZE", "OMPI_COMM_WORLD_RANK",
                "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(var, raising=False)
    assert get_mpi_rank() == 0 and get_mpi_size() == 1
    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "3")
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "8")
    assert get_mpi_rank() == 3 and get_mpi_size() == 8
    # RANK/WORLD_SIZE win over the OMPI names (reference precedence)
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "4")
    assert get_mpi_rank() == 1 and get_mpi_size() == 4


def test_distributed_initialize_requires_rank_with_world(monkeypatch):
    from gitax.runtime.distributed import initialize

    for var in ("RANK", "WORLD_SIZE", "OMPI_COMM_WORLD_RANK",
                "OMPI_COMM_WORLD_SIZE", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize() is False  # single-process no-op
    monkeypatch.setenv("WORLD_SIZE", "4")
    with pytest.raises(ValueError, match="no rank"):
        initialize()
