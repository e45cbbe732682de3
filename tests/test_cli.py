"""CLI special commands + persistent settings (reference
yolo/cfg/__init__.py:260-339, yolo/utils/__init__.py:686-743)."""
from pathlib import Path

import pytest

import mgdt_yolo_tpu.utils as U
from mgdt_yolo_tpu.cfg import (copy_default_cfg, entrypoint,
                               handle_yolo_settings, merge_equals_args)


@pytest.fixture
def settings_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(U, "SETTINGS_YAML", tmp_path / "settings.yaml")
    return tmp_path


def test_merge_equals_args():
    assert merge_equals_args(["imgsz", "=", "640"]) == ["imgsz=640"]
    assert merge_equals_args(["imgsz=", "640"]) == ["imgsz=640"]
    assert merge_equals_args(["imgsz", "=640"]) == ["imgsz=640"]
    assert merge_equals_args(["a=1", "b=2"]) == ["a=1", "b=2"]


def test_get_settings_creates_and_validates(settings_dir):
    s = U.get_settings()
    assert (settings_dir / "settings.yaml").is_file()
    assert set(s) == {"datasets_dir", "weights_dir", "runs_dir", "uuid",
                      "sync", "api_key", "settings_version"}
    # corrupt file resets to defaults
    (settings_dir / "settings.yaml").write_text("garbage_key: 1\n")
    s2 = U.get_settings()
    assert set(s2) == set(s)


def test_set_settings_persists_and_rejects_unknown(settings_dir):
    U.set_settings({"runs_dir": "/tmp/myruns"})
    assert U.get_settings()["runs_dir"] == "/tmp/myruns"
    with pytest.raises(KeyError):
        U.set_settings({"bogus": 1})


@pytest.fixture
def log_lines(monkeypatch):
    """The package LOGGER binds the pre-pytest stdout; record .info calls
    directly instead of fighting the capture plumbing."""
    lines = []
    monkeypatch.setattr(U.LOGGER, "info", lambda msg, *a: lines.append(str(msg)))
    return lines


def test_cli_version_and_checks(log_lines):
    import mgdt_yolo_tpu
    entrypoint(["version"])
    assert any(mgdt_yolo_tpu.__version__ in ln for ln in log_lines)
    entrypoint(["checks"])
    assert any("jax" in ln for ln in log_lines)


def test_cli_help_aliases(log_lines):
    for alias in ("help", "-h", "--help"):
        log_lines.clear()
        entrypoint([alias])
        assert any("usage: yolo" in ln for ln in log_lines)


def test_cli_settings_roundtrip(settings_dir):
    entrypoint(["settings", "runs_dir=/tmp/cli_runs"])
    assert U.get_settings()["runs_dir"] == "/tmp/cli_runs"
    entrypoint(["settings", "reset"])
    assert U.get_settings()["runs_dir"] != "/tmp/cli_runs"


def test_cli_cfg_print(log_lines):
    entrypoint(["cfg"])
    assert any("imgsz" in ln for ln in log_lines)


def test_copy_cfg(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    f = copy_default_cfg()
    assert Path(f).is_file() and f.name == "default_copy.yaml"


def test_cli_errors():
    with pytest.raises(SyntaxError):  # valid key without '='
        entrypoint(["detect", "train", "imgsz"])
    with pytest.raises(SyntaxError):  # unknown key with fuzzy hint
        entrypoint(["detect", "train", "imgzs=640"])
