"""User-config/preset CRUD scenario tests (reference P01-P20 style)."""

import json

import pytest

from whisperjav_tpu.config.user_config import UserConfigManager


@pytest.fixture
def mgr(tmp_path):
    return UserConfigManager(tmp_path / "config.json")


def test_fresh_config_defaults(mgr):
    assert mgr.list_presets() == []
    assert mgr.get_pref("theme") is None


def test_preferences_persist(tmp_path):
    m1 = UserConfigManager(tmp_path / "c.json")
    m1.set_pref("default_mode", "balanced")
    m2 = UserConfigManager(tmp_path / "c.json")
    assert m2.get_pref("default_mode") == "balanced"


def test_preset_crud(mgr):
    mgr.save_preset("night run", {"mode": "fidelity", "batch_size": 16})
    assert mgr.list_presets() == ["night run"]
    assert mgr.get_preset("night run")["mode"] == "fidelity"
    mgr.rename_preset("night run", "overnight")
    assert mgr.get_preset("night run") is None
    assert mgr.get_preset("overnight")["batch_size"] == 16
    assert mgr.delete_preset("overnight")
    assert not mgr.delete_preset("overnight")   # already gone


def test_unicode_preset_names(mgr):
    mgr.save_preset("夜間バッチ🌙", {"mode": "qwen"})
    m2 = UserConfigManager(mgr.path)
    assert "夜間バッチ🌙" in m2.list_presets()


def test_invalid_names_rejected(mgr):
    with pytest.raises(ValueError):
        mgr.save_preset("", {})
    with pytest.raises(ValueError):
        mgr.save_preset("   ", {})
    mgr.save_preset("x", {})
    with pytest.raises(ValueError):
        mgr.rename_preset("x", "")
    with pytest.raises(KeyError):
        mgr.rename_preset("missing", "y")


def test_corrupt_file_quarantined(tmp_path):
    p = tmp_path / "c.json"
    p.write_text("{not valid json", encoding="utf-8")
    m = UserConfigManager(p)
    assert m.list_presets() == []           # fresh defaults
    assert (tmp_path / "c.json.corrupt").exists()
    m.set_pref("a", 1)                      # can still save
    assert json.loads(p.read_text())["preferences"]["a"] == 1


def test_wrong_shape_quarantined(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps([1, 2, 3]), encoding="utf-8")
    m = UserConfigManager(p)
    assert m.data["schema_version"]


def test_atomic_write_no_partial(tmp_path, mgr):
    mgr.save_preset("p1", {"k": "v"})
    # no stray temp files
    leftovers = [f for f in mgr.path.parent.iterdir()
                 if f.suffix == ".tmp"]
    assert leftovers == []


def test_export_import(tmp_path, mgr):
    mgr.save_preset("p1", {"mode": "fast"})
    mgr.set_pref("lang", "ja")
    out = mgr.export_to(tmp_path / "export.json")
    other = UserConfigManager(tmp_path / "other.json")
    other.save_preset("p2", {"mode": "qwen"})
    other.import_from(out, merge=True)
    assert set(other.list_presets()) == {"p1", "p2"}
    assert other.get_pref("lang") == "ja"
    other.import_from(out, merge=False)
    assert other.list_presets() == ["p1"]
