"""Tests for the translation service (offline, injected provider)."""

import json

import pytest

from whisperjav_tpu.modules.srt import Subtitle, load_srt, save_srt
from whisperjav_tpu.translate.providers import (
    PROVIDERS, max_batch_lines, resolve_provider,
)
from whisperjav_tpu.translate.service import (
    parse_numbered_response, translate_srt,
)


def test_provider_registry():
    assert {"deepseek", "openrouter", "gpt", "claude", "gemini", "glm",
            "groq", "ollama", "local", "custom", "identity"} <= set(PROVIDERS)
    cfg = resolve_provider("deepseek")
    assert cfg.api_style == "openai"
    with pytest.raises(ValueError):
        resolve_provider("nope")
    custom = resolve_provider("custom", base_url="http://x", model="m1")
    assert custom.base_url == "http://x"
    assert custom.default_model == "m1"


def test_batch_cap_scales_with_context():
    small = max_batch_lines(resolve_provider("local"))
    big = max_batch_lines(resolve_provider("gemini"))
    assert big > small >= 8


def test_parse_numbered_response():
    text = "1: Hello\n2: World\ngarbage\n3） こんにちは\n4. Dots too"
    parsed = parse_numbered_response(text)
    assert parsed[1] == "Hello"
    assert parsed[3] == "こんにちは"
    assert parsed[4] == "Dots too"


def _mk_srt(tmp_path, n=5):
    subs = [Subtitle(i + 1, i * 2.0, i * 2.0 + 1.5, f"台詞{i + 1}")
            for i in range(n)]
    p = tmp_path / "movie.ja.whisperjav.srt"
    save_srt(p, subs)
    return p


def test_translate_with_injected_provider(tmp_path):
    p = _mk_srt(tmp_path)

    def fake_call(prompt):
        # echo with EN prefix, numbered
        lines = []
        for ln in prompt.split("---\n", 1)[1].split("\n"):
            num, text = ln.split(":", 1)
            lines.append(f"{num}: EN[{text.strip()}]")
        return "\n".join(lines)

    out = translate_srt(p, provider="custom", call_fn=fake_call,
                        target_language="English")
    subs = load_srt(out)
    assert all(s.text.startswith("EN[") for s in subs)
    # project file recorded progress
    proj = json.loads(p.with_suffix(".wjtrans.json").read_text())
    assert len(proj["translated"]) == 5


def test_translate_resume_skips_done(tmp_path):
    p = _mk_srt(tmp_path)
    calls = []

    def count_call(prompt):
        calls.append(prompt)
        lines = []
        for ln in prompt.split("---\n", 1)[1].split("\n"):
            num, text = ln.split(":", 1)
            lines.append(f"{num}: X{text.strip()}")
        return "\n".join(lines)

    translate_srt(p, provider="custom", call_fn=count_call)
    n_first = len(calls)
    translate_srt(p, provider="custom", call_fn=count_call)
    assert len(calls) == n_first     # nothing left to translate


def test_translate_failure_keeps_source(tmp_path):
    p = _mk_srt(tmp_path, n=3)

    def broken(prompt):
        raise RuntimeError("no network")

    out = translate_srt(p, provider="custom", call_fn=broken)
    subs = load_srt(out)
    assert [s.text for s in subs] == ["台詞1", "台詞2", "台詞3"]


def test_identity_provider_offline(tmp_path):
    p = _mk_srt(tmp_path, n=2)
    out = translate_srt(p, provider="identity")
    subs = load_srt(out)
    assert len(subs) == 2   # identity echoes the numbered source lines


class TestOllamaManager:
    def _mgr(self, monkeypatch, tags=None, show_ctx=8192):
        from whisperjav_tpu.translate import ollama_manager as om

        mgr = om.OllamaManager("http://test:11434")

        def fake_get(path, timeout=5.0):
            if path == "/api/tags":
                if tags is None:
                    raise OSError("connection refused")
                return {"models": [{"name": n} for n in tags]}
            raise AssertionError(path)

        def fake_post(path, payload, timeout=30.0):
            if path == "/api/show":
                return {"model_info": {"llama.context_length": show_ctx}}
            raise AssertionError(path)

        monkeypatch.setattr(mgr, "_get", fake_get)
        monkeypatch.setattr(mgr, "_post", fake_post)
        return mgr

    def test_ensure_ready_computes_batch(self, monkeypatch):
        mgr = self._mgr(monkeypatch, tags=["gemma2:2b"], show_ctx=4096)
        ready = mgr.ensure_ready(model="gemma2:2b", auto_start=False)
        assert ready["model"] == "gemma2:2b"
        assert ready["num_ctx"] == 4096
        assert 8 <= ready["batch_size"] <= 96
        assert not ready["server_started"]

    def test_missing_model_raises(self, monkeypatch):
        from whisperjav_tpu.translate.ollama_manager import (
            ModelNotAvailableError,
        )
        mgr = self._mgr(monkeypatch, tags=["other:1b"])
        with pytest.raises(ModelNotAvailableError):
            mgr.ensure_ready(model="gemma3:12b", auto_start=False)

    def test_not_running_raises_without_autostart(self, monkeypatch):
        from whisperjav_tpu.translate.ollama_manager import (
            OllamaNotRunningError,
        )
        mgr = self._mgr(monkeypatch, tags=None)
        with pytest.raises(OllamaNotRunningError):
            mgr.ensure_ready(model="x", auto_start=False)

    def test_vram_ladder(self):
        from whisperjav_tpu.translate.ollama_manager import OllamaManager
        mgr = OllamaManager("http://test:11434")
        assert mgr.recommend_model(20.0).name == "qwen2.5:32b"
        assert mgr.recommend_model(9.0).name == "gemma2:9b"
        assert mgr.recommend_model(0.0).quality == "basic"


def test_instruction_content_tones():
    from whisperjav_tpu.translate.instructions import get_instruction_content
    std = get_instruction_content("standard", "German")
    assert "German" in std and "numbered" in std
    porn = get_instruction_content("pornify", "English")
    assert porn != std and "English" in porn
    # unknown tone degrades to standard
    assert "numbered" in get_instruction_content("nope", "English")
