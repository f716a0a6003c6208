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
