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
    # project file recorded progress (v2 scene/batch schema)
    proj = json.loads(p.with_suffix(".wjtrans.json").read_text())
    assert proj["schema"] == 2
    done = {k: v for b in proj["batches"] for k, v in b["translated"].items()}
    assert len(done) == 5
    assert all(b["status"] == "done" for b in proj["batches"])


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


# ---------------------------------------------------------------------------
# TPU-local backend (on-accelerator LM translation)
# ---------------------------------------------------------------------------

class _FakeTok:
    """Deterministic byte-ish tokenizer for hermetic backend tests."""
    is_real = True

    def encode(self, text):
        return [(ord(c) % 250) + 3 for c in text][:400]

    def decode(self, ids):
        return "".join(chr((i - 3) % 94 + 33) for i in ids)


def _tiny_lm():
    import jax
    from whisperjav_tpu.models.qwen.model import QwenASRConfig, init_params
    cfg = QwenASRConfig()
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def test_generate_text_pad_invariance():
    """Right-padded prompt decode is invariant to the pad amount —
    validates the bucketing correctness argument in generate_text."""
    import jax.numpy as jnp
    import numpy as np
    from whisperjav_tpu.models.qwen.model import generate_text
    cfg, params = _tiny_lm()
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size - 1, 17).astype(np.int32)
    outs = []
    for pad_to in (17, 24, 40):
        buf = np.full((1, pad_to), cfg.eos_id, np.int32)
        buf[0, :17] = ids
        res = generate_text(params, cfg, jnp.asarray(buf),
                            jnp.asarray([17], jnp.int32), max_new=8)
        outs.append(np.asarray(res.tokens)[0])
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[0], outs[2])


def test_generate_text_matches_unpadded_prefill_logits():
    """Prefill logits at the last real token equal an exact-length
    forward (no stale-pad leakage)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from whisperjav_tpu.models.qwen.model import LMCache, lm_step
    cfg, params = _tiny_lm()
    rng = np.random.default_rng(1)
    n = 9
    ids = rng.integers(3, cfg.vocab_size - 1, n).astype(np.int32)
    emb = params["tok_emb"][jnp.asarray(ids[None])]
    cache = LMCache.zeros(cfg, 1, n, jnp.float32)
    exact, _ = lm_step(params, cfg, emb, 0, cache)

    buf = np.full((1, 16), cfg.eos_id, np.int32)
    buf[0, :n] = ids
    emb_p = params["tok_emb"][jnp.asarray(buf)]
    cache = LMCache.zeros(cfg, 1, 16, jnp.float32)
    padded, _ = lm_step(params, cfg, emb_p, 0, cache)
    np.testing.assert_allclose(np.asarray(exact[0, n - 1]),
                               np.asarray(padded[0, n - 1]),
                               rtol=2e-4, atol=2e-4)


def test_tpu_local_backend_call_roundtrip():
    from whisperjav_tpu.translate.local_backend import TpuLocalBackend
    cfg, params = _tiny_lm()
    backend = TpuLocalBackend(params=params, cfg=cfg, tokenizer=_FakeTok(),
                              max_new_tokens=6, prompt_bucket=64)
    out = backend("1: こんにちは\n2: ありがとう")
    assert isinstance(out, str)


def test_cap_batch_size_for_context():
    from whisperjav_tpu.translate.local_backend import (
        cap_batch_size_for_context,
    )
    assert cap_batch_size_for_context(30, 8192) == 11
    assert cap_batch_size_for_context(30, 16384) == 27
    assert cap_batch_size_for_context(30, 64000) == 30
    assert cap_batch_size_for_context(30, 1000) == 1


def test_translate_srt_tpu_local_dispatch(tmp_path, monkeypatch):
    """provider=tpu-local constructs the on-device backend and the
    numbered protocol round-trips through it."""
    from whisperjav_tpu.modules.srt import Subtitle, save_srt, load_srt
    from whisperjav_tpu.translate import local_backend as lb
    from whisperjav_tpu.translate.service import translate_srt

    calls = {}

    class FakeBackend:
        def __init__(self, checkpoint=None, **kw):
            calls["checkpoint"] = checkpoint

        def __call__(self, prompt):
            lines = [ln for ln in prompt.split("---\n", 1)[-1].split("\n")
                     if ln.strip()]
            return "\n".join(
                f"{ln.split(':', 1)[0]}: EN[{ln.split(':', 1)[1].strip()}]"
                for ln in lines)

    monkeypatch.setattr(lb, "TpuLocalBackend", FakeBackend)
    srt = tmp_path / "x.srt"
    save_srt(srt, [Subtitle(1, 0.0, 1.0, "こんにちは"),
                   Subtitle(2, 1.5, 2.0, "ありがとう")])
    out = translate_srt(srt, provider="tpu-local", model="/ckpt/dir",
                        target_language="English")
    assert calls["checkpoint"] == "/ckpt/dir"
    subs = load_srt(out)
    assert subs[0].text == "EN[こんにちは]"
    assert subs[1].text == "EN[ありがとう]"


# ---------------------------------------------------------------------------
# settings persistence (reference: translate/settings.py)
# ---------------------------------------------------------------------------

def test_settings_roundtrip_and_precedence(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("WJAV_CONFIG_DIR", str(tmp_path))
    from whisperjav_tpu.translate import settings as st
    s = st.load_settings()
    assert s["provider"] == "identity"          # defaults when no file
    s["provider"] = "deepseek"
    s["movie_title"] = "Test Movie"
    s["actress"] = "Aizawa"
    path = st.save_settings(s)
    assert path.exists()
    again = st.load_settings()
    assert again["provider"] == "deepseek"
    ctx = st.movie_context_block(again)
    assert "Test Movie" in ctx and "Aizawa" in ctx

    # stored settings become CLI defaults; explicit flags win
    from whisperjav_tpu.translate import cli as tcli
    rc = tcli.main(["--show-settings"])
    assert rc == 0
    shown = json.loads(capsys.readouterr().out)
    assert shown["provider"] == "deepseek"
    rc = tcli.main(["--provider", "identity", "--show-settings"])
    shown = json.loads(capsys.readouterr().out)
    assert shown["provider"] == "identity"


def test_settings_corrupt_file_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("WJAV_CONFIG_DIR", str(tmp_path))
    from whisperjav_tpu.translate import settings as st
    p = st.get_settings_path()
    p.parent.mkdir(parents=True)
    p.write_text("{not json", encoding="utf-8")
    s = st.load_settings()
    assert s["provider"] == "identity"


def test_movie_context_reaches_prompt(tmp_path, monkeypatch):
    from whisperjav_tpu.modules.srt import Subtitle, save_srt
    from whisperjav_tpu.translate.service import translate_srt
    prompts = []

    def fake_call(prompt):
        prompts.append(prompt)
        return "1: hi"

    srt = tmp_path / "m.srt"
    save_srt(srt, [Subtitle(1, 0.0, 1.0, "やあ")])
    translate_srt(srt, provider="identity", call_fn=fake_call,
                  movie_context="Movie context:\nTitle: XYZ",
                  max_batch_size=5)
    assert "Title: XYZ" in prompts[0]
