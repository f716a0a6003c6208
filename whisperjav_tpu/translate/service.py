"""Subtitle translation service with batch resume.

Role parity with reference ``whisperjav/translate/service.py`` + ``core.py``
(PySubtrans-based batch translation with .subtrans project resume and
batch sizes capped to the LLM context window), rebuilt without
PySubtrans: SRT cues are translated in numbered batches through a
provider chat endpoint, progress persists to a ``.wjtrans.json`` project
file so interrupted runs resume, and failures leave untranslated batches
intact (the output keeps source text for them).
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

from whisperjav_tpu.modules.srt import Subtitle, load_srt, save_srt
from whisperjav_tpu.translate.providers import (
    ProviderConfig, get_api_key, max_batch_lines, resolve_provider,
)
from whisperjav_tpu.translate.instructions import get_instruction_content
from whisperjav_tpu.utils.logger import logger

# numbered-line response protocol appended to every instruction set
_PROTOCOL = ("\nOutput one line per number in the exact form "
             "'N: translation'.")


@dataclass
class TranslationProject:
    """Resumable translation state (role of the .subtrans project file)."""
    source: str
    provider: str
    model: str
    target_language: str
    translated: Dict[str, str] = field(default_factory=dict)  # index → text

    def path_for(self, srt_path: Path) -> Path:
        return srt_path.with_suffix(".wjtrans.json")

    def save(self, srt_path: Path) -> None:
        self.path_for(srt_path).write_text(
            json.dumps(self.__dict__, ensure_ascii=False, indent=1),
            encoding="utf-8")

    @classmethod
    def load_or_new(cls, srt_path: Path, provider: str, model: str,
                    target: str) -> "TranslationProject":
        p = srt_path.with_suffix(".wjtrans.json")
        if p.exists():
            try:
                data = json.loads(p.read_text(encoding="utf-8"))
                if (data.get("provider") == provider
                        and data.get("target_language") == target):
                    proj = cls(**{k: data[k] for k in
                                  ("source", "provider", "model",
                                   "target_language")})
                    proj.translated = data.get("translated", {})
                    logger.info("resuming translation: %d lines done",
                                len(proj.translated))
                    return proj
            except (json.JSONDecodeError, KeyError):
                logger.warning("corrupt project file %s; starting fresh", p)
        return cls(str(srt_path), provider, model, target)


_LINE_RE = re.compile(r"^\s*(\d+)\s*[:：.)）]\s*(.*)$")

_LANG_TAGS = {
    "english": "en", "japanese": "ja", "chinese": "zh", "korean": "ko",
    "german": "de", "french": "fr", "spanish": "es", "portuguese": "pt",
    "italian": "it", "russian": "ru", "indonesian": "id", "thai": "th",
    "vietnamese": "vi", "arabic": "ar", "hindi": "hi", "dutch": "nl",
    "polish": "pl", "turkish": "tr",
}


def _iso_tag(language_name: str) -> str:
    """Language NAME → ISO tag for output filenames; 2-letter inputs pass
    through, unknown names fall back to their first two letters."""
    name = (language_name or "en").strip().lower()
    if len(name) == 2:
        return name
    return _LANG_TAGS.get(name, name[:2])


def parse_numbered_response(text: str) -> Dict[int, str]:
    out: Dict[int, str] = {}
    for ln in text.split("\n"):
        m = _LINE_RE.match(ln)
        if m:
            out[int(m.group(1))] = m.group(2).strip()
    return out


def _call_provider(cfg: ProviderConfig, prompt: str, model: str) -> str:
    """Dispatch one chat request. Network access + SDKs are runtime-gated;
    unavailable providers raise RuntimeError (handled per batch)."""
    if cfg.api_style == "none":      # identity provider: echo source lines
        return prompt.split("---\n", 1)[-1]
    if cfg.api_style == "openai":
        try:
            import openai
        except ImportError as e:
            raise RuntimeError(f"openai SDK not installed: {e}")
        client = openai.OpenAI(base_url=cfg.base_url,
                               api_key=get_api_key(cfg) or "none")
        resp = client.chat.completions.create(
            model=model, messages=[{"role": "user", "content": prompt}])
        return resp.choices[0].message.content or ""
    if cfg.api_style == "anthropic":
        try:
            import anthropic
        except ImportError as e:
            raise RuntimeError(f"anthropic SDK not installed: {e}")
        client = anthropic.Anthropic(api_key=get_api_key(cfg))
        resp = client.messages.create(
            model=model, max_tokens=8192,
            messages=[{"role": "user", "content": prompt}])
        return resp.content[0].text
    if cfg.api_style == "gemini":
        try:
            from google import genai
        except ImportError as e:
            raise RuntimeError(f"google-genai SDK not installed: {e}")
        client = genai.Client(api_key=get_api_key(cfg))
        resp = client.models.generate_content(model=model, contents=prompt)
        return resp.text
    if cfg.api_style == "ollama":
        import json as _json
        import urllib.request
        req = urllib.request.Request(
            f"{cfg.base_url}/api/generate",
            data=_json.dumps({"model": model, "prompt": prompt,
                              "stream": False}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return _json.loads(r.read())["response"]
    raise RuntimeError(f"unsupported api style {cfg.api_style}")


def translate_srt(
    srt_path: Path,
    provider: str = "identity",
    model: Optional[str] = None,
    target_language: str = "English",
    output_path: Optional[Path] = None,
    base_url: Optional[str] = None,
    tone: str = "standard",
    auto_start_ollama: bool = True,
    call_fn: Optional[Callable] = None,   # injection point for tests
    max_batch_size: Optional[int] = None,
    movie_context: Optional[str] = None,
) -> Path:
    """Translate an SRT file batch-by-batch with resume; returns output path.

    Untranslatable batches (network/provider failure) keep source text —
    the run always produces a complete SRT. The ollama provider runs
    through OllamaManager (server auto-start, VRAM-based model pick,
    context-window-derived batch size — reference:
    translate/ollama_manager.py, translate/core.py:7-30).
    """
    srt_path = Path(srt_path)
    cfg = resolve_provider(provider, base_url=base_url, model=model)
    model = model or cfg.default_model
    batch_override: Optional[int] = None
    if cfg.api_style == "tpu-local" and call_fn is None:
        # on-accelerator local LM: --translate-model is the local
        # checkpoint directory (TPU replacement for the reference's
        # llama-cpp backend)
        from whisperjav_tpu.translate.local_backend import TpuLocalBackend
        call_fn = TpuLocalBackend(checkpoint=model or None)
    if cfg.api_style == "ollama" and call_fn is None:
        from whisperjav_tpu.translate.ollama_manager import OllamaManager
        mgr = OllamaManager(base_url=cfg.base_url)
        ready = mgr.ensure_ready(model=model if model != "auto" else None,
                                 auto_start=auto_start_ollama)
        model = ready["model"]
        batch_override = ready["batch_size"]
        cfg = resolve_provider(provider, base_url=ready["base_url"],
                               model=model)
        logger.info("ollama ready: %s (num_ctx=%d, batch=%d%s)",
                    model, ready["num_ctx"], ready["batch_size"],
                    ", server auto-started"
                    if ready["server_started"] else "")
    subs = load_srt(srt_path)
    project = TranslationProject.load_or_new(srt_path, provider, model,
                                             target_language)
    batch_size = batch_override or max_batch_lines(cfg)
    if max_batch_size:
        batch_size = min(batch_size, max_batch_size)
    call = call_fn or (lambda prompt: _call_provider(cfg, prompt, model))
    instructions = get_instruction_content(tone, target_language)
    if movie_context:
        # movie metadata block (reference: settings.py movie_title/plot/
        # actress injected for name & register handling)
        instructions = instructions + "\n" + movie_context + "\n"

    pending = [s for s in subs if str(s.index) not in project.translated]
    logger.info("translating %d/%d cues via %s (%s), batch=%d",
                len(pending), len(subs), provider, model, batch_size)

    for i in range(0, len(pending), batch_size):
        batch = pending[i:i + batch_size]
        numbered = "\n".join(
            f"{s.index}: {s.text.replace(chr(10), ' ')}" for s in batch)
        prompt = instructions + _PROTOCOL + "\n---\n" + numbered
        try:
            response = call(prompt)
        except Exception as e:  # noqa: BLE001 — keep remaining batches
            logger.error("translation batch failed (%s); keeping source "
                         "text for %d cues", e, len(batch))
            continue
        parsed = parse_numbered_response(response)
        for s in batch:
            if s.index in parsed and parsed[s.index]:
                project.translated[str(s.index)] = parsed[s.index]
        project.save(srt_path)

    out = [Subtitle(s.index, s.start, s.end,
                    project.translated.get(str(s.index), s.text))
           for s in subs]
    if output_path is None:
        lang_tag = _iso_tag(target_language)
        output_path = srt_path.with_name(
            srt_path.stem.rsplit(".", 1)[0] + f".{lang_tag}.srt"
            if srt_path.stem.endswith(".whisperjav")
            else srt_path.stem + f".{lang_tag}.srt")
    save_srt(output_path, out)
    logger.info("translated SRT written: %s", output_path)
    return Path(output_path)


def translate_with_config(config: Dict) -> Path:
    """Dict-config entry point (reference: translate_with_config)."""
    return translate_srt(
        Path(config["input"]),
        provider=config.get("provider", "identity"),
        model=config.get("model"),
        target_language=config.get("target_language", "English"),
        output_path=(Path(config["output"]) if config.get("output")
                     else None),
        base_url=config.get("base_url"),
        tone=config.get("tone", "standard"),
        auto_start_ollama=config.get("auto_start_ollama", True),
    )
