"""``whisperjav-gui``: local web GUI that drives the CLI.

Architecture parity with the reference GUI (reference:
whisperjav/webview_gui/api.py:65-562 — the GUI process NEVER loads
models; it builds CLI argv from UI options, spawns the ``whisperjav``
CLI as a subprocess, and streams its stdout to the UI), rebuilt as a
dependency-free stdlib HTTP server + single-page app instead of
PyWebView, so it runs on headless/remote TPU hosts via port forwarding.

Endpoints: GET / (app), GET /api/schema (modes/sensitivities/backends),
POST /api/start {options}, GET /api/logs?since=N, POST /api/cancel,
GET /api/status.
"""

from __future__ import annotations

import json
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

from whisperjav_tpu.gui.app_page import APP_HTML


def build_args(options: Dict) -> List[str]:
    """UI options dict → whisperjav CLI argv (reference: api.py:97-294)."""
    argv: List[str] = [sys.executable, "-m", "whisperjav_tpu.cli"]
    inputs = options.get("inputs") or []
    if isinstance(inputs, str):
        inputs = [inputs]
    argv.extend(inputs)
    simple = {
        "mode": "--mode", "sensitivity": "--sensitivity",
        "model": "--model", "checkpoint": "--checkpoint",
        "language": "--language", "subs_language": "--subs-language",
        "output_dir": "--output-dir", "batch_size": "--batch-size",
        "vad_backend": "--vad-backend", "scene_backend": "--scene-backend",
        "enhancer": "--enhancer", "translate": "--translate",
        "translate_target": "--translate-target",
        "merge_strategy": "--merge-strategy",
        "pass1_sensitivity": "--pass1-sensitivity",
        "pass2_sensitivity": "--pass2-sensitivity",
        "pass1_model": "--pass1-model", "pass2_model": "--pass2-model",
        "output_format": "--output-format",
        "credit": "--credit",
        "beam_size": "--beam-size",
        "vad_threshold": "--vad-threshold",
        "speech_pad_ms": "--speech-pad-ms",
        "prompt": "--prompt",
        "timestamp_mode": "--timestamp-mode",
        "regroup_mode": "--regroup-mode",
        "framer": "--framer",
        "devices": "--devices",
        "task": "--task",
    }
    for key, flag in simple.items():
        val = options.get(key)
        if val not in (None, "", []):
            argv.extend([flag, str(val)])
    for key, flag in [("skip_existing", "--skip-existing"),
                      ("make_vtt", "--make-vtt"),
                      ("no_sanitize", "--no-sanitize"),
                      ("ensemble", "--ensemble"),
                      ("keep_temp", "--keep-temp"),
                      ("enhance_for_vad", "--enhance-for-vad"),
                      ("no_signature", "--no-signature"),
                      ("word_timestamps", "--word-timestamps"),
                      ("int8_weights", "--int8-weights"),
                      ("no_vad", "--no-vad")]:
        if options.get(key):
            argv.append(flag)
    return argv


class _JobState:
    def __init__(self):
        self.proc: Optional[subprocess.Popen] = None
        self.logs: List[str] = []
        self.lock = threading.Lock()
        self.status = "idle"

    def start(self, argv: List[str]) -> None:
        with self.lock:
            if self.proc is not None and self.proc.poll() is None:
                raise RuntimeError("a job is already running")
            self.logs = [f"$ {' '.join(argv)}"]
            self.status = "running"
            self.proc = subprocess.Popen(
                argv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, bufsize=1)
        threading.Thread(target=self._pump, daemon=True).start()

    def _pump(self) -> None:
        proc = self.proc
        assert proc is not None and proc.stdout is not None
        for line in proc.stdout:
            with self.lock:
                self.logs.append(line.rstrip("\n"))
        code = proc.wait()
        with self.lock:
            self.status = "done" if code == 0 else f"failed ({code})"
            self.logs.append(f"[exit {code}]")

    def cancel(self) -> None:
        with self.lock:
            if self.proc is not None and self.proc.poll() is None:
                self.proc.terminate()
                self.status = "cancelled"


JOB = _JobState()


def schema() -> Dict:
    from whisperjav_tpu.config.presets import (
        MODE_PRESETS, SENSITIVITY_PRESETS,
    )
    from whisperjav_tpu.ensemble.merge import MERGE_STRATEGIES
    return {
        "modes": {k: v.description for k, v in MODE_PRESETS.items()},
        "sensitivities": sorted(SENSITIVITY_PRESETS),
        "vad_backends": ["energy", "silero", "ten", "whisperseg",
                         "whisper-vad", "none"],
        "scene_backends": ["energy", "semantic", "silero", "none"],
        "enhancers": ["none", "dsp", "zipenhancer", "clearvoice",
                      "bs-roformer"],
        "merge_strategies": sorted(MERGE_STRATEGIES),
        "translate_providers": ["", "identity", "deepseek", "gpt", "claude",
                                "gemini", "ollama", "tpu-local"],
        # per-backend parameter schemas live at
        # /api/component_schema?type=<T>&name=<N> (reference:
        # webview_gui/api.py:830 get_component_schema)
        "component_types": sorted(_COMPONENT_CONFIGS),
    }


# per-backend config dataclasses — the authoritative source of each
# backend's KEY=VALUE parameters (the reference exposes pydantic
# schemas per component, webview_gui/api.py:830-960; here the config
# dataclasses play that role)
_COMPONENT_CONFIGS: Dict[str, Dict[str, str]] = {
    "segmenter": {
        "energy": "whisperjav_tpu.modules.segmentation.energy_vad"
                  ":EnergyVadConfig",
        "silero": "whisperjav_tpu.modules.segmentation.silero_jax"
                  ":SileroJaxConfig",
        "ten": "whisperjav_tpu.modules.segmentation.ten_jax:TenJaxConfig",
        "whisperseg": "whisperjav_tpu.modules.segmentation.whisperseg"
                      ":WhisperSegConfig",
        "whisper-vad": "whisperjav_tpu.modules.segmentation.whisper_vad"
                       ":WhisperVadConfig",
    },
    "scene": {
        "energy": "whisperjav_tpu.modules.scene_detection.energy"
                  ":EnergySceneConfig",
        "semantic": "whisperjav_tpu.modules.scene_detection.semantic"
                    ":SemanticSceneConfig",
        "silero": "whisperjav_tpu.modules.scene_detection.silero_scene"
                  ":SileroSceneConfig",
    },
    "enhancer": {
        "dsp": "whisperjav_tpu.modules.enhancement.dsp:DspConfig",
        "zipenhancer": "whisperjav_tpu.modules.enhancement.zip_jax"
                       ":ZipJaxConfig",
        "clearvoice": "whisperjav_tpu.modules.enhancement"
                      ".bandsplit_backends:_HeavyConfig",
        "bs-roformer": "whisperjav_tpu.modules.enhancement"
                       ".bandsplit_backends:_HeavyConfig",
    },
    "sanitizer": {
        "default": "whisperjav_tpu.modules.sanitize.sanitizer"
                   ":SanitizerConfig",
        "cross-subtitle": "whisperjav_tpu.modules.sanitize.cross_subtitle"
                          ":CrossSubtitleConfig",
    },
}


def component_schema(ctype: str, name: str) -> Dict:
    """Field-level parameter schema for one backend, introspected from
    its config dataclass: name, type, default per field."""
    import dataclasses
    import importlib

    try:
        spec = _COMPONENT_CONFIGS[ctype][name]
    except KeyError:
        return {"success": False,
                "error": f"unknown component {ctype}/{name}"}
    mod_name, cls_name = spec.split(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    inst = cls()
    fields = []
    for f in dataclasses.fields(cls):
        default = getattr(inst, f.name)
        fields.append({
            "name": f.name,
            "type": type(default).__name__ if default is not None
            else "str",
            "default": default if isinstance(
                default, (int, float, str, bool, type(None))) else
            str(default),
        })
    return {"success": True, "component": name, "type": ctype,
            "fields": fields}


class Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, body: bytes,
              ctype: str = "application/json") -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, obj, code: int = 200) -> None:
        self._send(code, json.dumps(obj).encode())

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        url = urlparse(self.path)
        if url.path in ("/", "/index.html"):
            self._send(200, APP_HTML.encode(), "text/html; charset=utf-8")
        elif url.path == "/api/schema":
            self._json(schema())
        elif url.path == "/api/component_schema":
            q = parse_qs(url.query)
            self._json(component_schema(
                q.get("type", [""])[0], q.get("name", [""])[0]))
        elif url.path == "/api/status":
            with JOB.lock:
                self._json({"status": JOB.status})
        elif url.path == "/api/presets":
            from whisperjav_tpu.config.user_config import UserConfigManager
            m = UserConfigManager()
            self._json({name: m.get_preset(name)
                        for name in m.list_presets()})
        elif url.path == "/api/logs":
            since = int(parse_qs(url.query).get("since", ["0"])[0])
            with JOB.lock:
                self._json({"lines": JOB.logs[since:],
                            "next": len(JOB.logs), "status": JOB.status})
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):  # noqa: N802
        url = urlparse(self.path)
        length = int(self.headers.get("Content-Length", "0"))
        body = json.loads(self.rfile.read(length) or b"{}")
        if url.path == "/api/start":
            try:
                JOB.start(build_args(body))
                self._json({"ok": True})
            except (RuntimeError, OSError) as e:
                self._json({"ok": False, "error": str(e)}, 409)
        elif url.path == "/api/cancel":
            JOB.cancel()
            self._json({"ok": True})
        elif url.path == "/api/presets":
            from whisperjav_tpu.config.user_config import UserConfigManager
            m = UserConfigManager()
            try:
                if body.get("delete"):
                    self._json({"ok": m.delete_preset(body["name"])})
                else:
                    m.save_preset(body["name"], body.get("options", {}))
                    self._json({"ok": True})
            except (ValueError, KeyError) as e:
                self._json({"ok": False, "error": str(e)}, 400)
        else:
            self._json({"error": "not found"}, 404)

    def log_message(self, fmt, *args):  # silence request logging
        pass


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    p = argparse.ArgumentParser(prog="whisperjav-gui")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8477)
    args = p.parse_args(argv)
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"whisperjav GUI: http://{args.host}:{args.port}/")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
