"""``whisperjav-serve``: persistent transcription service with a hot engine.

Production serving counterpart the reference architecture lacks: its GUI
spawns a fresh CLI process per job, reloading models each time
(reference: webview_gui/api.py:350). Here the compiled engine stays
resident; each request pays only preprocessing + device decode, so
sustained throughput matches bench.py's steady-state numbers.

API (JSON over HTTP, stdlib only):
  GET  /health                  → {status, model, device}
  POST /transcribe              → body: {"path": "/abs/file.wav",
                                   "language": "ja", "format": "srt|json"}
                                   or raw WAV bytes with
                                   Content-Type: audio/wav
Responses: SRT text or JSON cue list + stats.
"""

from __future__ import annotations

import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import List, Optional

import numpy as np

from whisperjav_tpu.utils.logger import logger, setup_logger


class TranscriptionService:
    """Owns one pipeline; serializes device access across requests."""

    def __init__(self, pipeline, language: str = "ja"):
        self.pipeline = pipeline
        self.language = language
        self.lock = threading.Lock()   # one batch stream on the device

    def transcribe_array(self, audio: np.ndarray, sample_rate: int):
        from whisperjav_tpu.modules.audio_io import (
            WHISPER_SAMPLE_RATE, resample,
        )
        if sample_rate != WHISPER_SAMPLE_RATE:
            audio = resample(audio, sample_rate, WHISPER_SAMPLE_RATE)
        with self.lock:
            subs, stats = self.pipeline.process_audio(
                audio, WHISPER_SAMPLE_RATE)
        if self.pipeline.postprocessor is not None:
            subs, san = self.pipeline.postprocessor.process(
                subs, language=self.language)
            stats["sanitization"] = san
        return subs, stats

    def transcribe_path(self, path: str):
        from whisperjav_tpu.modules.audio_io import (
            WHISPER_SAMPLE_RATE, load_audio,
        )
        audio = load_audio(path, WHISPER_SAMPLE_RATE)
        return self.transcribe_array(audio, WHISPER_SAMPLE_RATE)


SERVICE: Optional[TranscriptionService] = None


class Handler(BaseHTTPRequestHandler):
    def _send(self, code, body: bytes, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, obj, code=200):
        self._send(code, json.dumps(obj, ensure_ascii=False).encode())

    def do_GET(self):  # noqa: N802
        if self.path == "/health":
            import jax
            dev = jax.devices()[0]
            self._json({"status": "ok",
                        "model": SERVICE.pipeline.engine.config.name,
                        "device": f"{dev.platform}:{dev.device_kind}"})
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):  # noqa: N802
        if self.path != "/transcribe":
            self._json({"error": "not found"}, 404)
            return
        length = int(self.headers.get("Content-Length", "0"))
        raw = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "application/json")
        try:
            if ctype.startswith("audio/"):
                from whisperjav_tpu.modules.audio_io import read_wav
                import tempfile
                with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                    f.write(raw)
                    f.flush()
                    audio, rate = read_wav(f.name)
                subs, stats = SERVICE.transcribe_array(audio, rate)
                fmt = "srt"
            else:
                req = json.loads(raw or b"{}")
                path = req.get("path")
                if not path or not Path(path).exists():
                    self._json({"error": f"file not found: {path}"}, 400)
                    return
                subs, stats = SERVICE.transcribe_path(path)
                fmt = req.get("format", "srt")
        except Exception as e:  # noqa: BLE001 — service must stay alive
            logger.error("transcribe request failed: %s", e, exc_info=True)
            self._json({"error": str(e)}, 500)
            return

        if fmt == "json":
            self._json({
                "cues": [{"index": s.index, "start": s.start,
                          "end": s.end, "text": s.text} for s in subs],
                "stats": stats,
            })
        else:
            from whisperjav_tpu.modules.srt import compose_srt
            self._send(200, compose_srt(subs).encode(),
                       "text/plain; charset=utf-8")

    def log_message(self, fmt, *args):
        pass


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    p = argparse.ArgumentParser(prog="whisperjav-serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8478)
    p.add_argument("--mode", default="balanced")
    p.add_argument("--sensitivity", default="balanced")
    p.add_argument("--model", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--language", default="ja")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--devices", type=int, default=None,
                   help="chips to shard over (default all; 1=single)")
    args = p.parse_args(argv)

    setup_logger("info")
    from whisperjav_tpu.config.presets import resolve_pipeline_config
    from whisperjav_tpu.modules.sanitize import SRTPostProcessor
    from whisperjav_tpu.pipelines.factory import build_pipeline

    cfg = resolve_pipeline_config(
        mode=args.mode, sensitivity=args.sensitivity,
        language=args.language, model=args.model,
        batch_size=args.batch_size)
    pipeline = build_pipeline(cfg, checkpoint=args.checkpoint,
                              postprocessor=SRTPostProcessor(),
                              devices=args.devices)

    global SERVICE
    SERVICE = TranscriptionService(pipeline, args.language)

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    logger.info("whisperjav-serve: http://%s:%d (model %s, hot engine)",
                args.host, args.port, cfg.model)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
