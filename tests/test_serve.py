"""Tests for the hot-engine transcription service."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

import whisperjav_tpu.serve as serve
from whisperjav_tpu.config.presets import resolve_pipeline_config
from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.modules.audio_io import write_wav
from whisperjav_tpu.pipelines.factory import build_pipeline

TINY = WhisperConfig(name="serve-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2)


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    cfg = resolve_pipeline_config(mode="fast", batch_size=2)
    pipeline = build_pipeline(cfg, model_config=TINY,
                              params=init_params(TINY, jax.random.PRNGKey(0)))
    serve.SERVICE = serve.TranscriptionService(pipeline)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()


def _post(port, path, data, ctype="application/json"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data,
        headers={"Content-Type": ctype})
    return urllib.request.urlopen(req, timeout=300)


@pytest.mark.slow
def test_health_and_transcribe(server, tmp_path):
    port = server
    health = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/health").read())
    assert health["status"] == "ok"
    assert health["model"] == "serve-tiny"

    sr = 16000
    t = np.arange(4 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    wav = tmp_path / "req.wav"
    write_wav(wav, x, sr)

    # path-based request, JSON response
    r = _post(port, "/transcribe",
              json.dumps({"path": str(wav), "format": "json"}).encode())
    data = json.loads(r.read())
    assert "cues" in data and "stats" in data

    # raw WAV body, SRT response
    r = _post(port, "/transcribe", wav.read_bytes(), ctype="audio/wav")
    srt = r.read().decode()
    assert "-->" in srt or srt.strip() == ""

    # bad path → 400
    try:
        _post(port, "/transcribe", json.dumps({"path": "/nope.wav"}).encode())
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_coalescer_shares_batches():
    """Concurrent submissions decode in ONE transcribe_windows pass and
    route results back to the right request."""
    calls = []

    class FakeEngine:
        batch_size = 4

        def transcribe_windows(self, windows, seed=0):
            calls.append(len(windows))
            return [(w, [f"seg-{id(w)}"]) for w in windows]

    co = serve.WindowCoalescer(FakeEngine(), linger_ms=120.0)

    class W:   # stand-in window object
        pass

    outs = {}

    def client(name, n):
        wins = [W() for _ in range(n)]
        outs[name] = (wins, co.submit(wins))

    threads = [threading.Thread(target=client, args=(f"c{i}", 2))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every request got exactly its own windows back, in order
    for name, (wins, result) in outs.items():
        assert [w for w, _ in result] == wins
        assert [s for _, segs in result for s in segs] == \
            [f"seg-{id(w)}" for w in wins]
    # at least two requests shared one engine call (6 windows total;
    # the first call may fire alone before the others enqueue)
    assert len(calls) < 3
    assert sum(calls) == 6


def test_coalescer_propagates_errors():
    class BoomEngine:
        batch_size = 2

        def transcribe_windows(self, windows, seed=0):
            raise RuntimeError("boom")

    co = serve.WindowCoalescer(BoomEngine(), linger_ms=5.0)
    with pytest.raises(RuntimeError, match="boom"):
        co.submit([object()])


@pytest.mark.slow
def test_service_coalesced_end_to_end(server):
    """Service path with coalescing on: correct SRT out (tiny pipeline)."""
    cfg = resolve_pipeline_config(mode="fast", batch_size=2)
    pipeline = build_pipeline(cfg, model_config=TINY,
                              params=init_params(TINY,
                                                 jax.random.PRNGKey(0)))
    svc = serve.TranscriptionService(pipeline, linger_ms=20.0)
    sr = 16000
    t = np.arange(int(3.0 * sr)) / sr
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    subs, stats = svc.transcribe_array(audio, sr)
    assert stats.get("coalesced") is True
    assert isinstance(subs, list)


def test_service_qwen_branch_routes_process_audio():
    """A qwen pipeline (no .engine) takes the decoupled path: no window
    coalescer, full request under the service lock, stats passed through."""
    from whisperjav_tpu.modules.srt import Subtitle

    class FakeQwenPipeline:
        def process_audio(self, audio, rate, title="audio"):
            return ([Subtitle(index=1, start=0.0, end=1.0, text="q")],
                    {"audio_s": len(audio) / rate, "stage_s": {},
                     "analytics": {"health": "ok"}})

    svc = serve.TranscriptionService(FakeQwenPipeline(), linger_ms=30.0)
    assert svc.is_qwen
    assert svc.coalescer is None
    subs, stats = svc.transcribe_array(np.zeros(16000, np.float32), 16000)
    assert subs[0].text == "q"
    assert stats["audio_s"] == pytest.approx(1.0)
    assert "analytics" in stats


@pytest.mark.slow
def test_qwen_factory_builds_default_stack(tmp_path):
    """qwen_factory builds the flagless-CLI default stack and transcribes
    in-memory audio end-to-end (the serve daemon's qwen path)."""
    from whisperjav_tpu.modules.subtitle_pipeline.components import (
        AssemblyTextCleaner, QwenAlignerAdapter, QwenGenerator,
        VadGroupedFramer,
    )
    from whisperjav_tpu.pipelines.qwen_factory import build_qwen_pipeline

    cfg = resolve_pipeline_config(mode="qwen", model="qwen3-asr-test",
                                  batch_size=2)
    pipe = build_qwen_pipeline(cfg)
    assert not hasattr(pipe, "engine")          # serve routes it as qwen
    d = pipe.decoupled
    assert isinstance(d.framer, VadGroupedFramer)
    assert isinstance(d.generator, QwenGenerator)
    assert isinstance(d.cleaner, AssemblyTextCleaner)
    assert isinstance(d.aligner, QwenAlignerAdapter)

    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(10 * sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 190 * t)
             * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
             + 0.04 * rng.standard_normal(len(t))).astype(np.float32)
    subs, stats = pipe.process_audio(audio, sr)
    assert stats["audio_s"] == pytest.approx(10.0, abs=0.1)
    assert "stage_s" in stats and "analytics" in stats
    for s in subs:
        assert 0 <= s.start <= s.end <= 10.5


def test_shutdown_endpoint_and_daemon_stop_cli():
    """POST /shutdown stops serve_forever (the --daemon-stop contract:
    frees HBM for a different-config resident — two engines measured
    RESOURCE_EXHAUSTED together on one v5e)."""
    from http.server import ThreadingHTTPServer
    from types import SimpleNamespace
    if serve.SERVICE is None:      # standalone run: /health needs one
        serve.SERVICE = SimpleNamespace(
            is_qwen=True, fingerprint={"model": "stub"})
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    resp = json.loads(_post(port, "/shutdown", b"{}").read())
    assert resp == {"status": "shutting down"}
    t.join(timeout=10)
    assert not t.is_alive()

    # CLI management flag drives the same endpoint (fresh server)
    httpd2 = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port2 = httpd2.server_address[1]
    t2 = threading.Thread(target=httpd2.serve_forever, daemon=True)
    t2.start()
    from whisperjav_tpu.cli import main as cli_main
    assert cli_main(["--daemon-stop", "--daemon-port", str(port2)]) == 0
    t2.join(timeout=10)
    assert not t2.is_alive()
    # stopping again: nothing listening → rc 1, no exception
    assert cli_main(["--daemon-stop", "--daemon-port", str(port2)]) == 1
