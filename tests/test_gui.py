"""Tests for the GUI argv builder and HTTP API."""

import json
import threading
import urllib.request

import pytest

from whisperjav_tpu.gui.server import build_args, schema


def test_build_args_basics():
    argv = build_args({
        "inputs": ["/a.wav", "/b.wav"], "mode": "balanced",
        "sensitivity": "aggressive", "output_dir": "/out",
        "batch_size": 16, "make_vtt": True, "ensemble": True,
    })
    joined = " ".join(argv)
    assert "/a.wav" in joined and "/b.wav" in joined
    assert "--mode balanced" in joined
    assert "--sensitivity aggressive" in joined
    assert "--batch-size 16" in joined
    assert "--make-vtt" in joined
    assert "--ensemble" in joined
    assert "whisperjav_tpu.cli" in joined


def test_build_args_skips_empty():
    argv = build_args({"inputs": "/x.wav", "model": "", "checkpoint": None})
    assert "--model" not in argv
    assert "--checkpoint" not in argv


def test_schema_complete():
    s = schema()
    assert "balanced" in s["modes"]
    assert "qwen" in s["modes"]
    assert set(s["sensitivities"]) == {"aggressive", "balanced",
                                       "conservative"}
    assert "smart_merge" in s["merge_strategies"]


def test_http_endpoints():
    from http.server import ThreadingHTTPServer
    from whisperjav_tpu.gui.server import Handler
    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/").read().decode()
        assert "WhisperJAV" in html
        sc = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/schema").read())
        assert "modes" in sc
        st = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/status").read())
        assert st["status"] in ("idle", "running", "done")
    finally:
        server.shutdown()
