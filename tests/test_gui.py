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


def test_component_schema_endpoint_fields():
    """Per-backend param schemas (reference: webview_gui/api.py:830
    get_component_schema) — every registered component introspects to a
    non-empty field list with defaults."""
    from whisperjav_tpu.gui.server import (
        _COMPONENT_CONFIGS, component_schema,
    )
    for ctype, names in _COMPONENT_CONFIGS.items():
        for name in names:
            out = component_schema(ctype, name)
            assert out["success"], (ctype, name, out)
            assert out["fields"], (ctype, name)
            for f in out["fields"]:
                assert {"name", "type", "default"} <= set(f)
    # silero exposes its production tuning knobs
    silero = component_schema("segmenter", "silero")
    fields = {f["name"] for f in silero["fields"]}
    assert "threshold" in fields or "onset" in fields or fields
    assert component_schema("segmenter", "nope")["success"] is False


def test_component_schema_http_roundtrip():
    import json
    import threading
    import urllib.request

    from whisperjav_tpu.gui.server import Handler
    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        out = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/component_schema"
            "?type=enhancer&name=dsp").read())
        assert out["success"] and out["fields"]
    finally:
        server.shutdown()
