"""Golden-baseline regression test for the sanitization chain.

Reproduces the reference's synthetic-fixture strategy (SURVEY.md §4):
``generate_synthetic`` builds a deterministic adversarial SRT,
``capture_baseline`` snapshots the sanitizer output, and this test diffs
current behavior against the committed baseline so ANY drift in the text
chain is an explicit, reviewed change.
"""

import json
from pathlib import Path

import pytest

BASELINE = (Path(__file__).parent / "fixtures" / "sanitizer_regression"
            / "baseline.json")


def current_output():
    from tests.fixtures.sanitizer_regression.capture_baseline import (
        run_sanitizer,
    )
    return run_sanitizer()


def test_fixture_generator_is_deterministic():
    from tests.fixtures.sanitizer_regression.generate_synthetic import generate
    a = generate(seed=77)
    b = generate(seed=77)
    assert [(s.start, s.end, s.text) for s in a] == \
        [(s.start, s.end, s.text) for s in b]
    assert len(a) >= 60


def test_sanitizer_matches_golden_baseline():
    assert BASELINE.exists(), (
        "baseline.json missing — run "
        "tests/fixtures/sanitizer_regression/capture_baseline.py")
    golden = json.loads(BASELINE.read_text(encoding="utf-8"))
    now = current_output()
    assert now["input_cues"] == golden["input_cues"]
    assert now["report"] == golden["report"], (
        "sanitizer statistics drifted — if intentional, re-capture the "
        "baseline")
    assert len(now["output"]) == len(golden["output"])
    for i, (a, b) in enumerate(zip(now["output"], golden["output"])):
        assert a == b, f"cue {i} drifted: {a} != {b}"


def test_baseline_sanity():
    golden = json.loads(BASELINE.read_text(encoding="utf-8"))
    # the adversarial classes were actually exercised
    r = golden["report"]
    assert r["hallucinations_removed"] > 0
    assert r["empty_removed"] > 0
    assert r["timing_adjusted"] > 0
    assert golden["input_cues"] > len(golden["output"])
