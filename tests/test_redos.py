"""ReDoS discipline: every sanitizer regex must terminate fast on
adversarial input (reference strategy: tests/test_redos_all_patterns.py —
patterns must be linear-time)."""

import time

import pytest

from whisperjav_tpu.modules.sanitize.hallucinations import (
    HallucinationRemover,
)
from whisperjav_tpu.modules.sanitize.repetition import RepetitionCleaner

ADVERSARIAL = [
    "あ" * 5000,
    ("あい" * 2500),
    ("♪" * 3000) + "x",
    ("（音楽" * 500) + "）" * 500,
    "http://" + "a" * 4000,
    ("。、" * 2000) + "!",
    ("はいはい" * 1000) + "違",
    "a" * 2000 + "!" * 2000,
]

BUDGET_S = 1.0   # generous; linear patterns finish in milliseconds


@pytest.mark.parametrize("text", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_hallucination_rules_terminate(text):
    hr = HallucinationRemover("ja")
    t0 = time.time()
    hr.clean(text)
    hr.is_hallucination(text[:200])
    assert time.time() - t0 < BUDGET_S


@pytest.mark.parametrize("text", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_repetition_cleaner_terminates(text):
    rc = RepetitionCleaner()
    t0 = time.time()
    rc.clean(text)
    assert time.time() - t0 < BUDGET_S


def test_every_db_pattern_individually():
    """Every pattern loaded from regexp_v09.json must terminate fast on
    adversarial input (reference: tests/test_redos_all_patterns.py)."""
    import re

    hr = HallucinationRemover("ja")
    patterns = hr.iter_patterns()
    assert len(patterns) >= 30   # the bundled DB ships ~36 patterns
    blob = "".join(ADVERSARIAL)[:20000]
    for pat in patterns:
        compiled = re.compile(pat)
        t0 = time.time()
        compiled.sub("", blob)
        compiled.search(blob)
        assert time.time() - t0 < BUDGET_S, pat
