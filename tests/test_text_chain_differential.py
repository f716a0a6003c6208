"""Differential parity: our text chain vs the REFERENCE'S OWN cleaners.

The strongest hermetic oracle available for the sanitization behavior
space: the reference's ``repetition_cleaner`` and
``hallucination_remover`` are pure-Python regex modules that import and
run on this host with their bundled DBs (reference:
whisperjav/modules/repetition_cleaner.py:94,
whisperjav/modules/hallucination_remover.py:81; chain order
subtitle_sanitizer.py:500-541 — hallucination first, then repetition,
final strip). Both chains run over the seeded adversarial corpus
(tests/fixtures/text_chain_corpus.py, 245 cases) and every divergence
must be empty or belong to a documented intentional class below.

Intentional divergence classes (each justified, narrowest-possible):

- ``emoji_gate``: our chain drops any line containing emoji/dingbat
  characters (stage 2, sanitize/hallucinations.py) — an explicit
  TPU-repo hardening beyond the reference, which only drops specific
  ♪-patterns via its regex DB. Ours is a strict superset (more removed,
  never less) and only on lines containing emoji.
- ``stray_eot_punct``: when removing a full-line hallucination leaves
  only trailing punctuation (e.g. "ご視聴ありがとうございました。"),
  the reference leaves the stray "。" for its later symbol-residue
  sanitizer phase; our remover drops the residue immediately. Same
  final output after each side's full SRT pipeline.

Run ``python tests/test_text_chain_differential.py`` directly to print
the full divergence report.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, List

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root
sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from text_chain_corpus import build_corpus  # noqa: E402

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not present")


@pytest.fixture(scope="module")
def ref_chain():
    """The reference's hallucination→repetition chain, loaded in-process."""
    sys.path.insert(0, str(REFERENCE))
    try:
        from whisperjav.config.sanitization_constants import (
            HallucinationConstants, RepetitionConstants,
        )
        from whisperjav.modules.hallucination_remover import (
            HallucinationRemover,
        )
        from whisperjav.modules.repetition_cleaner import RepetitionCleaner
    finally:
        sys.path.remove(str(REFERENCE))
    hr = HallucinationRemover(HallucinationConstants(),
                              primary_language="ja")
    rc = RepetitionCleaner(RepetitionConstants())

    def chain(text: str) -> str:
        cur = text
        out, _ = hr.remove_hallucinations(cur, "ja")
        cur = out
        if cur.strip():
            cur, _ = rc.clean_repetitions(cur)
        return cur.strip()

    return chain


@pytest.fixture(scope="module")
def our_chain():
    from whisperjav_tpu.modules.sanitize.hallucinations import (
        HallucinationRemover,
    )
    from whisperjav_tpu.modules.sanitize.repetition import RepetitionCleaner
    hr = HallucinationRemover("ja")
    rc = RepetitionCleaner()

    def chain(text: str) -> str:
        cur, _ = hr.clean(text)
        if cur.strip():
            cur, _ = rc.clean(cur)
        return cur.strip()

    return chain


def _has_emoji(text: str) -> bool:
    from whisperjav_tpu.modules.sanitize.hallucinations import _EMOJI_RE
    return bool(_EMOJI_RE.search(text)) or "♪" in text


def _classify_divergence(case: Dict[str, str], ref: str, ours: str) -> str:
    """Return the intentional-divergence class, or 'UNEXPECTED'."""
    if _has_emoji(case["text"]) and ours == "":
        return "emoji_gate"
    # ref left only punctuation/symbols where we removed the whole line
    if ours == "" and ref and not any(
            ch.isalnum() for ch in ref):
        return "stray_eot_punct"
    return "UNEXPECTED"


def run_differential() -> Dict[str, List[Dict]]:
    """Standalone runner (also used by __main__): returns
    {divergence_class: [case dicts]} over the full corpus."""
    sys.path.insert(0, str(REFERENCE))
    from whisperjav.config.sanitization_constants import (
        HallucinationConstants, RepetitionConstants,
    )
    from whisperjav.modules.hallucination_remover import HallucinationRemover
    from whisperjav.modules.repetition_cleaner import RepetitionCleaner
    sys.path.remove(str(REFERENCE))
    from whisperjav_tpu.modules.sanitize.hallucinations import (
        HallucinationRemover as OurHR,
    )
    from whisperjav_tpu.modules.sanitize.repetition import (
        RepetitionCleaner as OurRC,
    )
    hr = HallucinationRemover(HallucinationConstants(),
                              primary_language="ja")
    rc = RepetitionCleaner(RepetitionConstants())
    our_hr = OurHR("ja")
    our_rc = OurRC()

    def ref_fn(text):
        cur, _ = hr.remove_hallucinations(text, "ja")
        if cur.strip():
            cur, _ = rc.clean_repetitions(cur)
        return cur.strip()

    def our_fn(text):
        cur, _ = our_hr.clean(text)
        if cur.strip():
            cur, _ = our_rc.clean(cur)
        return cur.strip()

    buckets: Dict[str, List[Dict]] = {}
    for case in build_corpus():
        ref, ours = ref_fn(case["text"]), our_fn(case["text"])
        if ref != ours:
            cls = _classify_divergence(case, ref, ours)
            buckets.setdefault(cls, []).append(
                {**case, "ref": ref, "ours": ours})
    return buckets


def test_text_chain_differential(ref_chain, our_chain):
    divergent: List[Dict] = []
    for case in build_corpus():
        ref = ref_chain(case["text"])
        ours = our_chain(case["text"])
        if ref != ours:
            cls = _classify_divergence(case, ref, ours)
            if cls == "UNEXPECTED":
                divergent.append({**case, "ref": ref, "ours": ours})
    msg = "\n".join(
        f"[{d['cls']}] {d['text']!r}\n  ref : {d['ref']!r}\n"
        f"  ours: {d['ours']!r}" for d in divergent[:25])
    assert not divergent, (
        f"{len(divergent)} unexpected divergences vs the reference chain "
        f"(first 25):\n{msg}")


def test_normal_lines_survive_both(ref_chain, our_chain):
    """Anti-overfit guard: legit dialogue must pass BOTH chains intact."""
    for case in build_corpus():
        if case["cls"] not in ("normal", "normal_long"):
            continue
        assert ref_chain(case["text"]) == case["text"].strip()
        assert our_chain(case["text"]) == case["text"].strip()


if __name__ == "__main__":
    buckets = run_differential()
    total = sum(len(v) for v in buckets.values())
    print(f"{total} divergences across {len(buckets)} classes")
    for cls, items in sorted(buckets.items()):
        print(f"\n=== {cls} ({len(items)}) ===")
        for d in items:
            print(f"[{d['cls']}] {d['text']!r}")
            print(f"   ref : {d['ref']!r}")
            print(f"   ours: {d['ours']!r}")
