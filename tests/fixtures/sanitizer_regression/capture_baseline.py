"""Capture the sanitizer's golden baseline output for the synthetic fixture.

Run manually when a sanitizer behavior change is INTENTIONAL:

    python tests/fixtures/sanitizer_regression/capture_baseline.py

The committed ``baseline.json`` is what tests diff against; regenerating
it is an explicit act reviewed with the code change (reference workflow:
tests/fixtures/sanitizer_regression/ capture_baseline.py at a known
commit).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

HERE = Path(__file__).parent


def run_sanitizer():
    sys.path.insert(0, str(HERE.parents[2]))
    from tests.fixtures.sanitizer_regression.generate_synthetic import generate
    from whisperjav_tpu.modules.sanitize import SubtitleSanitizer

    subs = generate()
    cleaned, report = SubtitleSanitizer("ja").process(subs)
    return {
        "input_cues": len(subs),
        "output": [
            {"start": round(s.start, 3), "end": round(s.end, 3),
             "text": s.text}
            for s in cleaned
        ],
        "report": report.to_dict(),
    }


def main() -> int:
    result = run_sanitizer()
    out = HERE / "baseline.json"
    out.write_text(json.dumps(result, ensure_ascii=False, indent=1),
                   encoding="utf-8")
    print(f"captured baseline: {len(result['output'])} cues → {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
