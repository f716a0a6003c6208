"""SRT post-processing router: language → sanitizer chain.

Role parity with reference ``whisperjav/modules/srt_postprocessing.py:92``
(ja/ko/zh → SubtitleSanitizer, en → English cleaner, language-code
normalization).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from whisperjav_tpu.modules.sanitize.sanitizer import (
    SanitizerConfig, SubtitleSanitizer,
)
from whisperjav_tpu.modules.srt import Subtitle

_LANG_ALIASES = {
    "japanese": "ja", "jpn": "ja", "jp": "ja",
    "korean": "ko", "kor": "ko",
    "chinese": "zh", "zho": "zh", "cmn": "zh",
    "english": "en", "eng": "en",
}


def normalize_language(code: str) -> str:
    c = (code or "ja").lower()
    return _LANG_ALIASES.get(c, c)


class SRTPostProcessor:
    def __init__(self, config: SanitizerConfig | None = None):
        self.config = config or SanitizerConfig()

    def process(self, subs: Sequence[Subtitle],
                language: str = "ja") -> Tuple[List[Subtitle], Dict]:
        lang = normalize_language(language)
        if lang in ("ja", "ko", "zh"):
            sanitizer = SubtitleSanitizer(lang, self.config)
        else:
            # English chain: same phases, EN phrase DB, looser CPS
            from dataclasses import replace
            cfg = replace(self.config, max_cps=35.0)
            sanitizer = SubtitleSanitizer("en", cfg)
        cleaned, report = sanitizer.process(list(subs))
        return cleaned, report.to_dict()
