"""``whisperjav-translate`` CLI (reference: whisperjav/translate/cli.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="whisperjav-translate",
        description="translate subtitle files via LLM providers")
    p.add_argument("-i", "--input", required=True, help="input SRT file")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--provider", default="identity",
                   help="deepseek/openrouter/gpt/claude/gemini/glm/groq/"
                        "ollama/local/custom/identity")
    p.add_argument("--model", default=None)
    p.add_argument("--target-language", default="English")
    p.add_argument("--base-url", default=None)
    p.add_argument("--tone", default="standard",
                   choices=["standard", "pornify"],
                   help="instruction set flavor")
    p.add_argument("--no-auto-start", action="store_true",
                   help="do not auto-start a local ollama server")
    args = p.parse_args(argv)

    from whisperjav_tpu.translate.service import translate_srt
    out = translate_srt(
        Path(args.input), provider=args.provider, model=args.model,
        target_language=args.target_language,
        output_path=Path(args.output) if args.output else None,
        base_url=args.base_url, tone=args.tone,
        auto_start_ollama=not args.no_auto_start)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
