"""Seeded adversarial corpus for text-chain differential testing.

Generates 250+ labeled cases across every adversarial class the
reference's sanitization chain accumulated edge-case handling for
(reference: whisperjav/modules/repetition_cleaner.py:50-84 pattern
classes; whisperjav/modules/hallucination_remover.py:454-585 matching
stages; tests/test_repetition_cleaner.py and
tests/test_hallucination_remover_slice_syntax.py case tables). The
differential suite (tests/test_text_chain_differential.py) runs each
case through BOTH the reference chain and ours and diffs the outputs.

Deterministic: same seed → same corpus, so divergence lists are stable.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Dict, List

Case = Dict[str, str]   # {"cls": ..., "text": ...}

_KANA = "あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほんぁぃぅぇぉ"
_KATA = "アイウエオカキクケコハヒフヘホンッァィゥェォ"

NORMAL_LINES = [
    "今日はいい天気ですね", "そんなこと言わないで", "ちょっと待ってください",
    "どこに行くの？", "本当にありがとう", "それは違うと思う",
    "もう一度お願いします", "大丈夫、心配しないで", "先に行ってて",
    "話を聞いてほしい", "昨日の映画は面白かったよ", "駅まで歩いて十分くらいです",
    # legitimate doubled expressions (must survive: reference patterns
    # need ≥3-4 occurrences; そこそこ/まあまあ are natural JA)
    "そこそこ美味しかった", "まあまあ落ち着いて", "胸がどきどきする",
    "目がきらきらしてる", "わくわくしてきた",
    # numbers / currency / latin mixed into JA
    "3000円でした", "DVDを買った", "LINEして",
]

# short interjections: REAL speech, but several are in the reference's
# own filter DB ("あっ!", "うん", "はい。" are exact-match entries) —
# diffed for chain equality, excluded from the must-survive guard
INTERJECTIONS = ["えっ", "あっ！", "うん", "はい。", "ん？", "そう。"]


def _sample_db_phrases(rng: random.Random, n: int = 40) -> List[str]:
    """Seeded sample of real filter_list_v08 JA entries (exercises the
    full bundled DB, not just the famous watermarks)."""
    db = Path(__file__).resolve().parents[2] / (
        "whisperjav_tpu/data/hallucination_filters/filter_list_v08.json")
    with open(db, encoding="utf-8") as f:
        data = json.load(f)
    langs = data.get("languages", data)
    ja = sorted(p for p in langs.get("ja", langs.get("japanese", []))
                if isinstance(p, str) and p.strip())
    return rng.sample(ja, min(n, len(ja)))


def build_corpus(seed: int = 20260818) -> List[Case]:
    rng = random.Random(seed)
    cases: List[Case] = []

    def add(cls: str, text: str):
        cases.append({"cls": cls, "text": text})

    # ---- repetition layer 1: curated pattern classes -----------------
    for ch in "あいうおんアウッぁ":
        for k in (4, 7, 12, 25):
            add("char_flood", ch * k)
    add("char_flood_dakuten", "あ゛" * 6)
    add("char_flood_dakuten", "う゛う゛う゛う゛う゛")
    for sep in ("\n", " ", "　", "  "):
        add("whitespace_flood", sep.join(["あ"] * 6))
        add("whitespace_flood", sep.join(["ん"] * 5) + sep)
    for unit, k in (("だめ", 7), ("そこ", 5), ("ハッ", 6), ("いや", 8),
                    ("んっ", 5), ("すご", 4), ("やだ", 12)):
        add("multi_char_word", unit * k)
    for unit, k in (("ゆーちゃん、", 4), ("すごい、", 5), ("もう,", 4),
                    ("だめ、 ", 3)):
        add("phrase_with_comma", unit * k)
    for unit, k in (("あ!!", 5), ("そう?", 4), ("ん！", 6), ("はい ", 5),
                    ("気持ちいい。", 4), ("イク〜", 4)):
        add("phrase_with_separator", unit * k)
    for unit, k in (("あ〜、", 4), ("ん〜、", 3), ("やー、", 5)):
        add("wavedash_comma", unit * k)
    add("sentence_phrase_rep", "はい、はい、はい・・・。" * 3)
    add("sentence_phrase_rep", "そうそう。" * 4)
    add("sentence_phrase_rep", "見て!見て!見て!見て!")
    for ch, mark, k in (("あ", "〜", 5), ("ん", "ー", 8), ("は", "〜", 12)):
        add("vowel_extension", ch + mark * k)
    for pre, ch, k in (("あ", "ら", 5), ("んは", "は", 6), ("お", "ほ", 4)):
        add("prefix_plus_char", pre + ch * k)

    # combos embedded in otherwise-normal lines
    add("embedded_flood", "それでああああああああ、どうしよう")
    add("embedded_flood", "だめだめだめだめだめ、やめて")
    add("embedded_flood", "待って待って待って待って！")

    # ---- repetition layer 2: generic substring dominance -------------
    for unit, k in (("お腹すいた", 9), ("気持ちよかった", 7),
                    ("もう無理です", 8), ("何回も何回も", 8)):
        add("generic_dominance", unit * k)
    add("generic_dominance_prefixed", "XY" + "お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹お腹")

    # ---- repetition layer 3: length limit -----------------------------
    base = "これは長い文章で、まだ続きます。"
    add("length_limit", base * 16)                     # 。/、 breaks exist
    add("length_limit_nobreak", "ん" * 230)            # no separator at all
    add("length_limit_earlybreak", "短い。" + "x" * 240)

    # word loop BELOW the generic threshold: an 8-char unit x3 (24 chars
    # < 40) matches NO curated pattern and stays — both chains keep it;
    # the CPS limiter is the stage that would kill it in a real SRT
    add("word_loop_under_threshold", "それは違うと思う" * 3)

    # ---- must-survive lines -------------------------------------------
    for line in NORMAL_LINES:
        add("normal", line)
    for line in INTERJECTIONS:
        add("interjection", line)
    add("normal_long", "今日は朝から雨が降っていて、傘を持たずに出かけてしまったので、駅に着く頃にはすっかり濡れてしまいました")

    # ---- hallucination DB stages --------------------------------------
    famous = [
        "ご視聴ありがとうございました", "チャンネル登録をお願いします",
        "最後までご視聴いただきありがとうございます",
        "字幕は視聴者によって作成されました", "おやすみなさい",
        "ありがとうございました",
    ]
    for p in famous:
        add("halluc_exact", p)
        add("halluc_exact_punct", p + "。")
        add("halluc_exact_punct", p + "!!")
        add("halluc_exact_spaced", " ".join(p))
    for p in _sample_db_phrases(rng, 40):
        add("halluc_db_sample", p)
    # fuzzy near-misses (typo distance within 0.9 similarity)
    add("halluc_fuzzy", "ご視聴ありがとうごさいました")
    add("halluc_fuzzy", "チャンネル登録をお願いしまーす")
    # bracketed SDH / sound-effect captions
    for t in ("（音楽）", "【拍手】", "(笑い声)", "[音楽]", "（ため息）"):
        add("halluc_bracketed", t)
    # emoji / music-symbol lines
    for t in ("♪〜", "🎵", "こんばんは🎵みなさん", "♪ラララ♪"):
        add("halluc_emoji", t)
    # latin-only lines inside a JA transcript
    add("halluc_latin", "thanks for watching everyone")
    add("halluc_latin", "Subtitles by the Amara.org community")
    # regexp_v09 slice-syntax triggers (#287 reproducers)
    add("halluc_slice", "いいいいいいいいいいいい")
    add("halluc_slice", "いいいいいいいいいいいい?")
    add("halluc_slice", "うううううううううううう。")
    add("halluc_slice", "〜〜〜〜〜〜〜〜〜〜〜〜")
    add("halluc_slice", "ーーーーーーーーーーーー")
    add("halluc_slice", "っっっっっっっっっっっっ")
    # punctuation-only / symbol residue
    for t in ("。。。。。。", "・・・・・・", "!!!!!!", "……………", "??"):
        add("punct_only", t)
    # hallucination + repetition in one line
    add("combo", "ご視聴ありがとうございましたあああああああ")
    add("combo", "あああああご視聴ありがとうございました")
    add("combo", "はいはいはいはいはい、チャンネル登録をお願いします")

    # ---- randomized stress: seeded mixtures ---------------------------
    for i in range(40):
        ch = rng.choice(_KANA)
        unit = "".join(rng.choice(_KANA) for _ in range(rng.randint(2, 4)))
        style = rng.randrange(5)
        if style == 0:
            add("rand_flood", ch * rng.randint(4, 20))
        elif style == 1:
            add("rand_word_loop", unit * rng.randint(4, 9))
        elif style == 2:
            add("rand_comma_loop", (unit + "、") * rng.randint(3, 6))
        elif style == 3:
            add("rand_mixed",
                rng.choice(NORMAL_LINES) + ch * rng.randint(4, 10))
        else:
            add("rand_kata", rng.choice(_KATA) * rng.randint(4, 15))

    # whitespace / empty edge cases
    add("edge_empty", "")
    add("edge_space", "   ")
    add("edge_newline", "\n\n")
    return cases


if __name__ == "__main__":
    corpus = build_corpus()
    print(f"{len(corpus)} cases")
    from collections import Counter
    for cls, n in sorted(Counter(c["cls"] for c in corpus).items()):
        print(f"  {cls}: {n}")
