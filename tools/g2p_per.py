"""Phoneme error rate of the rule-LTS path vs hand-graded CMUdict refs.

VERDICT r2 #7: held-out *coverage* says how often words miss the lexicon,
but says nothing about how WRONG the rule LTS is when they do.  This tool
scores ``rule_letter_to_sound`` (the exact code path an out-of-lexicon
word takes; stem lexicon lookups inside the rules are part of that
algorithm) against tests/golden/lts_per_goldens.json — 120 hand-written
CMUdict-convention references selected by the deterministic protocol in
the fixture's _README.  Because the tool calls the LTS directly, adding
the sample words to the lexicon later does not perturb this measurement.

Metrics (per standard G2P evaluation):
- PER = sum(levenshtein(hyp, ref)) / sum(len(ref)), micro-averaged;
  reported stress-insensitive (primary; hand stress marks carry grader
  judgment) and stress-sensitive.
- WER = fraction of words with any error (stress-insensitive).

The reference frontend this approximates is g2p_en's trained seq2seq
fallback (ref: /root/reference/audio.py:54-59); published g2p_en-class
models sit around 5-9% PER on CMUdict held-out data — that is the
comparison bar for the numbers printed here.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from transformertts_tpu.text.g2p import rule_letter_to_sound  # noqa: E402
from transformertts_tpu.text.lexicon import LEXICON  # noqa: E402

GOLDENS = (pathlib.Path(__file__).resolve().parent.parent
           / "tests" / "golden" / "lts_per_goldens.json")


def levenshtein(a: list[str], b: list[str]) -> int:
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def strip_stress(phones: list[str]) -> list[str]:
    return [p.rstrip("012") for p in phones]


def main() -> dict:
    words = json.loads(GOLDENS.read_text())["words"]
    edits = edits_str = ref_len = wrong = 0
    worst: list[tuple[float, str, str, str]] = []
    in_lex = 0
    for word, ref_s in sorted(words.items()):
        ref = ref_s.split()
        hyp = rule_letter_to_sound(word)
        in_lex += word in LEXICON
        d = levenshtein(strip_stress(hyp), strip_stress(ref))
        ds = levenshtein(hyp, ref)
        edits += d
        edits_str += ds
        ref_len += len(ref)
        wrong += d > 0
        worst.append((d / len(ref), word, " ".join(hyp), ref_s))
    worst.sort(reverse=True)
    out = {
        "n_words": len(words),
        "sample_words_currently_in_lexicon": in_lex,
        "per_stress_insensitive": round(edits / ref_len, 4),
        "per_stress_sensitive": round(edits_str / ref_len, 4),
        "wer": round(wrong / len(words), 4),
        "ref_phones": ref_len,
        "comparison_bar": "g2p_en-class seq2seq fallback: ~5-9% PER",
        "worst_10": [
            {"word": w, "hyp": h, "ref": r, "rate": round(rt, 2)}
            for rt, w, h, r in worst[:10]
        ],
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
