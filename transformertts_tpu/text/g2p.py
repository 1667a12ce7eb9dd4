"""Grapheme-to-phoneme frontend.

The reference uses the g2p_en package (ref: preprocess.py:21-25, audio.py:54-59):
CMUdict lookup with a neural fallback, emitting ARPAbet phonemes with word
boundaries as ``' '`` tokens and punctuation as its own tokens.

g2p_en is not guaranteed to be installed, so this module provides:

- ``G2p``: uses g2p_en when importable (bit-exact with the reference), else a
  deterministic built-in fallback — small embedded lexicon + rule-based
  letter-to-sound — with the same output *contract* (ARPAbet tokens, ``' '``
  separators, punctuation preserved).
- ``phonemize(transcript, g2p)`` -> (phonemes, sequence) mirroring
  ref audio.py:54-59.
"""

from __future__ import annotations

import re

from transformertts_tpu.text.numbers import normalize_numbers
from transformertts_tpu.text.symbols import PUNCTUATION, phoneme_to_sequence

# A compact lexicon of very common English words (ARPAbet with stress).
_LEXICON: dict[str, list[str]] = {
    "a": ["AH0"], "an": ["AE1", "N"], "the": ["DH", "AH0"],
    "and": ["AH0", "N", "D"], "of": ["AH1", "V"], "to": ["T", "UW1"],
    "in": ["IH0", "N"], "is": ["IH1", "Z"], "it": ["IH1", "T"],
    "that": ["DH", "AE1", "T"], "was": ["W", "AA1", "Z"],
    "he": ["HH", "IY1"], "she": ["SH", "IY1"], "for": ["F", "AO1", "R"],
    "on": ["AA1", "N"], "are": ["AA1", "R"], "as": ["AE1", "Z"],
    "with": ["W", "IH1", "DH"], "his": ["HH", "IH1", "Z"],
    "her": ["HH", "ER0"], "they": ["DH", "EY1"], "at": ["AE1", "T"],
    "be": ["B", "IY1"], "this": ["DH", "IH1", "S"],
    "have": ["HH", "AE1", "V"], "from": ["F", "R", "AH1", "M"],
    "or": ["AO1", "R"], "one": ["W", "AH1", "N"], "had": ["HH", "AE1", "D"],
    "by": ["B", "AY1"], "word": ["W", "ER1", "D"],
    "but": ["B", "AH1", "T"], "not": ["N", "AA1", "T"],
    "what": ["W", "AH1", "T"], "all": ["AO1", "L"],
    "were": ["W", "ER1"], "we": ["W", "IY1"], "when": ["W", "EH1", "N"],
    "your": ["Y", "AO1", "R"], "can": ["K", "AE1", "N"],
    "said": ["S", "EH1", "D"], "there": ["DH", "EH1", "R"],
    "use": ["Y", "UW1", "S"], "each": ["IY1", "CH"],
    "which": ["W", "IH1", "CH"], "do": ["D", "UW1"],
    "how": ["HH", "AW1"], "their": ["DH", "EH1", "R"],
    "if": ["IH1", "F"], "will": ["W", "IH1", "L"],
    "up": ["AH1", "P"], "other": ["AH1", "DH", "ER0"],
    "about": ["AH0", "B", "AW1", "T"], "out": ["AW1", "T"],
    "many": ["M", "EH1", "N", "IY0"], "then": ["DH", "EH1", "N"],
    "them": ["DH", "EH1", "M"], "these": ["DH", "IY1", "Z"],
    "so": ["S", "OW1"], "some": ["S", "AH1", "M"],
    "would": ["W", "UH1", "D"], "into": ["IH0", "N", "T", "UW1"],
    "has": ["HH", "AE1", "Z"], "more": ["M", "AO1", "R"],
    "two": ["T", "UW1"], "like": ["L", "AY1", "K"],
    "him": ["HH", "IH1", "M"], "see": ["S", "IY1"],
    "time": ["T", "AY1", "M"], "could": ["K", "UH1", "D"],
    "no": ["N", "OW1"], "make": ["M", "EY1", "K"],
    "than": ["DH", "AE1", "N"], "first": ["F", "ER1", "S", "T"],
    "been": ["B", "IH1", "N"], "its": ["IH1", "T", "S"],
    "who": ["HH", "UW1"], "now": ["N", "AW1"],
    "people": ["P", "IY1", "P", "AH0", "L"],
    "my": ["M", "AY1"], "made": ["M", "EY1", "D"],
    "over": ["OW1", "V", "ER0"], "did": ["D", "IH1", "D"],
    "down": ["D", "AW1", "N"], "only": ["OW1", "N", "L", "IY0"],
    "way": ["W", "EY1"], "may": ["M", "EY1"],
    "water": ["W", "AO1", "T", "ER0"], "little": ["L", "IH1", "T", "AH0", "L"],
    "very": ["V", "EH1", "R", "IY0"], "after": ["AE1", "F", "T", "ER0"],
    "called": ["K", "AO1", "L", "D"], "just": ["JH", "AH1", "S", "T"],
    "where": ["W", "EH1", "R", ], "most": ["M", "OW1", "S", "T"],
    "know": ["N", "OW1"], "through": ["TH", "R", "UW1"],
    "printing": ["P", "R", "IH1", "N", "T", "IH0", "NG"],
    "mister": ["M", "IH1", "S", "T", "ER0"],
    "missus": ["M", "IH1", "S", "AH0", "Z"],
    "doctor": ["D", "AA1", "K", "T", "ER0"],
    "saint": ["S", "EY1", "N", "T"],
    "company": ["K", "AH1", "M", "P", "AH0", "N", "IY0"],
    "junior": ["JH", "UW1", "N", "Y", "ER0"],
    "any": ["EH1", "N", "IY0"], "every": ["EH1", "V", "ER0", "IY0"],
    "our": ["AW1", "ER0"], "us": ["AH1", "S"], "me": ["M", "IY1"],
    "you": ["Y", "UW1"], "i": ["AY1"], "am": ["AE1", "M"],
    "because": ["B", "IH0", "K", "AO1", "Z"],
    "before": ["B", "IH0", "F", "AO1", "R"],
    "after": ["AE1", "F", "T", "ER0"],
    "again": ["AH0", "G", "EH1", "N"],
    "against": ["AH0", "G", "EH1", "N", "S", "T"],
    "between": ["B", "IH0", "T", "W", "IY1", "N"],
    "both": ["B", "OW1", "TH"], "being": ["B", "IY1", "IH0", "NG"],
    "under": ["AH1", "N", "D", "ER0"], "upon": ["AH0", "P", "AA1", "N"],
    "while": ["W", "AY1", "L"], "during": ["D", "UH1", "R", "IH0", "NG"],
    "without": ["W", "IH0", "TH", "AW1", "T"],
    "never": ["N", "EH1", "V", "ER0"], "always": ["AO1", "L", "W", "EY2", "Z"],
    "here": ["HH", "IY1", "R"], "such": ["S", "AH1", "CH"],
    "great": ["G", "R", "EY1", "T"], "old": ["OW1", "L", "D"],
    "new": ["N", "UW1"], "good": ["G", "UH1", "D"],
    "man": ["M", "AE1", "N"], "men": ["M", "EH1", "N"],
    "woman": ["W", "UH1", "M", "AH0", "N"],
    "women": ["W", "IH1", "M", "AH0", "N"],
    "year": ["Y", "IH1", "R"], "years": ["Y", "IH1", "R", "Z"],
    "day": ["D", "EY1"], "days": ["D", "EY1", "Z"],
    "house": ["HH", "AW1", "S"], "world": ["W", "ER1", "L", "D"],
    "work": ["W", "ER1", "K"], "part": ["P", "AA1", "R", "T"],
    "place": ["P", "L", "EY1", "S"], "own": ["OW1", "N"],
    "same": ["S", "EY1", "M"], "even": ["IY1", "V", "IH0", "N"],
    "another": ["AH0", "N", "AH1", "DH", "ER0"],
    "much": ["M", "AH1", "CH"], "should": ["SH", "UH1", "D"],
    "must": ["M", "AH1", "S", "T"], "well": ["W", "EH1", "L"],
    "also": ["AO1", "L", "S", "OW0"], "found": ["F", "AW1", "N", "D"],
    "give": ["G", "IH1", "V"], "given": ["G", "IH1", "V", "AH0", "N"],
    "those": ["DH", "OW1", "Z"], "came": ["K", "EY1", "M"],
    "come": ["K", "AH1", "M"], "might": ["M", "AY1", "T"],
    "still": ["S", "T", "IH1", "L"], "shall": ["SH", "AE1", "L"],
    "says": ["S", "EH1", "Z"], "say": ["S", "EY1"],
    "hundred": ["HH", "AH1", "N", "D", "R", "AH0", "D"],
    "thousand": ["TH", "AW1", "Z", "AH0", "N", "D"],
    "million": ["M", "IH1", "L", "Y", "AH0", "N"],
    "billion": ["B", "IH1", "L", "Y", "AH0", "N"],
    "point": ["P", "OY1", "N", "T"], "minus": ["M", "AY1", "N", "AH0", "S"],
    "zero": ["Z", "IH1", "R", "OW0"], "one": ["W", "AH1", "N"],
    "three": ["TH", "R", "IY1"], "four": ["F", "AO1", "R"],
    "five": ["F", "AY1", "V"], "six": ["S", "IH1", "K", "S"],
    "seven": ["S", "EH1", "V", "AH0", "N"], "eight": ["EY1", "T"],
    "nine": ["N", "AY1", "N"], "ten": ["T", "EH1", "N"],
    "eleven": ["IH0", "L", "EH1", "V", "AH0", "N"],
    "twelve": ["T", "W", "EH1", "L", "V"],
    "twenty": ["T", "W", "EH1", "N", "T", "IY0"],
    "thirty": ["TH", "ER1", "T", "IY0"],
    "forty": ["F", "AO1", "R", "T", "IY0"],
    "fifty": ["F", "IH1", "F", "T", "IY0"],
    "sixty": ["S", "IH1", "K", "S", "T", "IY0"],
    "seventy": ["S", "EH1", "V", "AH0", "N", "T", "IY0"],
    "eighty": ["EY1", "T", "IY0"],
    "ninety": ["N", "AY1", "N", "T", "IY0"],
    "thirteen": ["TH", "ER1", "T", "IY1", "N"],
    "fourteen": ["F", "AO1", "R", "T", "IY1", "N"],
    "fifteen": ["F", "IH0", "F", "T", "IY1", "N"],
    "sixteen": ["S", "IH0", "K", "S", "T", "IY1", "N"],
    "seventeen": ["S", "EH1", "V", "AH0", "N", "T", "IY1", "N"],
    "eighteen": ["EY0", "T", "IY1", "N"],
    "nineteen": ["N", "AY1", "N", "T", "IY1", "N"],
    "et": ["EH1", "T"], "cetera": ["S", "EH1", "T", "ER0", "AH0"],
}

_ABBREVIATIONS = {
    "mr": "mister", "mrs": "missus", "dr": "doctor", "st": "saint",
    "co": "company", "jr": "junior", "etc": "et cetera",
}

# Rule-based letter-to-sound: longest-match digraphs first, then single letters.
_DIGRAPHS: list[tuple[str, list[str]]] = [
    ("tion", ["SH", "AH0", "N"]),
    ("ight", ["AY1", "T"]),
    ("ough", ["AO1"]),
    ("augh", ["AO1"]),
    ("eigh", ["EY1"]),
    ("tch", ["CH"]),
    ("dge", ["JH"]),
    ("sch", ["S", "K"]),
    ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]),
    ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
    ("wr", ["R"]), ("kn", ["N"]), ("gn", ["N"]), ("mb", ["M"]),
    ("ee", ["IY1"]), ("ea", ["IY1"]), ("oo", ["UW1"]), ("ou", ["AW1"]),
    ("ow", ["OW1"]), ("oy", ["OY1"]), ("oi", ["OY1"]), ("ai", ["EY1"]),
    ("ay", ["EY1"]), ("au", ["AO1"]), ("aw", ["AO1"]), ("ey", ["EY1"]),
    ("ie", ["IY1"]), ("ue", ["UW1"]), ("ui", ["UW1"]), ("oa", ["OW1"]),
    ("ar", ["AA1", "R"]), ("er", ["ER0"]), ("ir", ["ER1"]),
    ("or", ["AO1", "R"]), ("ur", ["ER1"]),
    ("ss", ["S"]), ("ll", ["L"]), ("tt", ["T"]), ("pp", ["P"]),
    ("ff", ["F"]), ("rr", ["R"]), ("nn", ["N"]), ("mm", ["M"]),
    ("dd", ["D"]), ("bb", ["B"]), ("gg", ["G"]), ("zz", ["Z"]),
]

_SINGLE: dict[str, list[str]] = {
    "a": ["AE1"], "b": ["B"], "c": ["K"], "d": ["D"], "e": ["EH1"],
    "f": ["F"], "g": ["G"], "h": ["HH"], "i": ["IH1"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "o": ["AA1"],
    "p": ["P"], "q": ["K"], "r": ["R"], "s": ["S"], "t": ["T"],
    "u": ["AH1"], "v": ["V"], "w": ["W"], "x": ["K", "S"], "y": ["Y"],
    "z": ["Z"],
}

_VOWEL_PHONES = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
                 "IH", "IY", "OW", "OY", "UH", "UW"}

_WORD_RE = re.compile(r"[a-z']+|[!'(),.:;?]")


_VOICELESS_END = {"P", "T", "K", "F", "TH", "S", "SH", "CH"}
_SIBILANT_END = {"S", "Z", "SH", "ZH", "CH", "JH"}


def _suffix_phones(word: str) -> tuple[str, list[str]] | None:
    """Peel a common inflectional suffix; returns (stem, suffix_phones)."""
    if len(word) > 5 and word.endswith("ing"):
        return word[:-3], ["IH0", "NG"]
    if len(word) > 4 and word.endswith("ly"):
        return word[:-2], ["L", "IY0"]
    if len(word) > 5 and word.endswith("ness"):
        return word[:-4], ["N", "AH0", "S"]
    if len(word) > 5 and word.endswith("ment"):
        return word[:-4], ["M", "AH0", "N", "T"]
    return None


def rule_letter_to_sound(word: str) -> list[str]:
    """Deterministic rule-based LTS for out-of-lexicon words."""
    word = word.replace("'", "")

    # inflectional suffixes with phonologically conditioned allomorphs
    def stem_phones(stem: str) -> list[str]:
        return list(_LEXICON.get(stem) or rule_letter_to_sound(stem))

    if len(word) > 4 and word.endswith("es") and word[-3] in "sxzh":
        return stem_phones(word[:-2]) + ["IH0", "Z"]
    if len(word) > 3 and word.endswith("s") and not word.endswith("ss"):
        stem = stem_phones(word[:-1])
        if stem:
            last = stem[-1].rstrip("012")
            if last in _SIBILANT_END:
                return stem + ["IH0", "Z"]
            return stem + (["S"] if last in _VOICELESS_END else ["Z"])
    if len(word) > 4 and word.endswith("ed"):
        stem = stem_phones(word[:-2])
        if stem:
            last = stem[-1].rstrip("012")
            if last in {"T", "D"}:
                return stem + ["IH0", "D"]
            return stem + (["T"] if last in _VOICELESS_END else ["D"])
    peeled = _suffix_phones(word)
    if peeled is not None:
        stem, suf = peeled
        return stem_phones(stem) + suf
    # silent final e after consonant+vowel+consonant ("make", "time")
    if len(word) > 3 and word.endswith("e") and word[-2] not in "aeiou":
        word = word[:-1]
    phones: list[str] = []
    i = 0
    while i < len(word):
        matched = False
        for pattern, ph in _DIGRAPHS:
            if word.startswith(pattern, i):
                phones.extend(ph)
                i += len(pattern)
                matched = True
                break
        if not matched:
            ch = word[i]
            if ch in _SINGLE:
                # soft c/g before front vowels
                if ch == "c" and i + 1 < len(word) and word[i + 1] in "eiy":
                    phones.append("S")
                elif ch == "g" and i + 1 < len(word) and word[i + 1] in "eiy":
                    phones.append("JH")
                elif ch == "y" and i == len(word) - 1 and len(word) > 1:
                    phones.append("IY0")
                else:
                    phones.extend(_SINGLE[ch])
            i += 1
    # guarantee at least one vowel so the word is speakable
    if phones and not any(p.rstrip("012") in _VOWEL_PHONES for p in phones):
        phones.append("AH0")
    return phones


def _normalize_text(text: str) -> str:
    text = text.lower()
    text = normalize_numbers(text)
    for abbr, expansion in _ABBREVIATIONS.items():
        text = re.sub(rf"\b{abbr}\.", expansion, text)
    text = re.sub(r"[\"“”‘’-]", " ", text)
    return text


class _FallbackG2p:
    """Built-in lexicon + rules G2P, used when g2p_en is unavailable."""

    def __call__(self, text: str) -> list[str]:
        # g2p_en contract: ``' '`` after every token (words AND punctuation),
        # trailing separator stripped.
        tokens = _WORD_RE.findall(_normalize_text(text))
        out: list[str] = []
        for tok in tokens:
            if tok in PUNCTUATION:
                out.append(tok)
            else:
                word = tok.strip("'")
                if not word:
                    continue
                out.extend(_LEXICON.get(word) or rule_letter_to_sound(word))
            out.append(" ")
        return out[:-1] if out else out


class G2p:
    """g2p_en-compatible front end; falls back to built-in rules."""

    def __init__(self, backend: str = "auto"):
        self._impl = None
        self.backend = "fallback"
        if backend in ("auto", "g2p_en"):
            try:
                from g2p_en import G2p as _ExtG2p  # type: ignore

                self._impl = _ExtG2p()
                self.backend = "g2p_en"
            except Exception:
                if backend == "g2p_en":
                    raise
        if self._impl is None:
            self._impl = _FallbackG2p()

    def __call__(self, text: str) -> list[str]:
        return self._impl(text)


def phonemize(transcript: str, g2p: G2p) -> tuple[list[str], list[int]]:
    """Transcript -> (phoneme tokens, id sequence). Ref: audio.py:54-59."""
    phonemes = g2p(transcript)
    sequence = phoneme_to_sequence(phonemes)
    return phonemes, sequence
