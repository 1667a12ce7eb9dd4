"""Measure the fallback-g2p lexicon coverage (VERDICT round-1 item 4).

The reference phonemizes with g2p_en = CMUdict + trained seq2seq fallback
(ref: /root/reference/audio.py:54-59).  Our fallback is the embedded
lexicon (text/lexicon.py) + rule LTS.  This tool measures, on
LJSpeech-register text, what fraction of word tokens hit the lexicon
(CMUdict-accurate) vs fall through to the rule LTS (approximate).

Usage: python tools/g2p_coverage.py [textfile ...]
With no args, measures on the embedded SAMPLE below — a reconstruction of
the two LJSpeech text registers (Victorian printing-history prose and
Warren-report prose; the actual LJSpeech transcripts are not available in
this environment).  Prints a JSON summary plus the OOV words and their
LTS renderings.
"""

from __future__ import annotations

import json
import pathlib
import sys
from collections import Counter

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from transformertts_tpu.text.g2p import (  # noqa: E402
    _LEXICON,
    _WORD_RE,
    _normalize_text,
    rule_letter_to_sound,
)
from transformertts_tpu.text.symbols import PUNCTUATION  # noqa: E402

# LJSpeech-register sample: the corpus interleaves two registers —
# (a) printing/typography history prose, (b) Warren-report narrative.
# These passages are written in those registers (NOT copied transcripts;
# LJSpeech itself is absent from this environment).
SAMPLE = """
Printing, in the only sense with which we are at present concerned,
differs from most if not from all the arts and crafts represented in the
exhibition in being comparatively modern. For although the Chinese took
impressions from wood blocks engraved in relief for centuries before the
woodcutters of the Netherlands, by a similar process, produced the block
books, which were the immediate predecessors of the true printed book,
the invention of movable metal letters in the middle of the fifteenth
century may justly be considered as the invention of the art of printing.
And it is worth mention in passing that, as an example of fine typography,
the earliest book printed with movable types, the Gutenberg Bible of about
fourteen fifty five, has never been surpassed. Printing, then, for our
purpose, may be considered as the art of making books by means of movable
types. Now, as all books not primarily intended as picture books consist
principally of types composed to form letterpress, it is of the first
importance that the letter used should be fine in form; especially as no
more time is occupied, or cost incurred, in casting, setting, or printing
beautiful letters than in the same operations with ugly ones. And it was
a matter of course that in the middle ages, when the craftsmen took care
that beautiful form should always be a part of their productions whatever
they were, the forms of printed letters should be beautiful, and that
their arrangement on the page should be reasonable and a help to the
shapeliness of the letters themselves. The middle ages brought calligraphy
to perfection, and it was natural therefore that the forms of printed
letters should follow more or less closely those of the written character,
and they followed them very closely. The first books were printed in black
letter, i.e. the letter which was a Gothic development of the ancient
Roman character, and which developed more completely and satisfactorily
on the side of the lowercase than the capital letters. The earliest books
printed with movable types were the works of the first printers of Mainz,
and the type they used was a black letter of great strength and beauty.

The President's Commission on the Assassination of President Kennedy was
created by Executive Order of President Johnson on November twenty nine,
nineteen sixty three. The Commission was directed to evaluate all the
facts and circumstances surrounding the assassination and the subsequent
killing of the alleged assassin, and to report its findings and
conclusions. Because of the numerous rumors and theories, the Commission
felt that the public interest required a thorough and independent
investigation. The Commission has functioned neither as a court presiding
over an adversary proceeding nor as a prosecutor determined to prove a
case. Oswald was hired on October fifteen, and worked at the Texas School
Book Depository from that date until the assassination. The rifle was
found on the sixth floor of the Depository Building shortly after the
shooting. Three used cartridge cases were found near the window on the
southeast corner of the sixth floor. The witnesses heard three shots fired
from the direction of the Depository Building. The motorcade proceeded at
a speed of about eleven miles per hour through the business district of
Dallas. Governor Connally testified that he heard the first shot and
turned to his right in an effort to see the President. Mrs. Kennedy was
seated in the rear seat of the limousine on the left side. The agents in
the follow up car observed the President slump to his left. The driver
accelerated the limousine and drove at high speed to Parkland Memorial
Hospital. A police officer stopped a man walking east on tenth street and
the man shot the officer four times with a revolver. The suspect was
arrested in the Texas Theatre a short time later. The paraffin test showed
traces of powder on his hands. The fingerprint and palm print evidence
established that Oswald had handled the rifle and the paper bag.
"""


def measure(text: str) -> dict:
    tokens = _WORD_RE.findall(_normalize_text(text))
    words = [t.strip("'") for t in tokens if t not in PUNCTUATION and t.strip("'")]
    hits = [w for w in words if w in _LEXICON]
    oov = [w for w in words if w not in _LEXICON]
    # words the LTS renders from a LEXICON stem via the inflection rules
    # (-s/-es/-ies/-ed/-ing/-er/-est/-ly/...): lexicon-quality output too
    def derived(w: str) -> bool:
        w = w.replace("'", "")
        for n, restore in ((1, ""), (2, ""), (2, "e"), (3, ""), (3, "e"),
                           (3, "y"), (4, "")):
            if len(w) > n + 2 and w[:-n] + restore in _LEXICON:
                return True
        return False

    derived_hits = [w for w in oov if derived(w)]
    oov_counts = Counter(oov)
    return {
        "word_tokens": len(words),
        "lexicon_hits": len(hits),
        "hit_rate": round(len(hits) / max(len(words), 1), 4),
        "derived_hits": len(derived_hits),
        "lexicon_or_derived_rate": round(
            (len(hits) + len(derived_hits)) / max(len(words), 1), 4),
        "distinct_words": len(set(words)),
        "distinct_in_lexicon": len({w for w in words if w in _LEXICON}),
        "distinct_oov": len(oov_counts),
        "oov_top": oov_counts.most_common(40),
    }


def main() -> None:
    if len(sys.argv) > 1:
        text = "\n".join(pathlib.Path(f).read_text() for f in sys.argv[1:])
        source = ",".join(sys.argv[1:])
    else:
        text, source = SAMPLE, "embedded LJSpeech-register sample"
    result = measure(text)
    result["source"] = source
    print(json.dumps({k: v for k, v in result.items() if k != "oov_top"}, indent=2))
    print("\nOOV words (count, LTS rendering):")
    for w, c in result["oov_top"]:
        print(f"  {c:3d}  {w:20s} -> {' '.join(rule_letter_to_sound(w))}")


if __name__ == "__main__":
    main()
