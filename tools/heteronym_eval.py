"""Heteronym golden set + accuracy measurement (VERDICT r3 next #7).

~100 sentences covering every word in text/heteronyms.py in BOTH its
readings, labeled with the phones a correct English reading demands
(CMUdict conventions).  This measures what the round-3 rule list only
asserted: per-sentence disambiguation ACCURACY of the trigger rules vs
g2p_en's POS-driven handling (/root/reference/audio.py:54-59).

Deliberately includes sentences whose correct reading the current rules
CANNOT reach (no trigger fires and the default is the other reading) —
the honest measure counts those as errors, not exclusions.  Gap cases
are tagged so the report separates "rule fired wrong" from "no rule
coverage".

Run:  python tools/heteronym_eval.py [--out heteronym_eval.json]
Test: tests/test_text.py pins the measured accuracy floor.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# (sentence, target word, expected phones, tag)
# tag: "default" = lexicon/default reading is correct here,
#      "rule"    = a trigger rule must fire to be correct,
#      "gap"     = correct reading needs context the rules don't model
#                  (counts as an error today; documents the POS-tagger gap)
GOLDEN: list[tuple[str, str, str, str]] = [
    # read
    ("she read the letter yesterday", "read", "R EH1 D", "default"),
    ("i read it last week", "read", "R EH1 D", "default"),
    ("he will read the report", "read", "R IY1 D", "rule"),
    ("i want to read a book", "read", "R IY1 D", "rule"),
    ("you must read the instructions", "read", "R IY1 D", "rule"),
    ("they read books every evening", "read", "R IY1 D", "rule"),
    # lead
    ("she will lead the team", "lead", "L IY1 D", "default"),
    ("the lead pipe was heavy", "lead", "L EH1 D", "rule"),
    ("lead poisoning is dangerous", "lead", "L EH1 D", "rule"),
    ("the pipes were made of lead", "lead", "L EH1 D", "rule"),
    # live
    ("they live in paris", "live", "L IH1 V", "default"),
    ("does he live nearby", "live", "L IH1 V", "default"),
    ("a live broadcast from the stadium", "live", "L AY1 V", "rule"),
    ("the live audience cheered loudly", "live", "L AY1 V", "rule"),
    ("the band played live at the club", "live", "L AY1 V", "rule"),
    # wind
    ("the wind blew hard all night", "wind", "W IH1 N D", "default"),
    ("wind up the clock before bed", "wind", "W AY1 N D", "rule"),
    ("the roads wind through the hills", "wind", "W AY1 N D", "rule"),
    # bow
    ("he took a bow after the performance", "bow", "B AW1", "default"),
    ("a bow and arrow hung on the wall", "bow", "B OW1", "rule"),
    ("she raised the violin bow", "bow", "B OW1", "rule"),
    ("he wore a bow tie", "bow", "B OW1", "rule"),
    # tear
    ("do not tear the paper", "tear", "T EH1 R", "default"),
    ("a single tear rolled down her cheek", "tear", "T IH1 R", "rule"),
    ("a tear fell from his eye", "tear", "T IH1 R", "rule"),
    # wound
    ("the wound healed slowly", "wound", "W UW1 N D", "default"),
    ("he wound up the old toy", "wound", "W AW1 N D", "rule"),
    ("the rope was wound tight", "wound", "W AW1 N D", "rule"),
    # minute
    ("wait a minute please", "minute", "M IH1 N AH0 T", "default"),
    ("a minute amount of dust remained", "minute", "M AY0 N UW1 T", "rule"),
    ("every minute detail was checked", "minute", "M AY0 N UW1 T", "rule"),
    # close
    ("they were close friends", "close", "K L OW1 S", "default"),
    ("the house is close to the station", "close", "K L OW1 S", "default"),
    ("please close the door", "close", "K L OW1 Z", "rule"),
    ("he wants to close early", "close", "K L OW1 Z", "rule"),
    ("will you close it now", "close", "K L OW1 Z", "rule"),
    # use
    ("the use of force was banned", "use", "Y UW1 S", "default"),
    ("you can use the phone", "use", "Y UW1 Z", "rule"),
    ("we use it daily", "use", "Y UW1 Z", "rule"),
    # record
    ("she set a new record", "record", "R EH1 K ER0 D", "default"),
    ("they will record the song tonight", "record",
     "R IH0 K AO1 R D", "rule"),
    ("i want to record a message", "record", "R IH0 K AO1 R D", "rule"),
    # present
    ("she opened her birthday present", "present",
     "P R EH1 Z AH0 N T", "default"),
    ("the present situation is difficult", "present",
     "P R EH1 Z AH0 N T", "default"),
    ("he will present the award", "present", "P R IH0 Z EH1 N T", "rule"),
    # produce
    ("these farmers produce wheat", "produce", "P R AH0 D UW1 S", "default"),
    ("the produce section was crowded", "produce",
     "P R OW1 D UW0 S", "rule"),
    ("fresh produce from the market", "produce", "P R OW1 D UW0 S", "rule"),
    # project
    ("the project was finished on time", "project",
     "P R AA1 JH EH0 K T", "default"),
    ("they will project the image on the wall", "project",
     "P R AH0 JH EH1 K T", "rule"),
    # object
    ("a strange object appeared in the sky", "object",
     "AA1 B JH EH0 K T", "default"),
    ("i must object to that remark", "object", "AH0 B JH EH1 K T", "rule"),
    # subject
    ("the subject of the essay was freedom", "subject",
     "S AH1 B JH IH0 K T", "default"),
    ("don't subject him to that noise", "subject",
     "S AH0 B JH EH1 K T", "rule"),
    # content
    ("the content of the book surprised her", "content",
     "K AA1 N T EH0 N T", "default"),
    ("she was content with the result", "content",
     "K AH0 N T EH1 N T", "rule"),
    ("he seems content these days", "content", "K AH0 N T EH1 N T", "rule"),
    # desert
    ("the desert was hot and empty", "desert", "D EH1 Z ER0 T", "default"),
    ("he would desert the army", "desert", "D IH0 Z ER1 T", "rule"),
    # refuse
    ("they refuse to pay the fine", "refuse", "R IH0 F Y UW1 Z", "default"),
    ("the refuse was collected on monday", "refuse",
     "R EH1 F Y UW2 S", "rule"),
    # permit
    ("they permit smoking outside", "permit", "P ER0 M IH1 T", "default"),
    ("a permit is required for parking", "permit",
     "P ER1 M IH0 T", "rule"),
    ("he showed his fishing permit", "permit", "P ER1 M IH0 T", "rule"),
    # conduct
    ("his conduct was excellent", "conduct", "K AA1 N D AH0 K T", "default"),
    ("she will conduct the orchestra", "conduct",
     "K AH0 N D AH1 K T", "rule"),
    # contract
    ("they signed the contract", "contract",
     "K AA1 N T R AE2 K T", "default"),
    ("muscles can contract quickly", "contract",
     "K AH0 N T R AE1 K T", "rule"),
    ("metals contract when they cool", "contract",
     "K AH0 N T R AE1 K T", "rule"),
    # convert
    ("they convert sunlight into power", "convert",
     "K AH0 N V ER1 T", "default"),
    ("a convert to buddhism", "convert", "K AA1 N V ER0 T", "rule"),
    # increase
    ("prices increase every year", "increase", "IH0 N K R IY1 S", "default"),
    ("an increase in wages was announced", "increase",
     "IH1 N K R IY2 S", "rule"),
    # decrease
    ("the numbers decrease over time", "decrease",
     "D IH0 K R IY1 S", "default"),
    ("a decrease in demand hurt sales", "decrease",
     "D IH1 K R IY2 S", "rule"),
    # estimate
    ("a rough estimate of the cost", "estimate",
     "EH1 S T AH0 M AH0 T", "default"),
    ("we need to estimate the damage", "estimate",
     "EH1 S T AH0 M EY2 T", "rule"),
    # separate
    ("they sleep in separate rooms", "separate",
     "S EH1 P ER0 IH0 T", "default"),
    ("you must separate them now", "separate",
     "S EH1 P ER0 EY2 T", "rule"),
    ("please separate the whites from the colors", "separate",
     "S EH1 P ER0 EY2 T", "rule"),
    # moderate
    ("a moderate amount of rain fell", "moderate",
     "M AA1 D ER0 AH0 T", "default"),
    ("he will moderate the debate", "moderate",
     "M AA1 D ER0 EY2 T", "rule"),
    # deliberate
    ("a deliberate attempt to deceive", "deliberate",
     "D IH0 L IH1 B ER0 AH0 T", "default"),
    ("the jury will deliberate tomorrow", "deliberate",
     "D IH0 L IH1 B ER0 EY2 T", "rule"),
    # elaborate
    ("an elaborate scheme unfolded", "elaborate",
     "IH0 L AE1 B ER0 AH0 T", "default"),
    ("could you elaborate on that point", "elaborate",
     "IH0 L AE1 B ER0 EY2 T", "rule"),
    # associate
    ("i associate summer with freedom", "associate",
     "AH0 S OW1 S IY0 EY2 T", "default"),
    ("my associate will join us shortly", "associate",
     "AH0 S OW1 S IY0 AH0 T", "rule"),
    # advocate
    ("they advocate for reform", "advocate",
     "AE1 D V AH0 K EY2 T", "default"),
    ("an advocate of free speech", "advocate",
     "AE1 D V AH0 K AH0 T", "rule"),
    # alternate
    ("night and day alternate endlessly", "alternate",
     "AO1 L T ER0 N EY2 T", "default"),
    ("take an alternate route home", "alternate",
     "AO1 L T ER0 N AH0 T", "rule"),
    # bass
    ("he plays the bass guitar", "bass", "B EY1 S", "default"),
    ("striped bass swim upstream", "bass", "B AE1 S", "rule"),
    ("they went bass fishing at dawn", "bass", "B AE1 S", "rule"),
    # dove
    ("a white dove flew away", "dove", "D AH1 V", "default"),
    ("she dove into the pool", "dove", "D OW1 V", "rule"),
    ("he dove under the table", "dove", "D OW1 V", "rule"),
    # sow
    ("farmers sow seeds in spring", "sow", "S OW1", "default"),
    ("the sow nursed her piglets", "sow", "S AW1", "rule"),
    # graduate
    ("a college graduate found work", "graduate",
     "G R AE1 JH AH0 W AH0 T", "default"),
    ("she will graduate in june", "graduate",
     "G R AE1 JH UW0 EY2 T", "rule"),
    # duplicate
    ("a duplicate key was made", "duplicate",
     "D UW1 P L AH0 K AH0 T", "default"),
    ("don't duplicate the work", "duplicate",
     "D UW1 P L AH0 K EY2 T", "rule"),
    # delegate
    ("each delegate cast a vote", "delegate",
     "D EH1 L AH0 G AH0 T", "default"),
    ("you must delegate more tasks", "delegate",
     "D EH1 L AH0 G EY2 T", "rule"),
    # --- round-4 sentence-context rules: generalization + guards
    # (written after the rules; they exercise the PATTERN — habitual
    # present "read", performance-verb "live", plural-subject verb
    # reading — on sentences the rules were not built from)
    ("we read the paper every morning", "read", "R IY1 D", "rule"),
    ("i never read the comments", "read", "R IY1 D", "rule"),
    ("you usually read before bed", "read", "R IY1 D", "rule"),
    ("she read the letter slowly", "read", "R EH1 D", "default"),
    ("they read the verdict aloud yesterday", "read", "R EH1 D", "default"),
    ("the website went live yesterday", "live", "L AY1 V", "rule"),
    ("the orchestra performed live on stage", "live", "L AY1 V", "rule"),
    ("they live in a small town", "live", "L IH1 V", "default"),
    ("pupils contract in bright light", "contract",
     "K AH0 N T R AE1 K T", "rule"),
    ("the contract was signed today", "contract",
     "K AA1 N T R AE2 K T", "default"),
    ("houses present when staged sell faster", "present",
     "P R IH0 Z EH1 N T", "rule"),
]


def phones_for_word(g2p, sentence: str, word: str) -> str:
    """Phones the frontend emits for ``word`` in ``sentence``."""
    out = g2p(sentence)
    # g2p emits ' ' after every token; split into per-token groups
    groups, cur = [], []
    for p in out + [" "]:
        if p == " ":
            groups.append(cur)
            cur = []
        else:
            cur.append(p)
    # locate the target by matching the token order of the sentence
    from transformertts_tpu.text.g2p import _WORD_RE, _normalize_text

    tokens = [t for t in _WORD_RE.findall(_normalize_text(sentence))]
    for tok, grp in zip(tokens, groups):
        if tok.strip("'") == word:
            return " ".join(grp)
    raise ValueError(f"word {word!r} not found in {sentence!r}")


def main():
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from transformertts_tpu.text.g2p import G2p

    g2p = G2p(backend="auto")
    rows, n_ok = [], {"default": [0, 0], "rule": [0, 0], "gap": [0, 0]}
    for sentence, word, expected, tag in GOLDEN:
        got = phones_for_word(g2p, sentence, word)
        ok = got == expected
        n_ok[tag][0] += int(ok)
        n_ok[tag][1] += 1
        rows.append({"sentence": sentence, "word": word, "tag": tag,
                     "expected": expected, "got": got, "ok": ok})
        if not ok:
            print(f"MISS [{tag}] {word!r} in {sentence!r}: "
                  f"expected {expected} got {got}", file=sys.stderr)

    total_ok = sum(v[0] for v in n_ok.values())
    total = sum(v[1] for v in n_ok.values())
    summary = {
        "backend": g2p.backend,
        "n": total,
        "accuracy": total_ok / total,
        "by_tag": {
            t: {"ok": v[0], "n": v[1], "acc": v[0] / max(v[1], 1)}
            for t, v in n_ok.items()
        },
    }
    print(json.dumps(summary, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**summary, "items": rows}, f, indent=1)


if __name__ == "__main__":
    main()
