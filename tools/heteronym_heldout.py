"""Held-out heteronym eval (VERDICT r4 next #7).

The development set in tools/heteronym_eval.py was used to BUILD the
round-4 sentence-context rules, then re-scored on itself — its 100% is a
development number.  This file is the held-out protocol: 93 fresh
sentences authored in round 5 *blind to the cue lists* in
text/heteronyms.py (different templates: passives, questions,
predicate-adjective positions, sentence-final verbs, possessives, and
the adversarial noun-then-clause shapes the round-4 verdict called out,
e.g. "a sales contract when disputed").  Scored ONCE, reported as-is —
misses are the honest measure of how far curated trigger rules
generalize vs a trained POS tagger (reference bar: g2p_en's POS tagging,
/root/reference/audio.py:54-59).

Run:  python tools/heteronym_heldout.py [--out heteronym_heldout.json]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from heteronym_eval import phones_for_word  # noqa: E402  (same scoring)

# (sentence, target word, expected phones) — CMUdict conventions,
# phone strings identical to the dev set's for each reading.
HELDOUT: list[tuple[str, str, str]] = [
    # read
    ("the novel was read aloud to the class", "read", "R EH1 D"),
    ("children who read daily do better in school", "read", "R IY1 D"),
    ("have you read the news this morning", "read", "R EH1 D"),
    ("read the sign before entering", "read", "R IY1 D"),
    # lead
    ("who will lead the expedition", "lead", "L IY1 D"),
    ("the old paint contained lead", "lead", "L EH1 D"),
    ("a lead weight anchored the fishing line", "lead", "L EH1 D"),
    ("follow my lead and stay quiet", "lead", "L IY1 D"),
    # live
    ("where do you live now", "live", "L IH1 V"),
    ("live music filled the tiny bar", "live", "L AY1 V"),
    ("the wire is live so be careful", "live", "L AY1 V"),
    ("few animals live this long in the wild", "live", "L IH1 V"),
    # wind
    ("a cold wind swept down the valley", "wind", "W IH1 N D"),
    ("wind the bandage around his arm", "wind", "W AY1 N D"),
    ("she had to wind the yarn into a ball", "wind", "W AY1 N D"),
    # bow
    ("the archer drew his bow", "bow", "B OW1"),
    ("they bow to the emperor each morning", "bow", "B AW1"),
    ("the ship's bow cut through the waves", "bow", "B AW1"),
    ("tie the ribbon in a neat bow", "bow", "B OW1"),
    # tear
    ("the tear in his jacket grew wider", "tear", "T EH1 R"),
    ("she wiped away a tear before speaking", "tear", "T IH1 R"),
    # wound
    ("the nurse cleaned the wound carefully", "wound", "W UW1 N D"),
    ("the clock was wound every sunday", "wound", "W AW1 N D"),
    ("ivy wound around the trellis", "wound", "W AW1 N D"),
    # minute
    ("give me one minute to decide", "minute", "M IH1 N AH0 T"),
    ("the difference between them was minute", "minute", "M AY0 N UW1 T"),
    # close
    ("the store will close at nine", "close", "K L OW1 Z"),
    ("stay close to me in the crowd", "close", "K L OW1 S"),
    ("the vote was too close to call", "close", "K L OW1 S"),
    ("did the wound close properly", "close", "K L OW1 Z"),
    # use
    ("what is the use of arguing", "use", "Y UW1 S"),
    ("may i use your pen for a moment", "use", "Y UW1 Z"),
    ("the old tool gets little use these days", "use", "Y UW1 S"),
    # record
    ("the tape will record for an hour", "record", "R IH0 K AO1 R D"),
    ("it was the hottest summer on record", "record", "R EH1 K ER0 D"),
    ("for the record i disagree", "record", "R EH1 K ER0 D"),
    # present
    ("everyone was present at the meeting", "present", "P R EH1 Z AH0 N T"),
    ("allow me to present my colleague", "present", "P R IH0 Z EH1 N T"),
    ("the facts present a puzzle", "present", "P R IH0 Z EH1 N T"),
    # produce
    ("these factories produce steel for export", "produce",
     "P R AH0 D UW1 S"),
    ("local produce tastes better in summer", "produce",
     "P R OW1 D UW0 S"),
    # project
    ("don't project your fears onto me", "project", "P R AH0 JH EH1 K T"),
    ("the science project won first prize", "project",
     "P R AA1 JH EH0 K T"),
    # object
    ("the object of the game is simple", "object", "AA1 B JH EH0 K T"),
    ("no one dared object", "object", "AH0 B JH EH1 K T"),
    # subject
    ("please change the subject", "subject", "S AH1 B JH IH0 K T"),
    ("the king would subject them to heavy taxes", "subject",
     "S AH0 B JH EH1 K T"),
    # content
    ("i am content to wait here", "content", "K AH0 N T EH1 N T"),
    ("the moisture content was far too high", "content",
     "K AA1 N T EH0 N T"),
    # desert
    ("rain rarely falls in the desert", "desert", "D EH1 Z ER0 T"),
    ("soldiers who desert face prison", "desert", "D IH0 Z ER1 T"),
    # refuse
    ("i refuse to believe it", "refuse", "R IH0 F Y UW1 Z"),
    ("piles of refuse lined the alley", "refuse", "R EH1 F Y UW2 S"),
    # permit
    ("the rules permit one retry", "permit", "P ER0 M IH1 T"),
    ("he lost his parking permit", "permit", "P ER1 M IH0 T"),
    # conduct
    ("copper can conduct electricity", "conduct", "K AH0 N D AH1 K T"),
    ("a strict code of conduct applies", "conduct", "K AA1 N D AH0 K T"),
    # contract — the verdict's adversarial noun-then-clause shape
    ("a sales contract when disputed goes to court", "contract",
     "K AA1 N T R AE2 K T"),
    ("did the metal contract overnight", "contract",
     "K AH0 N T R AE1 K T"),
    # convert
    ("the sofa can convert into a bed", "convert", "K AH0 N V ER1 T"),
    ("as a recent convert he was zealous", "convert", "K AA1 N V ER0 T"),
    # increase
    ("burglaries are on the increase", "increase", "IH1 N K R IY2 S"),
    ("we must increase production this quarter", "increase",
     "IH0 N K R IY1 S"),
    # decrease
    ("exercise can decrease stress", "decrease", "D IH0 K R IY1 S"),
    ("the chart shows a steady decrease", "decrease", "D IH1 K R IY2 S"),
    # estimate
    ("the plumber gave us an estimate", "estimate", "EH1 S T AH0 M AH0 T"),
    ("experts estimate the crowd at two thousand", "estimate",
     "EH1 S T AH0 M EY2 T"),
    # separate
    ("keep the raw meat separate", "separate", "S EH1 P ER0 IH0 T"),
    ("the twins were hard to separate", "separate", "S EH1 P ER0 EY2 T"),
    # moderate
    ("moderate exercise helps the heart", "moderate", "M AA1 D ER0 AH0 T"),
    ("someone must moderate the panel", "moderate", "M AA1 D ER0 EY2 T"),
    # deliberate
    ("her insult was clearly deliberate", "deliberate",
     "D IH0 L IH1 B ER0 AH0 T"),
    ("juries deliberate before voting", "deliberate",
     "D IH0 L IH1 B ER0 EY2 T"),
    # elaborate
    ("the costumes were elaborate", "elaborate", "IH0 L AE1 B ER0 AH0 T"),
    ("he refused to elaborate further", "elaborate",
     "IH0 L AE1 B ER0 EY2 T"),
    # associate
    ("an associate professor taught the course", "associate",
     "AH0 S OW1 S IY0 AH0 T"),
    ("people associate red with danger", "associate",
     "AH0 S OW1 S IY0 EY2 T"),
    # advocate
    ("the lawyer was a fierce advocate for tenants", "advocate",
     "AE1 D V AH0 K AH0 T"),
    ("doctors advocate regular checkups", "advocate",
     "AE1 D V AH0 K EY2 T"),
    # alternate
    ("we alternate shifts each week", "alternate", "AO1 L T ER0 N EY2 T"),
    ("on alternate days she swims", "alternate", "AO1 L T ER0 N AH0 T"),
    # bass
    ("the bass line shook the whole room", "bass", "B EY1 S"),
    ("he caught a largemouth bass at dawn", "bass", "B AE1 S"),
    # dove
    ("the dove is a symbol of peace", "dove", "D AH1 V"),
    ("the goalkeeper dove to his left", "dove", "D OW1 V"),
    # sow
    ("you reap what you sow", "sow", "S OW1"),
    ("the sow escaped from her pen", "sow", "S AW1"),
    # graduate
    ("a graduate student ran the laboratory", "graduate",
     "G R AE1 JH AH0 W AH0 T"),
    ("many students graduate in debt", "graduate", "G R AE1 JH UW0 EY2 T"),
    # duplicate
    ("the form was filed in duplicate", "duplicate",
     "D UW1 P L AH0 K AH0 T"),
    ("cells duplicate before dividing", "duplicate",
     "D UW1 P L AH0 K EY2 T"),
    # delegate
    ("the delegate from ohio spoke first", "delegate",
     "D EH1 L AH0 G AH0 T"),
    ("good managers delegate authority", "delegate",
     "D EH1 L AH0 G EY2 T"),
]


def main():
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from transformertts_tpu.text.g2p import G2p

    g2p = G2p(backend="auto")
    rows, per_word = [], {}
    for sentence, word, expected in HELDOUT:
        got = phones_for_word(g2p, sentence, word)
        ok = got == expected
        per_word.setdefault(word, [0, 0])
        per_word[word][0] += int(ok)
        per_word[word][1] += 1
        rows.append({"sentence": sentence, "word": word,
                     "expected": expected, "got": got, "ok": ok})
        if not ok:
            print(f"MISS {word!r} in {sentence!r}: "
                  f"expected {expected} got {got}", file=sys.stderr)

    total_ok = sum(r["ok"] for r in rows)
    summary = {
        "backend": g2p.backend,
        "n": len(rows),
        "accuracy": total_ok / len(rows),
        "per_word": {
            w: {"ok": v[0], "n": v[1]} for w, v in sorted(per_word.items())
            if v[0] < v[1]  # only words with misses, for a readable report
        },
    }
    print(json.dumps(summary, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**summary, "items": rows}, f, indent=1)


if __name__ == "__main__":
    main()
