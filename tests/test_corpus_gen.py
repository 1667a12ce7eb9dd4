"""Pins the v2 proxy-corpus text distribution (tools/gen_synth_corpus.py).

Round-4 invariants: (a) the v2 val slice is byte-identical to v1's, so
free-running evals stay comparable across corpus versions; (b) the
diverse training bank is disjoint from the val sentence list (no
leakage); (c) v2 actually injects the bank into the train slots.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from gen_synth_corpus import SENTENCES, make_texts  # noqa: E402
from train_sentences import TRAIN_SENTENCES  # noqa: E402

N = 1024
N_VAL = N // 16


def test_bank_disjoint_from_val_sentences():
    assert len(TRAIN_SENTENCES) >= 250
    assert not set(TRAIN_SENTENCES) & set(SENTENCES)
    assert len(set(TRAIN_SENTENCES)) == len(TRAIN_SENTENCES)


def test_v2_val_slice_identical_to_v1():
    v1 = make_texts(N, seed=1)
    v2 = make_texts(N, seed=1, diverse_train=True)
    assert v1[:N_VAL] == v2[:N_VAL]
    assert len(v1) == len(v2) == N


def test_v2_train_slots_carry_the_bank():
    v2 = make_texts(N, seed=1, diverse_train=True)
    train = v2[N_VAL:]
    bank_hits = sum(1 for t in train if t in set(TRAIN_SENTENCES))
    # every other train slot is a bank sentence
    assert bank_hits == len(train) // 2 + len(train) % 2
    # and no val sentence leaked into train
    assert not set(train) & set(SENTENCES)


def test_bank_phonemizable():
    from transformertts_tpu.text.g2p import G2p, phonemize

    g2p = G2p()
    for text in TRAIN_SENTENCES[::25]:
        phonemes, seq = phonemize(text, g2p)
        assert len(phonemes) > 5
        assert len(seq) > 5
