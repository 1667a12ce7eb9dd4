from transformertts_tpu.text import (
    G2p,
    PHONEMES,
    PUNCTUATION,
    SYMBOLS,
    phoneme_to_sequence,
    phonemize,
    sequence_to_phoneme,
)
from transformertts_tpu.text.numbers import int_to_words, normalize_numbers
from transformertts_tpu.text.symbols import N_SYMBOLS, PAD_ID


def test_symbol_table_layout():
    # first four specials, then ARPAbet, then punctuation (ref preprocess.py:21-25)
    assert PHONEMES[:4] == ["<pad>", "<unk>", "<s>", "</s>"]
    assert PAD_ID == 0
    assert SYMBOLS[-len(PUNCTUATION):] == PUNCTUATION
    assert len(set(SYMBOLS)) == len(SYMBOLS)  # no duplicate ids
    assert N_SYMBOLS < 100  # fits reference n_phon=100 embedding table


def test_arpabet_inventory():
    vowels = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
              "IH", "IY", "OW", "OY", "UH", "UW"}
    consonants = {"B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L", "M",
                  "N", "NG", "P", "R", "S", "SH", "T", "TH", "V", "W", "Y",
                  "Z", "ZH"}
    for v in vowels:
        for s in "012":
            assert v + s in PHONEMES, v + s
    for c in consonants:
        assert c in PHONEMES, c


def test_sequence_roundtrip_and_oov_drop():
    phones = ["HH", "AH0", "L", "OW1", " ", "NOT_A_SYMBOL", "!"]
    seq = phoneme_to_sequence(phones)
    assert len(seq) == 6  # OOV silently dropped (ref audio.py:62-63)
    assert sequence_to_phoneme(seq) == ["HH", "AH0", "L", "OW1", " ", "!"]
    assert sequence_to_phoneme([10_000]) == []


def test_number_expansion():
    assert int_to_words(0) == "zero"
    assert int_to_words(21) == "twenty one"
    assert int_to_words(105) == "one hundred five"
    assert int_to_words(1234) == "one thousand two hundred thirty four"
    assert normalize_numbers("in 1,234 ways") == "in one thousand two hundred thirty four ways"
    assert "point" in normalize_numbers("3.14")


def test_g2p_contract():
    g2p = G2p()
    phones = g2p("Hello, world!")
    # all tokens must be valid symbols (so nothing is silently dropped)
    assert all(p in SYMBOLS for p in phones), [p for p in phones if p not in SYMBOLS]
    assert "," in phones and "!" in phones
    assert " " in phones  # word boundary token
    # deterministic
    assert phones == g2p("Hello, world!")


def test_phonemize_produces_ids():
    g2p = G2p()
    phones, seq = phonemize("The quick brown fox; it jumped.", g2p)
    assert len(seq) == len([p for p in phones if p in SYMBOLS])
    assert all(0 <= s < len(SYMBOLS) for s in seq)
    assert len(seq) > 10


def test_lexicon_words():
    g2p = G2p()
    phones = g2p("the")
    if g2p.backend == "fallback":
        assert phones == ["DH", "AH0"]
