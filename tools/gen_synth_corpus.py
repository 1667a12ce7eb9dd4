"""Phoneme-conditioned synthetic LJSpeech proxy corpus.

The environment has no LJSpeech audio (and no network), so the convergence
evidence the BASELINE targets ask for (mel-L1 + alignment diagonality on
real data, /root/reference/readme.md:23,31-41) uses this corpus as the
closest possible proxy: diverse English text run through the repo's REAL
g2p frontend and REAL mel pipeline, over a deterministic source-filter
synthesizer in which every ARPAbet phoneme has a distinct spectral
signature and a variable duration.

Why this forces alignment: the waveform is generated *from the phoneme
sequence itself* — each phoneme contributes a segment whose spectrum
identifies it (vowel formant stacks, fricative noise bands, stop
silences+bursts) and whose duration is jittered per utterance.  The mel
at frame t is therefore predictable only by locating the right phoneme,
so the decoder's cross-attention must become monotonic-diagonal for the
loss to fall — unlike round 1's word-level tonal corpus (14 words, fixed
0.35 s/word, f0-only coding) where text barely informed the mel and
val_diagonality stayed flat at 0.36.

Usage:  python tools/gen_synth_corpus.py OUT_DIR [n_clips] [seed] [--v2]
(--v2: replace every other TRAIN slot with the 300-sentence diverse bank
in tools/train_sentences.py; the val slice stays byte-identical to v1 —
see make_texts for the round-4 rationale.)
Writes OUT_DIR/LJSpeech-1.1/{wavs/*.wav, metadata.csv} in the layout the
preprocess CLI expects (ref: preprocess.py:11-18).  IDs with prefix
LJ001/LJ002/LJ003 become the val split (ref: dataset.py:43-56).
"""

from __future__ import annotations

import pathlib
import sys
import wave

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from transformertts_tpu.text.g2p import G2p, phonemize  # noqa: E402

SR = 22050

# Peterson-Barney-style monophthong formants (F1, F2, F3) in Hz.
VOWEL_FORMANTS = {
    "IY": (270, 2290, 3010), "IH": (390, 1990, 2550),
    "EH": (530, 1840, 2480), "AE": (660, 1720, 2410),
    "AA": (730, 1090, 2440), "AO": (570, 840, 2410),
    "UH": (440, 1020, 2240), "UW": (300, 870, 2240),
    "AH": (640, 1190, 2390), "ER": (490, 1350, 1690),
}
# Diphthongs glide between two monophthong targets.
DIPHTHONGS = {
    "EY": ("EH", "IY"), "AY": ("AA", "IY"), "OY": ("AO", "IY"),
    "AW": ("AA", "UH"), "OW": ("AO", "UW"),
}
# Sonorant consonants: formant targets, voiced.
SONORANTS = {
    "M": (250, 1100, 2200), "N": (250, 1700, 2600), "NG": (250, 2000, 2800),
    "L": (360, 1300, 3000), "R": (400, 1300, 1690),
    "W": (300, 870, 2240), "Y": (270, 2290, 3010),
}
# Unvoiced fricatives: (noise center Hz, bandwidth Hz, amplitude).
FRICATIVES_UV = {
    "S": (6500, 2000, 0.5), "SH": (3500, 1500, 0.55), "F": (4500, 3500, 0.25),
    "TH": (5500, 3000, 0.2), "HH": (1500, 1500, 0.25),
}
# Voiced fricatives: weak harmonics + the noise band of their UV partner.
FRICATIVES_V = {"Z": "S", "ZH": "SH", "V": "F", "DH": "TH"}
# Stops: (burst center Hz, voiced?).
STOPS = {"P": (1000, False), "T": (4500, False), "K": (2000, False),
         "B": (800, True), "D": (3500, True), "G": (1600, True)}
AFFRICATES = {"CH": ("T", "SH"), "JH": ("D", "ZH")}

# Base durations in ms by category; per-utterance jitter multiplies these.
DUR = {"vowel": 110, "vowel0": 75, "diph": 150, "stop": 60, "fric": 95,
       "son": 70, "space": 45, "punct": 200}


def _formant_amp(freqs: np.ndarray, formants, bw=(90.0, 120.0, 160.0)) -> np.ndarray:
    """Resonance envelope: sum of Lorentzian peaks at the formants."""
    amp = np.zeros_like(freqs)
    for i, f in enumerate(formants):
        amp += 1.0 / (1.0 + ((freqs - f) / bw[min(i, len(bw) - 1)]) ** 2)
    return amp


def _voiced(n: int, f0: np.ndarray, formants_t, rng) -> np.ndarray:
    """Harmonic source shaped by a (possibly time-varying) formant filter.

    f0: per-sample fundamental.  formants_t: callable frac->formant tuple.
    Synthesized as a sum of harmonics with amplitudes from the resonance
    envelope evaluated midway (cheap and spectrally correct enough for mel).
    """
    t = np.arange(n) / SR
    phase = 2 * np.pi * np.cumsum(f0) / SR
    mid = formants_t(0.5)
    n_harm = int(9000 / max(float(f0.mean()), 60.0))
    sig = np.zeros(n)
    start_f, end_f = formants_t(0.0), formants_t(1.0)
    glide = not np.allclose(start_f, end_f)
    frac = t / max(t[-1], 1e-6) if glide else None
    for k in range(1, n_harm + 1):
        fk = k * float(f0.mean())
        if fk > 9000:
            break
        if glide:
            fs = np.array([np.interp(frac, [0, 1], [s, e]) for s, e in zip(start_f, end_f)])
            a = np.zeros(n)
            for i in range(len(start_f)):
                bw = (90.0, 120.0, 160.0)[min(i, 2)]
                a += 1.0 / (1.0 + ((fk - fs[i]) / bw) ** 2)
        else:
            a = _formant_amp(np.array([fk]), mid)[0]
        sig += a * (1.0 / k**0.5) * np.sin(k * phase)
    return sig


def _noise_band(n: int, center: float, bw: float, rng) -> np.ndarray:
    """White noise bandpassed via FFT mask (cheap, exact band control)."""
    x = rng.standard_normal(n)
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    mask = np.exp(-0.5 * ((freqs - center) / (bw / 2.355)) ** 2)
    return np.fft.irfft(spec * mask, n)


def _env(n: int, attack_ms=8.0, release_ms=12.0) -> np.ndarray:
    a = min(max(int(SR * attack_ms / 1000), 1), max(n // 3, 1))
    r = min(max(int(SR * release_ms / 1000), 1), max(n // 3, 1))
    env = np.ones(n)
    env[:a] = np.linspace(0, 1, a)
    env[n - r:] = np.linspace(1, 0, r)
    return env


def synth_phoneme(ph: str, dur_s: float, f0_base: float, rng) -> np.ndarray:
    """Render one phoneme token to a waveform segment."""
    n = max(int(dur_s * SR), 32)
    f0 = np.full(n, f0_base) * (1.0 + 0.01 * np.sin(np.linspace(0, 3, n)))

    base = ph.rstrip("012")
    stress = ph[len(base):]

    if ph in (" ",):
        return np.zeros(n)
    if ph in ("!", "'", "(", ")", ",", ".", ":", ";", "?"):
        return np.zeros(n)

    if base in VOWEL_FORMANTS:
        fm = VOWEL_FORMANTS[base]
        sig = _voiced(n, f0, lambda _s: fm, rng)
        amp = 0.9 if stress == "1" else (0.75 if stress == "2" else 0.6)
        return sig * _env(n) * amp
    if base in DIPHTHONGS:
        a, b = DIPHTHONGS[base]
        fa, fb = VOWEL_FORMANTS[a], VOWEL_FORMANTS[b]
        sig = _voiced(n, f0, lambda s: tuple(x + s * (y - x) for x, y in zip(fa, fb)), rng)
        return sig * _env(n) * 0.85
    if base in SONORANTS:
        sig = _voiced(n, f0 * 0.95, lambda _s: SONORANTS[base], rng)
        return sig * _env(n) * 0.55
    if base in FRICATIVES_UV:
        c, bw, amp = FRICATIVES_UV[base]
        return _noise_band(n, c, bw, rng) * _env(n) * amp
    if base in FRICATIVES_V:
        c, bw, amp = FRICATIVES_UV[FRICATIVES_V[base]]
        voiced = _voiced(n, f0, lambda _s: (300, 1200, 2500), rng) * 0.25
        return (voiced + _noise_band(n, c, bw, rng) * amp * 0.6) * _env(n)
    if base in STOPS:
        c, voiced = STOPS[base]
        closure = int(n * 0.55)
        burst = n - closure
        sig = np.zeros(n)
        sig[closure:] = _noise_band(burst, c, 2000, rng) * _env(burst, 2, 20) * 0.5
        if voiced:
            murmur = _voiced(closure, f0[:closure] * 0.9, lambda _s: (200, 1000, 2200), rng)
            sig[:closure] = murmur * 0.15
        return sig
    if base in AFFRICATES:
        st, fr = AFFRICATES[base]
        n1 = n // 2
        return np.concatenate([
            synth_phoneme(st, n1 / SR, f0_base, rng),
            synth_phoneme(fr, (n - n1) / SR, f0_base, rng),
        ])
    return np.zeros(n)  # unknown token -> silence


def phoneme_duration(ph: str, rng) -> float:
    base = ph.rstrip("012")
    stress = ph[len(base):]
    if ph == " ":
        d = DUR["space"]
    elif ph in ("!", "'", "(", ")", ",", ".", ":", ";", "?"):
        d = DUR["punct"]
    elif base in DIPHTHONGS:
        d = DUR["diph"]
    elif base in VOWEL_FORMANTS:
        d = DUR["vowel0"] if stress == "0" else DUR["vowel"]
    elif base in STOPS or base in AFFRICATES:
        d = DUR["stop"]
    elif base in FRICATIVES_UV or base in FRICATIVES_V:
        d = DUR["fric"]
    else:
        d = DUR["son"]
    return d / 1000.0 * rng.uniform(0.7, 1.4)


def synth_utterance(phonemes: list[str], seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    f0_start = 150.0  # fixed speaker; declination below makes f0 positional
    segs = []
    n_ph = max(len(phonemes), 1)
    for i, ph in enumerate(phonemes):
        dur = phoneme_duration(ph, rng)
        f0 = f0_start * (1.0 - 0.12 * i / n_ph)
        segs.append(synth_phoneme(ph, dur, f0, rng))
    sig = np.concatenate(segs) if segs else np.zeros(SR // 4)
    sig = sig + rng.standard_normal(len(sig)) * 0.004  # sensor-noise floor
    peak = np.abs(sig).max()
    return (sig / max(peak, 1e-6) * 0.6).astype(np.float64)


# ---------------------------------------------------------------------------
# Text generation: fixed diverse sentences + a template grammar, so the
# corpus exercises the full phoneme inventory and a wide vocabulary.

SENTENCES = [
    "Printing in the only sense with which we are at present concerned.",
    "The quick brown fox jumps over the lazy dog.",
    "She sells sea shells by the sea shore.",
    "A watched pot never boils on a cold winter morning.",
    "Every good boy deserves fudge and a glass of milk.",
    "The old clock on the wall struck twelve at midnight.",
    "Books and letters filled the shelves of the quiet library.",
    "He read the first page of the book very slowly.",
    "The machine was designed to produce pages of great beauty.",
    "Many of the early printers were also publishers and sellers of books.",
    "Water flows down the river into the wide open sea.",
    "The children played in the garden until the sun went down.",
    "A letter from the doctor arrived early this morning.",
    "The company printed two hundred copies of the little book.",
    "His voice was soft and low as he spoke to the crowd.",
    "The art of printing spread quickly through the old cities.",
    "Paper and ink are the simple tools of the printer.",
    "She walked through the door and placed the box on the table.",
    "The train left the station at seven in the evening.",
    "Good judges of type say the work was done with care.",
    "The form of the letters changed little over many years.",
    "It is a strange thing that so few people know the story.",
    "Light from the window fell upon the printed page.",
    "The king asked the printer to make a book of prayers.",
    "Most of the works were printed in the black letter style.",
    "Time and patience bring the mulberry leaf to silk.",
    "The first printers took the written page as their model.",
    "Each new press was faster and stronger than the last.",
    "There was no sound but the turning of the pages.",
    "What we call beauty in a book is order and clearness.",
]

SUBJECTS = ["the printer", "the old man", "a young woman", "the doctor",
            "the company", "every reader", "the first press", "his brother",
            "the school", "a little child", "the master", "the workman"]
VERBS = ["made", "printed", "carried", "finished", "showed", "brought",
         "placed", "found", "sold", "kept", "designed", "produced"]
OBJECTS = ["a book of great beauty", "two hundred pages", "the morning paper",
           "a letter to the king", "the new type", "many fine copies",
           "a simple form", "the open box", "a page of prayers",
           "the black letters", "a strong frame", "the first proof"]
TAILS = ["in the early morning.", "before the end of the year.",
         "with care and patience.", "for the people of the town.",
         "under the old stone bridge.", "near the open window.",
         "after a long day of work.", "in the quiet of the night.",
         "by the light of a candle.", "at the side of the road."]


def make_texts(n: int, seed: int, diverse_train: bool = False) -> list[str]:
    """v1: SENTENCES then template grammar.  v2 (diverse_train=True): the
    val slice (first n//16 texts) is IDENTICAL to v1 — same SENTENCES,
    same template RNG stream — but every other TRAIN slot is replaced by
    a sentence from the 300-entry diverse bank (tools/train_sentences.py,
    cycled with varying per-utterance duration jitter).

    Rationale (round-4 analysis, PARITY.md): in v1 the diverse register
    exists ONLY in val, so val's hard half is out-of-distribution — an
    artifact real LJSpeech (one book register across train AND val,
    /root/reference/readme.md:23) does not have.  v2 keeps the val
    utterances byte-identical (same text, same synth seed) so evals
    stay directly comparable, while the train distribution gains the
    diverse-register mass.
    """
    rng = np.random.default_rng(seed)
    texts = list(SENTENCES)
    while len(texts) < n:
        s = rng.choice(SUBJECTS)
        v = rng.choice(VERBS)
        o = rng.choice(OBJECTS)
        tl = rng.choice(TAILS)
        if rng.random() < 0.3:
            s2, v2 = rng.choice(SUBJECTS), rng.choice(VERBS)
            text = f"{s.capitalize()} {v} {o}, and {s2} {v2} {rng.choice(OBJECTS)} {tl}"
        else:
            text = f"{s.capitalize()} {v} {o} {tl}"
        texts.append(text)
    texts = texts[:n]
    if diverse_train:
        from train_sentences import TRAIN_SENTENCES

        assert not set(TRAIN_SENTENCES) & set(SENTENCES)
        n_val = max(n // 16, 4)
        j = 0
        for i in range(n_val, n, 2):
            texts[i] = TRAIN_SENTENCES[j % len(TRAIN_SENTENCES)]
            j += 1
    return texts


def write_wav(path: pathlib.Path, sig: np.ndarray) -> None:
    pcm = (np.clip(sig, -1, 1) * 30000).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SR)
        f.writeframes(pcm.tobytes())


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--v2"]
    diverse_train = "--v2" in sys.argv[1:]
    # Reject flag-like positional paths: a misparsed invocation once wrote a
    # 111 MB corpus into a directory literally named "--help".
    if argv and argv[0].startswith("-"):
        sys.exit(f"gen_synth_corpus: output dir {argv[0]!r} looks like a flag; "
                 "usage: gen_synth_corpus.py OUT_DIR [N_CLIPS] [SEED] [--v2]")
    out = pathlib.Path(argv[0]) if len(argv) > 0 else pathlib.Path("synth_corpus")
    n_clips = int(argv[1]) if len(argv) > 1 else 512
    seed = int(argv[2]) if len(argv) > 2 else 0

    root = out / "LJSpeech-1.1"
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    g2p = G2p()
    texts = make_texts(n_clips, seed, diverse_train=diverse_train)

    n_val = max(n_clips // 16, 4)
    lines, total_s = [], 0.0
    for i, text in enumerate(texts):
        # val split rule: LJ001/2/3 prefixes (ref dataset.py:43-56)
        uid = (f"LJ00{1 + i % 3}-{i:04d}" if i < n_val else
               f"LJ{10 + i % 40:03d}-{i:04d}")
        phonemes, _seq = phonemize(text, g2p)
        sig = synth_utterance(phonemes, seed * 100003 + i)
        write_wav(root / "wavs" / f"{uid}.wav", sig)
        total_s += len(sig) / SR
        lines.append(f"{uid}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines))
    print(f"corpus: {root} | {n_clips} clips | {total_s / 60:.1f} min | "
          f"{n_val} val")


if __name__ == "__main__":
    main()
