from transformertts_tpu.dsp.mel import (  # noqa: F401
    hann_window,
    mel_filterbank,
    stft_magnitude_np,
    mel_spectrogram_np,
    mel_spectrogram_jax,
    dynamic_range_compression,
    normalize_mel,
    denormalize_mel,
)
