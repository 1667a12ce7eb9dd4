from transformertts_tpu.ops.pallas.flash_attention import flash_attention  # noqa: F401
from transformertts_tpu.ops.pallas.stft import log_mel_pallas  # noqa: F401
