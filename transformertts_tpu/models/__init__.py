from transformertts_tpu.models.tts import TransformerTTS  # noqa: F401
from transformertts_tpu.models.masks import (  # noqa: F401
    lengths_to_valid_mask,
    causal_bias,
    padding_bias,
)
