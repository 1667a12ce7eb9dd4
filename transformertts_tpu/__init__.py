"""TPU-native Transformer-TTS framework.

A from-scratch JAX/XLA/Pallas/pjit implementation of the full Transformer-TTS
training and inference stack with the capabilities of the PyTorch reference
(Orca0917/TransformerTTS), re-designed TPU-first:

- ``text``      g2p phoneme frontend + symbol table (ref: audio.py:54-67)
- ``dsp``       STFT / log-mel feature extraction, numpy + JAX + Pallas paths
                (ref: audio.py:27-51)
- ``data``      offline preprocess CLI + bucketed-length, host-sharded batching
                (ref: preprocess.py, dataset.py)
- ``models``    encoder-decoder Transformer with prenets/postnet/scaled PE
                (ref: model/model.py, model/layers.py, model/module.py)
- ``ops``       Pallas TPU kernels (fused attention, STFT+mel)
- ``train``     masked losses, Noam schedule, block-wise scheduled sampling,
                jitted train step, trainer loop (ref: loss.py, utils/util.py,
                lightning_module.py, train.py)
- ``infer``     KV-cached autoregressive mel decoding (ref: model/model.py:323-394,
                which recomputes the full decoder per frame; here a
                lax.while_loop with per-layer KV caches)
- ``parallel``  device mesh + GSPMD sharding rules (DP/TP over ICI)
"""

__version__ = "0.1.0"

from transformertts_tpu.config import Config, load_config  # noqa: F401
