"""One home for deriving TransformerTTS runtime kwargs from a Config.

The trainer and bench.py construct the model with the same gates (Pallas
kernel toggles constrained by lane alignment / scoped VMEM); keeping the
derivation here stops the two sites from drifting.
"""

from __future__ import annotations

import jax.numpy as jnp


def runtime_model_kwargs(cfg) -> dict:
    """kwargs for ``TransformerTTS(cfg.model, **runtime_model_kwargs(cfg))``."""
    from transformertts_tpu.ops.pallas.fused_ffn import fused_ffn_fits

    m, r = cfg.model, cfg.runtime
    itemsize = 2 if r.compute_dtype == "bfloat16" else 4
    lane_ok = all(
        d % 128 == 0 for d in (m.d_model, m.encoder_d_ffn, m.decoder_d_ffn)
    )
    return dict(
        dtype=jnp.bfloat16 if r.compute_dtype == "bfloat16" else jnp.float32,
        use_flash=r.use_pallas_attention,
        use_fused_ln=r.use_pallas_fused_ln and m.d_model % 128 == 0,
        use_fused_ffn=r.use_pallas_fused_ffn and lane_ok and all(
            fused_ffn_fits(m.d_model, f, itemsize)
            for f in (m.encoder_d_ffn, m.decoder_d_ffn)
        ),
        fuse_qkv=r.fuse_qkv_projections,
    )
