"""Persistent XLA compilation cache.

First compiles through the remote-compile tunnel cost 30-120 s; the
persistent cache makes every subsequent process reuse them from disk.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "TTS_COMPILE_CACHE", os.path.expanduser("~/.cache/tts_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags: harmless
        pass
