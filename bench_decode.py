"""Inference benchmark: KV-cached autoregressive decode throughput.

The reference decodes with a full-decoder recompute per frame and no KV
cache (model/model.py:354-374).  This measures our single-compiled-program
`lax.while_loop` decode in generated mel frames/s and audio-seconds of
speech synthesized per wall-clock second (batch and single-utterance).

Writes bench_decode.json; not part of the driver's bench.py contract.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    from bench import wait_for_backend

    wait_for_backend()
    import jax

    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from transformertts_tpu.config import Config, apply_overrides
    from transformertts_tpu.infer import make_decode_fn
    from transformertts_tpu.models import TransformerTTS

    cfg = apply_overrides(Config().validate(), sys.argv[1:])
    dtype = jax.numpy.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jax.numpy.float32
    model = TransformerTTS(cfg.model, dtype=dtype)

    rng = np.random.default_rng(0)
    results = {}
    audio_sec_per_frame = cfg.audio.hop_length / cfg.audio.sample_rate

    for name, (b, max_len) in {
        "single_utterance": (1, 512),
        "batch16": (16, 512),
    }.items():
        tp = 128
        phoneme = np.asarray(rng.integers(1, 80, (b, tp)), np.int32)
        lens = np.full((b,), tp, np.int32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            phoneme[:, :16], np.zeros((b, 32, cfg.model.n_mels), np.float32),
            np.full((b,), 16, np.int32), np.full((b,), 32, np.int32), train=False,
        )
        # threshold 2.0 => decode always runs to max_len (worst case)
        decode = make_decode_fn(model, cfg, max_len=max_len, stop_threshold=2.0)
        out = decode(variables, phoneme, lens)
        n = int(jax.device_get(out["n_frames"]))  # forces completion (compile)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = decode(variables, phoneme, lens)
        n = int(jax.device_get(out["n_frames"]))  # forces completion
        dt = (time.perf_counter() - t0) / reps
        frames = b * max_len
        results[name] = {
            "max_len": max_len,
            "batch": b,
            "decode_s": dt,
            "frames_per_s": frames / dt,
            "ms_per_frame_step": dt / max_len * 1000,
            "audio_s_per_s": frames * audio_sec_per_frame / dt,
            "rtf_per_utterance": (max_len * audio_sec_per_frame) / dt,
        }
        print(name, results[name], file=sys.stderr)

    # streaming: time-to-first-chunk + steady chunk cadence (single stream)
    import jax.numpy as jnp

    from transformertts_tpu.infer.streaming import make_stream_fns, postnet_overlap

    chunk, max_len = 64, 512
    init, chunk_fn, post_fn = make_stream_fns(model, cfg, max_len=max_len,
                                              chunk=chunk, stop_threshold=2.0)
    phoneme = np.asarray(rng.integers(1, 80, (1, 128)), np.int32)
    lens = np.full((1,), 128, np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme[:, :16], np.zeros((1, 32, cfg.model.n_mels), np.float32),
        np.full((1,), 16, np.int32), np.full((1,), 32, np.int32), train=False,
    )
    # compile
    carry = init(variables, phoneme, lens)
    carry, pred, n_new = chunk_fn(variables, carry)
    _ = np.asarray(post_fn(variables, carry["frames"], jnp.int32(0)))
    reps, ttfc, total = 3, [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = init(variables, phoneme, lens)
        carry, pred, n_new = chunk_fn(variables, carry)
        first = np.asarray(pred)  # host readback = audio-ready pre-postnet
        ttfc.append(time.perf_counter() - t0)
        for _ in range(max_len // chunk - 1):
            carry, pred, n_new = chunk_fn(variables, carry)
        int(jax.device_get(n_new))
        total.append(time.perf_counter() - t0)
    results["streaming_single"] = {
        "chunk": chunk,
        "max_len": max_len,
        "time_to_first_chunk_ms": min(ttfc) * 1000,
        "first_chunk_audio_ms": chunk * audio_sec_per_frame * 1000,
        "full_utterance_s": min(total),
        "postnet_lag_frames": postnet_overlap(cfg),
    }
    print("streaming_single", results["streaming_single"], file=sys.stderr)

    with open("bench_decode.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
