"""A/B + trace decomposition of the batch-64 merged-step anomaly.

PERF.md round-1 "known remaining headroom" #2: one merged 64-batch
micro-step measured ~40% SLOWER (6,231 audio-s/s) than the reference
semantics 4x16 in-jit scan (10,272) — surprising if the step were
FLOP-bound.  This script re-measures both shapes in one session (so tunnel
drift cancels), captures a jax.profiler trace of each, and prints the
device-time decomposition via tools/trace_summary.py categories so the
gap is attributable (hypotheses: (a) T=768 attention tiles exceed VMEM at
B=64 forcing smaller q-blocks, (b) bf16->f32 spills in the 64-row softmax,
(c) XLA scheduling differences around the scheduled-sampling double
forward).

Run on the real chip:  python tools/ab_batch64.py
Writes ab_batch64.json and trace dirs /tmp/ab64_{scan,merged}.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import json
import sys
import time

import numpy as np

import jax


def main():
    from bench import synthetic_epoch_batch
    from transformertts_tpu.config import Config, apply_overrides
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.models.factory import runtime_model_kwargs
    from transformertts_tpu.parallel import make_mesh, shard_batch, shard_state
    from transformertts_tpu.train import create_train_state, make_train_step
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = apply_overrides(Config().validate(), sys.argv[1:])
    jax.config.update("jax_default_prng_impl", cfg.runtime.prng_impl)
    rng = np.random.default_rng(0)
    results = {}

    for name, (k, b) in {"scan_4x16": (4, 16), "merged_1x64": (1, 64)}.items():
        import dataclasses

        c = cfg.replace(training=dataclasses.replace(
            cfg.training, grad_acc_steps=k, batch_size=b))
        model = TransformerTTS(c.model, **runtime_model_kwargs(c))
        mesh = make_mesh(1, 1)
        batch = synthetic_epoch_batch(rng, k, b)
        tiny = {kk: v[:, :2] for kk, v in batch.items()}
        state = create_train_state(model, c, jax.random.PRNGKey(0), tiny)
        state = shard_state(state, mesh)
        step = make_train_step(model, c, scheduled_sampling=True, donate=True)
        key = jax.random.PRNGKey(1)
        with mesh:
            sharded = shard_batch(batch, mesh)
            for _ in range(8):
                state, metrics = step(state, sharded, 0.8, key)
            _ = float(jax.device_get(metrics["total"]))
            # trace 5 steps
            jax.profiler.start_trace(f"/tmp/ab64_{name}")
            for _ in range(5):
                state, metrics = step(state, sharded, 0.8, key)
            _ = float(jax.device_get(metrics["total"]))
            jax.profiler.stop_trace()
            # timed windows
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(20):
                    state, metrics = step(state, sharded, 0.8, key)
                _ = float(jax.device_get(metrics["total"]))
                best = min(best, (time.perf_counter() - t0) / 20)
        audio_s = float(batch["melspec_lens"].sum()) * c.audio.hop_length / c.audio.sample_rate
        results[name] = {
            "step_ms": best * 1e3,
            "audio_s_per_s": audio_s / best,
            "trace_dir": f"/tmp/ab64_{name}",
        }
        print(name, json.dumps(results[name]), file=sys.stderr)

    with open("ab_batch64.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    print("decompose with: python tools/trace_summary.py /tmp/ab64_scan_4x16 --steps 5",
          file=sys.stderr)


if __name__ == "__main__":
    main()
