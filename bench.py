"""Training-throughput benchmark (the BASELINE.json headline metric).

Measures steady-state audio-seconds of speech processed per wall-clock
second per chip for the full reference-parity LJSpeech config (batch 16 x
grad-accum 4, scheduled-sampling double-forward train step — the reference's
exact training regime, ref: config.yaml:49,56, lightning_module.py:45-86)
on synthetic LJSpeech-length-distributed data.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s", "vs_baseline": N}

Robustness contract (round-2 rework after BENCH_r01 rc=124/parsed:null):
the driver runs this under a hard timeout while the axon TPU tunnel can be
down for hours.  This script therefore
  1. budgets everything against BENCH_DEADLINE_S (default 1500 s) of its own,
  2. installs SIGTERM/SIGALRM backstops that print the best JSON line
     obtained so far (or a clearly-labelled replay of the last successful
     on-chip measurement from bench_last_good.json) before dying,
  3. probes the backend with SHORT subprocess probes and falls back to the
     replay line instead of waiting out an outage,
  4. emits after ONE timed window if the deadline is near (more windows only
     when time allows), and
  5. persists every fresh on-chip measurement to bench_last_good.json.

Baseline: the reference publishes no numbers (BASELINE.md).  We use an
analytic estimate of its RTX-4060 throughput: ~420 GFLOP per effective
optimizer step (fwd+bwd+no-grad fwd at batch 16, avg 568 mel frames /
95 phonemes) against ~15 TFLOP/s peak fp32 at a generous 35% eager-torch
utilization, plus dataloader overhead => ~75 ms per batch-16 micro-step
=> ~105.6 audio-s / 0.30 s accum-step ~= 350 audio-s/s.  Details in
bench_details.json.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_AUDIO_S_PER_S = 350.0
T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_last_good.json")

# LJSpeech stats: 13,100 clips / ~24 h -> mean 6.57 s -> 566 mel frames @
# hop 256 / 22.05 kHz; transcript ~ 95 phonemes
MEL_MEAN, MEL_STD, MEL_BUCKET = 566, 120, 768
PHON_MEAN, PHON_STD, PHON_BUCKET = 95, 25, 128

_best_result: dict | None = None  # best fresh measurement so far
_emitted = False


def remaining() -> float:
    return DEADLINE_S - (time.monotonic() - T0)


def _emit(result: dict) -> None:
    """Print the one JSON line exactly once and flush hard.

    The emitted flag is set only AFTER the flush: if a signal lands
    mid-write, the handler's own _emit still produces a line (a rare
    duplicate beats the silent no-output failure this guards against)."""
    global _emitted
    if _emitted:
        return
    sys.stdout.write(json.dumps(result) + "\n")
    sys.stdout.flush()
    _emitted = True


def _fallback_result(why: str) -> dict:
    """Replay the last successful on-chip measurement, clearly labelled."""
    try:
        with open(LAST_GOOD) as f:
            prev = json.load(f)
        return {
            "metric": prev["metric"] + " [REPLAY of last on-chip run: " + why + "]",
            "value": prev["value"],
            "unit": prev["unit"],
            "vs_baseline": prev["vs_baseline"],
            "note": f"replayed from bench_last_good.json ({prev.get('recorded', '?')}); {why}",
        }
    except Exception:
        return {
            "metric": "LJSpeech train throughput per chip (batch 16 x accum 4, scheduled sampling)",
            "value": 0.0,
            "unit": "audio-s/s",
            "vs_baseline": 0.0,
            "note": f"no measurement possible and no last-good record: {why}",
        }


def _emit_best_and_exit(why: str) -> None:
    if _best_result is not None:
        _emit(_best_result)
    else:
        _emit(_fallback_result(why))
    os._exit(0)


def _signal_backstop(signum, frame):  # noqa: ARG001
    _emit_best_and_exit(f"interrupted by signal {signum}")


signal.signal(signal.SIGTERM, _signal_backstop)
signal.signal(signal.SIGINT, _signal_backstop)
signal.signal(signal.SIGALRM, _signal_backstop)
# absolute backstop: fire our own alarm before the driver's timeout would
signal.alarm(max(60, int(DEADLINE_S - 30)))


def synthetic_epoch_batch(rng, k, b):
    mel_lens = np.clip(
        rng.normal(MEL_MEAN, MEL_STD, (k, b)).astype(np.int32), 200, MEL_BUCKET
    )
    phon_lens = np.clip(
        rng.normal(PHON_MEAN, PHON_STD, (k, b)).astype(np.int32), 30, PHON_BUCKET
    )
    return {
        "phoneme": rng.integers(1, 80, (k, b, PHON_BUCKET)).astype(np.int32),
        "melspec": (rng.standard_normal((k, b, MEL_BUCKET, 80)) * 0.8).astype(np.float32),
        "phoneme_lens": phon_lens,
        "melspec_lens": mel_lens,
    }


def wait_for_backend() -> bool:
    """Probe the TPU tunnel with SHORT subprocess probes.

    jax caches a failed backend for the process lifetime, so probe in a
    subprocess and only init in-process once a probe succeeds.  Returns
    False (-> replay fallback) instead of waiting out a multi-hour outage:
    probing stops when either ~7 min of probing has elapsed or less than
    8 min of deadline would remain for measurement."""
    import subprocess

    probe_budget = min(420.0, remaining() - 480.0)
    probe_deadline = time.monotonic() + max(probe_budget, 0.0)
    attempt = 0
    # always make at least one probe, even under a tiny deadline — a healthy
    # backend must never be skipped in favour of the stale replay
    while attempt == 0 or time.monotonic() < probe_deadline:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, timeout=60, text=True,
            )
            if out.returncode == 0:
                print(f"backend up (probe {attempt}): {out.stdout.strip()}",
                      file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"backend probe {attempt} failed; retrying...", file=sys.stderr)
        time.sleep(20)
    return False


def main():
    global _best_result

    force_cpu = os.environ.get("BENCH_FORCE_CPU") == "1"  # measurement-path testing
    if not force_cpu and not wait_for_backend():
        _emit_best_and_exit("TPU tunnel unavailable during probe window")

    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from transformertts_tpu.config import Config, apply_overrides
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.models.factory import runtime_model_kwargs
    from transformertts_tpu.parallel import make_mesh, shard_batch, shard_state
    from transformertts_tpu.train import create_train_state, make_train_step

    args = [a for a in sys.argv[1:] if a != "--no-scheduled-sampling"]
    scheduled_sampling = "--no-scheduled-sampling" not in sys.argv[1:]
    cfg = apply_overrides(Config().validate(), args)
    jax.config.update("jax_default_prng_impl", cfg.runtime.prng_impl)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", file=sys.stderr)

    model = TransformerTTS(cfg.model, **runtime_model_kwargs(cfg))

    k, b = cfg.training.grad_acc_steps, cfg.training.batch_size
    rng = np.random.default_rng(0)
    batch = synthetic_epoch_batch(rng, k, b)

    n_dev = len(jax.devices())
    n_data = n_dev
    while b % n_data:
        n_data -= 1
    mesh = make_mesh(n_data, 1)

    # init at tiny shapes (params are length-independent) to keep the init
    # compile cheap; the real compile happens on the first step() call
    tiny = synthetic_epoch_batch(rng, 1, 2)
    tiny = {
        "phoneme": tiny["phoneme"][:, :, :16],
        "melspec": tiny["melspec"][:, :, :32],
        "phoneme_lens": np.full((1, 2), 16, np.int32),
        "melspec_lens": np.full((1, 2), 32, np.int32),
    }
    t0 = time.perf_counter()
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), tiny)
    state = shard_state(state, mesh)
    print(f"init: {time.perf_counter() - t0:.1f}s | {remaining():.0f}s left",
          file=sys.stderr)
    step = make_train_step(model, cfg, scheduled_sampling=scheduled_sampling, donate=True)

    audio_sec_per_frame = cfg.audio.hop_length / cfg.audio.sample_rate
    key = jax.random.PRNGKey(1)

    with mesh:
        sharded = shard_batch(batch, mesh)
        # compile (persistent-cache hit when warm) + saturate the async
        # dispatch queue so the timed window measures execution, not
        # dispatch (the axon relay acks dispatches long before execution)
        t0 = time.perf_counter()
        state, metrics = step(state, sharded, 0.8, key)
        _ = float(jax.device_get(metrics["total"]))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(6):
            state, metrics = step(state, sharded, 0.8, key)
        _ = float(jax.device_get(metrics["total"]))  # forced readback
        warmup_s = time.perf_counter() - t0
        est_step_s = warmup_s / 6
        print(f"compile: {compile_s:.1f}s warmup: {warmup_s:.1f}s "
              f"(~{est_step_s * 1000:.0f} ms/step) | {remaining():.0f}s left",
              file=sys.stderr)

        # the tunnel adds noisy per-call latency; take the best of up to
        # three timed windows (identical work per step, so max throughput
        # == least-perturbed measurement).  Deadline-aware: size the window
        # to fit, emit after however many windows complete.
        n_steps = max(8, min(40, int((remaining() * 0.25) / max(est_step_s, 1e-3))))
        batches = [synthetic_epoch_batch(rng, k, b) for _ in range(4)]
        shardeds = [shard_batch(x, mesh) for x in batches]
        audio_per_window = sum(
            float(batches[i % len(batches)]["melspec_lens"].sum()) * audio_sec_per_frame
            for i in range(n_steps)
        )
        window_times = []
        for w in range(3):
            need = n_steps * est_step_s * 1.6 + 20.0
            if w > 0 and remaining() < need:
                print(f"skipping window {w + 1}: {remaining():.0f}s left < {need:.0f}s",
                      file=sys.stderr)
                break
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, metrics = step(state, shardeds[i % len(shardeds)], 0.8, key)
            _ = float(jax.device_get(metrics["total"]))  # forces completion
            window_times.append(time.perf_counter() - t0)
            est_step_s = min(est_step_s, window_times[-1] / n_steps)

            # keep the best-so-far result ready for the signal backstop
            elapsed = min(window_times)
            value = audio_per_window / elapsed / n_dev
            _best_result = {
                "metric": "LJSpeech train throughput per chip (batch 16 x accum 4, scheduled sampling)",
                "value": round(value, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
            }
        elapsed = min(window_times)
        audio_seconds = audio_per_window
        print(f"windows ({n_steps} steps each): {[round(w, 2) for w in window_times]}s",
              file=sys.stderr)

    value = audio_seconds / elapsed / n_dev
    details = {
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "n_devices": n_dev,
        "steps_per_s": n_steps / elapsed,
        "step_time_ms": elapsed / n_steps * 1000,
        "audio_s_per_step": audio_seconds / n_steps,
        "compile_s": compile_s,
        "warmup_s": warmup_s,
        "n_windows": len(window_times),
        "steps_per_window": n_steps,
        "effective_batch": k * b,
        "loss_final": float(jax.device_get(metrics["total"])),
        "baseline_estimate_audio_s_per_s": BASELINE_AUDIO_S_PER_S,
        "baseline_note": "analytic RTX-4060 estimate; reference publishes no numbers",
    }
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)
    result = {
        "metric": "LJSpeech train throughput per chip (batch 16 x accum 4, scheduled sampling)",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
    }
    # BENCH_NO_RECORD=1 keeps sweep/variant runs (e.g. tools/tune_paper.sh)
    # from replacing the parity-config replay record with their numbers
    if dev.platform != "cpu" and os.environ.get("BENCH_NO_RECORD") != "1":
        try:
            with open(LAST_GOOD, "w") as f:
                json.dump({**result, "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
                           "details": details}, f, indent=2)
        except Exception:
            pass
    _emit(result)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit something rather than dying silently
        print(f"bench error: {type(e).__name__}: {e}", file=sys.stderr)
        _emit_best_and_exit(f"error: {type(e).__name__}")
