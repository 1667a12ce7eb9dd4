"""On-chip per-component timing breakdown of the training step.

Times each sub-computation of the scheduled-sampling optimizer step in
isolation (encoder, decoder, postnet, no-grad sampling forward, loss+bwd,
optimizer update) at the bench shapes (B=16, T_mel=768, T_phon=128), then
the full k=4 step for reconciliation.  Uses bench.py's methodology:
saturate the async dispatch queue, force a readback, best-of-3 windows.

Run on the real chip:  python tools/profile_step.py
Writes profile_step.json and prints a table.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, args, n=30, windows=3):
    # compile + saturate
    out = None
    for _ in range(8):
        out = fn(*args)
    jax.tree.leaves(jax.device_get(jax.tree.map(lambda x: x.ravel()[0], out)))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.tree.leaves(jax.device_get(jax.tree.map(lambda x: x.ravel()[0], out)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def main():
    from transformertts_tpu.config import Config
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.models.factory import runtime_model_kwargs
    from transformertts_tpu.train import create_train_state, make_train_step
    from transformertts_tpu.train.loss import tts_loss
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = Config().validate()
    jax.config.update("jax_default_prng_impl", cfg.runtime.prng_impl)
    model = TransformerTTS(cfg.model, **runtime_model_kwargs(cfg))

    B, TM, TP = 16, 768, 128
    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 80, (B, TP)), jnp.int32)
    melspec = jnp.asarray(rng.standard_normal((B, TM, 80)) * 0.8, jnp.float32)
    p_lens = jnp.full((B,), TP, jnp.int32)
    m_lens = jnp.full((B,), TM, jnp.int32)
    batch_k = {
        "phoneme": jnp.broadcast_to(phoneme, (4, B, TP)),
        "melspec": jnp.broadcast_to(melspec, (4, B, TM, 80)),
        "phoneme_lens": jnp.broadcast_to(p_lens, (4, B)),
        "melspec_lens": jnp.broadcast_to(m_lens, (4, B)),
    }
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        jax.tree.map(lambda x: np.asarray(x[:1]), batch_k),
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    key = jax.random.PRNGKey(1)
    results = {}

    # --- full optimizer step (k=4, scheduled sampling) ---
    step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    results["full_step_k4_ss"] = _time(
        lambda s, b: step(s, b, 0.8, key)[1]["total"], (state, batch_k))

    # --- full optimizer step (k=4, plain teacher forcing) ---
    step_tf = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    results["full_step_k4_tf"] = _time(
        lambda s, b: step_tf(s, b, 0.8, key)[1]["total"], (state, batch_k))

    # --- one micro-batch: grad of (forward + loss), teacher-forced ---
    def micro_loss(params, mel):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            phoneme, mel, p_lens, m_lens, train=True,
            return_alignments=False, rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        return tts_loss(out, mel, m_lens, cfg.loss.stop_weight,
                        cfg.loss.post_mel_weight)["total"]

    results["micro_fwd_bwd"] = _time(
        jax.jit(lambda p, m: jax.grad(micro_loss)(p, m)["emb"]["embedding"]),
        (state.params, melspec))

    # --- one micro-batch: the no-grad sampling forward (no postnet/aligns) ---
    def fwd1(params, mel):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            phoneme, mel, p_lens, m_lens, train=True,
            return_alignments=False, compute_postnet=False,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return out["pred_melspec"]

    results["micro_fwd1_nograd"] = _time(jax.jit(fwd1), (state.params, melspec))

    # --- encoder alone (fwd+bwd of sum) ---
    def enc_loss(params):
        mem = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            phoneme, p_lens, True, method=TransformerTTS.encode,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )[0]
        return jnp.sum(mem.astype(jnp.float32))

    results["encoder_fwd_bwd"] = _time(
        jax.jit(lambda p: jax.grad(enc_loss)(p)["emb"]["embedding"]),
        (state.params,))

    # --- decoder alone (fwd+bwd), memory fixed ---
    memory = model.apply(
        variables, phoneme, p_lens, False, method=TransformerTTS.encode)

    def dec_loss(params, mem):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            mem, melspec, p_lens, m_lens, True, False,
            method=TransformerTTS.decode,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return jnp.sum(out[0].astype(jnp.float32))

    results["decoder_fwd_bwd"] = _time(
        jax.jit(lambda p, m: jax.grad(dec_loss)(p, m)["emb"]["embedding"]),
        (state.params, memory))

    # --- postnet alone (fwd+bwd) ---
    def post_loss(params, mel):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            mel, method=lambda mdl, x: mdl.postnet(x.astype(mdl.dtype), True),
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32))

    results["postnet_fwd_bwd"] = _time(
        jax.jit(lambda p, m: jax.grad(post_loss, argnums=1)(p, m)),
        (state.params, melspec))

    # --- optimizer update alone ---
    from transformertts_tpu.train.train_step import make_optimizer
    opt = make_optimizer(cfg)
    grads = jax.tree.map(jnp.ones_like, state.params)

    def opt_update(g, os, p):
        u, nos = opt.update(g, os, p)
        import optax
        return optax.apply_updates(p, u), nos

    results["optimizer_update"] = _time(
        jax.jit(opt_update), (grads, state.opt_state, state.params))

    # reconciliation: k*(fwd1 + fwd_bwd) + opt ~ full_step_ss
    recon = 4 * (results["micro_fwd1_nograd"] + results["micro_fwd_bwd"]) + \
        results["optimizer_update"]
    results["_reconstructed_ss_ms"] = recon

    dev = jax.devices()[0]
    results["_device"] = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    with open("profile_step.json", "w") as f:
        json.dump(results, f, indent=2)
    width = max(len(k) for k in results)
    for k, v in results.items():
        print(f"{k:<{width}}  {v if isinstance(v, str) else f'{v:8.2f} ms'}",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
