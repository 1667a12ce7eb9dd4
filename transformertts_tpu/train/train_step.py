"""Jitted training/eval steps.

One call == one optimizer step == ``grad_acc_steps`` micro-batches scanned
inside the jit (ref: Lightning accumulate_grad_batches=4, train.py:42) —
gradients are averaged, then clip(1.0) -> Adam(0.9, 0.98, 1e-9) with L2
weight decay folded into the gradient (torch Adam semantics) x Noam LR
(ref: lightning_module.py:160-177).

Scheduled sampling follows the reference's two-forward recipe
(lightning_module.py:53-77): a gradient-free train-mode forward produces
``pred_melspec`` (BatchNorm running stats update, dropout active), block-wise
mixing replaces GT frames, then the real forward + loss.  Both forwards live
in the same jit; the first skips postnet/alignments (its outputs are unused).

Everything is mesh-agnostic: pass sharded arrays + sharded TrainState and
GSPMD inserts the collectives (grad allreduce over ICI for DP).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from transformertts_tpu.config import Config
from transformertts_tpu.models.tts import TransformerTTS
from transformertts_tpu.train.loss import (
    alignment_diagonality,
    guided_attention_loss,
    tts_loss,
)
from transformertts_tpu.train.sampling import apply_teacher_forcing


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    # EMA copy of ``params`` (training.ema_decay > 0), else None — None has
    # no pytree leaves, so disabled runs keep the exact round-1..4
    # checkpoint layout (CheckpointManager fills the field on old files).
    ema_params: core.FrozenDict | None = None

    @property
    def eval_params(self):
        """Parameters to use for validation/inference: the EMA copy when
        one is maintained, else the live parameters."""
        return self.params if self.ema_params is None else self.ema_params


def make_optimizer(cfg: Config):
    from transformertts_tpu.train.schedules import noam_schedule

    t = cfg.training
    opt = optax.chain(
        optax.clip_by_global_norm(t.max_grad_norm),
        optax.add_decayed_weights(t.weight_decay),  # torch Adam weight_decay
        optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9),
        optax.scale_by_schedule(noam_schedule(cfg.model.d_model, t.warmup_steps)),
        optax.scale(-1.0),
    )
    if cfg.runtime.fused_optimizer and cfg.runtime.mesh_model == 1:
        # every transform above is elementwise or a global scalar, so running
        # the update over ONE raveled vector is equivalent (modulo summation
        # order inside the global-norm clip) — but replaces ~100 tiny
        # per-leaf kernels with a handful of long ones.  Disabled under
        # tensor parallelism: a flat vector cannot carry per-param shardings
        # (moments would gather over the model axis).
        opt = optax.flatten(opt)
    return opt


def create_train_state(
    model: TransformerTTS,
    cfg: Config,
    rng: jax.Array,
    example_batch: dict,
    optimizer=None,
) -> TrainState:
    micro = jax.tree.map(lambda x: x[0] if x.ndim > 1 else x, example_batch)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        micro["phoneme"],
        micro["melspec"],
        micro["phoneme_lens"],
        micro["melspec_lens"],
        train=False,
    )
    optimizer = optimizer or make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        opt_state=optimizer.init(variables["params"]),
        ema_params=(
            jax.tree.map(jnp.copy, variables["params"])
            if cfg.training.ema_decay > 0.0 else None
        ),
    )


def _micro_loss(
    model: TransformerTTS,
    cfg: Config,
    params,
    batch_stats,
    batch: dict,
    p_tf,
    rng: jax.Array,
    scheduled_sampling: bool,
    ga_w=None,  # traced guided-attn weight override (None = cfg constant)
):
    phoneme = batch["phoneme"]
    melspec = batch["melspec"]
    p_lens = batch["phoneme_lens"]
    m_lens = batch["melspec_lens"]
    r1, r2, r_mask = jax.random.split(rng, 3)

    target_in = melspec
    if scheduled_sampling:
        # forward #1: gradient-free, train-mode (dropout + BN updates), no postnet
        out1, upd1 = model.apply(
            {"params": jax.lax.stop_gradient(params), "batch_stats": batch_stats},
            phoneme, melspec, p_lens, m_lens,
            train=True, return_alignments=False, compute_postnet=False,
            rngs={"dropout": r1}, mutable=["batch_stats"],
        )
        batch_stats = upd1["batch_stats"]
        target_in = apply_teacher_forcing(
            r_mask, out1["pred_melspec"], melspec, m_lens, p_tf,
            cfg.training.scheduled_sampling_block,
        )

    need_align = cfg.loss.guided_attn_weight > 0.0
    if ga_w is None:
        ga_w = cfg.loss.guided_attn_weight

    def loss_fn(p):
        out, upd = model.apply(
            {"params": p, "batch_stats": batch_stats},
            phoneme, target_in, p_lens, m_lens,
            train=True, return_alignments=need_align,
            rngs={"dropout": r2}, mutable=["batch_stats"],
        )
        losses = tts_loss(
            out, melspec, m_lens, cfg.loss.stop_weight, cfg.loss.post_mel_weight,
            cfg.loss.stop_gate_k,
        )
        total = losses["total"]
        if need_align:
            ga = guided_attention_loss(
                out["alignments"], m_lens, p_lens, cfg.loss.guided_attn_sigma
            )
            losses["guided_attn"] = ga
            total = total + ga_w * ga
        losses["total"] = total
        return total, (losses, upd["batch_stats"])

    grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
    return grads, losses, new_stats, target_in


def make_train_step(
    model: TransformerTTS,
    cfg: Config,
    optimizer=None,
    scheduled_sampling: bool = True,
    donate: bool = True,
    return_mixed_inputs: bool = False,
) -> Callable:
    """Returns jitted fn(state, batch, p_tf, rng) -> (state, metrics).

    ``batch`` arrays carry a leading ``grad_acc_steps`` axis:
    phoneme (K, B, T_p) int32; melspec (K, B, T_m, n_mels) float32;
    phoneme_lens/melspec_lens (K, B) int32.

    ``return_mixed_inputs=True`` additionally returns the scheduled-sampling
    mixed decoder inputs of the FIRST micro-batch, (B, T_m, n_mels), so the
    trainer can dump the reference's train-time ``plot_mels_scheduled``
    from the actual training batch (ref: lightning_module.py:82) — the
    array is already computed inside the step; the host transfer only
    happens when the trainer device_gets it at log_interval.
    """
    optimizer = optimizer or make_optimizer(cfg)

    def step_fn(state: TrainState, batch: dict, p_tf, rng: jax.Array, ga_w=None):
        # ``ga_w`` (optional traced scalar) overrides cfg.loss.guided_attn_weight
        # so the trainer can anneal the guided term per-epoch without a
        # recompile (guided_attn_anneal_at_diag); None keeps the static weight.
        k = batch["phoneme"].shape[0]
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), k)

        def micro_step(carry, xs):
            # xs/carry shapes are kept IDENTICAL to the plain step when
            # return_mixed_inputs is off (mixed slot is None, which
            # flattens away) so the persistent compile cache still hits
            acc_grads, batch_stats, mixed0 = carry
            if return_mixed_inputs:
                micro_batch, micro_rng, idx = xs
            else:
                micro_batch, micro_rng = xs
            grads, losses, batch_stats, target_in = _micro_loss(
                model, cfg, state.params, batch_stats, micro_batch, p_tf,
                micro_rng, scheduled_sampling, ga_w,
            )
            acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
            if return_mixed_inputs:
                # keep only micro-batch 0's mixed inputs in the carry —
                # stacking all K as a scan output would materialize a
                # (K, B, T, C) buffer of which (K-1)/K is dead
                mixed0 = jnp.where(idx == 0, target_in, mixed0)
            return (acc_grads, batch_stats, mixed0), losses

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        if return_mixed_inputs:
            mixed_init = jnp.zeros_like(batch["melspec"][0])
            xs = (batch, rngs, jnp.arange(k))
        else:
            mixed_init, xs = None, (batch, rngs)
        import os

        unroll = int(os.environ.get("TTS_ACCUM_UNROLL", "1"))
        (acc_grads, new_stats, mixed), losses = jax.lax.scan(
            micro_step, (zero_grads, state.batch_stats, mixed_init), xs,
            unroll=unroll if unroll > 1 and k % unroll == 0 else 1,
        )
        grads = jax.tree.map(lambda g: g / k, acc_grads)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {name: jnp.mean(val) for name, val in losses.items()}
        grad_norm = optax.global_norm(grads)
        metrics["grad_norm"] = grad_norm

        # failure detection (SURVEY.md §5.3 — absent in the reference): a
        # non-finite loss/grad step is skipped wholesale instead of
        # poisoning the parameters; the trainer logs/aborts on repeats.
        ok = jnp.isfinite(grad_norm) & jnp.isfinite(metrics["total"])
        keep = lambda new, old: jax.tree.map(  # noqa: E731
            lambda n, o: jnp.where(ok, n, o), new, old
        )
        metrics["skipped"] = (~ok).astype(jnp.float32)

        if state.ema_params is not None:
            # EMA trails the POST-update params; under the skip guard the
            # whole ema update is reverted along with everything else
            d = cfg.training.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, new_params
            )
            new_ema = keep(new_ema, state.ema_params)
        else:
            new_ema = None
        new_state = state.replace(
            step=state.step + 1,
            params=keep(new_params, state.params),
            batch_stats=keep(new_stats, state.batch_stats),
            opt_state=keep(new_opt_state, state.opt_state),
            ema_params=new_ema,
        )
        if return_mixed_inputs:
            return new_state, metrics, mixed
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: TransformerTTS, cfg: Config, with_outputs: bool = False):
    """Teacher-forced validation step (ref: lightning_module.py:102-131)."""

    def eval_fn(state: TrainState, batch: dict):
        out = model.apply(
            {"params": state.eval_params, "batch_stats": state.batch_stats},
            batch["phoneme"], batch["melspec"],
            batch["phoneme_lens"], batch["melspec_lens"],
            train=False, return_alignments=True,
        )
        losses = tts_loss(
            out, batch["melspec"], batch["melspec_lens"],
            cfg.loss.stop_weight, cfg.loss.post_mel_weight,
            cfg.loss.stop_gate_k,
        )
        metrics = dict(losses)
        metrics["diagonality"] = alignment_diagonality(
            out["alignments"], batch["melspec_lens"], batch["phoneme_lens"]
        )
        mel_l1 = jnp.abs(out["post_melspec"] - batch["melspec"])
        from transformertts_tpu.models.masks import lengths_to_valid_mask
        from transformertts_tpu.train.metrics import (
            mel_cepstral_distortion,
            stop_token_metrics,
        )

        valid = lengths_to_valid_mask(batch["melspec_lens"], mel_l1.shape[1])[:, :, None]
        metrics["mel_l1"] = jnp.sum(jnp.where(valid, mel_l1, 0.0)) / jnp.maximum(
            jnp.sum(valid) * mel_l1.shape[-1], 1
        )
        metrics["mcd"] = mel_cepstral_distortion(
            out["post_melspec"], batch["melspec"], batch["melspec_lens"]
        )
        metrics.update(
            stop_token_metrics(out["pred_stop"], batch["melspec_lens"])
        )
        if with_outputs:
            return metrics, out
        return metrics

    return jax.jit(eval_fn, static_argnums=())


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
