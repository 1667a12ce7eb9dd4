"""Training orchestration — the runtime the reference delegates to
pytorch-lightning (ref: train.py:14-56, lightning_module.py).

Responsibilities: mesh setup + state sharding, per-epoch teacher-forcing
schedule, bucketed train loop (one jitted step per (phoneme, mel) bucket
shape; compile count is bounded by the bucket grid), validation with the
plot suite, early stopping (patience on val_loss, ref train.py:31-36),
orbax checkpoint/resume, throughput accounting in audio-seconds/s (the
BASELINE.json metric), optional jax.profiler traces.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np

from transformertts_tpu.config import Config
from transformertts_tpu.data import BucketedLoader, LJSpeechDataset
from transformertts_tpu.infer import make_decode_fn
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.models.factory import runtime_model_kwargs
from transformertts_tpu.parallel import make_mesh, shard_batch, shard_state
from transformertts_tpu.train.checkpoint import CheckpointManager
from transformertts_tpu.train.schedules import noam_schedule, teacher_forcing_ratio
from transformertts_tpu.train.train_step import (
    count_params,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from transformertts_tpu.utils import log_step_info, setup_logger
from transformertts_tpu.utils import plot as plots


class Trainer:
    def __init__(self, cfg: Config, exp_dir: str | Path, resume: bool = True,
                 profile_steps: int = 0):
        from transformertts_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        jax.config.update("jax_default_prng_impl", cfg.runtime.prng_impl)
        self.profile_steps = profile_steps
        self.cfg = cfg
        self.exp_dir = Path(exp_dir)
        self.log = setup_logger(str(self.exp_dir / "train.log"))
        self.model = TransformerTTS(cfg.model, **runtime_model_kwargs(cfg))

        r = cfg.runtime
        avail = len(jax.devices()) // r.mesh_model
        n_data = avail if r.mesh_data == -1 else min(r.mesh_data, avail)
        # the sharded batch axis must divide evenly over 'data'
        while cfg.training.batch_size % n_data:
            n_data -= 1
        self.mesh = make_mesh(n_data, r.mesh_model)
        self.log.info("mesh: %s over %d devices", dict(self.mesh.shape), self.mesh.size)

        self._build_data()
        self._build_state(resume)
        self.train_step_ss = make_train_step(
            self.model, cfg, scheduled_sampling=True, return_mixed_inputs=True
        )
        self.train_step_tf = make_train_step(self.model, cfg, scheduled_sampling=False)
        self.eval_step = make_eval_step(self.model, cfg, with_outputs=True)
        self.decode = make_decode_fn(self.model, cfg)
        self.audio_sec_per_frame = cfg.audio.hop_length / cfg.audio.sample_rate

    def _build_data(self):
        cfg = self.cfg
        train_ds = LJSpeechDataset(cfg.path.preprocessed, "train")
        val_ds = LJSpeechDataset(cfg.path.preprocessed, "val")
        common = dict(
            phoneme_buckets=cfg.runtime.phoneme_buckets,
            mel_buckets=cfg.runtime.mel_buckets,
            n_mels=cfg.model.n_mels,
            seed=cfg.training.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            n_threads=cfg.training.num_workers,
        )
        self.train_loader = BucketedLoader(
            train_ds, cfg.training.batch_size,
            grad_acc_steps=cfg.training.grad_acc_steps,
            shuffle=True, drop_last=True, **common,
        )
        self.val_loader = BucketedLoader(
            val_ds, cfg.training.batch_size, grad_acc_steps=1,
            shuffle=False, drop_last=False, **common,
        )
        self.log.info(
            "data: %d train / %d val items, %d train batches/epoch",
            len(train_ds), len(val_ds), self.train_loader.batches_per_epoch(),
        )

    def _build_state(self, resume: bool):
        cfg = self.cfg
        example = next(iter(self.train_loader.epoch(0)))
        state = create_train_state(
            self.model, cfg, jax.random.PRNGKey(cfg.training.seed), example
        )
        self.ckpt = CheckpointManager(self.exp_dir / "checkpoints")
        self.ckpt_best = (
            CheckpointManager(self.exp_dir / "checkpoints_best", max_to_keep=1)
            if cfg.training.keep_best_metric
            else None
        )
        self.start_epoch = 0
        if resume:
            # adopt_ema=False: resumed EMA-off training must not adopt a
            # disk EMA into its state (it would decay to the live params in
            # one step and permanently change the checkpoint layout)
            restored, epoch = self.ckpt.restore(state, adopt_ema=False)
            if restored is not None:
                state, self.start_epoch = restored, epoch
        self.state = shard_state(state, self.mesh)
        self.log.info("model parameters: %.2fM", count_params(state.params) / 1e6)
        self.noam = noam_schedule(cfg.model.d_model, cfg.training.warmup_steps)
        # guided-attention annealing (loss.guided_attn_anneal_at_diag): the
        # epoch the linear decay began, or None while the trigger hasn't
        # fired.  Recovered from history.json on resume.
        self.ga_anneal_start: int | None = None
        self.prev_history: list[dict] = []
        hist_path = self.exp_dir / "history.json"
        if self.start_epoch > 0 and hist_path.exists():
            with open(hist_path) as f:
                self.prev_history = [
                    h for h in json.load(f) if h.get("epoch", 1 << 30) < self.start_epoch
                ]
            self.ga_anneal_start = self._recover_anneal_start(
                self.prev_history, cfg.loss
            )

    # ------------------------------------------------------------------ train

    def train_epoch(self, epoch: int, profile_steps: int = 0) -> dict:
        """One epoch; ``profile_steps > 0`` captures a jax.profiler trace of
        that many steps into <exp_dir>/profile (SURVEY.md §5.1 — the
        reference has no tracing)."""
        cfg = self.cfg
        p_tf = teacher_forcing_ratio(
            epoch, cfg.training.num_epochs, cfg.training.teacher_forcing_mode,
            cfg.training.teacher_forcing_warmup_epochs,
        )
        use_ss = p_tf < 1.0
        step_fn = self.train_step_ss if use_ss else self.train_step_tf
        rng = jax.random.PRNGKey(cfg.training.seed + 1000 + epoch)
        ga_w = self._guided_weight(epoch)
        # only thread the traced override when annealing is live (keeps the
        # 4-arg trace — and the persistent compile cache — for normal runs)
        extra = () if ga_w is None else (ga_w,)

        step_metrics, n_steps = [], 0
        audio_seconds = 0.0
        profiling = False
        t_start = time.perf_counter()
        from transformertts_tpu.data.prefetch import prefetch

        with self.mesh:
            for batch in prefetch(self.train_loader.epoch(epoch)):
                if profile_steps and n_steps == 1 and not profiling:
                    jax.profiler.start_trace(str(self.exp_dir / "profile"))
                    profiling = True
                audio_seconds += float(batch["melspec_lens"].sum()) * self.audio_sec_per_frame
                sharded = shard_batch(
                    batch, self.mesh,
                    shard_sequence=self.cfg.runtime.shard_sequence,
                )
                if use_ss:
                    self.state, metrics, mixed = step_fn(
                        self.state, sharded, p_tf, rng, *extra
                    )
                else:
                    self.state, metrics = step_fn(
                        self.state, sharded, p_tf, rng, *extra
                    )
                n_steps += 1
                if profiling and n_steps >= 1 + profile_steps:
                    jax.block_until_ready(metrics["total"])
                    jax.profiler.stop_trace()
                    profiling = False
                # metrics stay ON DEVICE here — a per-step device_get would
                # force a tunnel round trip per step; they are fetched in
                # one transfer at epoch end (scalars, so holding an epoch's
                # worth costs nothing)
                step_metrics.append(metrics)
                if n_steps % cfg.training.log_interval == 0:
                    metrics = jax.device_get(metrics)
                    step_now = int(jax.device_get(self.state.step))
                    elapsed = time.perf_counter() - t_start
                    log_step_info(
                        self.log, epoch, step_now, metrics,
                        float(self.noam(step_now)), audio_seconds / elapsed,
                    )
                    # train-time scheduled-sampling dump from the ACTUAL
                    # mixed batch (ref: lightning_module.py:82 writes
                    # plot_mels_scheduled every log_interval train batches)
                    if use_ss and jax.process_index() == 0:
                        plots.plot_mels_scheduled(
                            jax.device_get(mixed), batch["melspec"][0],
                            batch["melspec_lens"][0],
                            self.exp_dir / "mels_scheduled"
                            / f"epoch_{epoch:04d}_step_{step_now:06d}.png",
                        )

        fetched = jax.device_get(step_metrics)
        totals: dict[str, float] = {}
        for m in fetched:
            for name, val in m.items():
                totals[name] = totals.get(name, 0.0) + float(val)

        skipped = totals.get("skipped", 0.0)
        if skipped:
            self.log.warning(
                "epoch %d: %d non-finite steps skipped (failure guard)",
                epoch, int(skipped),
            )
            if skipped > 0.5 * max(n_steps, 1):
                raise RuntimeError(
                    f"over half of epoch {epoch}'s steps were non-finite — aborting"
                )
        if profiling:  # epoch shorter than profile window
            jax.profiler.stop_trace()
        elapsed = time.perf_counter() - t_start
        avg = {name: v / max(n_steps, 1) for name, v in totals.items()}
        avg["audio_s_per_s"] = audio_seconds / elapsed
        avg["p_tf"] = p_tf
        if ga_w is not None:
            avg["ga_w"] = float(ga_w)
            # exact trigger epoch for resume recovery (ga_w alone is
            # ambiguous while the decay fraction is still 0)
            avg["ga_anneal_start"] = self.ga_anneal_start
        self.log.info(
            "epoch %d done: loss %.4f | p_tf %.3f | %.1f audio-s/s",
            epoch, avg.get("total", float("nan")), p_tf, avg["audio_s_per_s"],
        )
        return avg

    @staticmethod
    def _recover_anneal_start(prev_history: list[dict], loss_cfg) -> int | None:
        """Recover the anneal trigger epoch from a resumed history.

        Prefers the explicit ``ga_anneal_start`` record (written since
        round 4 — exact even for epochs where the decay fraction is still
        0); falls back to inverting the linear decay from the first row
        whose ``ga_w`` dropped below the base weight (legacy histories)."""
        base = loss_cfg.guided_attn_weight
        for h in prev_history:
            if h.get("ga_anneal_start") is not None:
                return int(h["ga_anneal_start"])
            if "ga_w" in h and h["ga_w"] < base:
                frac = 1.0 - h["ga_w"] / base
                return int(round(
                    h["epoch"] - frac * loss_cfg.guided_attn_anneal_epochs
                ))
        return None

    def _guided_weight(self, epoch: int) -> float | None:
        """Per-epoch guided-attention weight under diagonality-triggered
        annealing; None when annealing is off (static cfg weight applies)."""
        loss_cfg = self.cfg.loss
        if loss_cfg.guided_attn_anneal_at_diag <= 0.0 or loss_cfg.guided_attn_weight <= 0.0:
            return None
        if self.ga_anneal_start is None:
            return loss_cfg.guided_attn_weight
        frac = (epoch - self.ga_anneal_start) / max(loss_cfg.guided_attn_anneal_epochs, 1)
        return loss_cfg.guided_attn_weight * max(1.0 - frac, 0.0)

    # ------------------------------------------------------------------- val

    def validate(self, epoch: int) -> tuple[float, dict]:
        totals, n = {}, 0
        first = True
        with self.mesh:
            for batch in self.val_loader.epoch(0):
                micro = {name: arr[0] for name, arr in batch.items()}
                metrics, out = self.eval_step(self.state, micro)
                for name, val in jax.device_get(metrics).items():
                    totals[name] = totals.get(name, 0.0) + float(val)
                n += 1
                if first and jax.process_index() == 0:
                    self._plot_validation(epoch, micro, jax.device_get(out))
                    first = False
        avg = {name: v / max(n, 1) for name, v in totals.items()}
        avg.update(self._free_running_eval(epoch))
        self.log.info(
            "epoch %d val: loss %.4f | mel_l1 %.4f | diagonality %.3f | "
            "free mel_l1 %.4f mcd %.2f mcd_dtw %.2f len %.2f",
            epoch, avg.get("total", float("nan")), avg.get("mel_l1", float("nan")),
            avg.get("diagonality", float("nan")),
            avg.get("free_mel_l1", float("nan")), avg.get("free_mcd", float("nan")),
            avg.get("free_mcd_dtw", float("nan")),
            avg.get("free_len_ratio", float("nan")),
        )
        return avg.get("total", float("inf")), avg

    def _plot_validation(self, epoch: int, batch: dict, out: dict):
        e = self.exp_dir
        plots.plot_mels_batch(
            out["post_melspec"], batch["melspec"], batch["melspec_lens"],
            e / "mels_batch" / f"epoch_{epoch:04d}.png",
        )
        plots.plot_alignments_batch(
            out["alignments"], batch["melspec_lens"], batch["phoneme_lens"],
            e / "align_batch" / f"epoch_{epoch:04d}.png",
        )
        plots.plot_alignment_single(
            out["alignments"], batch["melspec_lens"][0], batch["phoneme_lens"][0],
            e / "align_single" / f"epoch_{epoch:04d}.png",
        )

    def _free_running_eval(self, epoch: int, n_samples: int = 4) -> dict:
        """Free-running decode on cached val samples: plot one
        (ref: lightning_module.py:146-157) AND return autoregressive
        quality metrics — the train/inference-mismatch signal the
        teacher-forced val loss cannot see (the reference's free-running
        quality is only ever eyeballed, readme.md:43-47)."""
        if jax.process_index() != 0 or len(self.val_loader.ds) == 0:
            return {}
        n = min(n_samples, len(self.val_loader.ds))
        items = [self.val_loader.ds[i] for i in range(n)]
        t_phon = self.cfg.runtime.phoneme_buckets[-1]
        phoneme = np.zeros((n, t_phon), np.int32)
        lens = np.zeros((n,), np.int32)
        for i, item in enumerate(items):
            seq = item["sequence"][:t_phon]
            phoneme[i, : len(seq)] = seq
            lens[i] = len(seq)
        out = jax.device_get(
            self.decode(
                {"params": self.state.eval_params, "batch_stats": self.state.batch_stats},
                phoneme, lens,
            )
        )
        n_frames = max(int(out["n_frames"]), 1)
        plots.plot_mels_single(
            out["post_melspec"][0, :n_frames], items[0]["melspec"],
            self.exp_dir / "mels_single" / f"epoch_{epoch:04d}.png",
        )

        # metrics over min(pred_len, true_len); decode already returns the
        # per-row stop-vote lengths (infer/decode.py:per_row_lengths)
        mel_l1, mcd, mcd_d, len_ratio = [], [], [], []
        from transformertts_tpu.train.metrics import (
            mcd_dtw,
            mel_cepstral_distortion,
        )

        for i, item in enumerate(items):
            pred_len = max(int(out["n_frames_per_row"][i]), 1)
            true = item["melspec"]  # (T, n_mels)
            m = min(pred_len, true.shape[0])
            pred = out["post_melspec"][i, :m]
            mel_l1.append(float(np.abs(pred - true[:m]).mean()))
            mcd.append(float(mel_cepstral_distortion(
                pred[None], true[None, :m], np.array([m], np.int32)
            )))
            # DTW-aligned MCD over the FULL prediction (no crop): free
            # decode has no timing anchor, so the frame-wise number above
            # confounds pacing drift with spectral error (metrics.mcd_dtw)
            mcd_d.append(mcd_dtw(out["post_melspec"][i, :pred_len], true))
            len_ratio.append(pred_len / max(true.shape[0], 1))
        return {
            "free_mel_l1": float(np.mean(mel_l1)),
            "free_mcd": float(np.mean(mcd)),
            "free_mcd_dtw": float(np.mean(mcd_d)),
            "free_len_ratio": float(np.mean(len_ratio)),
        }

    # ------------------------------------------------------------------- fit

    def fit(self) -> dict:
        cfg = self.cfg
        best_val, patience = float("inf"), 0
        history = list(self.prev_history)  # resumed runs keep earlier epochs
        # best-checkpoint retention: resumed runs recover the incumbent best
        # from history so the extension can't overwrite a better checkpoint
        # with a worse one (training.keep_best_metric, lower is better)
        best_metric_name = cfg.training.keep_best_metric
        best_metric = min(
            (h[best_metric_name] for h in history if best_metric_name in h),
            default=float("inf"),
        ) if self.ckpt_best is not None else float("inf")
        if self.ga_anneal_start is not None:
            self.log.info(
                "guided-attn anneal recovered from history: started epoch %d",
                self.ga_anneal_start,
            )
        for epoch in range(self.start_epoch, cfg.training.num_epochs):
            train_metrics = self.train_epoch(
                epoch, self.profile_steps if epoch == self.start_epoch else 0
            )
            val_loss, val_metrics = self.validate(epoch)
            thresh = cfg.loss.guided_attn_anneal_at_diag
            if (
                thresh > 0.0
                and self.ga_anneal_start is None
                and val_metrics.get("diagonality", 0.0) >= thresh
            ):
                # alignment has formed — hand the rest of training to the
                # reference's exact loss via a linear decay of the guided term
                self.ga_anneal_start = epoch + 1
                self.log.info(
                    "val diagonality %.3f >= %.2f at epoch %d: guided-attn "
                    "weight anneals to 0 over epochs %d-%d",
                    val_metrics["diagonality"], thresh, epoch,
                    self.ga_anneal_start,
                    self.ga_anneal_start + cfg.loss.guided_attn_anneal_epochs - 1,
                )
            if "ga_anneal_start" in train_metrics:
                # the trigger fires after train_epoch: make the trigger
                # epoch's own row already carry it for resume recovery
                train_metrics["ga_anneal_start"] = self.ga_anneal_start
            history.append({
                "epoch": epoch, **train_metrics, "val_loss": val_loss,
                **{f"val_{k}": v for k, v in val_metrics.items() if k != "total"},
            })

            if jax.process_index() == 0:
                self.ckpt.save(int(jax.device_get(self.state.step)), self.state, epoch + 1)
                with open(self.exp_dir / "history.json", "w") as f:
                    json.dump(history, f, indent=2)
                row_metric = history[-1].get(best_metric_name)
                if (
                    self.ckpt_best is not None
                    and row_metric is not None
                    and row_metric < best_metric
                ):
                    best_metric = row_metric
                    self.ckpt_best.save(
                        int(jax.device_get(self.state.step)), self.state, epoch + 1
                    )
                    self.log.info(
                        "new best %s %.4f at epoch %d -> checkpoints_best/",
                        best_metric_name, row_metric, epoch,
                    )

            if val_loss < best_val:
                best_val, patience = val_loss, 0
            else:
                patience += 1
                if patience >= cfg.training.max_patience:  # ref: train.py:31-36
                    self.log.info("early stopping at epoch %d (patience %d)",
                                  epoch, patience)
                    break
        # "epochs" counts epochs trained by THIS call — history also carries
        # the resumed epochs so the anneal trigger survives restarts
        out = {"best_val": best_val,
               "epochs": len(history) - len(self.prev_history)}
        if self.ckpt_best is not None and best_metric != float("inf"):
            out["best_" + best_metric_name] = best_metric
        return out
