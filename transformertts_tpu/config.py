"""Typed, validated configuration system.

The reference passes a raw ``yaml.safe_load`` dict around with no schema
(ref: train.py:16, config.yaml:1-62, lightning_module.py:30).  Here the same
YAML keys map onto frozen dataclasses with validation, defaults identical to
the reference's ``config.yaml``, plus a TPU-specific ``runtime`` section
(mesh axes, dtype policy, Pallas toggles, length buckets) the reference has
no equivalent for.

Dotted CLI overrides are supported: ``load_config(path, overrides=["training.batch_size=32"])``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml


@dataclass(frozen=True)
class PathConfig:
    # ref: config.yaml:4-7
    data: str = "data/LJSpeech-1.1"
    preprocessed: str = "preprocessed"
    experiment: str = "experiment"


@dataclass(frozen=True)
class AudioConfig:
    # ref: config.yaml:12-20
    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    fmin: float = 0.0
    fmax: float = 8000.0
    n_mels: int = 80
    normalize_mel: bool = True

    def validate(self) -> None:
        if self.win_length > self.n_fft:
            raise ValueError("win_length must be <= n_fft")
        if not 0 <= self.fmin < self.fmax <= self.sample_rate / 2:
            raise ValueError("need 0 <= fmin < fmax <= sr/2")
        if self.hop_length <= 0 or self.n_mels <= 0:
            raise ValueError("hop_length and n_mels must be positive")


@dataclass(frozen=True)
class ModelConfig:
    # ref: config.yaml:25-42 and TransformerTTS.__init__ defaults
    # (model/model.py:139-160: n_phon=100, n_mels=80 exist only as Python defaults)
    encoder_prenet_n_layers: int = 3
    encoder_prenet_kernel_size: int = 5
    encoder_prenet_dropout: float = 0.5
    encoder_n_layers: int = 3
    encoder_n_head: int = 4
    encoder_d_ffn: int = 1024
    encoder_dropout: float = 0.1
    decoder_prenet_dropout: float = 0.5
    decoder_n_layers: int = 3
    decoder_n_head: int = 4
    decoder_d_ffn: int = 1024
    decoder_dropout: float = 0.1
    postnet_n_layers: int = 5
    postnet_kernel_size: int = 5
    postnet_dropout: float = 0.5
    d_model: int = 256
    n_phon: int = 100
    n_mels: int = 80
    max_len: int = 5000  # positional-encoding table size (ref: model/model.py:76)
    # dropout inside the shared scaled-PE module; the reference hard-codes
    # 0.1 regardless of encoder_dropout (ref: model/model.py:75,184)
    pe_dropout: float = 0.1
    # Frames emitted per decoder step ("reduction factor", Tacotron/paper
    # trick; reference is r=1).  r>1 runs the decoder on T/r positions:
    # ~r x fewer decode steps and a shorter self-attention — an opt-in
    # speed/quality trade-off.  Mel lengths/buckets must be multiples of r.
    reduction_factor: int = 1

    def validate(self) -> None:
        for side, heads in (("encoder", self.encoder_n_head), ("decoder", self.decoder_n_head)):
            if self.d_model % heads != 0:
                raise ValueError(f"d_model={self.d_model} not divisible by {side}_n_head={heads}")
        if self.postnet_n_layers < 2:
            raise ValueError("postnet needs >= 2 layers")
        for name in ("encoder_prenet_kernel_size", "postnet_kernel_size"):
            if getattr(self, name) % 2 != 1:
                raise ValueError(f"{name} must be odd for same-padding")
        if self.reduction_factor < 1:
            raise ValueError("reduction_factor must be >= 1")


@dataclass(frozen=True)
class TrainingConfig:
    # ref: config.yaml:47-58
    seed: int = 42
    batch_size: int = 16
    num_workers: int = 4
    weight_decay: float = 1e-6
    max_patience: int = 50
    num_epochs: int = 300
    max_grad_norm: float = 1.0
    warmup_steps: int = 4000
    grad_acc_steps: int = 4
    log_interval: int = 100
    teacher_forcing_mode: str = "linear"  # linear | cosine | constant
    teacher_forcing_warmup_epochs: int = 10
    scheduled_sampling_block: int = 8  # L_bar (ref: utils/util.py:117)
    # Exponential moving average of the parameters (opt-in; not in the
    # reference).  When > 0, an EMA copy is updated every optimizer step
    # (ema = d*ema + (1-d)*params) and used for validation, free-running
    # eval, and synthesis — a standard stabilizer for autoregressive
    # inference quality.  0.0 = off (reference semantics).
    ema_decay: float = 0.0
    # Best-checkpoint retention (round 5; not in the reference, which keeps
    # only Lightning's implicit last checkpoint).  Alongside the rolling
    # latest-3 under checkpoints/, the trainer keeps the single best
    # checkpoint by this LOWER-IS-BETTER history metric under
    # checkpoints_best/.  Motivated by the measured stacked-flagship
    # trajectory: free MCD-DTW peaked at epoch 100 (10.56) and regressed to
    # 19.4 by epoch 200 — rolling retention alone deletes the best model.
    # "" disables; "val_loss" tracks the early-stopping metric instead.
    keep_best_metric: str = "val_free_mcd_dtw"

    def validate(self) -> None:
        if self.teacher_forcing_mode not in ("linear", "cosine", "constant"):
            raise ValueError(f"bad teacher_forcing_mode: {self.teacher_forcing_mode}")
        if self.batch_size <= 0 or self.grad_acc_steps <= 0:
            raise ValueError("batch_size and grad_acc_steps must be positive")
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in [0, 1): {self.ema_decay}")


@dataclass(frozen=True)
class LossConfig:
    # ref: config.yaml:60-61, loss.py:10
    stop_weight: float = 8.0
    post_mel_weight: float = 0.5  # ref: loss.py:40
    # Guided-attention loss (not in the reference; BASELINE.json config 5)
    guided_attn_weight: float = 0.0
    guided_attn_sigma: float = 0.4
    # Annealing: once mean val diagonality first reaches this threshold,
    # the guided weight decays linearly to 0 over ``guided_attn_anneal_epochs``
    # — training finishes under the reference's exact loss (loss.py:9-55),
    # with the guided term demoted to a formation aid only.  0.0 = off
    # (constant weight, the round-2/3 recipe).
    guided_attn_anneal_at_diag: float = 0.0
    guided_attn_anneal_epochs: int = 20
    # Stop-gate target tolerance: gate=1 over the LAST k valid frames.
    # k=1 is the reference's exact-frame semantics (loss.py:31); k>1 is an
    # opt-in deviation that fattens the positive class (k-fold more positive
    # targets) to stabilize the stop head's recall/pacing.
    stop_gate_k: int = 1

    def validate(self) -> None:
        if self.stop_gate_k < 1:
            raise ValueError("stop_gate_k must be >= 1")
        if self.guided_attn_anneal_epochs < 1:
            raise ValueError("guided_attn_anneal_epochs must be >= 1")
        if not 0.0 <= self.guided_attn_anneal_at_diag <= 1.0:
            raise ValueError("guided_attn_anneal_at_diag must be in [0, 1]")


@dataclass(frozen=True)
class RuntimeConfig:
    """TPU-specific runtime knobs (no reference equivalent; SURVEY.md §5.8)."""

    compute_dtype: str = "bfloat16"  # activations/matmuls; params stay float32
    use_pallas_attention: bool = True  # flash-attention Pallas kernel path
    # batched on-device mel extraction in preprocessing (fused Pallas
    # STFT->mel kernel on TPU, XLA rFFT elsewhere); False = per-clip host
    # numpy (the reference's shape, preprocess.py:96-100)
    use_pallas_mel: bool = False
    # fused residual+dropout+LayerNorm kernel for the transformer sublayers
    # (ops/pallas/fused_ln.py); auto-disabled unless d_model % 128 == 0.
    # measured: 9556 -> 10272 audio-s/s on one v5e (same-session windows)
    use_pallas_fused_ln: bool = True
    # run each attention's in-projections as ONE matmul (q|k|v fused for
    # self-attention, k|v for cross) by concatenating kernels at apply time;
    # param tree/numerics unchanged, dispatch count drops (the d=256 step is
    # latency-bound, PERF.md)
    fuse_qkv_projections: bool = True
    # fused linear->relu->dropout->linear FFN kernel (ops/pallas/fused_ffn.py);
    # the (B, T, d_ffn) intermediate stays in VMEM.  Off by default: measured
    # throughput-NEUTRAL at the parity config (9324 vs 9383 audio-s/s, within
    # tunnel noise — the FFN is a minor term next to attention + convs there).
    # Opt-in for experiments; auto-disabled unless d_model % 128 == 0,
    # d_ffn % 128 == 0, and the backward fits scoped VMEM (fused_ffn_fits).
    use_pallas_fused_ffn: bool = False
    # run the optimizer update over one raveled vector (optax.flatten):
    # equivalent math (modulo clip-reduction order), far fewer kernels;
    # auto-disabled with TP.  Measured NO throughput change at the 8M-param
    # parity config (10,197 vs 10,272 audio-s/s — XLA already fuses the
    # per-leaf updates), so off by default; may help at much larger scale.
    # NOTE: changes opt_state structure — checkpoints don't carry across.
    fused_optimizer: bool = False
    # run each batch-1 decode step as ONE Pallas program with all decoder
    # weights + caches resident in VMEM (ops/pallas/decode_step.py) — the
    # single-stream serving latency path.  Auto-gated: TPU backend, batch
    # <= decode_megakernel_max_batch, VMEM fit (decode_step_fits); larger
    # batches stay on the XLA loop (which amortizes dispatch at B >= 16).
    use_pallas_decode_step: bool = True
    # largest batch the auto gate routes to the (batched) decode megakernel.
    # Hardware A/B (tools/ab_decode_batched.py, ab_decode_batched.json,
    # round 3 after the flat-in-B restructure): megakernel beats the XLA
    # loop 2.17x/2.25x/2.70x/2.90x at B=1/2/4/8 (26.8-35.9 us/frame vs
    # 58-104), 2,587 audio-s/s at B=8.  Batches that fail the VMEM fit
    # (decode_step_fits, batch-scaled caches) fall back to the XLA loop.
    decode_megakernel_max_batch: int = 8
    # PRNG for dropout keys: "rbg" is much cheaper on TPU than the default
    # counter-based threefry (dozens of dropout masks per step); streams
    # differ between impls but statistics are identical.
    # measured: 2319 (threefry+xla-attn) -> 4107 (flash) -> 7067 audio-s/s
    # (flash+rbg) on one v5e chip, reference-parity config.
    prng_impl: str = "rbg"  # "threefry2x32" | "rbg"
    mesh_data: int = -1  # -1 = all devices on the data axis
    mesh_model: int = 1
    # Sequence parallelism (long-context training, SURVEY.md §5.7): shard
    # the mel/phoneme TIME axes over the SAME mesh axis TP uses
    # (Megatron-SP layout).  Pointwise work (prenets, LN, FFN, convs,
    # heads, loss) stays T-sharded — activation memory per device drops
    # ~mesh_model-fold along T — and GSPMD inserts all-gathers where
    # attention needs the full sequence.  Off by default: the reference
    # task's sequences (<=896 frames) don't need it; validated on the
    # 8-device CPU mesh like TP (tests/test_sharding.py).
    shard_sequence: bool = False
    # Static (phoneme, mel) padded-length buckets to bound recompilation
    # under jit (SURVEY.md §7 hard part (v)).
    phoneme_buckets: tuple[int, ...] = (32, 64, 96, 128, 192)
    mel_buckets: tuple[int, ...] = (128, 256, 384, 512, 640, 768, 896)
    infer_max_len: int = 1500  # ref: model/model.py:328
    stop_threshold: float = 0.5
    # Windowed MONOTONIC cross-attention at decode (0 = off, the
    # reference's unconstrained inference).  W > 0 restricts every
    # decoder layer's cross-attention to phoneme positions within
    # [center - W, center + W] of a per-utterance attention center that
    # only moves FORWARD (tracked from the last layer's attention
    # expectation each step).  Directly attacks the free-running failure
    # modes measured on the round-2 checkpoint: pacing drawl and
    # alignment wander/looping.  XLA-loop decode path only.
    decode_attn_window: int = 0
    # Tacotron-2-style inference-time decoder-prenet dropout rate (fresh
    # Bernoulli masks every decode step).  The reference runs the prenet
    # deterministically at inference (model/model.py:342) — 0.0 keeps that.
    # >0 is an opt-in free-running stabilizer: the decoder is forced to
    # lean on the attention context rather than its own (blurry) frame
    # history.  XLA-loop decode path only (megakernel auto-gate turns off).
    infer_prenet_dropout: float = 0.0
    # Speculative multi-frame decode (single-stream, batch-1, XLA loop):
    # draft the next K-1 decoder input frames by linear extrapolation
    # (mel trajectories are smooth), run ONE chunked verify pass over all
    # K positions (the decoder attends the cache + the chunk's own K/V
    # rows), and accept the leading run of drafts whose max-abs error vs
    # the verified previous-group output is <= decode_speculative_tau
    # (normalized-mel units).  Each verify pass costs ~one step of launch
    # overhead (the B=1 bottleneck) but advances by the accepted count,
    # so frames/s scales with the measured acceptance rate.  Accepted
    # outputs were computed from inputs within tau of exact — a bounded
    # input perturbation, NOT bit-exact decode; quality deltas are
    # measured (free MCD-DTW A/B) before any default changes.  0/1 = off.
    decode_speculative_k: int = 0
    decode_speculative_tau: float = 0.15
    # draft model: "linear" extrapolates the trajectory at the feedback
    # stride; "hold" repeats the last frame (more conservative at
    # transients, where linear overshoots).  Measured head-to-head by
    # tools/ab_spec_decode.py.
    decode_speculative_draft: str = "linear"

    def validate(self) -> None:
        if self.compute_dtype not in ("bfloat16", "float32"):
            raise ValueError(f"bad compute_dtype: {self.compute_dtype}")
        if self.prng_impl not in ("threefry2x32", "rbg", "unsafe_rbg"):
            raise ValueError(f"bad prng_impl: {self.prng_impl}")
        if list(self.phoneme_buckets) != sorted(self.phoneme_buckets) or not self.phoneme_buckets:
            raise ValueError("phoneme_buckets must be sorted and non-empty")
        if list(self.mel_buckets) != sorted(self.mel_buckets) or not self.mel_buckets:
            raise ValueError("mel_buckets must be sorted and non-empty")
        if self.decode_speculative_k < 0:
            raise ValueError("decode_speculative_k must be >= 0")
        if self.decode_speculative_tau < 0.0:
            raise ValueError("decode_speculative_tau must be >= 0")
        if self.decode_speculative_draft not in ("linear", "hold"):
            raise ValueError(
                f"bad decode_speculative_draft: {self.decode_speculative_draft}"
            )


@dataclass(frozen=True)
class Config:
    path: PathConfig = field(default_factory=PathConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    def validate(self) -> "Config":
        self.audio.validate()
        self.model.validate()
        self.training.validate()
        self.loss.validate()
        self.runtime.validate()
        if self.model.n_mels != self.audio.n_mels:
            raise ValueError("model.n_mels must equal audio.n_mels")
        r = self.model.reduction_factor
        if any(b % r for b in self.runtime.mel_buckets):
            raise ValueError(
                f"all runtime.mel_buckets must be multiples of reduction_factor {r}"
            )
        if self.runtime.infer_max_len % r:
            raise ValueError(
                f"runtime.infer_max_len must be a multiple of reduction_factor {r}"
            )
        return self

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=list)

    def replace(self, **section_updates: Any) -> "Config":
        return dataclasses.replace(self, **section_updates)


_SECTIONS = {
    "path": PathConfig,
    "audio": AudioConfig,
    "model": ModelConfig,
    "training": TrainingConfig,
    "loss": LossConfig,
    "runtime": RuntimeConfig,
}

# Reference-YAML keys that do not map 1:1 onto our dataclasses
# (ref config.yaml:27-28 widths always equal d_model in practice).
_KEY_ALIASES = {
    ("model", "encoder_prenet_in_channel"): None,  # implied by d_model
    ("model", "encoder_prenet_out_channel"): None,
}


def _coerce(dc_cls: type, raw: dict[str, Any], section: str) -> Any:
    fields = {f.name: f for f in dataclasses.fields(dc_cls)}
    kwargs: dict[str, Any] = {}
    for key, value in raw.items():
        if (section, key) in _KEY_ALIASES:
            mapped = _KEY_ALIASES[(section, key)]
            if mapped is None:
                continue
            key = mapped
        if key not in fields:
            raise ValueError(f"unknown config key {section}.{key}")
        if isinstance(value, list):
            value = tuple(value)
        kwargs[key] = value
    return dc_cls(**kwargs)


def config_from_dict(raw: dict[str, Any]) -> Config:
    sections: dict[str, Any] = {}
    for name, value in (raw or {}).items():
        if name not in _SECTIONS:
            raise ValueError(f"unknown config section: {name}")
        sections[name] = _coerce(_SECTIONS[name], value or {}, name)
    return Config(**sections).validate()


def _parse_scalar(text: str) -> Any:
    return yaml.safe_load(text)


def apply_overrides(cfg: Config, overrides: list[str] | None) -> Config:
    for item in overrides or []:
        key, _, value = item.partition("=")
        if not _:
            raise ValueError(f"override must look like section.key=value, got {item!r}")
        section, _, leaf = key.strip().partition(".")
        if section not in _SECTIONS or not leaf:
            raise ValueError(f"bad override key {key!r}")
        if leaf not in {f.name for f in dataclasses.fields(_SECTIONS[section])}:
            raise ValueError(f"unknown config key {section}.{leaf}")
        old_section = getattr(cfg, section)
        parsed = _parse_scalar(value)
        if isinstance(parsed, list):
            parsed = tuple(parsed)
        new_section = dataclasses.replace(old_section, **{leaf: parsed})
        cfg = dataclasses.replace(cfg, **{section: new_section})
    return cfg.validate()


def load_config(path: str | Path | None = None, overrides: list[str] | None = None) -> Config:
    """Load config from YAML (defaults mirror the reference's config.yaml)."""
    if path is None:
        cfg = Config().validate()
    else:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        cfg = config_from_dict(raw)
    return apply_overrides(cfg, overrides)


def tiny_config() -> Config:
    """BASELINE.json config 1: 2 enc/2 dec layers, d_model=128, CPU-runnable."""
    cfg = Config()
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            encoder_n_layers=2,
            decoder_n_layers=2,
            d_model=128,
            encoder_d_ffn=512,
            decoder_d_ffn=512,
        ),
        runtime=dataclasses.replace(
            cfg.runtime,
            compute_dtype="float32",
            phoneme_buckets=(16, 32),
            mel_buckets=(64, 128),
        ),
    ).validate()
