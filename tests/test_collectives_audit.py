"""HLO collectives audit for tensor parallelism (SURVEY.md §5.8).

Pins parallel/mesh.py's design claim — megatron-style sharding makes GSPMD
derive exactly ONE output all-reduce per attention block and one per FFN
block, with activations never gathered — by compiling on a CPU mesh and
counting collective ops in the optimized HLO.  Also checks TP == DP
numerics at paper-config widths (d_model=512, 8 heads, ffn 2048 — the
BASELINE.json config-2 shapes), not just the tiny config.
"""

import re

import numpy as np
import pytest

import jax

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.parallel import make_mesh, shard_batch, shard_state
from transformertts_tpu.train import create_train_state, make_train_step

from tests.test_train_step import synthetic_batch


def _collective_counts(hlo_text: str) -> dict:
    """op name -> (op count, total reduced/moved tensor operands).

    XLA's combiner can merge neighbouring all-reduces into one multi-operand
    op, so the design-level count is the OPERAND count, not the op count.
    """
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        # combined ops have a TUPLE result type (contains spaces), so match
        # the op application itself on any line that defines a value;
        # `(?:-start)?` covers async start/done splitting
        ops = [
            m.group(1)
            for line in hlo_text.splitlines()
            if " = " in line
            for m in [re.search(rf" {op}(?:-start)?\(([^)]*)\)", line)]
            if m
        ]
        out[op] = (len(ops), sum(o.count("%") for o in ops))
    return out


def _compile_forward_hlo(cfg, mesh):
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, k=1, b=4)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    state = shard_state(state, mesh)

    def fwd(params, batch_stats, micro):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            micro["phoneme"], micro["melspec"],
            micro["phoneme_lens"], micro["melspec_lens"],
            train=False, return_alignments=False,
        )["post_melspec"]

    micro = {k: v[0] for k, v in batch.items()}
    with mesh:
        sharded = shard_batch(micro, mesh, has_accum_dim=False)
        lowered = jax.jit(fwd).lower(state.params, state.batch_stats, sharded)
        return lowered.compile().as_text()


def test_tp_forward_one_allreduce_per_block():
    """Pure-TP (1, 2) forward: the all-reduced tensor count must equal
    enc_layers * (self-attn + ffn) + dec_layers * (self + cross + ffn),
    and NO activation gathers/scatters may appear anywhere."""
    cfg = tiny_config()
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    counts = _collective_counts(_compile_forward_hlo(cfg, mesh))

    m = cfg.model
    expected = m.encoder_n_layers * 2 + m.decoder_n_layers * 3
    assert counts["all-reduce"][1] == expected, counts
    for op in ("all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        assert counts[op] == (0, 0), (op, counts)


def test_tp_train_step_no_gathers():
    """Full train step (fwd x2 + bwd + optimizer) at (4, 2): activations and
    gradients must stay in place — all communication is all-reduce.

    The exact op count after XLA's combiner is pinned too (49 ops / 315
    reduced tensors with the image's jax: 2 forwards x 10 activation
    reduces + backward input-grad reduces + per-leaf DP gradient sync +
    metric means); if a jax upgrade shifts combining, the important
    invariants are the zero-gather lines below — update the pinned count
    with a trace-level justification."""
    cfg = tiny_config()
    model = TransformerTTS(cfg.model)
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, k=2, b=8)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    state = shard_state(state, mesh)
    step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    with mesh:
        sharded = shard_batch(batch, mesh)
        txt = step.lower(state, sharded, 0.8, jax.random.PRNGKey(1)).compile().as_text()
    counts = _collective_counts(txt)
    for op in ("all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        assert counts[op] == (0, 0), (op, counts)
    assert counts["all-reduce"] == (49, 315), counts


@pytest.mark.slow
def test_tp_matches_dp_at_paper_widths():
    """TP (4, 2) and DP (8, 1) produce the same loss/grad-norm on the same
    batch at paper-config widths (d_model=512, 8 heads, ffn 2048, post-LN
    6+6 trimmed to 2+2 layers for CPU runtime — the width is what TP
    shards; layer count only repeats the pattern)."""
    import dataclasses

    cfg = tiny_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, d_model=512, encoder_n_head=8, decoder_n_head=8,
        encoder_d_ffn=2048, decoder_d_ffn=2048,
    ))
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, k=1, b=8)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)

    results = {}
    for name, (nd, nm) in {"dp": (8, 1), "tp": (4, 2)}.items():
        mesh = make_mesh(nd, nm)
        st = shard_state(state, mesh)
        with mesh:
            _, metrics = step(st, shard_batch(batch, mesh), 1.0, jax.random.PRNGKey(1))
        results[name] = {k: float(v) for k, v in metrics.items()}
    assert results["dp"]["total"] == pytest.approx(results["tp"]["total"], rel=2e-5)
    assert results["dp"]["grad_norm"] == pytest.approx(results["tp"]["grad_norm"], rel=2e-4)


def test_sp_forward_gathers_only_at_attention():
    """Sequence-parallel forward (1, 2 mesh, time axes sharded over
    'model', runtime.shard_sequence): GSPMD may all-gather sequences where
    attention needs full-T K/V, but pointwise work must stay T-sharded —
    pinned as: some all-gathers exist (attention), and the gathered-tensor
    count stays BOUNDED by the attention-block count (no per-pointwise-op
    regathering)."""
    cfg = tiny_config()
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, k=1, b=4)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    state = shard_state(state, mesh)

    def fwd(params, batch_stats, micro):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            micro["phoneme"], micro["melspec"],
            micro["phoneme_lens"], micro["melspec_lens"],
            train=False, return_alignments=False,
        )["post_melspec"]

    micro = {k: v[0] for k, v in batch.items()}
    with mesh:
        sharded = shard_batch(micro, mesh, has_accum_dim=False,
                              shard_sequence=True)
        txt = jax.jit(fwd).lower(
            state.params, state.batch_stats, sharded).compile().as_text()
    counts = _collective_counts(txt)
    m = cfg.model
    n_attn = m.encoder_n_layers + m.decoder_n_layers * 2
    gathered = counts["all-gather"][1]
    assert gathered > 0, counts  # attention really needs the full sequence
    # bounded: at most ~3 gathered tensors per attention block (q/k/v-side
    # re-partitions) plus one for the final output reassembly
    assert gathered <= 3 * n_attn + 2, counts
