"""Device mesh + GSPMD sharding rules (SURVEY.md §5.8; no reference
equivalent — the reference is single-GPU, train.py:47).

Design: one global ``Mesh`` with axes ``('data', 'model')``.

- DP: batches sharded over ``data``; gradients/metrics allreduce over ICI is
  inserted by GSPMD (no hand-written collectives).  BatchNorm statistics
  become global automatically because the mean/var reductions happen inside
  the jitted program on the sharded batch axis.
- TP (for the scaled d_model=1024 config, BASELINE.json config 5):
  megatron-style head/ffn sharding over ``model`` — QKV projections split
  on the output (head) dim, out-projections on the input dim, FFN first
  Dense split on the hidden dim, second on the input dim.  Each attention
  block then needs exactly one allreduce on its output, which GSPMD derives
  on its own from these parameter shardings.

The same path-pattern rules are applied to params AND optimizer moments
(their pytree paths embed the param paths), so the whole TrainState shards
consistently.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec) — first match wins; default replicated.
_TP_RULES: list[tuple[str, P]] = [
    (r"(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"out_proj/kernel$", P("model", None)),
    (r"ffn/Dense_0/kernel$", P(None, "model")),
    (r"ffn/Dense_0/bias$", P("model")),
    (r"ffn/Dense_1/kernel$", P("model", None)),
    (r"emb/embedding$", P(None, None)),
]


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // n_model
    n = n_data * n_model
    dev_array = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def param_spec(path: str, tp: bool) -> P:
    if tp:
        for pattern, spec in _TP_RULES:
            if re.search(pattern, path):
                return spec
    return P()  # replicated


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k)))) for k in path
    )


def state_shardings(state, mesh: Mesh):
    """TrainState pytree -> matching pytree of NamedShardings."""
    tp = mesh.shape.get("model", 1) > 1

    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, param_spec(_path_str(path), tp))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_state(state, mesh: Mesh):
    """Place a host-side TrainState onto the mesh per the sharding rules."""
    return jax.device_put(state, state_shardings(state, mesh))


# batch keys whose (batch-relative) axis 1 is a time axis that sequence
# parallelism shards over the 'model' mesh axis
_SEQ_KEYS = ("melspec", "phoneme")


def batch_shardings(
    batch: dict, mesh: Mesh, has_accum_dim: bool = True,
    shard_sequence: bool = False,
):
    axis = 1 if has_accum_dim else 0

    def spec(k, x):
        parts = [None] * x.ndim
        parts[axis] = "data"
        if shard_sequence and k in _SEQ_KEYS and x.ndim > axis + 1:
            # Megatron-style sequence parallelism: the TIME axis rides the
            # same mesh axis TP uses.  GSPMD keeps pointwise/prenet/LN/conv
            # work T-sharded and inserts all-gathers only where attention
            # needs the full sequence (audited in tests/test_sharding.py).
            parts[axis + 1] = "model"
        return NamedSharding(mesh, P(*parts))

    return {k: spec(k, v) for k, v in batch.items()}


def shard_batch(
    batch: dict, mesh: Mesh, has_accum_dim: bool = True,
    shard_sequence: bool = False,
) -> dict:
    """Shard batch dim over ``data`` ((K, B, ...) or (B, ...)); with
    ``shard_sequence`` also shard mel/phoneme time over ``model``."""
    shardings = batch_shardings(batch, mesh, has_accum_dim, shard_sequence)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
