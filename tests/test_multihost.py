"""True multi-host test: 2 processes x 4 virtual CPU devices, one global
mesh, host-sharded data, jax.distributed coordination (SURVEY.md §5.8).

Each "host" runs the same jitted DP train step on its disjoint data shard;
the losses and updated parameters must agree bit-for-bit across hosts
(GSPMD allreduce over the global mesh).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, json
    import numpy as np
    import jax

    # container sitecustomize points jax at the TPU; force CPU before init
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["PROC_ID"]),
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8  # global
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from transformertts_tpu.config import tiny_config
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.parallel import make_mesh, shard_state
    from transformertts_tpu.train import create_train_state, make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    cfg = tiny_config()
    model = TransformerTTS(cfg.model)
    mesh = make_mesh(8, 1)

    # deterministic global batch; every host materializes the whole thing,
    # then contributes only its local shard via host_local_array_to_global
    rng = np.random.default_rng(0)
    K, B, TP, TM, C = 1, 8, 16, 64, 80
    global_batch = {
        "phoneme": rng.integers(1, 60, (K, B, TP)).astype(np.int32),
        "melspec": rng.standard_normal((K, B, TM, C)).astype(np.float32),
        "phoneme_lens": np.full((K, B), TP, np.int32),
        "melspec_lens": np.full((K, B), TM, np.int32),
    }
    pid = jax.process_index()
    local = {k: v[:, pid * 4 : (pid + 1) * 4] for k, v in global_batch.items()}
    def to_global(x):
        parts = [None] * x.ndim
        parts[1] = "data"
        return multihost_utils.host_local_array_to_global_array(
            x, mesh, P(*parts)
        )
    batch = {k: to_global(v) for k, v in local.items()}

    state = create_train_state(model, cfg, jax.random.PRNGKey(0), global_batch)
    state = shard_state(state, mesh)
    step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    with mesh:
        for i in range(2):
            state, metrics = step(state, batch, 0.8, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["total"]))
    leaf = float(jax.device_get(state.params["emb"]["embedding"]).sum())
    print(json.dumps({"proc": pid, "loss": loss, "emb_sum": leaf}), flush=True)
    """
)


@pytest.mark.slow
def test_two_host_dp(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "COORD": f"127.0.0.1:{port}",
            "PROC_ID": str(pid),
            # the worker runs from tmp_path, so the repo root must be on its
            # import path regardless of the ambient PYTHONPATH (which the
            # container points at the axon PJRT plugin site)
            "PYTHONPATH": repo_root + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    results = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
        results.append(json.loads(out.strip().splitlines()[-1]))

    # both hosts observe the identical global loss and parameters
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    assert results[0]["emb_sum"] == pytest.approx(results[1]["emb_sum"], abs=1e-5)
    assert np.isfinite(results[0]["loss"])
