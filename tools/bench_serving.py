"""Serving throughput bench: dynamic batcher + Synthesizer on a trained
checkpoint.

Closed-loop load: C client threads each synthesize M utterances
back-to-back through one DynamicBatcher (infer/serving.py).  Reports, per
concurrency level, sustained requests/s, audio-s/s (mel frames x hop /
sample_rate), mean request latency, and the realized batch histogram —
the serving-side counterpart of ab_decode_batched.json's raw decode A/B.

Usage (TPU host):
    python tools/bench_serving.py PREP_DIR CKPT_DIR [--set k=v ...] \
        [--conc 1,4,8] [--reqs 4] [--max-batch 8] [--out bench_serving.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prep_dir")
    ap.add_argument("ckpt_dir")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--config", default=None)
    ap.add_argument("--conc", default="1,4,8", help="client concurrency levels")
    ap.add_argument("--reqs", type=int, default=4, help="requests per client")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)

    from transformertts_tpu.config import load_config
    from transformertts_tpu.infer import DynamicBatcher, Synthesizer

    overrides = list(args.overrides) + [f"path.preprocessed={args.prep_dir}"]
    cfg = load_config(args.config, overrides)
    synth = Synthesizer(cfg, args.ckpt_dir)

    # request pool: the val texts (LJ001/2/3 ids) from the corpus metadata
    meta = Path(cfg.path.data) / "metadata.csv" if cfg.path.data else None
    texts = []
    if meta and meta.exists():
        for line in meta.read_text().splitlines():
            uid, _, text = line.split("|", 2)
            if uid[:5] in ("LJ001", "LJ002", "LJ003"):
                texts.append(text)
    if not texts:
        texts = ["The printer finished many fine copies under the old stone bridge."]
    hop_s = cfg.audio.hop_length / cfg.audio.sample_rate

    results = {"ckpt": str(args.ckpt_dir), "backend": jax.default_backend(),
               "max_batch": args.max_batch, "levels": []}
    # warmup: pre-compile every (phoneme bucket, batch size) decode graph
    # the closed-loop clients can realize (Synthesizer.warmup).  The first
    # version of this bench warmed by synthesizing b sample texts, which
    # only covers the BUCKET those texts happen to hit — the first conc-8
    # run then paid a 21 s B=8 compile inside a request's latency.  Ragged
    # tail sizes (batches between the warmed sizes) still compile lazily —
    # counted in that request's latency, as in production cold start.
    levels = [int(c) for c in args.conc.split(",")]
    sizes = tuple(sorted({min(c, args.max_batch) for c in levels} | {1}))
    synth.warmup(batch_sizes=sizes)

    for conc in levels:
        batcher = DynamicBatcher(
            synth, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
        )
        frames = []
        lat = []
        lock = threading.Lock()

        def client(k: int):
            for j in range(args.reqs):
                t0 = time.monotonic()
                mel = batcher.synthesize(texts[(k * args.reqs + j) % len(texts)])
                dt = time.monotonic() - t0
                with lock:
                    frames.append(mel.shape[1])
                    lat.append(dt)

        t0 = time.monotonic()
        threads = [threading.Thread(target=client, args=(k,)) for k in range(conc)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        batcher.close()
        n = conc * args.reqs
        level = {
            "concurrency": conc,
            "requests": n,
            "wall_s": round(wall, 3),
            "req_per_s": round(n / wall, 3),
            "audio_s_per_s": round(sum(frames) * hop_s / wall, 1),
            "mean_latency_s": round(sum(lat) / len(lat), 3),
            "p_max_latency_s": round(max(lat), 3),
            "batch_hist": batcher.stats()["batch_hist"],
        }
        results["levels"].append(level)
        print(json.dumps(level), flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
