"""Command-line entry points (ref: train.py:14-56, preprocess.py:103-112).

  python -m transformertts_tpu.cli train --config config.yaml
  python -m transformertts_tpu.cli preprocess --config config.yaml
  python -m transformertts_tpu.cli synthesize --config c.yaml --ckpt DIR --text "..."
"""

from __future__ import annotations

import argparse
import os
import sys


def _honor_platform_env():
    """Respect an explicit JAX_PLATFORMS override from the caller.

    Containers may pre-import jax from sitecustomize with a TPU backend
    already registered, in which case the env var alone is read too early
    to take effect — mirror tests/conftest.py and update the live config.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want and "jax" in sys.modules:
        import jax

        jax.config.update("jax_platforms", want)


def _add_common(p):
    p.add_argument("--config", default=None, help="YAML config path (defaults = reference config)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   help="dotted override, e.g. training.batch_size=32")


def cmd_train(args):
    from transformertts_tpu.config import load_config
    from transformertts_tpu.train.trainer import Trainer
    from transformertts_tpu.utils import increment_path

    if args.distributed or os.environ.get("TTS_DISTRIBUTED"):
        # multi-host pod slice: one process per host (SURVEY.md §5.8);
        # coordinator/process env comes from the TPU runtime or flags
        import jax

        jax.distributed.initialize()

    cfg = load_config(args.config, args.overrides)
    exp_dir = args.exp_dir or increment_path(cfg.path.experiment)
    trainer = Trainer(cfg, exp_dir, resume=not args.no_resume,
                      profile_steps=args.profile_steps)
    result = trainer.fit()
    if result["epochs"] == 0:
        print("nothing to do: training already completed (resume found "
              f"epoch {trainer.start_epoch} >= num_epochs)")
    else:
        print(f"done: best val loss {result['best_val']:.4f} after {result['epochs']} epochs")


def cmd_preprocess(args):
    import logging

    from transformertts_tpu.config import load_config
    from transformertts_tpu.data.preprocess import preprocess

    logging.basicConfig(level=logging.INFO, format="%(levelname)s | %(message)s")
    preprocess(load_config(args.config, args.overrides))


def cmd_synthesize(args):
    import numpy as np
    import jax

    from transformertts_tpu.config import load_config
    from transformertts_tpu.data import load_stats
    from transformertts_tpu.dsp import denormalize_mel
    from transformertts_tpu.infer import make_decode_fn
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.text import G2p, phonemize
    from transformertts_tpu.train.checkpoint import CheckpointManager
    from transformertts_tpu.train.train_step import create_train_state

    cfg = load_config(args.config, args.overrides)
    model = TransformerTTS(cfg.model)
    g2p = G2p()
    _, seq = phonemize(args.text, g2p)
    max_p = cfg.runtime.phoneme_buckets[-1]
    phoneme = np.zeros((1, max_p), np.int32)
    phoneme[0, : len(seq)] = seq[:max_p]

    example = {
        "phoneme": phoneme[None],
        "melspec": np.zeros((1, 1, 8, cfg.model.n_mels), np.float32),
        "phoneme_lens": np.array([[len(seq)]], np.int32),
        "melspec_lens": np.array([[8]], np.int32),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), example)
    state, _ = CheckpointManager(args.ckpt).restore(state)
    if state is None:
        sys.exit(f"no checkpoint found in {args.ckpt}")

    decode = make_decode_fn(model, cfg)
    out = jax.device_get(
        decode({"params": state.eval_params, "batch_stats": state.batch_stats},
               phoneme, np.array([len(seq)], np.int32))
    )
    n = int(out["n_frames"])
    mel = out["post_melspec"][0, :n]
    if cfg.audio.normalize_mel:
        try:
            stats = load_stats(cfg.path.preprocessed)
            mel = denormalize_mel(mel, stats["mean"], stats["std"])
        except FileNotFoundError:
            print("warning: stats.json not found; mel left normalized")
    np.save(args.out, mel.T)  # (n_mels, T) layout like preprocess output
    print(f"wrote {mel.shape[0]} frames to {args.out}")

    if args.wav:
        from transformertts_tpu.dsp.griffin_lim import griffin_lim, write_wav

        a = cfg.audio
        y = griffin_lim(
            mel.T, a.sample_rate, a.n_fft, a.hop_length, a.win_length,
            a.fmin, a.fmax,
        )
        write_wav(args.wav, y, a.sample_rate)
        print(f"wrote {len(y) / a.sample_rate:.2f}s of audio to {args.wav}")


def cmd_serve(args):
    """Interactive/piped serving loop: one line of text in -> mel (and
    optionally wav) out, decoded incrementally via the streaming API."""
    import numpy as np

    from transformertts_tpu.config import load_config
    from transformertts_tpu.infer import Synthesizer

    cfg = load_config(args.config, args.overrides)
    synth = Synthesizer(cfg, args.ckpt)
    out_dir = args.out_dir
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    n = 0
    src = open(args.input) if args.input else sys.stdin
    try:
        for line in src:
            text = line.strip()
            if not text:
                continue
            chunks = []
            for chunk in synth.stream(text, chunk=args.chunk):
                chunks.append(chunk)
                print(f"\r[{n}] {sum(c.shape[1] for c in chunks)} frames", end="",
                      file=sys.stderr)
            print(file=sys.stderr)
            mel = np.concatenate(chunks, axis=1) if chunks else np.zeros((cfg.model.n_mels, 0))
            path = f"{out_dir}/utt_{n:04d}"
            np.save(path + ".npy", mel)
            if args.wav:
                from transformertts_tpu.dsp.griffin_lim import griffin_lim, write_wav

                a = cfg.audio
                y = griffin_lim(mel, a.sample_rate, a.n_fft, a.hop_length,
                                a.win_length, a.fmin, a.fmax)
                write_wav(path + ".wav", y, a.sample_rate)
            print(f"[{n}] {mel.shape[1]} frames -> {path}.npy"
                  + (" + .wav" if args.wav else ""))
            n += 1
    finally:
        if args.input:
            src.close()
    print(f"served {n} utterances")


def cmd_serve_http(args):
    """Dynamic-batching HTTP synthesis server: concurrent POSTs coalesce
    into one padded decode batch (infer/serving.py)."""
    from transformertts_tpu.config import load_config
    from transformertts_tpu.infer import DynamicBatcher, Synthesizer, make_http_server

    cfg = load_config(args.config, args.overrides)
    synth = Synthesizer(cfg, args.ckpt)
    if args.warmup:
        sizes = sorted({1, args.max_batch})
        print(f"warming decode graphs (batch sizes {sizes} x "
              f"{len(cfg.runtime.phoneme_buckets)} buckets)...", flush=True)
        n = synth.warmup(batch_sizes=tuple(sizes))
        print(f"warmed {n} decode graphs", flush=True)
    batcher = DynamicBatcher(
        synth, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    )
    server = make_http_server(batcher, cfg, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(max_batch={args.max_batch}, max_wait_ms={args.max_wait_ms})",
          flush=True)
    # serve on a side thread and park on an event: SIGTERM (and SIGINT,
    # when not inherited-ignored by a background shell) both release it
    # for a graceful drain + stats print
    import signal
    import threading

    stop = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, lambda *_: stop.set())
        except (ValueError, OSError):
            pass
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        stop.wait()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.close()
        print(f"stats: {batcher.stats()}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="transformertts_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train the model")
    _add_common(p_train)
    p_train.add_argument("--exp-dir", default=None)
    p_train.add_argument("--no-resume", action="store_true")
    p_train.add_argument("--distributed", action="store_true",
                         help="multi-host: call jax.distributed.initialize()")
    p_train.add_argument("--profile-steps", type=int, default=0,
                         help="capture a jax.profiler trace of N steps")
    p_train.set_defaults(fn=cmd_train)

    p_pre = sub.add_parser("preprocess", help="offline feature extraction")
    _add_common(p_pre)
    p_pre.set_defaults(fn=cmd_preprocess)

    p_syn = sub.add_parser("synthesize", help="text -> mel with a trained checkpoint")
    _add_common(p_syn)
    p_syn.add_argument("--ckpt", required=True, help="checkpoint directory")
    p_syn.add_argument("--text", required=True)
    p_syn.add_argument("--out", default="mel.npy")
    p_syn.add_argument("--wav", default=None,
                       help="also write audio via Griffin-Lim inversion")
    p_syn.set_defaults(fn=cmd_synthesize)

    p_srv = sub.add_parser("serve", help="stream-synthesize each stdin line")
    _add_common(p_srv)
    p_srv.add_argument("--ckpt", required=True, help="checkpoint directory")
    p_srv.add_argument("--out-dir", default="served")
    p_srv.add_argument("--chunk", type=int, default=64)
    p_srv.add_argument("--wav", action="store_true",
                       help="also write Griffin-Lim audio per utterance")
    p_srv.add_argument("--input", default=None,
                       help="read lines from a file instead of stdin")
    p_srv.set_defaults(fn=cmd_serve)

    p_http = sub.add_parser(
        "serve-http", help="dynamic-batching HTTP synthesis server"
    )
    _add_common(p_http)
    p_http.add_argument("--ckpt", required=True, help="checkpoint directory")
    p_http.add_argument("--host", default="127.0.0.1")
    p_http.add_argument("--port", type=int, default=8777)
    p_http.add_argument("--max-batch", type=int, default=8,
                        help="coalesce up to N concurrent requests per decode")
    p_http.add_argument("--max-wait-ms", type=float, default=20.0,
                        help="max extra latency to wait for batch fill")
    p_http.add_argument("--warmup", action="store_true",
                        help="pre-compile decode graphs for batch sizes "
                        "{1, max_batch} x all phoneme buckets before "
                        "accepting requests (kills per-shape cold start)")
    p_http.set_defaults(fn=cmd_serve_http)

    args = ap.parse_args(argv)
    _honor_platform_env()
    args.fn(args)


if __name__ == "__main__":
    main()
