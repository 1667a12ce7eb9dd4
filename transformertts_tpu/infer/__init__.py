from transformertts_tpu.infer.decode import make_decode_fn, naive_decode  # noqa: F401
