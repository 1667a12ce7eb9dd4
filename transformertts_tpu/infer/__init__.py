from transformertts_tpu.infer.decode import make_decode_fn, naive_decode  # noqa: F401
from transformertts_tpu.infer.api import Synthesizer  # noqa: F401
from transformertts_tpu.infer.streaming import make_stream_fns, stream_decode  # noqa: F401
from transformertts_tpu.infer.serving import DynamicBatcher, make_http_server  # noqa: F401
