from transformertts_tpu.native.bindings import NativeBatchLoader, native_available  # noqa: F401
