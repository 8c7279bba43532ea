"""Persistent XLA compilation cache setup.

The axon TPU tunnel compiles our render programs in 2-10 minutes (load
dependent) — but compiled executables reload from the persistent cache in
~30ms. Every entry point (app, bench, driver hooks) calls enable() first so
a given (program, shape) pair is only ever compiled once per machine.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/vkrt_tpu_xla")

# XLA places the trace kernels' frame-sized outputs in scoped VMEM when they
# sit inside the frame loop; the default 16MB scoped limit then OOMs at
# compile time. Must be set before the TPU backend initializes.
_SCOPED_VMEM = "--xla_tpu_scoped_vmem_limit_kib=122880"


def _extend_libtpu_args() -> None:
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + _SCOPED_VMEM).strip()


_extend_libtpu_args()  # at import, before jax pulls up the backend


def enable(cache_dir: str = None) -> None:
    _extend_libtpu_args()
    import jax

    try:
        if jax.default_backend() != "tpu":
            # CPU AOT cache entries are machine-feature specific (the remote
            # compile helper's CPU differs from this host; XLA warns of
            # potential SIGILL when loading them) — cache TPU programs only.
            return
    except Exception:
        return
    cache_dir = cache_dir or os.environ.get("VKRT_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: flag names differ; cache is an optimization only
