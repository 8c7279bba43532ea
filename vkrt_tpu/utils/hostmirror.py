"""Host-side numpy mirrors for device-resident scene arrays.

The axon TPU tunnel charges a one-time ~60-105 s initialization on the
FIRST device->host transfer of a process (measured: pull 0 = 105 s,
every later pull ~0 s), and host-side builders (the cluster-scene packer,
scene_is_textured, refit) read scene arrays with np.asarray — so a cold
process paid the whole tax inside make_tracer before rendering anything.

Every scene array is born from a host numpy buffer (scene.build_scene's
dev()); registering that buffer here lets asnumpy() hand it back without
touching the device at all. Mirrors are keyed by id() with a weakref
finalizer so an entry dies exactly when its device array does (CPython
runs finalizers during dealloc, before the id can be reused).
"""

from __future__ import annotations

import weakref

import numpy as np

_MIRROR: dict = {}


def register(dev_arr, host_arr: np.ndarray):
    """Attach ``host_arr`` as the known host copy of ``dev_arr``."""
    k = id(dev_arr)
    _MIRROR[k] = host_arr
    try:
        weakref.finalize(dev_arr, _MIRROR.pop, k, None)
    except TypeError:
        pass  # non-weakref-able (e.g. plain numpy passed through): skip
    return dev_arr


def asnumpy(x) -> np.ndarray:
    """np.asarray(x) that prefers a registered host mirror."""
    if isinstance(x, np.ndarray):
        return x
    h = _MIRROR.get(id(x))
    if h is not None:
        return h
    return np.asarray(x)


def warm_transfer_path() -> None:
    """Pay the tunnel's one-time device->host transfer init on a BACKGROUND
    thread (the C-level wait releases the GIL), overlapping it with scene
    build / tracing / compilation. Call once early in any entry point that
    will eventually device_get."""
    import threading

    def _pull():
        try:
            import jax
            import jax.numpy as jnp

            np.asarray(jnp.zeros((1,), jnp.float32) + 0)
        except Exception:
            pass  # warmup only — real pulls will pay the cost instead

    threading.Thread(target=_pull, daemon=True).start()
