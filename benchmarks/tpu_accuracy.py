"""On-DEVICE accuracy anchor (VERDICT r4 next 6).

The golden images and the f64 oracle run on CPU (tests/conftest.py);
device evidence was only bit-parity spot checks. This module renders a
small Cornell on the REAL TPU through the production pipeline (compiled
Pallas cluster kernel + packed shade kernel, equal seeds) and bounds it
against the float64 brute-force oracle of the identical estimator on CPU
— the BASELINE.md <=1e-3 RMSE target measured on hardware, methodology of
tests/test_accuracy_oracle.py (two error populations: float drift bounded
by RMSE/p99, chaotic discrete-decision divergence bounded by count).

Writes TPU_ACCURACY.json at the repo root; run standalone
(``python -m benchmarks.tpu_accuracy``) or via bench.py each round.
"""

from __future__ import annotations

import json
import os
import sys
from functools import partial

W, H = 64, 48
FRAMES = 3
DEPTH = 3

_OUT = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "TPU_ACCURACY.json")


def _render(scene, tracer, dtype, device=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vkrt_tpu.models.pathtracer import pathtrace_frame
    from vkrt_tpu.utils.camera import Camera

    cam = Camera().matrices(W, H)
    cam = jax.tree.map(lambda a: jnp.asarray(a, dtype), cam)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], dtype)
    step = jax.jit(
        partial(pathtrace_frame, scene, tracer,
                width=W, height=H, samples=1, depth=DEPTH),
        device=device,
    )
    accum = jnp.zeros((W * H, 3), dtype)
    if device is not None:
        accum = jax.device_put(accum, device)
    for f in range(FRAMES):
        accum, _ = step(cam, f, accum, clear)
    return np.asarray(jax.device_get(accum), np.float64)


def run(out_path: str = _OUT) -> dict:
    """Render TPU-f32 vs CPU-f64, write + return the accuracy record."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vkrt_tpu.models.post import tonemap
    from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
    from vkrt_tpu.ops.trace import make_tracer
    from vkrt_tpu.scene import make_cornell_box

    dev = jax.devices()[0]
    scene = make_cornell_box()
    # the production path on the default device: compiled Pallas kernels on
    # TPU (interpret only if this process is CPU-forced)
    interpret = dev.platform not in ("tpu", "axon")
    img32 = _render(scene, make_pallas_tracer(scene, interpret=interpret),
                    jnp.float32)

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64():
        with jax.default_device(cpu):
            scene64 = jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float64)
                if a.dtype == jnp.float32 else jnp.asarray(a),
                scene,
            )
            img64 = _render(scene64, make_tracer(scene64, "bruteforce"),
                            jnp.float64, device=cpu)

    disp32 = np.clip(np.asarray(tonemap(jnp.asarray(img32, jnp.float32)),
                                np.float64), 0, 1)
    disp64 = np.clip(np.asarray(tonemap(jnp.asarray(img64, jnp.float32)),
                                np.float64), 0, 1)
    err = np.abs(disp32 - disp64).max(-1)
    diverged = err > 1e-2
    rmse = float(np.sqrt(np.mean((disp32 - disp64)[~diverged] ** 2)))
    rec = {
        "workload": f"cornell_{W}x{H}_spp1_depth{DEPTH}_frames{FRAMES}",
        "device": str(dev),
        "rmse_display": rmse,
        "p99_abs_err": float(np.percentile(err, 99)),
        "diverged_frac": float(diverged.mean()),
        "budget_rmse": 1e-3,
        "ok": bool(rmse <= 1e-3 and np.percentile(err, 99) <= 1e-3
                   and diverged.mean() < 0.01),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"[tpu_accuracy] {rec}", file=sys.stderr, flush=True)
    return rec


def main():
    from vkrt_tpu.utils.jaxcache import enable

    enable()
    rec = run()
    if not rec["ok"]:
        sys.exit(5)


if __name__ == "__main__":
    main()
