"""Suite config 1 regression probe: where do the 1-bounce frame's ms go?

Round-5's consolidated suite showed cornell_1spp_1bounce at 80.9 ms/frame
vs r3's 54.8 while every deeper config improved 1.9-3.9x — the suspect is
the per-frame display path (engine._display), not the render step. This
times, interleaved in one process on the engine's own jitted callables:

  * step-only        (the pathtrace step, no display)
  * display-only     (engine._display on a fixed accumulator)
  * step + display   (render_frame, the suite's per-frame path)

Usage: python -m benchmarks.scratch.displaybench [WxH] [depth]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu.config import RenderSettings
from vkrt_tpu.engine import Engine
from vkrt_tpu.scene import load_cornell
from vkrt_tpu.utils.camera import Camera


def timeit(fn, iters=8):
    out = fn()
    jax.device_get(jnp.sum(out) if hasattr(out, "shape") else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(jnp.sum(out) if hasattr(out, "shape") else out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    w, h = (int(x) for x in res.split("x"))
    eng = Engine(load_cornell(), w, h,
                 RenderSettings(rt_mode=1, samples=1, depth=depth), Camera())
    out = eng.render_frame()
    jax.block_until_ready(out)

    cam = eng.camera.matrices(w, h)

    def step_only():
        accum, rays = eng._step(
            *eng._step_args(), cam, eng.frame, eng.accum, eng.clear_color,
            eng._clamp_lohi(),
        )
        return rays

    accum_fixed = eng.accum

    def display_only():
        return eng._display(accum_fixed, jnp.asarray(True))

    def full():
        return eng.render_frame()

    print(f"step only (d{depth})   : {timeit(step_only):7.1f} ms", flush=True)
    print(f"display only         : {timeit(display_only):7.1f} ms", flush=True)
    print(f"render_frame (suite) : {timeit(full):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
