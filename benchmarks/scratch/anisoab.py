"""In-process A/B of the 4x aniso G-buffer sampler vs the round-2
isotropic trilinear LOD (VKRT_ANISO knob, read at trace time) on the
hybrid city config — isolates the hybrid-frame cost of the aniso change.

Usage: python -m benchmarks.scratch.anisoab
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import os
import time

import jax

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.config import RenderSettings
from vkrt_tpu.engine import Engine
from vkrt_tpu.utils.camera import orbit_camera


def bench(eng, frames=6):
    out = eng.render_frame()
    _ = jax.device_get(out.sum())
    t0 = time.time()
    for _ in range(frames):
        out = eng.render_frame()
    _ = jax.device_get(out.sum())
    return (time.time() - t0) / frames * 1e3


def main():
    city = scene_mod.make_city(grid=96)
    s = RenderSettings(rt_mode=0, use_shadows=True, use_ao=True, use_gi=True)
    results = {}
    for mode in ("1", "0", "1", "0"):
        os.environ["VKRT_ANISO"] = mode
        eng = Engine(city, 1280, 720, s, camera=orbit_camera(0.12, radius=300, height=48))
        ms = bench(eng)
        results.setdefault(mode, []).append(ms)
        print(f"aniso={mode}: {ms:7.1f} ms/frame", flush=True)
    for m, v in results.items():
        print(f"aniso={m}: best {min(v):.1f} ms")


if __name__ == "__main__":
    main()
