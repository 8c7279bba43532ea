"""In-process A/B of the bf16 texture atlas (VKRT_TEX_BF16, read at scene
BUILD time) vs the f32 atlas on the hybrid city config — isolates the
gather-byte share of the 4x-aniso texture fetch (32 texel gathers/fetch on
a ~12 GB/s random-gather machine).

Usage: python -m benchmarks.scratch.texdtype_ab [path]
  'path' arg benches the textured-city path-trace config instead of hybrid.
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import os
import sys
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
    mode_path = len(sys.argv) > 1 and sys.argv[1] == "path"
    scenes = {}
    saved = os.environ.get("VKRT_TEX_BF16")
    try:
        for flag in ("0", "1"):
            os.environ["VKRT_TEX_BF16"] = flag
            scenes[flag] = scene_mod.make_city(grid=96)
            print(f"bf16={flag}: atlas dtype "
                  f"{scenes[flag].tex_mip_atlas.dtype}", flush=True)
    finally:
        # don't leak the sweep value into scenes built later in-process
        if saved is None:
            os.environ.pop("VKRT_TEX_BF16", None)
        else:
            os.environ["VKRT_TEX_BF16"] = saved
    if mode_path:
        s = RenderSettings(rt_mode=1, depth=4)
    else:
        s = RenderSettings(rt_mode=0, use_shadows=True, use_ao=True, use_gi=True)
    cam = orbit_camera(0.12, radius=300, height=48)
    engines = {
        f: Engine(scenes[f], 1280, 720, s, camera=cam) for f in ("0", "1")
    }
    results = {}
    for flag in ("0", "1", "0", "1", "0", "1"):
        ms = bench(engines[flag])
        results.setdefault(flag, []).append(ms)
        print(f"bf16={flag}: {ms:7.1f} ms/frame", flush=True)
    for f, v in results.items():
        print(f"bf16={f}: best {min(v):.1f} ms  all={[round(x,1) for x in v]}")


if __name__ == "__main__":
    main()
