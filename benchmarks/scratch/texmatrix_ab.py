"""Interleaved in-process matrix A/B of the hybrid texture-path knobs:

  atlas dtype  {f32, bf16}   (VKRT_TEX_BF16, baked at scene BUILD time)
  aniso taps   {4, 2}        (texture.ANISO_TAPS, baked at TRACE time)

on the hybrid city config (shadows + AO + GI) — the VERDICT r3 item-3
decision harness. Each (dtype, taps) pair gets its own Engine; frames are
interleaved round-robin so all variants share the same process drift
(STATUS r3: cross-process numbers drift +/-40% on this box).

Usage: python -m benchmarks.scratch.texmatrix_ab [frames_per_rep] [reps]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import os
import sys
import time

import jax

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.config import RenderSettings
from vkrt_tpu.engine import Engine
from vkrt_tpu.ops import texture as tex_mod
from vkrt_tpu.utils.camera import orbit_camera

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def bench(eng, frames):
    t0 = time.time()
    for _ in range(frames):
        out = eng.render_frame()
    _ = jax.device_get(out.sum())
    return (time.time() - t0) / frames * 1e3


def main():
    scenes = {}
    saved = os.environ.get("VKRT_TEX_BF16")
    try:
        for flag in ("0", "1"):
            os.environ["VKRT_TEX_BF16"] = flag
            scenes[flag] = scene_mod.make_city(grid=96)
            print(f"bf16={flag}: atlas {scenes[flag].tex_mip_atlas.dtype}",
                  flush=True)
    finally:
        if saved is None:
            os.environ.pop("VKRT_TEX_BF16", None)
        else:
            os.environ["VKRT_TEX_BF16"] = saved

    s = RenderSettings(rt_mode=0, use_shadows=True, use_ao=True, use_gi=True)
    cam = orbit_camera(0.12, radius=300, height=48)
    variants = {}
    saved_taps = tex_mod.ANISO_TAPS
    try:
        for taps in (4, 2):
            for flag in ("0", "1"):
                # taps is read from the module global at trace time; pin it
                # before this engine's first (tracing) frame
                tex_mod.ANISO_TAPS = taps
                eng = Engine(scenes[flag], 1280, 720, s, camera=cam)
                _ = jax.device_get(eng.render_frame().sum())  # compile+warm
                variants[(flag, taps)] = eng
                print(f"warmed bf16={flag} taps={taps}", flush=True)
    finally:
        tex_mod.ANISO_TAPS = saved_taps

    results = {k: [] for k in variants}
    for r in range(REPS):
        for key, eng in variants.items():
            ms = bench(eng, FRAMES)
            results[key].append(ms)
            print(f"rep {r} bf16={key[0]} taps={key[1]}: {ms:7.1f} ms/frame",
                  flush=True)
    print("--- best of reps ---")
    for (flag, taps), v in results.items():
        print(f"bf16={flag} taps={taps}: best {min(v):7.1f} ms  "
              f"all={[round(x, 1) for x in v]}")


if __name__ == "__main__":
    main()
