"""Round-3: per-frame re-pose cost (VERDICT item 9).

Measures engine.set_node_transform end to end (re-bake one node + cluster
refit + upper-level rebuild) and the first frame after it (pose-stable
stepping: no retrace), against the plain frame time — is the TLAS-update
analog frame-loop-viable?

Usage: python -m benchmarks.scratch.reposebench [frames]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import numpy as np
import jax

from vkrt_tpu.config import RenderSettings
from vkrt_tpu.engine import Engine
from vkrt_tpu import scene_instances as si


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    res = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    w, h = (int(x) for x in res.split("x"))
    inst = si.load_scene_instanced(
        "/root/reference/media/scenes/cornell.gltf"
    )
    eng = Engine(
        inst, w, h, RenderSettings(rt_mode=1, samples=1, depth=3),
    )
    # pick the largest node to move (worst case)
    sizes = [int(r[1] - r[0]) for r in inst.prim_ranges]
    node = int(np.argmax(sizes))
    print(f"cornell: {len(sizes)} nodes; moving node {node} "
          f"({sizes[node]} tris of {inst.scene.num_tris}); "
          # CPU runs get the oracle backend (not pose-stable: recompiles
          # per re-pose); the TPU PallasTracer path is the one item 9 asks
          # about — check this flag when reading the numbers
          f"pose_stable={eng._pose_stable}")

    img = eng.render_frame()
    jax.device_get(img[:1])
    t0 = time.perf_counter()
    for _ in range(frames):
        img = eng.render_frame()
    jax.device_get(img[:1])
    base = (time.perf_counter() - t0) / frames * 1e3
    print(f"static frame          : {base:8.1f} ms")

    # animated: move the node a little every frame, then render
    mats, reposes = [], []
    for f in range(frames):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.02 * (f + 1)
        mats.append(m)
    img = None
    t0 = time.perf_counter()
    for f in range(frames):
        t1 = time.perf_counter()
        eng.set_node_transform(node, mats[f])
        reposes.append((time.perf_counter() - t1) * 1e3)
        img = eng.render_frame()
    jax.device_get(img[:1])
    anim = (time.perf_counter() - t0) / frames * 1e3
    print(f"animated frame        : {anim:8.1f} ms "
          f"(repose host cost {np.mean(reposes):.1f} ms/frame, "
          f"min {min(reposes):.1f} max {max(reposes):.1f})")
    # frame 0 pays the one-time _splice_device/_apply_refit compiles; the
    # animation-loop cost is the steady state
    print("repose per frame (ms) : "
          + " ".join(f"{r:.1f}" for r in reposes))
    if len(reposes) > 2:
        print(f"steady-state repose   : {np.mean(reposes[1:]):8.1f} ms "
              f"(vs static frame {base:.1f} ms)")


if __name__ == "__main__":
    main()
