from vkrt_tpu.utils.jaxcache import enable; enable()
import numpy as np, jax.numpy as jnp
from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas import trace as T
from vkrt_tpu.utils.camera import Camera, generate_rays, tile_perm
from benchmarks.scratch.variants import make_call, slope_time

scene = scene_mod.load_cornell()
cs = T.build_cluster_scene(scene.tri_v0, scene.tri_e1, scene.tri_e2)
W, H = 1280, 720
n = (W * H) // 1024 * 1024
cam = Camera().matrices(W, H)
o_p, d_p = generate_rays(cam, W, H, jnp.full((W * H, 2), 0.5, jnp.float32))
perm, _ = tile_perm(W, H)
o_t = jnp.take(o_p, jnp.asarray(perm), axis=0)[:n]
d_t = jnp.take(d_p, jnp.asarray(perm), axis=0)[:n]

a = np.asarray(make_call(cs, "mt16")(o_t, d_t))
b = np.asarray(make_call(cs, "ppmt16")(o_t, d_t))
print("mt16 vs ppmt16 equal:", np.array_equal(a, b), "maxdiff", np.abs(a-b).max())
for v in ["mt16", "ppmt16", "bit16", "ppbit16"]:
    call = make_call(cs, v)
    dt = slope_time(call, o_t, d_t)
    print(f"{v:10s}: {dt*1e3:8.2f} ms")
