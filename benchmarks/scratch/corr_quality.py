from vkrt_tpu.utils.jaxcache import enable; enable()
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from vkrt_tpu.models.pathtracer import trace_pixels
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.scene import load_cornell
from vkrt_tpu.utils.camera import Camera, pixel_coords, tile_perm
from vkrt_tpu.utils.metrics import rmse

W, H = 128, 96
scene = load_cornell()
tracer = make_pallas_tracer(scene)
cam = Camera().matrices(W, H)
perm, inv = tile_perm(W, H)
pix = jnp.take(pixel_coords(W, H), jnp.asarray(perm), axis=0)
pid = jnp.asarray(perm).astype(jnp.uint32)

def mk(corr):
    def f(f_idx):
        return trace_pixels(
            scene, tracer, cam, W, H, f_idx, jnp.ones(4),
            samples=1, depth=3, clamp_weights=True, corr=corr,
            pix=pix, seeds=tea(pid, jnp.uint32(f_idx)),
        ).radiance
    return jax.jit(f)

steps = {False: mk(False), True: mk(True)}
def mean_img(corr, frames, start=0):
    acc = np.zeros((W * H, 3), np.float64)
    for f in range(start, start + frames):
        acc += np.asarray(jax.device_get(steps[corr](f)), np.float64)
    return acc / frames

ref = mean_img(False, 600, start=5000)
for n in (8, 32, 128):
    e_d = rmse(mean_img(False, n), ref)
    e_c = rmse(mean_img(True, n), ref)
    print(f"{n:4d} frames: indep {e_d:.5f}  corr {e_c:.5f}  ratio {e_c/e_d:.3f}", flush=True)
# converged-mean agreement (bias check): corr long-run vs indep long-run
ref_c = mean_img(True, 600, start=5000)
print(f"bias check: |mean_corr - mean_indep| rmse over 600f = {rmse(ref_c, ref):.5f} "
      f"(vs indep self-noise at 600f ~ {rmse(mean_img(False, 600, start=9000), ref):.5f})", flush=True)
