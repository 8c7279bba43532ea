"""vkrt_tpu — a TPU-native real-time ray tracing framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of the Vulkan engine
``CristianSimion5/vk-raytracing-engine`` (mounted read-only at /root/reference),
designed TPU-first:

* the scene is a flat SoA pytree of device arrays (the TPU analog of the
  reference's ``SceneDesc`` buffer-device-address table,
  ``shaders/host_device.h:107-117``),
* rays are traced in large batches through either a fused brute-force
  intersector (VPU-friendly ray x triangle blocks), an LBVH built on-device
  with ``jax.lax`` sort/scan primitives, or Pallas kernels,
* a frame is a pure function ``render(scene, camera, params, accum) ->
  (image, accum)`` under ``jax.jit`` — progressive accumulation
  (``shaders/raytrace.rgen:136-145``) is functional state, not a mutable
  framebuffer,
* multi-chip scaling shards the pixel/sample space over a
  ``jax.sharding.Mesh`` with the scene/BVH replicated per chip.

Subpackages
-----------
``vkrt_tpu.utils``     camera, glTF loader, PNG io, small math helpers
``vkrt_tpu.ops``       RNG, sampling, BRDFs, intersection, trace backends
``vkrt_tpu.bvh``       LBVH build (Morton + Karras) and threaded flattening
``vkrt_tpu.models``    path tracer, G-buffer, hybrid effects, denoiser, post
``vkrt_tpu.parallel``  device-mesh sharded rendering
"""

from vkrt_tpu.config import EngineConfig, RenderSettings, load_config

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "RenderSettings",
    "load_config",
    "__version__",
]
