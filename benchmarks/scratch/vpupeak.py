"""VPU speed-of-light microbenchmark: measured peak (8,128)-vreg FMA
throughput of one TensorCore, for the trace-kernel roofline argument.

The trace kernel's inner loop is pure VPU work ((8,128) f32 vregs: slab
votes, Moller-Trumbore, winner merges) — no MXU, no HBM traffic once the
block is resident. Its speed-of-light is therefore the chip's sustained
vector-FMA rate. This kernel issues K dependent-chain-free FMAs per
(8,128) tile over a grid of tiles and reports achieved FMA-vreg-ops/s;
divide the trace kernel's analytic per-frame vreg-op count (see
benchmarks/scratch/poolstats.py visit counts x ops/visit) by this number
for the fraction-of-roofline the frame achieves.

Usage: python -m benchmarks.scratch.vpupeak [K=512] [TILES=4096] [REPS=20]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkrt_tpu.utils import jaxcache

jaxcache.enable()

K = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
TILES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
ROWS = 8
LANES = 128
UNROLL = 64  # FMA vregs per fori iteration (8 chains x 8 deep)


def kernel(x_ref, o_ref):
    x = x_ref[:]
    # 8 independent accumulator chains so the FMA latency pipelines;
    # multipliers chosen so values stay O(1) (no inf/denormal stalls).
    # K must be large enough that per-program overhead (DMA + launch,
    # ~10-30us through the tunnel) is noise: a 512-FMA version measured
    # 0.06 G vreg-FMA/s — pure overhead, not the VPU.
    c = 1.0000001

    def step(accs):
        return tuple(a * c + 1e-7 for a in accs)

    def body(_, accs):
        for _ in range(UNROLL // 8):  # 8 chains x 8 deep per iteration
            accs = step(accs)
        return accs

    accs = jax.lax.fori_loop(
        0, K // UNROLL, body,
        tuple(x * (0.9 + 0.01 * i) for i in range(8)),
    )
    out = accs[0]
    for a in accs[1:]:
        out = out + a
    o_ref[:] = out


@jax.jit
def run(x):
    return pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * ROWS, LANES), jnp.float32),
    )(x)


def main():
    x = jnp.ones((TILES * ROWS, LANES), jnp.float32) * 0.5
    jax.device_get(run(x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = run(x)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / REPS
    fma_vregs = (K // UNROLL) * UNROLL * TILES  # per rep, (8,128) FMA ops
    flops = fma_vregs * ROWS * LANES * 2  # 2 flops per FMA lane
    print(f"K={K} TILES={TILES}: {dt*1e3:.3f} ms/rep")
    print(f"achieved: {fma_vregs/dt/1e9:.2f} G vreg-FMA/s "
          f"= {flops/dt/1e12:.3f} TFLOP/s f32 VPU")


if __name__ == "__main__":
    main()
