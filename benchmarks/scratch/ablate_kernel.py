"""Ablation: decompose the closest kernel's device time into
super-votes / cluster-votes / triangle (MT) work. Scratch tool."""
from vkrt_tpu.utils.jaxcache import enable; enable()
import time, functools, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas import trace as T
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.utils.camera import Camera, generate_rays

LANES, PROG_ROWS, BLOCK_ROWS, SUBS, SUPER, WORD, CLUSTER, GROUP, INF = (
    T.LANES, T.PROG_ROWS, T.BLOCK_ROWS, T.SUBS, T.SUPER, T.WORD, T.CLUSTER, T.GROUP, T.INF)

def make_kernel(mode):
    def kernel(n_super, t_min, t_max, super_ref, cluster_ref, *rest):
        tri_refs = rest[:9]
        rays_ref, out_ref = rest[9], rest[10]
        rays = rays_ref[:]
        ox_a = rays[:, 0*LANES:1*LANES]; oy_a = rays[:, 1*LANES:2*LANES]
        oz_a = rays[:, 2*LANES:3*LANES]; dx_a = rays[:, 3*LANES:4*LANES]
        dy_a = rays[:, 4*LANES:5*LANES]; dz_a = rays[:, 5*LANES:6*LANES]
        def safe_inv(d):
            return pl.reciprocal(jnp.where(jnp.abs(d)<1e-20, jnp.where(d<0,-1e-20,1e-20), d), approx=False)
        neg1_bits = pltpu.bitcast(jnp.full((PROG_ROWS,LANES),-1,jnp.int32), jnp.float32)
        out_ref[:] = jnp.concatenate([
            jnp.full((PROG_ROWS,LANES),INF,jnp.float32), neg1_bits,
            jnp.zeros((PROG_ROWS,2*LANES),jnp.float32)], axis=1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32,(GROUP,LANES),0)
        for sub in range(SUBS):
            rb = sub*BLOCK_ROWS
            sl = pl.ds(rb, BLOCK_ROWS)
            ox,oy,oz = ox_a[rb:rb+BLOCK_ROWS],oy_a[rb:rb+BLOCK_ROWS],oz_a[rb:rb+BLOCK_ROWS]
            dx,dy,dz = dx_a[rb:rb+BLOCK_ROWS],dy_a[rb:rb+BLOCK_ROWS],dz_a[rb:rb+BLOCK_ROWS]
            ix,iy,iz = safe_inv(dx),safe_inv(dy),safe_inv(dz)
            def cluster_work(c, count_only=False):
                tiles = T._cluster_tiles(tri_refs, c)
                for row in range(BLOCK_ROWS):
                    oxr=ox[row:row+1,:]; oyr=oy[row:row+1,:]; ozr=oz[row:row+1,:]
                    dxr=dx[row:row+1,:]; dyr=dy[row:row+1,:]; dzr=dz[row:row+1,:]
                    r = rb+row
                    t_row = out_ref[r:r+1, 0:LANES]
                    idx_row = pltpu.bitcast(out_ref[r:r+1, LANES:2*LANES], jnp.int32)
                    u_row = out_ref[r:r+1, 2*LANES:3*LANES]
                    v_row = out_ref[r:r+1, 3*LANES:4*LANES]
                    for g in range(CLUSTER//GROUP):
                        base = c*CLUSTER + g*GROUP
                        t_c,u_c,v_c,valid,*_ = T._mt_group(tiles,g,oxr,oyr,ozr,dxr,dyr,dzr,t_min)
                        t_c = jnp.where(t_c<t_max,t_c,INF)
                        t_min_g = jnp.min(t_c,axis=0,keepdims=True)
                        is_min = t_c==t_min_g
                        win_sub = jnp.min(jnp.where(is_min,sub_iota,GROUP),axis=0,keepdims=True)
                        pick = sub_iota==win_sub
                        u_g = jnp.sum(jnp.where(pick,u_c,0.0),axis=0,keepdims=True)
                        v_g = jnp.sum(jnp.where(pick,v_c,0.0),axis=0,keepdims=True)
                        improved = t_min_g<t_row
                        t_row = jnp.where(improved,t_min_g,t_row)
                        idx_g = base+win_sub
                        idx_row = jnp.where(improved,idx_g,idx_row)
                        u_row = jnp.where(improved,u_g,u_row)
                        v_row = jnp.where(improved,v_g,v_row)
                    out_ref[r:r+1,0:LANES]=t_row
                    out_ref[r:r+1,LANES:2*LANES]=pltpu.bitcast(idx_row,jnp.float32)
                    out_ref[r:r+1,2*LANES:3*LANES]=u_row
                    out_ref[r:r+1,3*LANES:4*LANES]=v_row
            def count_cluster(c):
                # minimal body: record the visit without MT work
                out_ref[rb:rb+1, 2*LANES:2*LANES+LANES] = (
                    out_ref[rb:rb+1, 2*LANES:2*LANES+LANES] + 1.0)
            def t_best():
                return out_ref[sl, 0:LANES]
            def visit_super(s):
                cword = T._vote_word(cluster_ref, s*SUPER, SUPER, ox,oy,oz,ix,iy,iz,t_min,t_best())
                if mode == "full":
                    T._for_each_set_bit(cword, lambda k: cluster_work(s*SUPER+k))
                elif mode == "count":
                    T._for_each_set_bit(cword, lambda k: count_cluster(s*SUPER+k))
                # mode == "votes": drop the cluster visits entirely
            for w in range(-(-n_super//WORD)):
                count = min(WORD, n_super - w*WORD)
                sword = T._vote_word(super_ref, w*WORD, count, ox,oy,oz,ix,iy,iz,t_min,t_best())
                if mode == "svote":
                    continue
                T._for_each_set_bit(sword, lambda sb, w=w: visit_super(w*WORD+sb))
    return kernel

def make_call(cs, mode):
    kernel = functools.partial(make_kernel(mode), cs.n_super, T_MIN, T_MAX)
    def call(orig, direction):
        packed, n, rows = T._pack_rays(orig, direction)
        chunks, chunk_rows = T._chunk_rows(packed, rows)
        ray_spec = pl.BlockSpec((PROG_ROWS,6*LANES), lambda i:(i,0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((PROG_ROWS,4*LANES), lambda i:(i,0), memory_space=pltpu.VMEM)
        def chunk_body(chunk):
            out = pl.pallas_call(kernel, grid=(chunk_rows//PROG_ROWS,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*11 + [ray_spec],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((chunk_rows,4*LANES),jnp.float32),
            )(cs.super_aabb, cs.cluster_aabb, *cs.tri_cols, chunk)
            return jax.lax.optimization_barrier(out)
        out = jax.lax.map(chunk_body, chunks).reshape(-1,4*LANES)
        return out[:, 2*LANES:3*LANES].reshape(-1)[:n]  # u col / counter col
    return call

def slope_time(fn, o, d, reps_hi=8):
    def mk(reps):
        @jax.jit
        def run():
            def body(i, carry):
                oo, dd = carry
                out = fn(oo, dd)
                oo = jax.lax.optimization_barrier(oo + 1e-30*out[:,None])
                return oo, dd
            oo,_ = jax.lax.fori_loop(0, reps, body, (o,d))
            return oo[0]
        return run
    f1,f8 = mk(1), mk(reps_hi)
    jax.device_get(f1()); jax.device_get(f8())
    t0=time.perf_counter(); jax.device_get(f1()); t1=time.perf_counter()
    jax.device_get(f8()); t2=time.perf_counter()
    return ((t2-t1)-(t1-t0))/(reps_hi-1)

if __name__ == "__main__":
    import sys
    which_scene = sys.argv[1] if len(sys.argv)>1 else "cornell"
    scene = scene_mod.load_cornell() if which_scene=="cornell" else scene_mod.make_city(grid=96)
    from vkrt_tpu.ops.pallas.trace import build_cluster_scene
    cs = build_cluster_scene(scene.tri_v0, scene.tri_e1, scene.tri_e2)
    print(f"{which_scene}: tris={scene.num_tris} clusters={cs.n_clusters} supers={cs.n_super}")
    W,H=1280,720; n=(W*H)//1024*1024
    cam = Camera().matrices(W,H)
    o_p,d_p = generate_rays(cam,W,H,jnp.full((W*H,2),0.5,jnp.float32))
    o_p,d_p = o_p[:n],d_p[:n]
    rng = np.random.default_rng(0)
    v0=np.asarray(scene.tri_v0); lo,hi=v0.min(0),v0.max(0)
    o_i=jnp.asarray(rng.uniform(lo,hi,(n,3)).astype(np.float32))
    d_i=rng.normal(size=(n,3)).astype(np.float32); d_i/=np.linalg.norm(d_i,axis=1,keepdims=True)
    d_i=jnp.asarray(d_i)
    for rays_name,(o,d) in (("primary",(o_p,d_p)),("incoher",(o_i,d_i))):
        for mode in ("svote","votes","count","full"):
            call = make_call(cs, mode)
            if mode=="count":
                cnt = jax.jit(call)(o,d)
                per_block = np.asarray(cnt).reshape(-1,1024)[: ,0]  # counter stored in row rb lane col
                print(f"  {rays_name} voted clusters/block: mean={per_block.mean():7.1f} p50={np.percentile(per_block,50):6.0f} p95={np.percentile(per_block,95):6.0f} max={per_block.max():6.0f}")
            dt = slope_time(call,o,d)
            print(f"  {rays_name} {mode:6s}: {dt*1e3:8.2f} ms")
