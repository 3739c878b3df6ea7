"""Microbench the RoI-stage pieces at PubLayNet train shapes (bs16).

Each candidate runs `steps` iterations inside one jit (fori_loop with a
data dependency) so tunnel dispatch latency cannot pollute the numbers.
"""
import os, sys, time
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

STEPS = 30
B, KPI, P, C = 16, 512, 7, 256
H_A, W_A = 109, 56
K = B * KPI  # 8192 rois total

rng = np.random.default_rng(0)
f_cat = jnp.asarray(rng.standard_normal((B, C, H_A, W_A)), jnp.bfloat16)
wy = jnp.asarray(rng.standard_normal((B, KPI, P, H_A)) * 0.1, jnp.float32)
wx = jnp.asarray(rng.standard_normal((B, KPI, P, W_A)) * 0.1, jnp.float32)
pooled = jnp.asarray(rng.standard_normal((B, KPI, P, C, P)), jnp.bfloat16)
bh_w1 = jnp.asarray(rng.standard_normal((P * C * P, 1024)) * 0.01, jnp.bfloat16)
bh_w2 = jnp.asarray(rng.standard_normal((1024, 1024)) * 0.01, jnp.bfloat16)

def timed(name, fn, *args):
    @jax.jit
    def run(args):
        def body(i, acc):
            out = fn(*args, acc)
            return jnp.real(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
    r = run(args); np.asarray(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run(args)); ts.append(time.perf_counter() - t0)
    ms = min(ts) / STEPS * 1e3
    print(f"{name:34s} {ms:7.3f} ms")
    return ms

def gemm1(f_cat, wy, eps):
    # t[b,k,p,c,w] = sum_h wy[b,k,p,h] f[b,h,c,w]  (the big skinny-K GEMM)
    def single(w, f):
        return jax.lax.dot_general(
            (w + eps).astype(jnp.bfloat16), f.transpose(1, 0, 2),
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    return jax.vmap(single)(wy, f_cat)

t = gemm1(f_cat, wy, jnp.float32(0))

def gemm2(t, wx, eps):
    # s[b,k,py,c,px] = sum_w t[b,k,py,c,w] wx[b,k,px,w]  (batched N=7)
    def single(t_i, w_i):
        return jax.lax.dot_general(
            t_i, (w_i + eps).astype(jnp.bfloat16),
            (((3,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    return jax.vmap(single)(t, wx)

def gemm2_vpu(t, wx, eps):
    # same contraction as broadcast-multiply + reduce (VPU)
    tt = t[:, :, :, None, :, :]          # [B,K,Py,1,C,W]
    ww = (wx + eps).astype(jnp.bfloat16)[:, :, None, :, None, :]  # [B,K,1,Px,1,W]
    return jnp.sum(tt * ww, axis=-1)     # [B,K,Py,Px,C]

def box_head(pooled, eps):
    x = (pooled + eps).reshape(B * KPI, P * C * P)
    h = jax.nn.relu(jax.lax.dot_general(x, bh_w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    return jax.nn.relu(jax.lax.dot_general(h, bh_w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))

def fused(f_cat, wy, wx, eps):
    return gemm2(gemm1(f_cat, wy, eps), wx, eps)

timed("gemm1 (wy @ F, K=109)", gemm1, f_cat, wy)
timed("gemm2 batched N=7 (t @ wx)", gemm2, t, wx)
timed("gemm2 as VPU bcast-reduce", gemm2_vpu, t, wx)
timed("gemm1+gemm2 fused (XLA)", fused, f_cat, wy, wx)
timed("box head 2xFC", box_head, pooled)
