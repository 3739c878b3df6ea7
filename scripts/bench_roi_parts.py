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
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    return jax.vmap(single)(wy, f_cat)

t = jax.jit(gemm1)(f_cat, wy, jnp.float32(0))
print("t ready", t.shape, flush=True)

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
timed("gemm1+gemm2 fused (XLA)", fused, f_cat, wy, wx)
timed("box head 2xFC", box_head, pooled)


# Grouped block-diagonal gemm2: pack G rois' wx into one [G*W, G*P] block-
# diagonal rhs so the MXU sees N = G*P = 126 lanes instead of 7. FLOPs grow
# G-fold (the off-diagonal blocks are zeros) but utilization grows ~18x.
G = 18
K_TOT = B * KPI            # 8192
NG = K_TOT // G            # 455 groups (pad to exact)
K_PAD = NG * G

def grouped(f_cat, wy, wx, eps):
    wyf = (wy + eps).reshape(K_TOT, P, H_A)[:K_PAD].reshape(NG, G, P, H_A)
    wxf = (wx + eps).reshape(K_TOT, P, W_A)[:K_PAD].reshape(NG, G, P, W_A)
    # f per group: group g contains rois of image k = (g*G + i)//KPI; a
    # group can straddle two images. For the bench just use image 0's
    # feature for all (shapes/perf identical; correctness handled in the
    # real impl by keeping groups within one image).
    f3 = f_cat[0].transpose(1, 0, 2)  # [H, C, W]
    # t5[n, i, py, c, w]
    t5 = jax.lax.dot_general(
        wyf.astype(jnp.bfloat16), f3.astype(jnp.bfloat16),
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # [NG, G, P, C, W]
    # block-diag rhs B5[n, i, w, j, px] = delta_ij wx[n, i, px, w]
    eye = jnp.eye(G, dtype=jnp.bfloat16)
    b5 = (
        wxf.astype(jnp.bfloat16).transpose(0, 1, 3, 2)[:, :, :, None, :]
        * eye[None, :, None, :, None]
    )  # [NG, G(i), W, G(j), P]
    out = jax.lax.dot_general(
        t5, b5,
        (((1, 4), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [NG, P(py), C, G(j), P(px)]
    return out.astype(jnp.bfloat16)

timed("grouped g1+g2 (G=18 block-diag)", grouped, f_cat, wy, wx)
