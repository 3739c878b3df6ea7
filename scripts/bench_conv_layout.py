"""FPN/RPN-head conv cost: NCHW (torch-parity layout) vs NHWC at bs16."""
import os, time
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

STEPS = 30
B, C = 16, 256
SIZES = [56, 28, 14, 7, 4]
rng = np.random.default_rng(0)
feats_nchw = [jnp.asarray(rng.standard_normal((B, C, s, s)), jnp.bfloat16) for s in SIZES]
feats_nhwc = [f.transpose(0, 2, 3, 1) for f in feats_nchw]
k33 = jnp.asarray(rng.standard_normal((C, C, 3, 3)) * 0.02, jnp.bfloat16)  # OIHW
k33_hwio = k33.transpose(2, 3, 1, 0)
k11o = jnp.asarray(rng.standard_normal((3, C, 1, 1)) * 0.02, jnp.bfloat16)
k11o_hwio = k11o.transpose(2, 3, 1, 0)

def timed(name, fn, ops):
    @jax.jit
    def run(ops):
        def body(i, acc):
            out = fn([o + acc.astype(o.dtype) for o in ops])
            return sum(o.astype(jnp.float32).ravel()[0] for o in out) * 1e-30
        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
    np.asarray(run(ops))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run(ops)); ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)/STEPS*1e3:7.3f} ms", flush=True)

def convs_nchw(fs):
    out = []
    for f in fs:
        y = jax.lax.conv_general_dilated(
            f, k33, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = jax.nn.relu(y)
        o = jax.lax.conv_general_dilated(
            y, k11o, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        out.append(o)
    return out

def convs_nhwc(fs):
    out = []
    for f in fs:
        y = jax.lax.conv_general_dilated(
            f, k33_hwio, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y)
        o = jax.lax.conv_general_dilated(
            y, k11o_hwio, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out.append(o)
    return out

timed("rpn-head-ish convs NCHW", convs_nchw, feats_nchw)
timed("rpn-head-ish convs NHWC", convs_nhwc, feats_nhwc)

# 3x3 as explicit matmul over shifted views (NHWC, padding folded):
def convs_matmul(fs):
    w2 = k33_hwio.reshape(9 * C, C)
    out = []
    for f in fs:
        b, h, w, c = f.shape
        fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [fp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)],
            axis=-1)  # [B, H, W, 9C]
        y = jax.nn.relu(jnp.dot(cols, w2, preferred_element_type=jnp.float32).astype(f.dtype))
        o = jnp.dot(y, k11o_hwio.reshape(C, 3), preferred_element_type=jnp.float32)
        out.append(o)
    return out

import sys
if "--matmul" in sys.argv:
    timed("rpn-head-ish convs 3x3-as-matmul", convs_matmul, feats_nhwc)
