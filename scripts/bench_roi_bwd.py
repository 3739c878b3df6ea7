"""fwd+bwd timing for the RoIAlign atlas contraction: XLA custom-VJP vs
XLA-fwd+Pallas-bwd vs full Pallas, at PubLayNet train shapes."""
import os, time
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np
from layoutdit_tpu.ops.roi_align import pooled_from_weights_native
from layoutdit_tpu.ops import roi_align_pallas as rap

STEPS = 20
B, KPI, P, C, H_A, W_A = 16, 512, 7, 256, 109, 56
rng = np.random.default_rng(0)
f_cat = jnp.asarray(rng.standard_normal((B, C, H_A, W_A)), jnp.bfloat16)
wy = jnp.asarray(rng.standard_normal((B, KPI, P, H_A)) * 0.1, jnp.float32)
wx = jnp.asarray(rng.standard_normal((B, KPI, P, W_A)) * 0.1, jnp.float32)

def timed(name, grad_fn):
    @jax.jit
    def run(f):
        def body(i, acc):
            g = grad_fn(f + acc * 1e-30)
            return g.astype(jnp.float32).ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
    np.asarray(run(f_cat))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run(f_cat)); ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)/STEPS*1e3:7.3f} ms")

def loss_xla(f):
    out = jax.vmap(pooled_from_weights_native)(f, wy, wx)
    return jnp.sum(out.astype(jnp.float32) ** 2)

timed("xla fwd + xla bwd (custom vjp)", jax.grad(loss_xla))

def loss_mixed(f):
    # xla forward contraction, pallas backward kernel
    @jax.custom_vjp
    def pool(f1, wy1, wx1):
        return pooled_from_weights_native(f1, wy1, wx1)
    def fwd(f1, wy1, wx1):
        return pool(f1, wy1, wx1), (wy1, wx1)
    def bwd(res, ds):
        wy1, wx1 = res
        # pallas bwd wants [K, Py, Px, C] cotangent; native is [K, Py, C, Px]
        d = ds.transpose(0, 1, 3, 2).astype(jnp.bfloat16)
        df = rap._bwd(wy1.reshape(KPI, P, H_A), wx1.reshape(KPI, P, W_A), d, rap.DEFAULT_KB, False)
        return df, jnp.zeros_like(wy1), jnp.zeros_like(wx1)
    pool.defvjp(fwd, bwd)
    out = jax.vmap(pool)(f, wy, wx)
    return jnp.sum(out.astype(jnp.float32) ** 2)

timed("xla fwd + pallas bwd", jax.grad(loss_mixed))
