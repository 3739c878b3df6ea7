"""gemm2 (pooled = t @ wx per-roi) formulation shootout."""
import os, time
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

STEPS = 20
K, P, C, W = 8192, 7, 256, 56
rng = np.random.default_rng(0)
t_host = rng.standard_normal((K, P, C, W)).astype(np.float32)
wx_host = (rng.standard_normal((K, P, W)) * 0.1).astype(np.float32)
t = jnp.asarray(t_host, jnp.bfloat16)
wx = jnp.asarray(wx_host, jnp.bfloat16)
wx2 = jnp.asarray(np.broadcast_to(wx_host[:, None], (K, P, P, W)).reshape(K * P, P, W), jnp.bfloat16)
wx128_h = np.zeros((K, 128, W), np.float32); wx128_h[:, :P] = wx_host
wx128 = jnp.asarray(wx128_h, jnp.bfloat16)

def timed(name, fn, *ops):
    @jax.jit
    def run(t, *ops):
        def body(i, acc):
            out = fn(t + acc.astype(jnp.bfloat16), *ops)
            return out.astype(jnp.float32).ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
    np.asarray(run(t, *ops))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run(t, *ops)); ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)/STEPS*1e3:7.3f} ms", flush=True)

timed("a) bmm M=1792 N=7", lambda t, w: jax.lax.dot_general(
    t, w, (((3,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
).astype(jnp.bfloat16), wx)

timed("b) bmm M=7 N=1792", lambda t, w: jax.lax.dot_general(
    w, t, (((2,), (3,)), ((0,), (0,))), preferred_element_type=jnp.float32
).astype(jnp.bfloat16), wx)

timed("c) einsum kpcw,kqw->kpqc", lambda t, w: jnp.einsum(
    "kpcw,kqw->kpqc", t, w, preferred_element_type=jnp.float32
).astype(jnp.bfloat16), wx)

timed("d) bmm batch=K*P M=C N=7", lambda t, w: jax.lax.dot_general(
    t.reshape(K * P, C, W), w, (((2,), (2,)), ((0,), (0,))),
    preferred_element_type=jnp.float32).astype(jnp.bfloat16), wx2)

timed("e) bmm N=128 (px padded)", lambda t, w: jax.lax.dot_general(
    t, w, (((3,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
).astype(jnp.bfloat16)[:, :, :, :P], wx128)
