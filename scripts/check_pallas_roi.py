import os, time
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from layoutdit_tpu.ops.roi_align import multiscale_roi_align

rng = np.random.default_rng(0)
# PubLayNet shapes: 5 FPN levels at 224 input, C=256, P=7
C = 256
feats = [jnp.asarray(rng.standard_normal((C, s, s)), jnp.bfloat16)
         for s in (56, 28, 14, 7, 4)]
K = 512
boxes = rng.uniform(0, 200, (K, 4)).astype(np.float32)
boxes[:, 2:] = boxes[:, :2] + rng.uniform(4, 80, (K, 2))
rois = jnp.asarray(np.clip(boxes, 0, 224))
mask = jnp.asarray(rng.uniform(size=(K,)) < 0.9)

def run(impl, native):
    f = jax.jit(lambda fs, r: multiscale_roi_align(
        fs, r, spatial_scales=(0.25, 0.125, 0.0625, 0.03125, 1/56),
        output_size=7, sampling_ratio=2, canonical_scale=224.0,
        roi_mask=mask, impl=impl, native_layout=native))
    out = f(feats, rois); out.block_until_ready()
    ts = []
    for _ in range(20):
        t0 = time.perf_counter(); f(feats, rois).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return out, np.median(ts) * 1e3

x, tx = run("xla", True)
p, tp = run("pallas", True)
err = float(jnp.max(jnp.abs(x.astype(jnp.float32) - p.astype(jnp.float32))))
print(f"fwd: xla {tx:.3f} ms  pallas {tp:.3f} ms  maxerr {err:.5f}")

# backward
def loss(impl):
    def g(fs):
        out = multiscale_roi_align(
            fs, rois, spatial_scales=(0.25, 0.125, 0.0625, 0.03125, 1/56),
            output_size=7, sampling_ratio=2, canonical_scale=224.0,
            roi_mask=mask, impl=impl, native_layout=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)
    return jax.jit(jax.grad(g))

gx = loss("xla"); gp = loss("pallas")
a = gx(feats); jax.block_until_ready(a)
b = gp(feats); jax.block_until_ready(b)
errs = [float(jnp.max(jnp.abs(u.astype(jnp.float32) - v.astype(jnp.float32)))) for u, v in zip(a, b)]
def t(f):
    ts=[]
    for _ in range(20):
        t0=time.perf_counter(); jax.block_until_ready(f(feats)); ts.append(time.perf_counter()-t0)
    return np.median(ts)*1e3
print(f"bwd: xla {t(gx):.3f} ms  pallas {t(gp):.3f} ms  maxerrs {max(errs):.5f}")
