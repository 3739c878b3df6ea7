"""High-res inference on the real chip: the flash-attention production
path (auto-selected >= 1024 tokens) + pos-embed interpolation, through
detector_predict at 512x512. Parity-checks flash vs xla attention on
device, then times both."""
import os, time, json
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig, detector_predict, init_detector_params,
)

SIZE = 512  # 32x32 grid -> 1025 tokens >= AUTO_FLASH_MIN_SEQ
batch, steps = 4, 10
rng = np.random.default_rng(0)
images = jnp.asarray(rng.uniform(0, 1, (batch, 3, SIZE, SIZE)), jnp.float32)

def build(attn):
    cfg = DetectorConfig(compute_dtype="bfloat16", attention_impl=attn,
                         image_size=SIZE)
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    return cfg, params

cfg_x, params = build("xla")
cfg_p, _ = build("pallas")

def timed(cfg):
    @jax.jit
    def run(params, images):
        def body(i, acc):
            det = detector_predict(params, images + acc * 1e-30, cfg)
            return det.scores.astype(jnp.float32).ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))
    np.asarray(run(params, images))
    ts = []
    for _ in range(3):
        t0 = time.time(); np.asarray(run(params, images)); ts.append(time.time() - t0)
    return min(ts) / steps * 1e3

# on-device parity first
dx = jax.jit(lambda p, im: detector_predict(p, im, cfg_x))(params, images)
dp = jax.jit(lambda p, im: detector_predict(p, im, cfg_p))(params, images)
err = float(jnp.max(jnp.abs(dx.boxes - dp.boxes)))
serr = float(jnp.max(jnp.abs(dx.scores - dp.scores)))
tx, tp = timed(cfg_x), timed(cfg_p)
print(json.dumps({
    "metric": "highres512_infer_ms_per_batch4",
    "xla_ms": round(tx, 2), "pallas_flash_ms": round(tp, 2),
    "box_maxdiff": round(err, 4), "score_maxdiff": round(serr, 6),
    "img_per_s_flash": round(batch * 1e3 / tp, 1),
}))
