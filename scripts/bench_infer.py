"""Inference throughput: detector_predict (backbone -> RPN -> RoI heads ->
per-class NMS -> top-100), bs16 224x224, scan-inside-jit methodology."""
import os, sys, time, json
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig, detector_predict, init_detector_params,
)

batch = int(os.environ.get("BENCH_BATCH", 16))
steps = int(os.environ.get("BENCH_STEPS", 20))
# serving-budget knob (VERDICT r3 item 1c): rpn_post_nms_top_n_test
# controls how many proposals/img the predict path pools (torchvision
# default 1000; train pools 512)
post_n = int(os.environ.get("BENCH_POST_NMS", 0))
if post_n:
    from layoutdit_tpu.config.constructs import DetectionBudget

    cfg = DetectorConfig(
        compute_dtype="bfloat16",
        budget=DetectionBudget(rpn_post_nms_top_n_test=post_n),
    )
else:
    cfg = DetectorConfig(compute_dtype="bfloat16")
params = init_detector_params(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.uniform(0, 1, (batch, 3, 224, 224)), jnp.float32)

@jax.jit
def run(params, images):
    def body(i, acc):
        det = detector_predict(params, images + acc * 1e-30, cfg)
        return det.scores.astype(jnp.float32).ravel()[0] * 1e-30
    return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

np.asarray(run(params, images))  # compile + warmup
ts = []
for _ in range(3):
    t0 = time.time(); np.asarray(run(params, images)); ts.append(time.time() - t0)
dt = min(ts)
print(json.dumps({
    "metric": "publaynet_dit_base_infer_throughput",
    "value": round(batch * steps / dt, 2),
    "unit": "images/sec/chip",
    "ms_per_batch": round(dt / steps * 1e3, 2),
}))
