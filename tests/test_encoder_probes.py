"""Encoder-forward probe knobs (PERF_STAGES.md round 5): exactness of
embedding-time token padding, and bounded drift of bf16 score storage.

Both knobs exist to chase the encoder-forward headroom the floor table
flags (6.42 ms measured vs a 2.8 ms GEMM floor); neither changes
defaults. pad_tokens_to must be EXACT for real tokens (masked keys
contribute exp(-inf) = 0 to every softmax row); score_dtype="bfloat16"
is lossy by design and only bounded here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdit_tpu.models import vit as vit_mod
from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward


def _cfg(**kw):
    base = dict(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, image_size=48, patch_size=16,
    )
    base.update(kw)
    return ViTConfig(**base)


def _run(cfg, params, x, taps=(1, 3), dtype=jnp.float32):
    outs = vit_forward(params, x, cfg, taps=taps, compute_dtype=dtype,
                       attention_impl="xla")
    return [np.asarray(o.astype(jnp.float32)) for o in outs]


def test_pad_tokens_exact_fp32():
    """197->256-style padding is EXACT for the real tokens in fp32
    (here 10 tokens -> 16): padded keys are excluded from every softmax
    row and contribute exactly zero."""
    cfg = _cfg()
    padded = _cfg(pad_tokens_to=16)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 48, 48)), jnp.float32)
    base = _run(cfg, params, x)
    probe = _run(padded, params, x)
    for b_, p_ in zip(base, probe):
        assert b_.shape == p_.shape
        np.testing.assert_allclose(b_, p_, rtol=1e-6, atol=1e-6)


def test_pad_tokens_exact_with_rel_bias():
    """The bias-table pad (zeros on padded entries) does not disturb real
    rows either — rel-pos-bias models get the same exactness."""
    cfg = _cfg(use_relative_position_bias=True,
               use_absolute_position_embeddings=False)
    padded = _cfg(pad_tokens_to=16, use_relative_position_bias=True,
                  use_absolute_position_embeddings=False)
    params = init_vit_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 48, 48)), jnp.float32)
    base = _run(cfg, params, x)
    probe = _run(padded, params, x)
    for b_, p_ in zip(base, probe):
        np.testing.assert_allclose(b_, p_, rtol=1e-6, atol=1e-6)


def test_pad_tokens_grad_flows_and_matches():
    """Training with the pad knob: gradients through the padded stack
    match the unpadded ones (the pad slots are dead ends). Tolerance is
    relative: padding widens matmul contraction extents with exact-zero
    terms, which changes fp32 reduction ORDER (ulp-level) but not
    values."""
    cfg = _cfg()
    padded = _cfg(pad_tokens_to=16)
    params = init_vit_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 48, 48)), jnp.float32)

    def loss(p, c):
        outs = vit_forward(p, x, c, taps=(3,), compute_dtype=jnp.float32,
                           attention_impl="xla")
        return (outs[0] ** 2).sum()

    g_base = jax.grad(loss)(params, cfg)
    g_pad = jax.grad(loss)(params, padded)
    flat_b = jax.tree_util.tree_leaves(g_base)
    flat_p = jax.tree_util.tree_leaves(g_pad)
    for a, b in zip(flat_b, flat_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-9
        np.testing.assert_allclose(a / scale, b / scale,
                                   rtol=1e-5, atol=1e-5)


def test_pad_tokens_inert_when_smaller_than_n():
    """pad_tokens_to below the real token count is a no-op (high-res
    pages under the base-res knob must not break)."""
    cfg = _cfg(pad_tokens_to=4)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 3, 48, 48), jnp.float32)
    outs = _run(cfg, params, x)
    assert outs[0].shape[1] == 1 + (48 // 16) ** 2


def test_bf16_scores_bounded_drift():
    """score_dtype="bfloat16" output stays within ~1% of the exact path
    in bf16 compute (the serving-relevant configuration)."""
    cfg = _cfg()
    probe_cfg = _cfg(score_dtype="bfloat16")
    params = init_vit_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 48, 48)), jnp.float32)
    base = _run(cfg, params, x, dtype=jnp.bfloat16)
    probe = _run(probe_cfg, params, x, dtype=jnp.bfloat16)
    for b_, p_ in zip(base, probe):
        err = np.abs(b_ - p_).max() / (np.abs(b_).max() + 1e-9)
        assert err < 0.02, err


@pytest.mark.parametrize("knob", [{"pad_tokens_to": 16},
                                  {"score_dtype": "bfloat16"}])
def test_probe_knobs_compose_with_vit_overrides(knob):
    """Both knobs are reachable through ModelConfig.vit_overrides (the
    probe surface documented in PERF_STAGES.md)."""
    from layoutdit_tpu.config.constructs import ModelConfig
    from layoutdit_tpu.models.detection.detector import DetectorConfig

    mc = ModelConfig(vit_overrides=dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, **knob,
    ))
    cfg = DetectorConfig.from_model_config(mc)
    for k, v in knob.items():
        assert getattr(cfg.backbone.vit, k) == v
