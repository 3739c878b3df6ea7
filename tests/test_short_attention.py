"""Short-sequence fused attention parity tests (interpret mode on CPU;
the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.ops.short_attention import short_attention


def _reference(q, k, v, scale=None):
    d = q.shape[-1]
    scale = scale or 1.0 / np.sqrt(d)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32)).astype(q.dtype)


def _rand(rng, shape, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)


@pytest.mark.parametrize("n", [64, 128, 197, 256, 300])
def test_forward_matches_reference(rng, n):
    # 197 is the production point (224 px dit pages); the others cover
    # exact-multiple and worst-case pad remainders of the 128-lane block.
    b, h, d = 2, 3, 64
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))
    want = _reference(q, k, v)
    got = short_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


@pytest.mark.parametrize("bh", [(1, 3), (1, 2), (1, 4), (2, 4), (4, 12)])
def test_head_grouping_shapes(rng, bh):
    # bh products 3/2/4/8/48 pick g = 1/2/4/8/8 — parity must hold for
    # EVERY _pick_group outcome (a grouping bug specific to one g must
    # not slip through).
    b, h = bh
    n, d = 197, 32
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))
    want = _reference(q, k, v)
    got = short_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_gradients_match_reference(rng):
    b, n, h, d = 1, 130, 2, 32
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))

    def loss_short(q, k, v):
        return (short_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference(q, k, v) ** 2).sum()

    g_short = jax.grad(loss_short, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gs, gr, name in zip(g_short, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), atol=1e-3, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_gradients_at_production_shape(rng):
    # N=197 pads to 256: 59 dead rows/columns flow through the backward
    # recompute — grads must not pick up padding contributions.
    b, n, h, d = 2, 197, 2, 32
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))
    g_short = jax.grad(
        lambda q, k, v: (short_attention(q, k, v, interpret=True) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: (_reference(q, k, v) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    for gs, gr, name in zip(g_short, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), atol=1e-3, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_forward(rng):
    b, n, h, d = 2, 197, 2, 64
    q, k, v = (_rand(rng, (b, n, h, d), jnp.bfloat16) for _ in range(3))
    want = np.asarray(_reference(q, k, v)).astype(np.float32)
    got = np.asarray(short_attention(q, k, v, interpret=True)).astype(np.float32)
    assert np.abs(got - want).max() < 0.05


def test_bf16_gradients_finite_and_close(rng):
    b, n, h, d = 2, 197, 2, 64
    q, k, v = (_rand(rng, (b, n, h, d), jnp.bfloat16) for _ in range(3))
    g = jax.grad(
        lambda q, k, v: (
            short_attention(q, k, v, interpret=True).astype(jnp.float32) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: (_reference(q, k, v).astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for gs, grr in zip(g, gr):
        gs = np.asarray(gs).astype(np.float32)
        grr = np.asarray(grr).astype(np.float32)
        assert np.isfinite(gs).all()
        assert np.abs(gs - grr).max() < 0.25  # bf16 storage of both operands


def test_vit_explicit_short_matches_xla(rng):
    """vit_forward(attention_impl='short') == 'xla' path on a dit-style
    (no rel-pos-bias) model."""
    from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from unittest import mock
    import layoutdit_tpu.ops.short_attention as sa

    cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=64,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = _rand(rng, (1, 3, 64, 64))
    want = vit_forward(params, x, cfg)[0]
    orig = sa.short_attention
    with mock.patch.object(
        sa, "short_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    ):
        got = vit_forward(params, x, cfg, attention_impl="short")[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_short_rejects_rel_bias():
    """Explicit 'short' on a rel-pos-bias model must fail loudly, not
    silently drop the bias."""
    from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

    cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=128, image_size=64,
        use_relative_position_bias=True, use_absolute_position_embeddings=False,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 3, 64, 64), jnp.float32)
    with pytest.raises(ValueError, match="short"):
        vit_forward(params, x, cfg, attention_impl="short")
