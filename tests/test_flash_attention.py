"""Flash-attention kernel parity tests (interpret mode on CPU; the same
kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.ops.flash_attention import flash_attention


def _reference(q, k, v, bias=None, scale=None):
    d = q.shape[-1]
    scale = scale or 1.0 / np.sqrt(d)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    if bias is not None:
        s = s + bias[None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32)).astype(q.dtype)


def _rand(rng, shape, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)


@pytest.mark.parametrize("n", [128, 197, 256, 300])
def test_forward_matches_reference(rng, n):
    b, h, d = 2, 3, 64
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))
    want = _reference(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_forward_with_bias(rng):
    b, n, h, d = 2, 197, 3, 64
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))
    bias = _rand(rng, (h, n, n))
    want = _reference(q, k, v, bias)
    got = flash_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_gradients_match_reference(rng):
    b, n, h, d = 1, 130, 2, 32
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference(q, k, v) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-3, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_bias_gradient(rng):
    b, n, h, d = 1, 64, 2, 32
    q, k, v = (_rand(rng, (b, n, h, d)) for _ in range(3))
    bias = _rand(rng, (h, n, n))

    gf = jax.grad(
        lambda bb: (flash_attention(q, k, v, bias=bb, interpret=True) ** 2).sum()
    )(bias)
    gr = jax.grad(lambda bb: (_reference(q, k, v, bb) ** 2).sum())(bias)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-3,
                               rtol=1e-3)


def test_bf16_forward(rng):
    b, n, h, d = 2, 197, 2, 64
    q, k, v = (_rand(rng, (b, n, h, d), jnp.bfloat16) for _ in range(3))
    want = np.asarray(_reference(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True)).astype(np.float32)
    assert np.abs(got - want).max() < 0.05


def test_vit_uses_flash_attention(rng):
    """End-to-end: vit_forward(attention_impl='pallas') == 'xla' path."""
    from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from unittest import mock
    import layoutdit_tpu.ops.flash_attention as fa

    cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=64,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = _rand(rng, (1, 3, 64, 64))
    want = vit_forward(params, x, cfg)[0]
    orig = fa.flash_attention
    with mock.patch.object(
        fa, "flash_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    ):
        got = vit_forward(params, x, cfg, attention_impl="pallas")[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )
