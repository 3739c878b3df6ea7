"""Ring attention (ops/ring_attention.py): exact sequence-sharded
attention with K/V rotating over the mesh axis via ppermute. Parity —
op level (fwd + grads, ragged N with padding), encoder level, and full
detector loss on a dp x sp mesh — all on the virtual 8-device CPU mesh.
Beyond the reference's fixed-197-token attention (dit_backbone.py:44-45,
SURVEY §5 'long-context: absent')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from layoutdit_tpu.config.constructs import MeshConfig
from layoutdit_tpu.ops.ring_attention import ring_attention_sharded
from layoutdit_tpu.parallel.mesh import batch_sharding, build_mesh


def _mesh(dp=2, tp=4):
    return build_mesh(MeshConfig(data_parallel=dp, model_parallel=tp))


def _seq(mesh):
    return NamedSharding(mesh, P(None, "model", None))


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v).astype(q.dtype)


@pytest.mark.parametrize("n", [32, 197])  # even split and ragged-pad
def test_ring_matches_reference_fwd_and_grad(n):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 8
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
        for _ in range(3)
    )
    scale = 1.0 / np.sqrt(d)

    ref = _ref_attention(q, k, v, scale)
    seq4 = NamedSharding(mesh, P(None, "model", None, None))

    got = jax.jit(
        lambda q, k, v: ring_attention_sharded(q, k, v, _seq(mesh), scale)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    del seq4

    # gradients: same cotangent through both implementations
    ct = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)

    def loss_ring(q, k, v):
        return (ring_attention_sharded(q, k, v, _seq(mesh), scale) * ct).sum()

    def loss_ref(q, k, v):
        return (_ref_attention(q, k, v, scale) * ct).sum()

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-6)


def test_ring_requires_token_axis():
    mesh = _mesh()
    q = jnp.zeros((1, 8, 2, 4))
    with pytest.raises(ValueError, match="token axis"):
        ring_attention_sharded(
            q, q, q, NamedSharding(mesh, P(None, None, None)), 1.0
        )


def test_encoder_ring_matches_xla():
    """vit_forward(attention_impl='ring') under SP == plain XLA encoder
    (197 tokens: CLS + 14x14, the real ragged case)."""
    from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

    cfg = ViTConfig(hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    image_size=112)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.uniform(0, 1, (2, 3, 112, 112)), jnp.float32)

    ref = jax.jit(
        lambda p, x: vit_forward(p, x, cfg, attention_impl="xla")[0]
    )(params, pixels)
    mesh = _mesh()
    got = jax.jit(
        lambda p, x: vit_forward(
            p, x, cfg, attention_impl="ring", seq_sharding=_seq(mesh)
        )[0]
    )(params, pixels)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5
    )


def test_detector_loss_ring_sp_matches_single_device():
    """Full detector loss with ring attention on a dp2 x sp4 mesh ==
    unsharded XLA-attention loss (the SP parity bar, now with the
    sequence never materialized per device)."""
    from layoutdit_tpu.models.detection.detector import (
        detector_loss,
        init_detector_params,
    )
    from layoutdit_tpu.parallel.sharding import shard_params
    from tests.test_parallel import _batch, _tiny_cfg

    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg(), attention_impl="ring")
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images, gt_boxes, gt_labels, gt_valid = _batch(4)
    rng = jax.random.PRNGKey(7)

    cfg_ref = _tiny_cfg()
    ref = jax.jit(
        lambda p: sum(
            detector_loss(
                p, rng, images, gt_boxes, gt_labels, gt_valid, cfg_ref
            ).values()
        )
    )(params)

    mesh = _mesh(dp=2, tp=4)
    seq = _seq(mesh)
    sharded = shard_params(params, mesh)
    data = batch_sharding(mesh)
    got = jax.jit(
        lambda p, im, gb, gl, gv: sum(
            detector_loss(
                p, rng, im, gb, gl, gv, cfg, seq_sharding=seq
            ).values()
        ),
        in_shardings=(None, data, data, data, data),
    )(sharded, images, gt_boxes, gt_labels, gt_valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


def test_ring_config_safe_without_sp():
    """A training config with attention_impl='ring' must not crash the
    SP-less inference paths (evaluator, serving, predict CLI):
    vit_forward degrades ring -> auto when no seq_sharding is given."""
    import dataclasses

    from layoutdit_tpu.models.detection.detector import (
        detector_predict,
        init_detector_params,
    )
    from tests.test_parallel import _batch, _tiny_cfg

    cfg = dataclasses.replace(_tiny_cfg(), attention_impl="ring")
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images, *_ = _batch(2)
    dets = jax.jit(lambda p, im: detector_predict(p, im, cfg))(params, images)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    # numerics match the plain config (ring degraded to the same path)
    ref = jax.jit(
        lambda p, im: detector_predict(p, im, _tiny_cfg())
    )(params, images)
    np.testing.assert_array_equal(
        np.asarray(dets.scores), np.asarray(ref.scores)
    )


def test_ring_composes_with_remat():
    """Encoder remat (jax.checkpoint) replays the ppermute ring in the
    backward pass — gradients must match the non-remat ring exactly."""
    from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

    cfg = ViTConfig(hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    image_size=64)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64)), jnp.float32)
    mesh = _mesh()
    seq = _seq(mesh)

    def loss(p, remat):
        return vit_forward(
            p, pixels, cfg, attention_impl="ring", seq_sharding=seq,
            remat=remat,
        )[0].astype(jnp.float32).sum()

    g_plain = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g_remat = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
