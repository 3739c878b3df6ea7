"""Windowed (ViTDet-style) attention — beyond-reference capability.

The reference pins its grid at 14x14 (dit_backbone.py:44-47) where
windowing is pointless; these tests cover the high-res lever added in
models/vit.py: non-global encoder layers attend inside window_size x
window_size patch windows, the CLS token attends only to itself there,
and relative-position biases gather within-window offsets from the SAME
full-grid tables the global layers use.

Oracle: a dense masked-attention implementation written in this file
(full [N, N] scores + a window-membership mask), sharing no code with
the production window partition/merge path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.models.vit import (
    ViTConfig,
    init_vit_params,
    relative_position_index,
    vit_forward,
    window_relative_position_index,
    _windowed_attention,
)


def _tiny_cfg(**kw):
    base = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=64,  # grid 4
        use_absolute_position_embeddings=True,
        layer_scale_init_value=0.1,
    )
    base.update(kw)
    return ViTConfig(**base)


def _rand_layer_inputs(cfg, gh, gw, seed=0):
    rng = np.random.default_rng(seed)
    params = init_vit_params(jax.random.PRNGKey(seed), cfg)
    layer = jax.tree.map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32) * 0.05
        ),
        params["layers"][0],
    )
    x = jnp.asarray(
        rng.standard_normal((2, 1 + gh * gw, cfg.hidden_size)).astype(np.float32)
    )
    return x, layer


def _window_membership_mask(gh, gw, ws):
    """[1+gh*gw, 1+gh*gw] bool — True where query i may attend key j:
    CLS only to itself, patches to patches in the same ws x ws window."""
    wid = (np.arange(gh)[:, None] // ws) * 10_000 + (np.arange(gw)[None, :] // ws)
    flat = wid.reshape(-1)
    n = 1 + gh * gw
    m = np.zeros((n, n), dtype=bool)
    m[0, 0] = True
    m[1:, 1:] = flat[:, None] == flat[None, :]
    return m


def _dense_masked_oracle(x, layer, cfg, mask, bias_full=None):
    """Full-sequence attention with an explicit [N, N] mask — the
    reference semantics windowed attention must reproduce exactly."""
    b, n, d = x.shape
    h, hd = cfg.num_attention_heads, cfg.head_dim
    qkv_kernel = jnp.concatenate(
        [layer["q"]["kernel"], layer["k"]["kernel"], layer["v"]["kernel"]], axis=1
    )
    qkv_bias = jnp.concatenate(
        [layer["q"]["bias"], jnp.zeros_like(layer["q"]["bias"]), layer["v"]["bias"]]
    )
    qkv = jnp.dot(x, qkv_kernel, preferred_element_type=jnp.float32) + qkv_bias
    q = qkv[..., :d].reshape(b, n, h, hd)
    k = qkv[..., d : 2 * d].reshape(b, n, h, hd)
    v = qkv[..., 2 * d :].reshape(b, n, h, hd)
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)
    if bias_full is not None:
        scores = scores + bias_full
    scores = jnp.where(jnp.asarray(mask)[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(b, n, d)
    return (
        jnp.dot(ctx, layer["attn_out"]["kernel"]) + layer["attn_out"]["bias"]
    )


# ---------------------------------------------------------------- index map


def test_window_index_is_submatrix_of_full_index():
    """Within-window offsets land on the SAME table entries the full-grid
    index uses — cross-validates the stride encoding non-circularly."""
    grid, ws = 7, 3
    full = relative_position_index(grid)[1:, 1:]  # patch-patch block
    win = window_relative_position_index(ws, grid)
    # tokens of the top-left window in flat full-grid order
    sel = np.array([i * grid + j for i in range(ws) for j in range(ws)])
    np.testing.assert_array_equal(full[np.ix_(sel, sel)], win)
    # ... and for an interior window (offsets are translation-invariant)
    sel2 = np.array([(i + 3) * grid + (j + 3) for i in range(ws) for j in range(ws)])
    np.testing.assert_array_equal(full[np.ix_(sel2, sel2)], win)


def test_window_index_rejects_oversized_window():
    with pytest.raises(ValueError, match="larger than grid"):
        window_relative_position_index(5, 4)


# ------------------------------------------------------- attention vs oracle


def test_windowed_attention_matches_masked_oracle_divisible():
    cfg = _tiny_cfg(window_size=2)
    gh = gw = 4
    x, layer = _rand_layer_inputs(cfg, gh, gw)
    got = _windowed_attention(x, layer, cfg, gh, gw, None, None)
    want = _dense_masked_oracle(
        x, layer, cfg, _window_membership_mask(gh, gw, 2)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_windowed_attention_matches_masked_oracle_padded_grid():
    """Grid 5 with ws=3: the partition zero-pads to 6x6 and masks the
    padded keys — results on real tokens must be unaffected."""
    cfg = _tiny_cfg(image_size=80, window_size=3)  # grid 5
    gh = gw = 5
    x, layer = _rand_layer_inputs(cfg, gh, gw, seed=3)
    got = _windowed_attention(x, layer, cfg, gh, gw, None, None)
    want = _dense_masked_oracle(
        x, layer, cfg, _window_membership_mask(gh, gw, 3)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("shared", [False, True])
def test_windowed_attention_rel_bias_matches_oracle(shared):
    """Windowed layers gather within-window rel-pos offsets from the same
    table the global layers use; oracle gathers via the full-grid index."""
    cfg = _tiny_cfg(
        window_size=2,
        use_absolute_position_embeddings=False,
        use_relative_position_bias=not shared,
        use_shared_relative_position_bias=shared,
    )
    gh = gw = 4
    x, layer = _rand_layer_inputs(cfg, gh, gw, seed=5)
    rng = np.random.default_rng(7)
    table = jnp.asarray(
        rng.standard_normal(((2 * gh - 1) ** 2 + 3, cfg.num_attention_heads)).astype(
            np.float32
        )
    )
    if shared:
        layer = {k: v for k, v in layer.items() if k != "rel_pos_table"}
        got = _windowed_attention(x, layer, cfg, gh, gw, gh, table)
    else:
        layer = dict(layer)
        layer["rel_pos_table"] = table
        got = _windowed_attention(x, layer, cfg, gh, gw, gh, None)

    # oracle: gather the FULL (1+N)^2 bias; CLS rows are masked out except
    # (0,0), where a bias shift is a no-op under a 1-element softmax
    full_idx = relative_position_index(gh)
    bias_full = table[jnp.asarray(full_idx)].transpose(2, 0, 1)[None]
    want = _dense_masked_oracle(
        x, layer, cfg, _window_membership_mask(gh, gw, 2), bias_full
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


# ----------------------------------------------------------- vit_forward


def _rand_pixels(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(
            np.float32
        )
    )


def test_window_covering_grid_is_identity():
    """window_size >= grid: windowing is inactive — outputs bit-identical
    to window_size=0 (a window_size=16 config still runs 224 px eval
    unchanged)."""
    cfg0 = _tiny_cfg()  # grid 4
    cfgw = dataclasses.replace(cfg0, window_size=4)
    params = init_vit_params(jax.random.PRNGKey(0), cfg0)
    x = _rand_pixels(cfg0)
    out0 = vit_forward(params, x, cfg0, taps=[1, 2])
    outw = vit_forward(params, x, cfgw, taps=[1, 2])
    for a, b in zip(out0, outw):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_all_global_layers_is_identity():
    """window_size active but every layer marked global: exact parity with
    the unwindowed forward (routing and shared-table plumbing add nothing)."""
    cfg0 = _tiny_cfg(use_absolute_position_embeddings=False,
                     use_shared_relative_position_bias=True)
    cfgw = dataclasses.replace(
        cfg0, window_size=2, global_attn_layers=(1, 2)
    )
    params = init_vit_params(jax.random.PRNGKey(1), cfg0)
    params["shared_rel_pos_table"] = (
        jax.random.normal(
            jax.random.PRNGKey(2), params["shared_rel_pos_table"].shape
        )
        * 0.1
    )
    x = _rand_pixels(cfg0, seed=1)
    out0 = vit_forward(params, x, cfg0, taps=[2])
    outw = vit_forward(params, x, cfgw, taps=[2])
    np.testing.assert_array_equal(np.asarray(out0[0]), np.asarray(outw[0]))


def test_windowed_forward_differs_and_default_globals():
    """Default global set = the tap layers [d/3, d/2, 2d/3, d]; windowed
    layers actually change the computation."""
    cfg = _tiny_cfg(num_hidden_layers=4, window_size=2)
    assert not cfg.is_global_layer(3)
    for li in (1, 2, 4):
        assert cfg.is_global_layer(li)
    params = init_vit_params(jax.random.PRNGKey(3), cfg)
    # non-trivial weights so windowing visibly changes the output
    params = jax.tree.map(
        lambda a: a
        + 0.05 * jax.random.normal(jax.random.PRNGKey(9), a.shape, a.dtype),
        params,
    )
    x = _rand_pixels(cfg, seed=2)
    outw = vit_forward(params, x, cfg, taps=[4])[0]
    out0 = vit_forward(
        params, x, dataclasses.replace(cfg, window_size=0), taps=[4]
    )[0]
    assert not np.allclose(np.asarray(outw), np.asarray(out0), atol=1e-4)


@pytest.mark.parametrize("policy", ["full", "dots"])
def test_windowed_forward_grads_finite_under_remat(policy):
    cfg = _tiny_cfg(num_hidden_layers=3, window_size=2)
    params = init_vit_params(jax.random.PRNGKey(4), cfg)
    x = _rand_pixels(cfg, seed=4)

    def loss(p):
        outs = vit_forward(
            p, x, cfg, taps=[3], remat=True, remat_policy=policy
        )
        return jnp.sum(outs[0] ** 2)

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g)
    assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # windowed layers' projections must receive gradient
    assert float(jnp.abs(g["layers"][1]["q"]["kernel"]).sum()) > 0


def test_windowed_incompatible_with_pipeline_and_sp():
    cfg = _tiny_cfg(window_size=2)
    params = init_vit_params(jax.random.PRNGKey(5), cfg)
    x = _rand_pixels(cfg)
    with pytest.raises(ValueError, match="GPipe"):
        vit_forward(params, x, cfg, taps=[1], pipeline=object())
    with pytest.raises(ValueError, match="sequence parallelism"):
        vit_forward(params, x, cfg, taps=[1], seq_sharding=object())


# ------------------------------------------------------------ config plumb


def test_model_config_plumbs_window_fields():
    from layoutdit_tpu.config.constructs import ModelConfig
    from layoutdit_tpu.models.detection.detector import DetectorConfig

    mc = ModelConfig(
        image_size=1024, window_size=16, window_global_layers=[3, 6, 9, 12]
    )
    dc = DetectorConfig.from_model_config(mc)
    assert dc.backbone.vit.window_size == 16
    assert dc.backbone.vit.global_attn_layers == (3, 6, 9, 12)
    hash(dc.backbone.vit)  # stays usable as a jit static argument
