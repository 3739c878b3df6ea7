"""Golden parity of the JAX BEiT/DiT encoder vs transformers.BeitModel.

The reference's backbone is exactly ``AutoModel("microsoft/dit-base")``
with hidden-state taps (dit_backbone.py:25-53); these tests build torch
BeitModels from config (no network), randomize their weights, import the
state_dict through weights_io, and require per-tap activation parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from layoutdit_tpu.models.weights_io import beit_state_dict_to_params

import jax


def _randomized_beit(hf_cfg, seed=0):
    import torch
    from transformers import BeitModel

    torch.manual_seed(seed)
    model = BeitModel(hf_cfg, add_pooling_layer=False).eval()
    sd = model.state_dict()
    g = torch.Generator().manual_seed(seed)
    new_sd = {
        k: torch.randn(v.shape, generator=g) * 0.02 if v.is_floating_point() else v
        for k, v in sd.items()
    }
    model.load_state_dict(new_sd)
    return model


def _compare(hf_cfg, vit_cfg, taps, atol=2e-5):
    import torch

    model = _randomized_beit(hf_cfg)
    params = beit_state_dict_to_params(model.state_dict(), vit_cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (2, 3, vit_cfg.image_size, vit_cfg.image_size)
    ).astype(np.float32)

    with torch.no_grad():
        out = model(torch.from_numpy(x), output_hidden_states=True)
    want = [out.hidden_states[t].numpy() for t in taps]

    got = vit_forward(params, jnp.asarray(x), vit_cfg, taps=taps)
    for t, w, g in zip(taps, want, got):
        np.testing.assert_allclose(
            np.asarray(g), w, rtol=1e-4, atol=atol,
            err_msg=f"hidden_states[{t}] mismatch",
        )


def test_dit_base_style_parity():
    """dit-base architecture: abs pos embeddings + layer scale, no rel bias."""
    from transformers import BeitConfig

    hf_cfg = BeitConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16,
        use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, attn_implementation="eager",
    )
    vit_cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=128, image_size=32,
        use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
    )
    _compare(hf_cfg, vit_cfg, taps=[0, 1, 2, 4])


def test_per_layer_relative_position_bias_parity():
    from transformers import BeitConfig

    hf_cfg = BeitConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=48, patch_size=16,
        use_absolute_position_embeddings=False, layer_scale_init_value=0.1,
        use_relative_position_bias=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, attn_implementation="eager",
    )
    vit_cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=48,
        use_absolute_position_embeddings=False, layer_scale_init_value=0.1,
        use_relative_position_bias=True,
    )
    _compare(hf_cfg, vit_cfg, taps=[2])


def test_shared_relative_position_bias_parity():
    from transformers import BeitConfig

    hf_cfg = BeitConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=48, patch_size=16,
        use_absolute_position_embeddings=False, layer_scale_init_value=0.0,
        use_shared_relative_position_bias=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, attn_implementation="eager",
    )
    vit_cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=48,
        use_absolute_position_embeddings=False, layer_scale_init_value=0.0,
        use_shared_relative_position_bias=True,
    )
    _compare(hf_cfg, vit_cfg, taps=[2])


@pytest.mark.slow
def test_dit_base_full_size_parity():
    """Full dit-base shape (768/12L) — the real production architecture."""
    from transformers import BeitConfig

    hf_cfg = BeitConfig(
        use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, attn_implementation="eager",
    )
    vit_cfg = ViTConfig()
    # taps used by the detection backbone: [d//3, d//2, 2d//3, d]
    _compare(hf_cfg, vit_cfg, taps=[4, 6, 8, 12], atol=5e-5)


def test_init_params_structure():
    cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    outs = vit_forward(params, jnp.zeros((1, 3, 32, 32)), cfg, taps=[0, 2])
    assert outs[0].shape == (1, 5, 64)  # 4 patches + CLS
    assert outs[1].shape == (1, 5, 64)
    assert np.isfinite(np.asarray(outs[1])).all()


def test_bf16_compute_close_to_fp32():
    cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32,
    )
    params = init_vit_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 32, 32)),
                    dtype=jnp.float32)
    full = np.asarray(vit_forward(params, x, cfg)[0])
    half = np.asarray(
        vit_forward(params, x, cfg, compute_dtype=jnp.bfloat16)[0]
    ).astype(np.float32)
    assert np.abs(full - half).max() < 0.1


@pytest.mark.parametrize("shared", [False, True])
def test_rel_pos_bias_interpolation_parity(shared):
    """Non-native grid with relative position bias: the table is
    bilinearly resampled exactly like HF BeitRelativePositionBias.forward
    (interpolate_pos_encoding path) — closes the high-res exclusion of
    rel-pos BEiT checkpoints (VERDICT r2 item 6)."""
    import torch
    from transformers import BeitConfig

    kw = dict(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=48, patch_size=16,
        use_absolute_position_embeddings=False, layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, attn_implementation="eager",
    )
    if shared:
        kw.update(use_shared_relative_position_bias=True,
                  layer_scale_init_value=0.0)
    else:
        kw.update(use_relative_position_bias=True)
    hf_cfg = BeitConfig(**kw)
    vit_cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=48,
        use_absolute_position_embeddings=False,
        layer_scale_init_value=kw["layer_scale_init_value"],
        use_relative_position_bias=not shared,
        use_shared_relative_position_bias=shared,
    )
    model = _randomized_beit(hf_cfg)
    params = beit_state_dict_to_params(model.state_dict(), vit_cfg)

    # run at 80px = 5x5 grid (native is 3x3): the table must interpolate
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 80, 80)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x), output_hidden_states=True,
                    interpolate_pos_encoding=True)
    want = out.hidden_states[2].numpy()
    got = vit_forward(params, jnp.asarray(x), vit_cfg, taps=[2])[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=3e-5)
