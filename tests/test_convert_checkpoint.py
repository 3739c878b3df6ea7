"""Pretrained-weight ingestion pipeline tests (VERDICT r1 item 7).

Network egress is unavailable, so the ungated tests drive the FULL offline
conversion path on a locally-constructed HF ``BeitModel`` checkpoint
(identical architecture to microsoft/dit-base, random weights): manifest
validation -> conversion -> native artifact -> warm-start -> activation
parity against the torch model. A separate test loads a REAL cached
checkpoint when one is present (LAYOUTDIT_DIT_BASE_CKPT), skipping
otherwise.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from layoutdit_tpu.models import vit as vit_mod  # noqa: E402
from layoutdit_tpu.tools.convert_hf_checkpoint import (  # noqa: E402
    convert,
    validate_state_dict,
)


def _random_dit_base():
    from transformers import BeitConfig, BeitModel

    cfg = BeitConfig(
        use_absolute_position_embeddings=True,
        use_relative_position_bias=False,
        use_shared_relative_position_bias=False,
        layer_scale_init_value=0.1,
        use_mask_token=True,
    )
    torch.manual_seed(0)
    return BeitModel(cfg, add_pooling_layer=True).eval()


@pytest.fixture(scope="module")
def dit_base_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("hf") / "pytorch_model.bin"
    model = _random_dit_base()
    torch.save(model.state_dict(), str(path))
    return str(path), model


def test_manifest_validates_correct_checkpoint(dit_base_ckpt):
    path, _ = dit_base_ckpt
    sd = torch.load(path, map_location="cpu", weights_only=True)
    ignored = validate_state_dict(sd, "dit-base")
    # pooler / mask_token / final layernorm are not backbone-tap weights
    assert any("pooler" in k for k in ignored)


def test_manifest_rejects_wrong_shape_and_missing_keys(dit_base_ckpt):
    path, _ = dit_base_ckpt
    sd = torch.load(path, map_location="cpu", weights_only=True)
    bad = dict(sd)
    bad["embeddings.cls_token"] = torch.zeros(1, 1, 17)
    with pytest.raises(ValueError, match="shape"):
        validate_state_dict(bad, "dit-base")
    bad = {k: v for k, v in sd.items() if "layer.7." not in k}
    with pytest.raises(ValueError, match="missing"):
        validate_state_dict(bad, "dit-base")


@pytest.mark.slow
def test_convert_then_warm_start_matches_hf_activations(dit_base_ckpt, tmp_path):
    """convert CLI -> .msgpack (+provenance sha256) -> load_dit_encoder ->
    hidden-state parity vs the torch BeitModel at every backbone tap."""
    src, hf_model = dit_base_ckpt
    out = str(tmp_path / "dit-base.msgpack")
    prov = convert(src, "dit-base", out)
    assert os.path.exists(out)
    with open(out + ".provenance.json") as f:
        assert json.load(f)["output_sha256"] == prov["output_sha256"]

    from layoutdit_tpu.models.weights_io import load_beit_checkpoint

    cfg = vit_mod.DIT_BASE
    params = load_beit_checkpoint(out, cfg)

    rng = np.random.default_rng(0)
    pixels = rng.uniform(-1, 1, (2, 3, 224, 224)).astype(np.float32)
    taps = (4, 6, 8, 12)
    got = vit_mod.vit_forward(params, jnp.asarray(pixels), cfg, taps=taps)

    with torch.no_grad():
        hf = hf_model(torch.from_numpy(pixels), output_hidden_states=True)
    for tap, g in zip(taps, got):
        want = hf.hidden_states[tap].numpy()
        np.testing.assert_allclose(np.asarray(g), want, rtol=2e-4, atol=2e-4)


def test_real_dit_base_checkpoint_if_cached():
    """Loads an ACTUAL microsoft/dit-base checkpoint when one is cached
    locally (export LAYOUTDIT_DIT_BASE_CKPT=/path/to/pytorch_model.bin).
    Asserts manifest validation + conversion + sane activation stats."""
    path = os.environ.get("LAYOUTDIT_DIT_BASE_CKPT")
    if not path or not os.path.exists(path):
        pytest.skip("no cached microsoft/dit-base checkpoint on this host")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    validate_state_dict(sd, "dit-base")
    from layoutdit_tpu.models.weights_io import beit_state_dict_to_params

    params = beit_state_dict_to_params(sd, vit_mod.DIT_BASE)
    x = jnp.zeros((1, 3, 224, 224), jnp.float32)
    (h,) = vit_mod.vit_forward(params, x, vit_mod.DIT_BASE, taps=(12,))
    assert np.isfinite(np.asarray(h)).all()
