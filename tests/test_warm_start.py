"""Warm-start path: load a torch BEiT state_dict checkpoint (.pth) into
ONLY the DiT encoder (reference model.py:65-70 semantics)."""

import numpy as np

import jax.numpy as jnp


def test_load_dit_encoder_from_pth(tmp_path):
    import torch
    from transformers import BeitConfig, BeitModel

    from layoutdit_tpu.config.constructs import DetectionBudget, ModelConfig
    from layoutdit_tpu.models.model import LayoutDetectionModel
    from layoutdit_tpu.models.vit import vit_forward

    hf_cfg = BeitConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=64, patch_size=16,
        use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, attn_implementation="eager",
    )
    torch.manual_seed(3)
    hf_model = BeitModel(hf_cfg, add_pooling_layer=False).eval()
    g = torch.Generator().manual_seed(3)
    hf_model.load_state_dict({
        k: torch.randn(v.shape, generator=g) * 0.02 if v.is_floating_point() else v
        for k, v in hf_model.state_dict().items()
    })
    ckpt = tmp_path / "dit_encoder.pth"
    torch.save(hf_model.state_dict(), str(ckpt))

    mc = ModelConfig(
        image_size=64,
        vit_overrides={
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
        },
        fpn_out_channels=32,
        detection_budget=DetectionBudget(
            rpn_pre_nms_top_n_test=32, rpn_post_nms_top_n_test=32,
            box_detections_per_img=8,
        ),
    )
    model = LayoutDetectionModel(
        mc, previous_layout_dit_checkpoint=str(ckpt), compute_dtype="float32",
    )

    # encoder activations must match HF exactly after the warm start
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(x), output_hidden_states=True
                        ).hidden_states[2].numpy()
    got = np.asarray(
        vit_forward(model.params["backbone"]["vit"], jnp.asarray(x),
                    model.cfg.backbone.vit, taps=[2])[0]
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)

    # detection heads stay randomly initialized (warm start touches ONLY
    # the encoder, like the reference's strict=False partial load)
    dets = model.predict(jnp.asarray(x))
    assert dets.boxes.shape[1] == 8
