"""Gradient accumulation (TrainingConfig.grad_accumulation_steps) and
remat (ModelConfig.remat) tests."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.config import LayoutDitConfig


@pytest.fixture(scope="module")
def fixture_cfg(tmp_path_factory):
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config

    root = str(tmp_path_factory.mktemp("accum"))
    make_fixture(root, n_images=8, split="samples", seed=2)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.local_mode = True
    cfg.mesh_config.data_parallel = 1  # single-device: exact comparisons
    return cfg


def _batch(cfg, key):
    b = cfg.data_loader_config.batch_size
    s = cfg.detection_model_config.image_size
    g = cfg.data_loader_config.max_gt_boxes
    k1, k2 = jax.random.split(key)
    images = jax.random.uniform(k1, (b, 3, s, s))
    boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 40.0, 40.0]]), (b, g, 1))
    labels = jnp.ones((b, g), jnp.int32)
    valid = jnp.zeros((b, g), bool).at[:, 0].set(True)
    return images, boxes, labels, valid


@pytest.mark.slow  # >60s on the 1-core host (measured round 5)
def test_accum_step_matches_manual_average(fixture_cfg):
    """The accum=2 jitted step applies exactly the update computed from
    the average of the two micro-batch gradients."""
    from layoutdit_tpu.models.detection.detector import detector_loss
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    import optax

    cfg = fixture_cfg.model_copy(deep=True)
    cfg.train_config.grad_accumulation_steps = 2
    model = build_model(cfg, seed=0)
    trainer = Trainer(cfg, model)

    rng = jax.random.PRNGKey(7)
    images, boxes, labels, valid = _batch(cfg, jax.random.PRNGKey(8))

    # manual: split the batch like the step does, average fp32 grads
    dcfg = model.cfg
    rngs = jax.random.split(rng, 2)

    def loss_fn(p, r, im, bx, lb, vd):
        return sum(detector_loss(p, r, im, bx, lb, vd, dcfg).values())

    # jit the oracle grad: eager op-by-op execution of the full detector
    # backward is minutes on this 1-core host; the compile is shared by
    # both micro-batch calls and lands in the persistent cache
    gfn = jax.jit(jax.grad(loss_fn))
    grads = []
    for a in range(2):
        sl = slice(2 * a, 2 * a + 2)
        g = gfn(
            model.params, rngs[a], images[sl], boxes[sl], labels[sl], valid[sl]
        )
        grads.append(jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), g))
    g_avg = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    updates, _ = trainer.tx.update(g_avg, trainer.opt_state, model.params)
    want = optax.apply_updates(model.params, updates)

    params_copy = jax.tree_util.tree_map(jnp.copy, model.params)
    opt_copy = jax.tree_util.tree_map(jnp.copy, trainer.opt_state)
    got, _, loss, _ = trainer._train_step(
        params_copy, opt_copy, rng, images, boxes, labels, valid
    )
    assert np.isfinite(float(loss))
    flat_got = jax.tree_util.tree_leaves(got)
    flat_want = jax.tree_util.tree_leaves(want)
    for a, b in zip(flat_got, flat_want):
        # jit-vs-eager bf16 fusion rounding can flip a near-zero gradient
        # element, and AdamW's first step is sign-like (m/sqrt(v) ~ ±1),
        # so a single element may differ by up to ~2*lr (observed: 1 of
        # 49k elements). Wrong accumulation math would diverge broadly.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=3e-4)


def test_accum_trains_e2e(fixture_cfg):
    """One epoch with accumulation runs and produces a finite loss."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    cfg = fixture_cfg.model_copy(deep=True)
    cfg.train_config.grad_accumulation_steps = 2
    cfg.train_config.steps_per_dispatch = 1
    model = build_model(cfg, seed=0)
    trainer = Trainer(cfg, model)
    trainer.train()
    assert np.isfinite(trainer.loss_history[0])


def test_remat_grads_exact(fixture_cfg):
    """jax.checkpoint rematerialization is numerically exact: loss and
    gradients match the non-remat forward bit-for-bit (same ops,
    recomputed)."""
    import dataclasses

    from layoutdit_tpu.models.detection.detector import detector_loss
    from layoutdit_tpu.models.model import build_model

    model = build_model(fixture_cfg, seed=0)
    cfg0 = model.cfg
    cfg1 = dataclasses.replace(cfg0, remat=True)
    rng = jax.random.PRNGKey(0)
    images, boxes, labels, valid = _batch(fixture_cfg, jax.random.PRNGKey(1))

    def loss(p, c):
        return sum(detector_loss(p, rng, images, boxes, labels, valid, c).values())

    # jit both sides (eager full-detector backward is minutes on CPU);
    # cfg is trace-static via closure so each variant compiles its own
    # graph — exactly what the equivalence claim is about
    l0, g0 = jax.jit(lambda p: jax.value_and_grad(loss)(p, cfg0))(model.params)
    l1, g1 = jax.jit(lambda p: jax.value_and_grad(loss)(p, cfg1))(model.params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_remat_dots_policy_grads_exact(fixture_cfg):
    """remat_policy='dots' (save GEMM outputs, recompute VPU work) is as
    numerics-exact as the full policy — only WHAT is recomputed changes."""
    import dataclasses

    from layoutdit_tpu.models.detection.detector import detector_loss
    from layoutdit_tpu.models.model import build_model

    model = build_model(fixture_cfg, seed=0)
    cfg0 = model.cfg
    cfg1 = dataclasses.replace(cfg0, remat=True, remat_policy="dots")
    rng = jax.random.PRNGKey(0)
    images, boxes, labels, valid = _batch(fixture_cfg, jax.random.PRNGKey(1))

    def loss(p, c):
        return sum(detector_loss(p, rng, images, boxes, labels, valid, c).values())

    l0, g0 = jax.jit(lambda p: jax.value_and_grad(loss)(p, cfg0))(model.params)
    l1, g1 = jax.jit(lambda p: jax.value_and_grad(loss)(p, cfg1))(model.params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_remat_bad_policy_rejected(fixture_cfg):
    import dataclasses

    import pytest

    from layoutdit_tpu.models.detection.detector import detector_loss
    from layoutdit_tpu.models.model import build_model

    model = build_model(fixture_cfg, seed=0)
    cfg = dataclasses.replace(model.cfg, remat=True, remat_policy="nope")
    images, boxes, labels, valid = _batch(fixture_cfg, jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="remat_policy"):
        jax.eval_shape(
            lambda p: detector_loss(
                p, jax.random.PRNGKey(0), images, boxes, labels, valid, cfg
            ),
            model.params,
        )


def test_remat_reachable_from_user_config(fixture_cfg):
    from layoutdit_tpu.models.model import build_model

    cfg = fixture_cfg.model_copy(deep=True)
    cfg.detection_model_config.remat = True
    cfg.detection_model_config.remat_policy = "dots"
    model = build_model(cfg, seed=0)
    assert model.cfg.remat is True
    assert model.cfg.remat_policy == "dots"
