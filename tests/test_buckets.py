"""Bucket planner tests (eval/buckets.py)."""

import itertools

import numpy as np
import pytest

from layoutdit_tpu.eval.buckets import corpus_cost, plan_buckets


def brute_force(pages, k, patch=16, cost_fn=lambda s: float(s) * s):
    needs = sorted({
        max(224, ((max(h, w) + patch - 1) // patch) * patch) for h, w in pages
    })
    best, best_cost = None, float("inf")
    for r in range(1, k + 1):
        for combo in itertools.combinations(needs, r):
            if combo[-1] != needs[-1]:
                continue  # top bucket must fit the largest page
            c = corpus_cost(pages, combo, patch=patch, cost_fn=cost_fn)
            if c < best_cost:
                best, best_cost = sorted(combo), c
    return best, best_cost


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_planner_matches_brute_force(k):
    rng = np.random.default_rng(0)
    pages = [(int(rng.integers(100, 1200)), int(rng.integers(100, 1200)))
             for _ in range(40)]
    got = plan_buckets(pages, k)
    _, want_cost = brute_force(pages, k)
    got_cost = corpus_cost(pages, got)
    assert got_cost == pytest.approx(want_cost)
    assert len(got) <= k
    assert got == sorted(got)


def test_planner_snaps_and_clamps():
    got = plan_buckets([(100, 90), (1000, 400)], k=2, patch=16, min_size=224)
    assert got[0] == 224  # snapped up to min_size
    assert got[-1] == 1008  # 1000 -> next multiple of 16
    assert all(s % 16 == 0 for s in got)

    capped = plan_buckets([(4000, 4000)], k=1, max_size=1024)
    assert capped == [1024]


def test_planner_fewer_pages_than_buckets():
    assert plan_buckets([(500, 300)], k=4) == [512]
    assert plan_buckets([], k=2) == [224]


def test_planner_measured_cost_fn():
    """A cost table that makes the big bucket cheap changes the plan."""
    pages = [(300, 300)] * 10 + [(900, 900)] * 1
    flat = plan_buckets(pages, k=1, cost_fn=lambda s: 1.0)
    assert flat == [912]  # with flat cost, one big bucket suffices
    quad = plan_buckets(pages, k=2)
    assert quad == [304, 912]  # quadratic cost splits off the small pages


def test_engine_from_corpus():
    import jax

    from layoutdit_tpu.config.constructs import DetectionBudget
    from layoutdit_tpu.eval.serving import BatchInferenceEngine
    from layoutdit_tpu.models.backbone import BackboneConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        init_detector_params,
    )
    from layoutdit_tpu.models.vit import ViTConfig

    class M:
        cfg = DetectorConfig(
            backbone=BackboneConfig(
                vit=ViTConfig(hidden_size=32, num_hidden_layers=1,
                              num_attention_heads=2, intermediate_size=64,
                              image_size=64),
                fpn_out_channels=32,
            ),
            image_size=64,
            budget=DetectionBudget(
                rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=50,
                box_detections_per_img=10,
            ),
        )
        params = init_detector_params(jax.random.PRNGKey(0), cfg)

    pages = [(230, 200)] * 5 + [(600, 400)] * 2
    engine = BatchInferenceEngine.from_corpus(M, pages, max_buckets=2,
                                              batch_size=2)
    assert engine.image_sizes == [240, 608]
