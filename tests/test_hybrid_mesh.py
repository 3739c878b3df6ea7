"""Hybrid ICI x DCN mesh layout (MeshConfig.dcn_data_parallel).

The reference has no distributed story at all (SURVEY.md §2.3); on
multi-slice TPU pods the TPU-native layout rule is: the DCN granule dim
goes OUTERMOST on the data axis so model/pipe collectives and the inner
data shards stay on ICI and only the gradient all-reduce's hierarchical
outer stage crosses DCN. These tests inject a granule_fn (the virtual
8-device CPU mesh is one process, so slice/process grouping is
simulated by device id) and assert the layout + validation + numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import MeshConfig
from layoutdit_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    build_mesh_for_batch,
)


def _two_granules(d):
    # devices 0-3 = "slice 0", 4-7 = "slice 1"
    return d.id // 4


def test_hybrid_granule_outermost_on_data_axis():
    mesh = build_mesh(
        MeshConfig(data_parallel=4, model_parallel=2, dcn_data_parallel=2),
        granule_fn=_two_granules,
    )
    assert mesh.shape == {"data": 4, "model": 2}
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    # data rows 0-1 entirely granule 0, rows 2-3 entirely granule 1
    assert set(ids[:2].ravel()) == {0, 1, 2, 3}
    assert set(ids[2:].ravel()) == {4, 5, 6, 7}
    # every model-axis pair (a per-layer TP collective group) is intra-granule
    for row in ids:
        assert row[0] // 4 == row[1] // 4


def test_hybrid_with_pipeline_axis():
    mesh = build_mesh(
        MeshConfig(
            data_parallel=2, model_parallel=2, pipeline_parallel=2,
            dcn_data_parallel=2,
        ),
        granule_fn=_two_granules,
    )
    assert mesh.shape == {"data": 2, "model": 2, "pipe": 2}
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    # each data index is one whole granule: its 2x2 model x pipe block
    # (all per-layer collectives) never crosses DCN
    assert set(ids[0].ravel()) == {0, 1, 2, 3}
    assert set(ids[1].ravel()) == {4, 5, 6, 7}


def test_hybrid_validation():
    with pytest.raises(ValueError, match="must divide"):
        build_mesh(
            MeshConfig(data_parallel=3, model_parallel=1,
                       dcn_data_parallel=2),
            devices=jax.devices()[:3], granule_fn=_two_granules,
        )
    with pytest.raises(ValueError, match="granules"):
        build_mesh(
            MeshConfig(data_parallel=4, model_parallel=2,
                       dcn_data_parallel=4),
            granule_fn=_two_granules,  # only 2 granules exist
        )
    with pytest.raises(ValueError, match="per granule"):
        # granule 0 has 4 devices, granule 1 has 2 — not uniform
        build_mesh(
            MeshConfig(data_parallel=6, model_parallel=1,
                       dcn_data_parallel=2),
            devices=jax.devices()[:6], granule_fn=_two_granules,
        )


def test_hybrid_mesh_numerics_match_flat():
    """Same sharded computation on hybrid vs flat mesh: identical result
    (device order changes placement, never values)."""
    cfg = MeshConfig(data_parallel=4, model_parallel=2)
    flat = build_mesh(cfg)
    hyb = build_mesh(
        MeshConfig(data_parallel=4, model_parallel=2, dcn_data_parallel=2),
        granule_fn=_two_granules,
    )
    x = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
    w = np.linspace(-1, 1, 8 * 8, dtype=np.float32).reshape(8, 8)

    def f(x, w):
        return jnp.mean(jnp.tanh(x @ w), axis=(1, 2))

    outs = []
    for mesh in (flat, hyb):
        xb = jax.device_put(x, batch_sharding(mesh))
        outs.append(np.asarray(jax.jit(f)(xb, jnp.asarray(w))))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_hybrid_build_mesh_for_batch_clamps_in_granules():
    # batch 6 over 8 devices, 2 granules: dp must be a multiple of 2
    # dividing 6 -> 6, taking a 3-device prefix of EACH granule
    mesh = build_mesh_for_batch(
        MeshConfig(data_parallel=-1, dcn_data_parallel=2),
        batch_size=6, granule_fn=_two_granules,
    )
    assert mesh.shape["data"] == 6
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert set(ids[:3].ravel()) == {0, 1, 2}
    assert set(ids[3:].ravel()) == {4, 5, 6}
    # no usable dp: batch 5 with dcn=2 has no even divisor
    with pytest.raises(ValueError, match="no data-parallel degree"):
        build_mesh_for_batch(
            MeshConfig(data_parallel=-1, dcn_data_parallel=2),
            batch_size=5, granule_fn=_two_granules,
        )


def test_nonstrict_fallback_resets_dcn():
    """The documented warn-and-fallback contract survives dcn>1: a
    topology that doesn't factor falls back to a flat Nx1 mesh instead
    of raising a dcn-vs-fallback-dp error the user never configured."""
    mesh = build_mesh(
        MeshConfig(data_parallel=3, model_parallel=1, dcn_data_parallel=3),
        granule_fn=_two_granules,
    )
    assert mesh.shape == {"data": 8, "model": 1}


def test_build_mesh_for_batch_granule_mismatch_raises():
    """The per-granule prefix path validates granule count like
    build_mesh does — a dcn that doesn't match the real topology must
    raise, not silently idle whole slices."""
    with pytest.raises(ValueError, match="granules"):
        build_mesh_for_batch(
            MeshConfig(data_parallel=4, model_parallel=1,
                       dcn_data_parallel=4),
            batch_size=4, granule_fn=_two_granules,  # only 2 granules
        )
