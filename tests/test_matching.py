"""Exactness tests for the jittable Hungarian solver (ops/matching.py)
against scipy.optimize.linear_sum_assignment and a brute-force oracle.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.ops.matching import linear_sum_assignment

scipy_lsa = pytest.importorskip("scipy.optimize").linear_sum_assignment


def _cost_of(cost, cols):
    return cost[np.arange(len(cols)), cols].sum()


def test_known_small_case():
    cost = np.asarray([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert sorted(got.tolist()) == [0, 1, 2]
    assert _cost_of(cost, got) == pytest.approx(5.0)  # 1 + 2 + 2


@pytest.mark.parametrize("r,c,seed", [
    (1, 1, 0), (2, 5, 1), (3, 3, 2), (4, 4, 3), (5, 7, 4), (6, 6, 5),
])
def test_vs_brute_force(r, c, seed):
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=(r, c)).astype(np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert len(set(got.tolist())) == r  # distinct columns
    best = min(
        _cost_of(cost, np.asarray(perm))
        for perm in itertools.permutations(range(c), r)
    )
    assert _cost_of(cost, got) == pytest.approx(best, abs=1e-5)


@pytest.mark.parametrize("r,c,seed", [
    (10, 10, 0), (20, 100, 1), (64, 100, 2), (100, 100, 3), (128, 300, 4),
])
def test_vs_scipy(r, c, seed):
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=(r, c)).astype(np.float32) * 10
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert len(set(got.tolist())) == r
    ri, ci = scipy_lsa(cost)
    assert _cost_of(cost, got) == pytest.approx(
        cost[ri, ci].sum(), rel=1e-5
    )


def test_jit_and_vmap():
    rng = np.random.default_rng(0)
    costs = rng.normal(size=(4, 8, 16)).astype(np.float32)
    got = jax.jit(jax.vmap(linear_sum_assignment))(jnp.asarray(costs))
    for b in range(4):
        ri, ci = scipy_lsa(costs[b])
        assert _cost_of(costs[b], np.asarray(got[b])) == pytest.approx(
            costs[b][ri, ci].sum(), rel=1e-5
        )


def test_constant_padded_columns_do_not_disturb_real_rows():
    """DETR pads gt rows; padded rows get a CONSTANT cost row, which must
    not change which columns the real rows win."""
    rng = np.random.default_rng(1)
    real = rng.normal(size=(3, 10)).astype(np.float32)
    padded = np.concatenate([real, np.full((5, 10), 7.0, np.float32)])
    got = np.asarray(linear_sum_assignment(jnp.asarray(padded)))
    ri, ci = scipy_lsa(real)
    assert _cost_of(real, got[:3]) == pytest.approx(
        real[ri, ci].sum(), rel=1e-5
    )
