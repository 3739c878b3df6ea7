"""Jittable exact linear-sum-assignment (Hungarian / Jonker-Volgenant).

Set-prediction training (DETR, models/detection/detr.py) needs an optimal
bipartite matching between predicted queries and ground-truth boxes INSIDE
the jitted train step — the reference ecosystem calls
``scipy.optimize.linear_sum_assignment`` on host, which would force a
host round-trip per image per decoder layer. This is the classic
potentials + shortest-augmenting-path algorithm (e-maxx/JV formulation,
O(R * C^2)) expressed with ``lax.while_loop``/``fori_loop`` so it runs
on-device, vmaps over the batch, and differentiates through nothing
(matching is a stop-gradient decision, as in DETR).

Sizes here are tiny (R = padded gt <= C = queries, e.g. 128 x 100-300):
the serial depth is R * path-length with O(C) vector work per step —
microseconds on a TPU core, and the whole batch's solves run as one
vmapped program.

Exactness is tested against scipy.optimize.linear_sum_assignment and a
brute-force oracle (tests/test_matching.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost assignment of every ROW to a distinct COLUMN.

    Args:
      cost: [R, C] float matrix, R <= C, finite entries.

    Returns:
      col_for_row: [R] int32 — the column assigned to each row; the total
      cost ``cost[arange(R), col_for_row].sum()`` is minimal.
    """
    r, c = cost.shape
    if r == 0:
        return jnp.zeros((0,), jnp.int32)
    assert r <= c, f"need rows <= cols, got {cost.shape}"
    a = cost.astype(jnp.float32)

    # 1-indexed rows; column 0 is the virtual start column (e-maxx).
    # pad[i0=0] row never used. p: col -> row (0 = free).
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    a1 = jnp.concatenate([jnp.zeros((1, c), jnp.float32), a], axis=0)  # [R+1, C]
    a1 = jnp.concatenate([jnp.zeros((r + 1, 1), jnp.float32), a1], axis=1)

    def insert_row(i, carry):
        u, v, p = carry  # u [R+1], v [C+1], p [C+1]
        p = p.at[0].set(i)
        minv = jnp.full((c + 1,), big)
        way = jnp.zeros((c + 1,), jnp.int32)
        used = jnp.zeros((c + 1,), bool)

        def dijkstra_cond(st):
            _, _, _, _, _, j0, first = st
            return first | (p[j0] != 0)

        # p is only mutated by the augmentation below, so closing over it
        # inside one insert_row call is sound.
        def dijkstra_body(st):
            u, v, minv, way, used, j0, _ = st
            used = used.at[j0].set(True)
            i0 = jnp.where(j0 == 0, i, p[j0])
            cur = a1[i0] - u[i0] - v  # [C+1]
            upd = (~used) & (cur < minv)
            upd = upd.at[0].set(False)  # virtual column never relaxes
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used, big, minv).at[0].set(big)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # used columns: u[p[j]] += delta, v[j] -= delta (col 0 -> row i)
            rows_of_used = jnp.where(used, jnp.where(
                jnp.arange(c + 1) == 0, i, p
            ), 0)
            u = u + jnp.zeros_like(u).at[rows_of_used].add(
                jnp.where(used, delta, 0.0)
            )
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return (u, v, minv, way, used, j1, False)

        u, v, minv, way, used, j0, _ = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body,
            (u, v, minv, way, used, jnp.int32(0), True),
        )

        def aug_cond(st):
            _, j0 = st
            return j0 != 0

        def aug_body(st):
            p, j0 = st
            j1 = way[j0]
            p = p.at[j0].set(jnp.where(j1 == 0, i, p[j1]))
            return (p, j1)

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p)

    u = jnp.zeros((r + 1,), jnp.float32)
    v = jnp.zeros((c + 1,), jnp.float32)
    p = jnp.zeros((c + 1,), jnp.int32)
    _, _, p = jax.lax.fori_loop(1, r + 1, insert_row, (u, v, p))

    # p[j] = row+0 (1-indexed rows; 0 = free col) -> col_for_row
    cols = jnp.arange(1, c + 1, dtype=jnp.int32)
    col_for_row = jnp.zeros((r + 1,), jnp.int32).at[p[1:]].set(cols)
    return col_for_row[1:] - 1
