"""Hungarian (linear-sum-assignment) matching as a jittable JAX function.

DETR-family training needs an exact minimum-cost bipartite matching between
ground-truth boxes and decoder queries every step. The reference has no
DETR training at all (its offline fine-tuning is ultralytics YOLOv8,
training/scripts/train_custom_model.py); upstream RT-DETR calls
scipy.optimize.linear_sum_assignment on the host per image. Neither works
inside a pjit-sharded TPU train step, so this module implements the exact
shortest-augmenting-path algorithm (the same one scipy uses) with static
shapes and `lax.while_loop` control flow: it jits, vmaps over the batch,
and shards with the data axis — no host callbacks, no dynamic shapes.

Cost matrices are (N_GT, N_QUERY) with N_GT <= N_QUERY (DETR guarantees
more queries than boxes); padded GT rows are handled by the caller giving
them any finite cost and masking the returned columns.

Algorithm: for each row, run Dijkstra over columns with dual potentials
(u, v), augment along the shortest path, update potentials. All inner
state is fixed-size vectors over columns, so the per-row work is a
vectorized O(N_QUERY) sweep inside a while_loop — compiler-friendly and
exactly optimal (verified against scipy in tests/test_matcher.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _lsa_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LSA for one (n, m) cost matrix, n <= m (static shapes).

    Returns col4row (n,) int32: the column assigned to each row. The
    assignment minimizes sum(cost[i, col4row[i]]) over permutations.
    """
    n, m = cost.shape
    cost = cost.astype(jnp.float32)

    def solve_row(cur_row, carry):
        u, v, col4row, row4col = carry

        # --- Dijkstra from cur_row until an unassigned column is reached.
        def dij_cond(s):
            _i, _minval, sink, *_rest = s
            return sink < 0

        def dij_body(s):
            i, minval, sink, sr, sc, spc, path = s
            sr = sr.at[i].set(True)
            # relax all columns not yet in SC
            r = minval + cost[i] - u[i] - v
            better = (~sc) & (r < spc)
            path = jnp.where(better, i, path)
            spc = jnp.where(better, r, spc)
            # pick the lowest tentative column; prefer unassigned on ties
            masked = jnp.where(sc, _INF, spc)
            lowest = jnp.min(masked)
            at_low = masked == lowest
            prefer = at_low & (row4col < 0)
            j = jnp.where(jnp.any(prefer), jnp.argmax(prefer),
                          jnp.argmax(at_low))
            sc = sc.at[j].set(True)
            sink = jnp.where(row4col[j] < 0, j, -1)
            i = jnp.where(sink < 0, row4col[j], i)
            return i, lowest, sink, sr, sc, spc, path

        init = (cur_row, jnp.float32(0.0), jnp.int32(-1),
                jnp.zeros((n,), bool), jnp.zeros((m,), bool),
                jnp.full((m,), _INF), jnp.zeros((m,), jnp.int32))
        _i, minval, sink, sr, sc, spc, path = jax.lax.while_loop(
            dij_cond, dij_body, init)

        # --- dual updates (scipy rectangular_lsap.cpp semantics)
        u = u.at[cur_row].add(minval)
        other = sr & (jnp.arange(n) != cur_row)
        u = u + jnp.where(other, minval - spc[col4row], 0.0)
        v = v - jnp.where(sc, minval - spc, 0.0)

        # --- augment: walk path back from sink, swapping assignments
        def aug_cond(s):
            _c4r, _r4c, _sink, done = s
            return ~done

        def aug_body(s):
            c4r, r4c, snk, _done = s
            i = path[snk]
            r4c = r4c.at[snk].set(i)
            nxt = c4r[i]
            c4r = c4r.at[i].set(snk)
            return c4r, r4c, nxt, i == cur_row

        col4row, row4col, _s, _d = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, sink, False))
        return u, v, col4row, row4col

    u = jnp.zeros((n,), jnp.float32)
    v = jnp.zeros((m,), jnp.float32)
    col4row = jnp.full((n,), -1, jnp.int32)
    row4col = jnp.full((m,), -1, jnp.int32)
    u, v, col4row, row4col = jax.lax.fori_loop(
        0, n, solve_row, (u, v, col4row, row4col))
    return col4row


@partial(jax.jit, static_argnames=())
def hungarian_match(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched exact linear-sum-assignment.

    cost: (B, N_GT, N_QUERY) with N_GT <= N_QUERY, any finite values.
    Returns (B, N_GT) int32 column indices — an optimal assignment per
    batch element. Jittable and vmap/shard-compatible (pure lax control
    flow; no host callbacks).
    """
    if cost.ndim == 2:
        return _lsa_single(cost)
    return jax.vmap(_lsa_single)(cost)
