"""Min-cost assignment on device: parallel auction inside lax.while_loop.

The reference solves detection↔track association with a sequential
Hungarian/Munkres solver (SURVEY.md §2 row "hungarian") — augmenting paths
are hostile to SIMD (SURVEY.md §7 hard part (a)).  The TPU-native design
named by BASELINE.json ("on-device auction/LAPJV solve inside
jax.lax.while_loop") is Bertsekas' auction algorithm: every unassigned row
bids in parallel (one [n, n] VPU block per round), columns take the best
bid, and the prices converge to epsilon-complementary-slackness.

Design notes (measured, see tests/test_assignment.py):
  * The problem is squared to n = max(N, M): exactly enough dummy columns
    exist for auction losers, and the symmetric epsilon-CS optimality bound
    applies (asymmetric auction with stale unassigned-column prices loses
    optimality).
  * Rows with no feasible entry ("dead" track slots / padded detections)
    get benefit 0 everywhere — they become indifferent filler instead of
    drilling price wars down the infeasible penalty pit.
  * A single small epsilon is used instead of epsilon-scaling: scaling's
    later phases degenerate into single-bidder eviction chains re-climbing
    overshot prices (~1-2k sequential rounds); a single phase at
    eps = 0.02 cost units converges in ~15-120 rounds at MOT sizes with
    total cost within n*eps of the Hungarian optimum — far below the IoU
    resolution that MOT association cares about.
  * A row-dependent tie-break jitter (< eps/4) keeps identical rows from
    serializing on the same column.

The exact host-side reference (scipy Hungarian) is `scipy_assign`, used by
the non-jit API and the parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Feasible costs are assumed in [0, COST_CAP); infeasible pairs are handled
# via the `feasible` mask (iou.association_cost marks them with 1e4).
COST_CAP = 4.0
_NEG = -8.0          # benefit of an infeasible pair (below the 0 of dummies)
DEFAULT_EPS = 0.02   # auction epsilon in cost units; suboptimality <= n*eps


def auction_assign(cost: jnp.ndarray, feasible: jnp.ndarray,
                   eps: float = DEFAULT_EPS,
                   max_iters: int = 2000) -> jnp.ndarray:
    """Solve min-cost assignment; returns row_to_col [N] int32, -1 = unmatched.

    cost     : [N, M] float32; only entries with feasible=True participate.
    feasible : [N, M] bool.
    Rows/columns whose only options are infeasible come back unmatched.
    Matches scipy_assign's cardinality; total cost within ~n*eps of optimal.
    """
    return auction_assign_stats(cost, feasible, eps, max_iters)[0]


@functools.partial(jax.jit, static_argnames=("max_iters", "eps"))
def auction_assign_stats(cost: jnp.ndarray, feasible: jnp.ndarray,
                         eps: float = DEFAULT_EPS, max_iters: int = 2000
                         ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """auction_assign plus observability: returns (row_to_col [N] int32,
    iters [] int32, converged [] bool).

    converged=False means the loop hit max_iters with some row still
    unassigned — the returned assignment is partial and the caller should
    count/flag it (the padded square problem always admits a perfect
    matching via the dummy columns, so non-convergence is an iteration
    budget event, never a structural one).

    iters counts ACTIVE Jacobi rounds.  The while_loop runs 3 rounds per
    condition check (loop-sync amortization), so the budget is enforced
    at 3-round granularity: up to max_iters + 2 active rounds can
    execute before the loop observes the limit.
    """
    n_rows, m_cols = cost.shape
    if n_rows == 0 or m_cols == 0:
        return (jnp.full((n_rows,), -1, jnp.int32), jnp.int32(0),
                jnp.bool_(True))
    n = max(n_rows, m_cols)

    b = jnp.where(feasible,
                  jnp.clip(COST_CAP - cost, 0.0, COST_CAP) + 1.0,
                  _NEG)
    row_dead = ~jnp.any(feasible, axis=1)
    b = jnp.where(row_dead[:, None], 0.0, b)               # neutral filler
    b = jnp.pad(b, ((0, n - n_rows), (0, n - m_cols)))     # dummies = 0
    # Row-dependent tie-breaker << eps: identical rows (dummy/dead blocks)
    # otherwise all bid the same column each round and serialize.
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    b = b + ((ri * 7 + ci * 13) % 29).astype(jnp.float32) * (0.25 * eps / 29.0)

    def cond(state):
        _, col_of, _, it = state
        return jnp.any(col_of < 0) & (it < max_iters)

    row_iota = jnp.arange(n, dtype=jnp.int32)
    col_iota2 = jnp.arange(n, dtype=jnp.int32)[None, :]

    def round_(state):
        # Dense-mask formulation: TPU gathers/scatters inside a while_loop
        # dominated the step profile (kCustom scatter fusions); every
        # indexed update below is an [n, n] one-hot compare+select on the
        # VPU instead.
        prices, col_of, row_of, it = state
        bidding = col_of < 0                           # [n]
        values = b - prices[None, :]                   # [n, n]
        j_star = jnp.argmax(values, axis=1)            # [n]
        m1 = jnp.max(values, axis=1)
        star_mask = col_iota2 == j_star[:, None]       # [n, n]
        m2 = jnp.max(jnp.where(star_mask, -jnp.inf, values), axis=1)
        m2 = jnp.where(jnp.isfinite(m2), m2, m1)       # single-col case
        price_at_star = jnp.max(jnp.where(star_mask, prices[None, :],
                                          -jnp.inf), axis=1)
        bid = price_at_star + (m1 - m2) + eps          # [n]

        # Column-wise best bid (Jacobi auction round).
        bids_mat = jnp.where(star_mask & bidding[:, None],
                             bid[:, None], -jnp.inf)   # [n, n]
        best_bid = jnp.max(bids_mat, axis=0)           # [n]
        winner = jnp.argmax(bids_mat, axis=0).astype(jnp.int32)
        has_bid = jnp.isfinite(best_bid)

        # Evict previous owners of re-auctioned columns (dense mask).
        evicted_row = (has_bid[None, :]
                       & (row_of[None, :] == row_iota[:, None]))  # [n, n]
        was_evicted = jnp.any(evicted_row, axis=1)
        # Install winners: row i wins column j iff winner[j] == i & has_bid.
        win_mask = has_bid[None, :] & (winner[None, :] == row_iota[:, None])
        won_col = jnp.max(jnp.where(win_mask, col_iota2, -1), axis=1)
        col_of = jnp.where(won_col >= 0, won_col,
                           jnp.where(was_evicted, -1, col_of))
        row_of = jnp.where(has_bid, winner, row_of)
        prices = jnp.where(has_bid, best_bid, prices)
        # Count only ACTIVE rounds: the unrolled body may run up to 2
        # no-op rounds after convergence, which must not inflate the
        # reported iteration stat or burn max_iters budget.
        return prices, col_of, row_of, it + jnp.any(bidding).astype(
            jnp.int32)

    def body(state):
        # Several Jacobi rounds per while_loop iteration: typical gated
        # MOT problems converge in 5-15 rounds and the per-round compute
        # is a handful of [n, n] VPU passes, so the loop-condition sync
        # is a significant fraction of the solve.  A round after
        # convergence is a no-op (no unassigned rows -> no bids), so
        # over-running by <= 2 rounds is harmless.
        for _ in range(3):
            state = round_(state)
        return state

    init = (jnp.zeros((n,), jnp.float32),
            jnp.full((n,), -1, jnp.int32),
            jnp.full((n,), -1, jnp.int32),
            jnp.int32(0))
    _, col_of, _, iters = jax.lax.while_loop(cond, body, init)
    converged = jnp.all(col_of >= 0)

    # Keep real rows only; strip dummy columns and infeasible matches.
    col_of = col_of[:n_rows]
    matched_real = (col_of >= 0) & (col_of < m_cols)
    ok = matched_real & jnp.take_along_axis(
        feasible, jnp.clip(col_of, 0, m_cols - 1)[:, None], axis=1)[:, 0]
    return jnp.where(ok, col_of, -1).astype(jnp.int32), iters, converged


def scipy_assign(cost: np.ndarray, feasible: np.ndarray) -> np.ndarray:
    """Host-side exact reference (scipy Hungarian), same interface."""
    from scipy.optimize import linear_sum_assignment

    n, m = cost.shape
    big = COST_CAP * 10.0
    c = np.where(feasible, cost, big)
    rows, cols = linear_sum_assignment(c)
    out = np.full((n,), -1, np.int32)
    for r, cc in zip(rows, cols):
        if feasible[r, cc]:
            out[r] = cc
    return out


def assignment_cost(cost: np.ndarray, row_to_col: np.ndarray) -> float:
    """Total cost of matched pairs (for optimality comparison in tests)."""
    total = 0.0
    for r, c in enumerate(row_to_col):
        if c >= 0:
            total += float(cost[r, c])
    return total
