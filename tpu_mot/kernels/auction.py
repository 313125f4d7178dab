"""Fused Pallas auction-assignment kernel — the whole Bertsekas solve in
one kernel launch, every Jacobi round a handful of [n, n] VPU passes over
a VMEM-resident benefit matrix.

Why: the XLA formulation (ops/assignment.auction_assign_warm) runs the
round body inside `lax.while_loop`, so every 3-round body pays a loop-sync
+ dispatch round trip through HBM for state that is 160x160 floats — the
auction was ~0.047 ms of the 0.19 ms frame at the bench shape (128x160,
tools/profile_stages_r3b.log) while touching well under 1 MB of state.
Here the while_loop lives INSIDE the kernel: prices/assignment stay in
registers/VMEM for the entire solve.

Same mathematical contract as the XLA path (gap bidding at fixed eps,
symmetric squared problem, jitter tie-breaks — see ops/assignment's
docstring for the design rationale); equality of RESULT COST is asserted
against scipy in tests/test_assignment.py, and argmax/argmin tie-break
differences between the two implementations are tolerated only where the
optimum is degenerate.

Mosaic notes (CLAUDE.md landmines respected):
  * no gathers/scatters — winner/eviction bookkeeping is dense one-hot
    compare+select, as in the XLA path;
  * no argmax — column/row picks are min-index-of-max via iota+where
    (deterministic, matches jnp.argmax's first-occurrence semantics);
  * reductions go one axis at a time; the loop predicate reads a [1, 1]
    single-axis reduction;
  * -1e30 sentinels instead of inf (no isfinite in the round body).

Reference behavior: SURVEY.md §2 row "hungarian" (BASELINE.json names the
on-device auction inside jax.lax.while_loop; this kernel is that design
with the loop pushed into VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1.0e30


def _auction_kernel(b_ref, col_out_ref, it_out_ref, *, eps: float,
                    max_iters: int, n: int):
    b = b_ref[...]                                     # [n, n] f32
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)

    def cond(state):
        _, col_of, _, it = state
        # One axis at a time; col_of is [n, 1] so axis 0 is the only one.
        unassigned = jnp.min(col_of, axis=0, keepdims=True)  # [1, 1]
        return (unassigned[0, 0] < 0) & (it < max_iters)

    def body(state):
        prices, col_of, row_of, it = state
        # prices [1, n] (per column), col_of [n, 1] (per row),
        # row_of [1, n] (owner row per column).
        bidding = col_of < 0                           # [n, 1]
        any_bid = jnp.max(bidding.astype(jnp.int32), axis=0,
                          keepdims=True)               # [1, 1]
        values = b - prices                            # [n, n]
        m1 = jnp.max(values, axis=1, keepdims=True)    # [n, 1]
        at_max = values >= m1                          # [n, n]
        c_star = jnp.min(jnp.where(at_max, ci, n), axis=1,
                         keepdims=True)                # [n, 1]
        star = ci == c_star                            # [n, n] one-hot
        m2 = jnp.max(jnp.where(star, _NEG, values), axis=1,
                     keepdims=True)                    # [n, 1]
        m2 = jnp.where(m2 <= _NEG * 0.5, m1, m2)       # single-column case
        p_at = jnp.max(jnp.where(star, prices + jnp.zeros_like(b), _NEG),
                       axis=1, keepdims=True)          # [n, 1]
        bid = p_at + (m1 - m2) + eps                   # [n, 1]

        bids = jnp.where(star & bidding, bid + jnp.zeros_like(b), _NEG)
        best_bid = jnp.max(bids, axis=0, keepdims=True)      # [1, n]
        has_bid = best_bid > _NEG * 0.5                      # [1, n]
        winner = jnp.min(jnp.where(bids >= best_bid, ri, n), axis=0,
                         keepdims=True)                      # [1, n]

        evict = has_bid & (row_of == ri)               # [n, n]
        was_evicted = jnp.max(evict.astype(jnp.int32), axis=1,
                              keepdims=True) > 0       # [n, 1]
        win = has_bid & (winner == ri)                 # [n, n]
        won_col = jnp.max(jnp.where(win, ci, -1), axis=1,
                          keepdims=True)               # [n, 1]
        col_of = jnp.where(won_col >= 0, won_col,
                           jnp.where(was_evicted, -1, col_of))
        row_of = jnp.where(has_bid, winner, row_of)
        prices = jnp.where(has_bid, best_bid, prices)
        return prices, col_of, row_of, it + any_bid[0, 0]

    init = (jnp.zeros((1, n), jnp.float32),
            jnp.full((n, 1), -1, jnp.int32),
            jnp.full((1, n), -1, jnp.int32),
            jnp.int32(0))
    _, col_of, _, iters = jax.lax.while_loop(cond, body, init)
    col_out_ref[...] = col_of
    it_out_ref[0, 0] = iters


@functools.partial(jax.jit,
                   static_argnames=("eps", "max_iters", "interpret"))
def auction_solve_pallas(b: jnp.ndarray, eps: float, max_iters: int,
                         interpret: bool | None = None
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the squared auction on benefits b [n, n] (dummies/jitter
    already folded in, as built by ops/assignment).  Returns
    (col_of [n] int32 — may contain -1 only if max_iters was hit —
    and iters [] int32).

    Capped-solve contract (tests/test_assignment.py::
    test_capped_solve_partial_contract / test_step_surfaces_capped_solve):
    when max_iters exhausts, col_of is mid-solve PARTIAL state — some rows
    -1, the rest holding a column they currently own (always a real,
    never-garbage index).  The ops/assignment wrapper maps this through
    the same strip_to_rows as the XLA solver, so -1 surfaces as
    "unmatched" and converged=False; in the tracker step unmatched tracks
    coast and unmatched detections birth tentatively — identical
    semantics to the XLA path's cap."""
    n = b.shape[0]
    assert b.shape == (n, n)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    col, it = pl.pallas_call(
        functools.partial(_auction_kernel, eps=eps, max_iters=max_iters,
                          n=n),
        out_shape=(jax.ShapeDtypeStruct((n, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(b)
    return col[:, 0], it[0, 0]
