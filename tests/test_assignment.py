"""Auction assignment vs SciPy Hungarian and optax (SURVEY.md §4.1):
random + adversarial (degenerate/tied) cost matrices."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_mot.ops import assignment, iou


def _check_case(cost, feasible, tol=None):
    # Theory bound: suboptimality <= n * eps (see assignment.py design notes).
    tol = tol if tol is not None else (
        cost.shape[0] * assignment.DEFAULT_EPS)
    got = np.asarray(assignment.auction_assign(
        jnp.asarray(cost), jnp.asarray(feasible)))
    want = assignment.scipy_assign(cost, feasible)
    # Valid assignment: no duplicate columns, only feasible pairs.
    matched = got[got >= 0]
    assert len(set(matched.tolist())) == len(matched)
    for r, c in enumerate(got):
        if c >= 0:
            assert feasible[r, c]
    # Same cardinality and (near-)equal optimal cost.
    assert (got >= 0).sum() == (want >= 0).sum(), (got, want)
    got_cost = assignment.assignment_cost(cost, got)
    want_cost = assignment.assignment_cost(cost, want)
    assert got_cost <= want_cost + tol, (got_cost, want_cost)
    return got


@pytest.mark.parametrize("shape", [(5, 5), (8, 3), (3, 8), (1, 1), (16, 16)])
def test_random_matrices(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    for trial in range(5):
        cost = rng.uniform(0, 2, shape).astype(np.float32)
        feasible = rng.random(shape) > 0.3
        _check_case(cost, feasible)


def test_all_infeasible():
    cost = np.ones((4, 4), np.float32)
    feasible = np.zeros((4, 4), bool)
    got = np.asarray(assignment.auction_assign(
        jnp.asarray(cost), jnp.asarray(feasible)))
    assert (got == -1).all()


def test_ties_and_degenerate():
    # All-equal costs: any perfect matching is optimal.
    cost = np.full((6, 6), 0.5, np.float32)
    feasible = np.ones((6, 6), bool)
    _check_case(cost, feasible)
    # Identical rows (classic Munkres stress).
    cost = np.tile(np.linspace(0, 1, 6, dtype=np.float32), (6, 1))
    _check_case(cost, feasible)
    # Diagonal dominance with one adversarial swap.
    cost = np.ones((5, 5), np.float32)
    np.fill_diagonal(cost, 0.1)
    cost[0, 1] = 0.0
    cost[1, 0] = 0.0
    _check_case(cost, np.ones((5, 5), bool))


def test_vs_optax_assignment():
    optax = pytest.importorskip("optax")
    rng = np.random.default_rng(7)
    cost = rng.uniform(0, 2, (10, 10)).astype(np.float32)
    feasible = np.ones((10, 10), bool)
    got = np.asarray(assignment.auction_assign(
        jnp.asarray(cost), jnp.asarray(feasible)))
    rows, cols = optax.assignment.hungarian_algorithm(jnp.asarray(cost))
    want_cost = float(cost[np.asarray(rows), np.asarray(cols)].sum())
    got_cost = assignment.assignment_cost(cost, got)
    assert got_cost <= want_cost + 10 * assignment.DEFAULT_EPS


def test_mot_shaped_case():
    """Tracks vs detections, gated by IoU, as used in the tracker step."""
    rng = np.random.default_rng(3)
    tracks = rng.uniform(50, 200, (12, 4)).astype(np.float32)
    tracks[:, 2:] = rng.uniform(15, 40, (12, 2))
    dets = tracks[:8].copy()
    dets[:, :2] += rng.normal(0, 3, (8, 2))        # matched, jittered
    extra = rng.uniform(50, 200, (3, 4)).astype(np.float32)
    extra[:, 2:] = rng.uniform(15, 40, (3, 2))
    dets = np.concatenate([dets, extra]).astype(np.float32)

    cost = np.asarray(iou.association_cost(
        jnp.asarray(tracks), jnp.asarray(dets),
        jnp.ones((12,), bool), jnp.ones((11,), bool),
        iou_gate=0.1, infeasible=1e4))
    feasible = cost < 1e3
    got = _check_case(cost.astype(np.float32), feasible)
    # The 8 jittered copies must match back to their source tracks.
    for t in range(8):
        assert got[t] == t, got
