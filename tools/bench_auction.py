"""Auction implementation sweep at the bench shape (128x160): XLA
lax.while_loop formulation vs the fused Pallas VMEM-resident kernel
(kernels/auction.py), standalone dependent-chain marginal timing
(CLAUDE.md methodology), plus result-agreement verification on the real
compiled kernel.

Run in the bench session; commit the log:
    python tools/bench_auction.py | tee tools/bench_auction_r3.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mot.ops import assignment, iou as iou_ops

    t_cap, d_cap = 128, 160
    rng = np.random.default_rng(0)

    def mot_instance(seed):
        r = np.random.default_rng(seed)
        tracks = r.uniform(50, 1800, (t_cap, 4)).astype(np.float32)
        tracks[:, 1] = r.uniform(50, 1000, t_cap)
        tracks[:, 2:] = r.uniform(24, 64, (t_cap, 2))
        dets = np.concatenate(
            [tracks[:110] + r.normal(0, 4, (110, 4)),
             r.uniform(50, 1000, (30, 4)),
             np.zeros((20, 4))]).astype(np.float32)
        dvalid = np.ones((d_cap,), bool)
        dvalid[140:] = False
        cost = np.asarray(iou_ops.association_cost(
            jnp.asarray(tracks), jnp.asarray(dets),
            jnp.ones((t_cap,), bool), jnp.asarray(dvalid),
            iou_gate=0.1, infeasible=1e4)).astype(np.float32)
        return cost, cost < 1e3

    # -- agreement on the compiled kernel (not just interpret mode) ----
    n_agree = 0
    for seed in range(8):
        cost, feas = mot_instance(seed)
        want = assignment.scipy_assign(cost, feas)
        for impl in ("xla", "pallas"):
            got, it, conv = assignment.auction_assign_stats(
                jnp.asarray(cost), jnp.asarray(feas), impl=impl)
            got = np.asarray(got)
            assert bool(conv), (seed, impl)
            assert (got >= 0).sum() == (want >= 0).sum(), (seed, impl)
            gap = (assignment.assignment_cost(cost, got)
                   - assignment.assignment_cost(cost, want))
            assert gap <= 0.05, (seed, impl, gap)
        n_agree += 1
    print(json.dumps({"check": "compiled-kernel agreement vs scipy",
                      "instances": n_agree, "status": "PASS"}), flush=True)

    # -- dependent-chain marginal timing --------------------------------
    cost0, feas0 = mot_instance(0)
    costj = jnp.asarray(cost0)
    feasj = jnp.asarray(feas0)
    n_long, n_short = 512, 64

    def measure(impl):
        def body(c, _):
            m, it, conv = assignment.auction_assign_stats(
                c, feasj, impl=impl)
            # Carry a cost perturbation derived from the result so no
            # iteration hoists (scan-hoisting pitfall, CLAUDE.md).
            return c + (jnp.sum(m).astype(jnp.float32) * 1e-9), None

        def run(n):
            c, _ = jax.lax.scan(body, costj, None, length=n)
            return c[0, 0]
        f_long = jax.jit(lambda: run(n_long))
        f_short = jax.jit(lambda: run(n_short))
        jax.block_until_ready(f_long())
        jax.block_until_ready(f_short())

        def t(f):
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(f_long) - t(f_short)) / (n_long - n_short) * 1e3

    for impl in ("xla", "pallas"):
        ms = measure(impl)
        print(json.dumps({"impl": impl, "shape": [t_cap, d_cap],
                          "ms_per_solve": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
