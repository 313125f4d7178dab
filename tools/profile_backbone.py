"""Per-layer yolov3-tiny backbone attribution at the serving shape.

r4e (tools/profile_detector_r4d.log): the b8/416/bf16 backbone measures
3.26 ms where its ~44 bf16 GFLOPs would be ~0.25 ms at the v5e MXU
peak.  This tool times each block (conv+bn+lrelu, maxpool, upsample,
concat) standalone at its exact serving shape with the dependent-chain
marginal method (CLAUDE.md timing methodology), to localize the
off-peak factor before any structural change.

Blocks are built as fresh ConvBlocks with random params — per-layer
cost is shape/topology-bound, not weight-bound.

Run in the bench session; commit the log.
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

    from tpu_mot.models.yolo import ConvBlock, _maxpool

    b = int(os.environ.get("PROF_BB_B", "8"))
    n_long = int(os.environ.get("PROF_BB_LONG", "64"))
    n_short = int(os.environ.get("PROF_BB_SHORT", "8"))

    def measure(body, carry0, fetch):
        def run(n):
            c, _ = jax.lax.scan(body, carry0, None, length=n)
            return fetch(c)
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
        ms = (t(f_long) - t(f_short)) / (n_long - n_short) * 1e3
        # Noise-floor clamp (VERDICT r4 weak #4): sub-10us stages can
        # measure negative under dependent-chain marginal timing; floor
        # at 0 and flag so a reader never quotes a negative cost.
        if ms < 0:
            print(json.dumps({"note": "below-resolution stage clamped",
                              "raw_ms": round(ms, 4)}), flush=True)
            ms = 0.0
        return ms

    def emit(k, v):
        print(json.dumps({"stage": k, "ms": round(v, 4)}), flush=True)

    rng = jax.random.PRNGKey(0)

    def conv_stage(name, hw, cin, cout, k=3, gflops=None):
        blk = ConvBlock(cout, k, dtype=jnp.bfloat16)
        x0 = jax.random.normal(rng, (b, hw, hw, cin), jnp.float32)
        var = blk.init(rng, x0)

        def body(x, _):
            y = blk.apply(var, x)
            # Data-dependent feedback at the INPUT shape so XLA cannot
            # hoist the conv out of the scan.
            d = (y[0, 0, 0, 0] * 1e-12).astype(x.dtype)
            return x + d, None
        ms = measure(body, x0, lambda c: c[0, 0, 0, 0])
        fl = 2 * b * hw * hw * k * k * cin * cout / 1e9
        emit(f"{name} conv{k}x{k} {cin}->{cout} @{hw}"
             f" ({fl:.2f} GF, {fl / 197e3 * 1e3 * 1e3:.1f} us peak)", ms)
        return ms

    def pool_stage(name, hw, c, stride=2):
        x0 = jax.random.normal(rng, (b, hw, hw, c), jnp.float32)

        def body(x, _):
            y = _maxpool(x, stride=stride)
            d = (y[0, 0, 0, 0] * 1e-12).astype(x.dtype)
            return x + d, None
        emit(f"{name} maxpool s{stride} @{hw}x{c}",
             measure(body, x0, lambda c_: c_[0, 0, 0, 0]))

    total = 0.0
    total += conv_stage("L0", 416, 3, 16)
    pool_stage("L1", 416, 16)
    total += conv_stage("L2", 208, 16, 32)
    pool_stage("L3", 208, 32)
    total += conv_stage("L4", 104, 32, 64)
    pool_stage("L5", 104, 64)
    total += conv_stage("L6", 52, 64, 128)
    pool_stage("L7", 52, 128)
    total += conv_stage("L8", 26, 128, 256)
    pool_stage("L9", 26, 256)
    total += conv_stage("L10", 13, 256, 512)
    pool_stage("L11", 13, 512, stride=1)
    total += conv_stage("L12", 13, 512, 1024)
    total += conv_stage("L13", 13, 1024, 256, k=1)
    total += conv_stage("L14-head0pre", 13, 256, 512)
    total += conv_stage("head0", 13, 512, 18, k=1)
    total += conv_stage("L15-up", 13, 256, 128, k=1)
    total += conv_stage("L16-head1pre", 26, 384, 256)
    total += conv_stage("head1", 26, 256, 18, k=1)

    emit("SUM(convs, standalone)", total)


if __name__ == "__main__":
    sys.exit(main())
