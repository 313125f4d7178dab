"""Fused-KCF-kernel variant sweep: MXU precision x track-block size.

Measures the standalone detect / train+blend chains at the bench shape
(T=128, C=1, S=64) for the XLA einsum path and the fused Pallas kernel
across (precision, block) variants.  Each measurement is a DEPENDENT chain
folded into one device program with lax.scan (the axon tunnel's ~30-45 ms
RTT and its identical-call dedup make per-call timing meaningless —
CLAUDE.md methodology); marginal cost comes from two chain lengths.

Run in the bench session; commit the log next to this file.
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

    from tpu_mot.kernels import kcf as fused
    from tpu_mot.ops import kcf as kcf_ops

    t_cap, nc, s = 128, 1, 64
    rng = np.random.default_rng(0)
    feat0 = jnp.asarray(rng.standard_normal((t_cap, nc, s, s)),
                        jnp.float32) * 0.3
    yf = kcf_ops.make_yf(s, 2.5, 0.125)
    model0 = kcf_ops.train(feat0, yf, 0.2, 1e-4)
    lr = jnp.full((t_cap,), 0.075, jnp.float32)
    n_long, n_short = 256, 32

    def chain_detect(det_fn):
        def body(feat, _):
            resp = det_fn(model0, feat)
            # Feed the response back as the next features: dependent chain.
            return resp[:, None, :, :] * 0.5 + feat0 * 0.5, None
        def run(n):
            f, _ = jax.lax.scan(body, feat0, None, length=n)
            return f
        return run

    def chain_train(train_fn):
        def body(model, _):
            # The features must depend on the carry: with loop-invariant
            # feat0, XLA hoists the whole train() out of the scan and only
            # the blend lerp is measured (observed: "train" ~0 ms for the
            # xla variant). A scalar model-dependent perturbation keeps the
            # chain honest for both impls.
            f = feat0 * (1.0 + jnp.mean(model.alphaf.re) * 1e-9)
            return train_fn(model, f), None
        def run(n):
            m, _ = jax.lax.scan(body, model0, None, length=n)
            return m.alphaf.re
        return run

    def measure(run):
        f_long = jax.jit(lambda: run(n_long))
        f_short = jax.jit(lambda: run(n_short))
        jax.block_until_ready(f_long())       # compile
        jax.block_until_ready(f_short())

        def t(f):
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(f_long) - t(f_short)) / (n_long - n_short) * 1e3  # ms/call

    variants = [("xla", None, None)]
    for prec in ("highest", "default"):
        for blk in (8, 16, 32, 64, 128):
            variants.append(("pallas", prec, blk))

    ref_resp = None
    for impl, prec, blk in variants:
        name = impl if impl == "xla" else f"pallas/{prec}/tb{blk}"
        try:
            if impl == "xla":
                det = lambda m, f: kcf_ops.detect(m, f, 0.2)
                trn = lambda m, f: kcf_ops.blend(
                    m, kcf_ops.train(f, yf, 0.2, 1e-4), lr)
            else:
                det = (lambda m, f, p=prec, b=blk:
                       fused.detect_fused(m, f, 0.2, precision=p, block=b))
                trn = (lambda m, f, p=prec, b=blk:
                       fused.train_fused(m, f, yf, 0.2, 1e-4, lr,
                                         precision=p, block=b))
            resp = np.asarray(jax.jit(det)(model0, feat0))
            if ref_resp is None:
                ref_resp = resp
            err = float(np.max(np.abs(resp - ref_resp)))
            ms_det = measure(chain_detect(det))
            ms_trn = measure(chain_train(trn))
            print(json.dumps({
                "variant": name,
                "detect_ms": round(ms_det, 4),
                "train_ms": round(ms_trn, 4),
                "total_ms": round(ms_det + ms_trn, 4),
                "max_abs_diff_vs_xla": f"{err:.2e}",
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives VMEM blowups
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
