"""Space-to-depth stem candidates for the tiny-YOLO early layers.

r4e attribution (tools/profile_backbone_r4e.log): L0 conv 3->16 @416^2
(2.17 ms), L1 maxpool (0.75), L2 conv 16->32 @208^2 (0.83), L3 maxpool
(0.77) are 4.5 ms of standalone cost for ~4.4 bf16 GFLOPs — the
classic TPU lane-padding pathology at channel counts 3/16/32 (every
tensor is padded to 128 lanes, so the stem moves ~30x its logical
bytes).  The classic remedy (MLPerf-ResNet space-to-depth) is EXACT
here: a 3x3 stride-1 conv on X equals a 3x3 conv on s2d(X) with the
taps scattered into (cell-offset, subpixel) kernel slots, and each 2x2
stride-2 maxpool collapses to a channel-group max.

Candidates, all mapping gray [B,416,416] -> [B,104,104,32]
(post conv1+pool1+conv2+pool2, darknet semantics: conv SAME(1,1),
BN(eps 1e-5), leaky 0.1, pool SAME):
  direct  broadcast->conv(Cin=3)->pool->conv->pool  (shipped today)
  s2d2    conv1 at 208^2 cells [*,*,4]->64ch, posmax, s2d, conv2
          [*,*,64]->128ch at 104^2 cells, posmax
  s2d4    conv1 at 104^2 cells [*,*,16]->256ch, paired posmax -> 64ch,
          conv2 ->128ch, posmax  (whole stem on one 104^2 grid)

Exactness vs the direct composition is asserted in f32 with conv
precision pinned HIGHEST (atol 2e-5 — conv accumulation-order class;
at DEFAULT the TPU computes "f32" convs in bf16 passes and the
direct-vs-s2d accumulation difference measures ~6e-3, which is dtype
rounding, not scatter error — first run 2026-08-19); timing uses the
dependent-chain marginal method at bf16 DEFAULT, the serving point.
Run on the TPU; commit the log.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stem_kernel_s2d(w, s):
    """Scatter a [3,3,Cin,Co] HWIO stride-1 conv kernel into its
    space-to-depth form [3,3,s*s*Cin, s*s*Co].

    Output position q=(ey*s+ex)*Co+o of cell (I,J) is the conv output at
    pixel (s*I+ey, s*J+ex); tap (u,v) reads pixel offset a=ey+u-1 which
    lives at cell offset divmod(a,s)[0], subpixel divmod(a,s)[1].  All
    slots not hit by a real tap stay zero, so cell-level zero padding
    reproduces SAME padding exactly (taps never reach beyond one pixel
    outside the frame)."""
    kh, kw, cin, co = w.shape
    assert kh == kw == 3
    out = np.zeros((3, 3, s * s * cin, s * s * co), w.dtype)
    for ey in range(s):
        for ex in range(s):
            for u in range(3):
                for v in range(3):
                    da, dy = divmod(ey + u - 1, s)
                    db, dx = divmod(ex + v - 1, s)
                    out[da + 1, db + 1,
                        (dy * s + dx) * cin:(dy * s + dx + 1) * cin,
                        (ey * s + ex) * co:(ey * s + ex + 1) * co] \
                        += w[u, v]
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    b = int(os.environ.get("PROF_STEM_B", "8"))
    hw = int(os.environ.get("PROF_STEM_HW", "416"))
    n_long = int(os.environ.get("PROF_STEM_LONG", "64"))
    n_short = int(os.environ.get("PROF_STEM_SHORT", "8"))

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
        return (t(f_long) - t(f_short)) / (n_long - n_short) * 1e3

    def emit(k, v):
        print(json.dumps({"stage": k, "ms": round(v, 4)}), flush=True)

    rng = np.random.default_rng(0)
    w1 = rng.normal(0, 0.1, (3, 3, 3, 16)).astype(np.float32)
    w2 = rng.normal(0, 0.1, (3, 3, 16, 32)).astype(np.float32)
    bn1 = [rng.normal(1, 0.1, 16).astype(np.float32),   # scale
           rng.normal(0, 0.1, 16).astype(np.float32),   # bias
           rng.normal(0, 0.1, 16).astype(np.float32),   # mean
           rng.uniform(0.5, 2, 16).astype(np.float32)]  # var
    bn2 = [rng.normal(1, 0.1, 32).astype(np.float32),
           rng.normal(0, 0.1, 32).astype(np.float32),
           rng.normal(0, 0.1, 32).astype(np.float32),
           rng.uniform(0.5, 2, 32).astype(np.float32)]
    gray = rng.random((b, hw, hw)).astype(np.float32)

    def conv(x, w, dt, prec=None):
        return jax.lax.conv_general_dilated(
            x.astype(dt), jnp.asarray(w, dt), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec)

    def bn_lrelu(x, p, tile=1):
        sc, bi, mu, va = [jnp.tile(jnp.asarray(q, x.dtype), tile)
                          for q in p]
        x = (x - mu) / jnp.sqrt(va + 1e-5) * sc + bi
        return jnp.where(x > 0, x, 0.1 * x)

    def pool(x, stride=2):
        return jax.lax.reduce_window(
            x, -jnp.inf if x.dtype == jnp.float32 else
            jnp.array(-3e38, x.dtype),
            jax.lax.max, (1, 2, 2, 1), (1, stride, stride, 1), "SAME")

    def s2d(x, s):
        bb, h, w, c = x.shape
        x = x.reshape(bb, h // s, s, w // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(bb, h // s, w // s, s * s * c)

    def posmax(x, groups):
        bb, h, w, c = x.shape
        return x.reshape(bb, h, w, groups, c // groups).max(axis=3)

    # -- direct (shipped): gray -> 3ch -> conv1 -> pool -> conv2 -> pool
    def direct(g, dt, prec=None):
        x = jnp.repeat(g[..., None], 3, axis=-1)
        x = bn_lrelu(conv(x, w1, dt, prec), bn1)
        x = pool(x)
        x = bn_lrelu(conv(x, w2, dt, prec), bn2)
        return pool(x)

    # -- s2d2
    w1g = w1.sum(axis=2, keepdims=True)            # gray: channels equal
    w1_s2 = stem_kernel_s2d(w1g, 2)                # [3,3,4,64]
    w2_s2 = stem_kernel_s2d(w2, 2)                 # [3,3,64,128]

    def cand_s2d2(g, dt, prec=None):
        x = s2d(g[..., None], 2)                   # [B,208,208,4]
        x = bn_lrelu(conv(x, w1_s2, dt, prec), bn1, tile=4)
        x = posmax(x, 4)                           # pool1 -> [B,208,208,16]
        x = s2d(x, 2)                              # [B,104,104,64]
        x = bn_lrelu(conv(x, w2_s2, dt, prec), bn2, tile=4)
        return posmax(x, 4)                        # pool2 -> [B,104,104,32]

    # -- s2d4: conv1 on the 104^2 grid, paired posmax re-packs to the
    #    s2d2-of-208^2 channel order conv2's s2d kernel expects.
    w1_s4 = stem_kernel_s2d(w1g, 4)                # [3,3,16,256]

    def pool1_s4(x):
        bb, h, w, _ = x.shape                      # [*, 16pos*16ch]
        x = x.reshape(bb, h, w, 2, 2, 2, 2, 16)    # (py2,dy,px2,dx,o)
        x = x.max(axis=(4, 6))                     # max over (dy,dx)
        return x.reshape(bb, h, w, 64)             # (py2*2+px2)*16+o

    def cand_s2d4(g, dt, prec=None):
        x = s2d(g[..., None], 4)                   # [B,104,104,16]
        x = bn_lrelu(conv(x, w1_s4, dt, prec), bn1, tile=16)
        x = pool1_s4(x)                            # [B,104,104,64]
        x = bn_lrelu(conv(x, w2_s2, dt, prec), bn2, tile=4)
        return posmax(x, 4)                        # [B,104,104,32]

    # -- exactness (f32 at HIGHEST conv precision — at DEFAULT the TPU
    #    runs "f32" convs in bf16 passes and accumulation-order noise
    #    between Cin=3 and Cin=48 formulations is ~6e-3, pure rounding)
    hi = jax.lax.Precision.HIGHEST
    g_small = jnp.asarray(gray[:2])
    ref = np.asarray(direct(g_small, jnp.float32, hi))
    for name, fn in [("s2d2", cand_s2d2), ("s2d4", cand_s2d4)]:
        got = np.asarray(fn(g_small, jnp.float32, hi))
        err = float(np.max(np.abs(got - ref)))
        print(json.dumps({"check": f"{name} vs direct (f32 atol)",
                          "max_abs_err": err, "ok": err < 2e-5}),
              flush=True)
        if err >= 2e-5:
            print(json.dumps({"fatal": f"{name} INEXACT"}), flush=True)
            return 1

    # -- timing (bf16 serving dtype)
    g0 = jnp.asarray(gray)
    for name, fn in [("direct", direct), ("s2d2", cand_s2d2),
                     ("s2d4", cand_s2d4)]:
        def body(x, _, fn=fn):
            y = fn(x, jnp.bfloat16)
            d = (y[0, 0, 0, 0] * 1e-12).astype(x.dtype)
            return x + d, None
        emit(f"stem_{name} (bf16, b{b}, {hw}^2 gray -> {hw // 4}^2 x32)",
             measure(body, g0, lambda c: c[0, 0, 0]))

    # -- layout cost alone
    def body_l(x, _):
        y = s2d(x[..., None], 4)
        d = (y[0, 0, 0, 0] * 1e-12).astype(x.dtype)
        return x + d, None
    emit("s2d4_transpose_alone", measure(body_l, g0,
                                         lambda c: c[0, 0, 0]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
