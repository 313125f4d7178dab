"""Fused Pallas mip-pyramid kernel: all N_LEVELS-1 pooled levels from one
pass over the frame.

Why: the XLA build_pyramid (kernels/roi.build_pyramid) is a chain of
three reduce_window kernels + pad copies — ~0.031 ms/frame at 1080p
(tools/profile_stages_r3b.log) for ~3 MB of traffic, i.e. launch/copy
bound, not bandwidth bound.  Here one kernel reads each frame tile once
and emits the aligned tiles of levels 1..3; level 0 stays the zero-copy
pad of the ingest frame exactly as before.

Design:
  * Grid tiles level 0 in (128, 1024) blocks, so the level-k output tile
    is (128>>k, 1024>>k) — every level's tile stays (8, 128)-aligned.
    The grid is raised to cover every PADDED level extent, and each
    output is allocated at the grid-exact extent (grid * tile) and
    sliced back to the canonical roi._level_shapes afterwards.  This
    matters: Pallas CLAMPS an out-of-range block index to the array
    edge rather than discarding the write, so a program whose tile lies
    beyond a small level's padded extent would otherwise land on top of
    a valid block and clobber it with its masked zeros (exactly what
    bit levels 1-2 of a 256x384 frame, where _level_shapes' 144x256
    minimum breaks the levels' 2x proportionality).  At 1080p every
    level is grid-exact and the slices are identity.
  * 2x2 average pooling runs as two matmuls on the MXU: Y = R X C with
    R [64, 128] / C [1024, 512] pair-sum matrices (passed as broadcast
    inputs — Mosaic kernels may not capture array constants, CLAUDE.md).
    Level k>1 uses the leading static slice of the same matrices (the
    pair-sum pattern is local, so R[:r, :2r] is the r-row pooling).
  * Everything beyond a level's TRUE extent is zeroed in-kernel with
    iota masks — both the input tile (so ragged-edge garbage never
    contaminates an interior average; matches the XLA path's zero-pad
    "SAME" edge semantics at odd extents) and the output tile (so the
    padded arrays are guaranteed zero — a NaN bit pattern in padding
    would otherwise survive a 0-weight in the ROI resample matmuls).
  * u8 levels round back to u8 per level and the NEXT level pools the
    rounded values — bit-identical semantics to the XLA chain (whose
    equality is asserted in tests/test_pyramid_fused.py).  u8 <-> f32
    casts go through int32 (no direct u8 cast on Mosaic).

KNOWN ISSUES / STATUS (2026-08-19, v5e):
  * BENCH: the kernel LOSES to the XLA reduce_window chain — 0.122 vs
    0.048 ms/frame standalone at 1080p and 4770 -> 2819 fps in the
    pipeline (tools/bench_pyramid_r4.log, bench_pyr_fused_r4.log), so
    pyramid_impl="auto" resolves to "xla"; the knob stays for
    re-evaluation on future toolchains.
  * HARDWARE-UNSTABLE on the current toolchain: the COMPILED kernel
    intermittently raises a TPU INTERNAL backend error at fetch — first
    reproducibly at the odd 543x961 shape (tpu_parity_r4.log, _r4b),
    then in a later same-day session at 1080p itself (_r4d), a shape
    that had passed bit-parity earlier.  The abort poisons the backend
    for all subsequent device calls in the process.  Treat the compiled
    path as unreliable until a toolchain update; tools/tpu_parity.py
    probes it subprocess-isolated and non-gating.  Interpret mode is
    bit-exact at every shape (tests/test_pyramid_fused.py).

Run only when the ROI Pallas path is active (the levels feed
kernels/roi's window DMAs); CPU tests cover it via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_mot.kernels.roi import N_LEVELS, PYRAMID_DTYPE, _level_shapes

BLK_R0 = 128          # level-0 tile rows  (level k tile: BLK_R0 >> k)
BLK_C0 = 1024         # level-0 tile cols


def _pool_matrices():
    """Pair-sum pooling matrices: R [64, 128] (rows), C [1024, 512]
    (cols); R[i, 2i] = R[i, 2i+1] = 1 — leading slices give every level's
    pooling operator."""
    r = np.zeros((BLK_R0 // 2, BLK_R0), np.float32)
    r[np.arange(BLK_R0 // 2), 2 * np.arange(BLK_R0 // 2)] = 1.0
    r[np.arange(BLK_R0 // 2), 2 * np.arange(BLK_R0 // 2) + 1] = 1.0
    c = np.zeros((BLK_C0, BLK_C0 // 2), np.float32)
    c[2 * np.arange(BLK_C0 // 2), np.arange(BLK_C0 // 2)] = 1.0
    c[2 * np.arange(BLK_C0 // 2) + 1, np.arange(BLK_C0 // 2)] = 1.0
    return r, c


def _mask_tile(x, rows_true: int, cols_true: int, blk_r: int, blk_c: int):
    """Zero x beyond the level's true extent for this program's tile."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (blk_r, blk_c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (blk_r, blk_c), 1)
    ok = ((ri + i * blk_r) < rows_true) & ((ci + j * blk_c) < cols_true)
    return jnp.where(ok, x, jnp.zeros_like(x))


def _pyramid_kernel(x_ref, r_ref, c_ref, o1_ref, o2_ref, o3_ref, *,
                    true_hw, u8: bool, out_dtype):
    h, w = true_hw
    rmat = r_ref[...]                       # [64, 128]
    cmat = c_ref[...]                       # [1024, 512]
    hp = jax.lax.Precision.HIGHEST

    x = x_ref[...]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32).astype(jnp.float32)
    else:
        x = x.astype(jnp.float32)
    x = _mask_tile(x, h, w, BLK_R0, BLK_C0)

    outs = (o1_ref, o2_ref, o3_ref)
    lh, lw = h, w
    for lv in range(1, N_LEVELS):
        br, bc = BLK_R0 >> lv, BLK_C0 >> lv
        lh, lw = -(-lh // 2), -(-lw // 2)
        y = 0.25 * jnp.dot(jnp.dot(rmat[:br, : 2 * br], x, precision=hp),
                           cmat[: 2 * bc, :bc], precision=hp)
        if u8:
            # Round to u8 domain; the next level pools the ROUNDED value
            # (bit-parity with the XLA chain).
            y = jnp.floor(jnp.clip(y + 0.5, 0.0, 255.0))
        y = _mask_tile(y, lh, lw, br, bc)
        if u8:
            outs[lv - 1][...] = y.astype(jnp.int32).astype(jnp.uint8)
        else:
            outs[lv - 1][...] = y.astype(out_dtype)
        x = y


@functools.partial(jax.jit, static_argnames=("shapes", "true_hw", "u8",
                                              "out_dtype", "interpret"))
def _run(level0: jnp.ndarray, *, shapes, true_hw, u8, out_dtype,
         interpret):
    rmat, cmat = _pool_matrices()
    grid_r = max(-(-shapes[0][0] // BLK_R0),
                 *[-(-shapes[lv][0] // (BLK_R0 >> lv))
                   for lv in range(1, N_LEVELS)])
    grid_c = max(-(-shapes[0][1] // BLK_C0),
                 *[-(-shapes[lv][1] // (BLK_C0 >> lv))
                   for lv in range(1, N_LEVELS)])
    # Grid-exact output extents: every program's write region is a
    # distinct in-bounds block (see module docstring — Pallas clamps
    # out-of-range block indices, it does not discard the write).
    out_shapes = tuple(
        jax.ShapeDtypeStruct((grid_r * (BLK_R0 >> lv),
                              grid_c * (BLK_C0 >> lv)),
                             jnp.uint8 if u8 else out_dtype)
        for lv in range(1, N_LEVELS))
    out_specs = tuple(
        pl.BlockSpec((BLK_R0 >> lv, BLK_C0 >> lv),
                     (lambda lv: lambda i, j: (i, j))(lv),
                     memory_space=pltpu.VMEM)
        for lv in range(1, N_LEVELS))
    outs = pl.pallas_call(
        functools.partial(_pyramid_kernel, true_hw=true_hw, u8=u8,
                          out_dtype=out_dtype),
        grid=(grid_r, grid_c),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec((BLK_R0, BLK_C0), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_R0 // 2, BLK_R0), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_C0, BLK_C0 // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(level0, jnp.asarray(rmat), jnp.asarray(cmat))
    # Identity at 1080p (grid-exact == canonical); a cheap copy on small
    # frames.  In-kernel masking guarantees the kept padding is zero.
    return tuple(o[: shapes[lv][0], : shapes[lv][1]]
                 for lv, o in zip(range(1, N_LEVELS), outs))


def build_pyramid_fused(gray: jnp.ndarray, dtype=None,
                        interpret: bool | None = None):
    """Drop-in fused variant of kernels/roi.build_pyramid: same level
    shapes (roi._level_shapes), same dtype rules, same values (asserted
    bit-equal for u8 in tests/test_pyramid_fused.py)."""
    h, w = gray.shape
    shapes = _level_shapes(h, w)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u8 = jnp.uint8 == (dtype or (jnp.uint8 if gray.dtype == jnp.uint8
                                 else PYRAMID_DTYPE))
    out_dtype = jnp.uint8 if u8 else (dtype or PYRAMID_DTYPE)
    if gray.dtype != jnp.uint8:
        unit = jnp.max(gray) <= 1.5         # value-domain guard (roi.py)
        gray = gray * jnp.where(unit, 1.0, 1.0 / 255.0)
        if u8:
            gray = jnp.clip(gray * 255.0 + 0.5, 0.0, 255.0).astype(
                jnp.uint8)
    elif not u8:
        gray = gray.astype(jnp.float32) / 255.0
    ph, pw = shapes[0]
    level0 = jnp.pad(gray, ((0, ph - h), (0, pw - w)))
    if not u8:
        level0 = level0.astype(out_dtype)
    # The kernel pools what the XLA chain pools: the u8 frame itself, or
    # for float pyramids the f32 'cur' (level-0 STORAGE is bf16, but the
    # chain's pooling operand stays f32 — roi.build_pyramid semantics).
    kp = level0 if u8 else jnp.pad(gray.astype(jnp.float32),
                                   ((0, ph - h), (0, pw - w)))
    deeper = _run(kp, shapes=shapes, true_hw=(h, w), u8=u8,
                  out_dtype=out_dtype, interpret=interpret)
    return [level0] + list(deeper)
