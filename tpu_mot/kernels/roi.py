"""Pallas ROI-extraction kernel: per-track window DMA + MXU resample.

The profiler showed the per-frame step is dominated by ROI sampling when it
is expressed as XLA gathers (row gathers from a 1080p HBM frame ran at
~10 GB/s, 26 ms of a 27 ms step).  The reference does this crop per track
on the CPU (SURVEY.md §2 "features"); the TPU-native design is:

  * The frame is reduced once per frame into a small mip pyramid
    (dense 2x average-pool chain — VPU work, ~1 extra frame read).
  * One Pallas grid program per track: pick the pyramid level where the
    context window is <= 128 px, DMA just that window's aligned block
    (160 x 256 px) HBM→VMEM, and bilinear-resample to the 64 x 64 template
    with two tiny matmuls on the MXU (resampling = one-hot weight matrices
    W_y @ block @ W_x^T).

Traffic: ~160 KB per track instead of streaming megabytes of gathered rows
— about 20 MB/frame at 128 tracks, two orders of magnitude less than the
gather formulation.

Pyramid levels also bound the largest trackable window: with 4 levels the
window may reach 128 * 8 = 1024 px on the full-resolution frame.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LEVELS = 4
BLK_ROWS = 144      # window rows per DMA block (multiple of 8; window
                    # <= 128 + alignment slack 8 + bilinear +1 => 137)
BLK_COLS = 256      # window cols per DMA block (multiple of 128)
MAX_WIN = 128.0     # level chosen so the window is <= this many px
# Pyramid storage dtype: the ROI DMAs are bandwidth-bound (~40 MB/frame at
# 128 tracks in f32); bfloat16 halves the traffic at ~0.4% pixel
# quantization — the same error class as the DEFAULT-precision resample
# dots. Pass dtype=float32 for exact parity runs.
PYRAMID_DTYPE = jnp.bfloat16


def _ceil_mult(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _level_shapes(h: int, w: int):
    """Padded (rows, cols) of each pyramid level; rows >= BLK_ROWS and
    cols >= BLK_COLS so a full block DMA never overruns."""
    shapes = []
    for lv in range(N_LEVELS):
        lh = -(-h // (1 << lv))
        lw = -(-w // (1 << lv))
        shapes.append((max(_ceil_mult(lh, 8), BLK_ROWS),
                       max(_ceil_mult(lw, 128), BLK_COLS)))
    return tuple(shapes)


def build_pyramid(gray: jnp.ndarray, dtype=None):
    """[H, W] float32 or uint8 frame → list of N_LEVELS padded level
    images.

    Level k is a 2^k x 2^k average pool; padding replicates nothing (zeros)
    — samplers never index past the true extent.

    A uint8 input keeps the whole pyramid uint8 (the ROI kernel folds the
    1/255 dequantization into its resample weights): level 0 becomes a
    zero-copy pad of the ingest frame (at 1080p the padded shape equals
    the frame shape, so it is free), deeper levels round back to u8
    (<=0.5/255 per level, below the bf16 storage error), and every window
    DMA halves again vs bf16 — measured 0.0425 ms/frame for the f32->bf16
    pyramid chain at 1080p (tools/bench_roi_sweep_r2.log).  Float input
    stores PYRAMID_DTYPE (bf16) by default; pass dtype=float32 for exact
    parity runs.
    """
    h, w = gray.shape
    shapes = _level_shapes(h, w)
    # Normalize the VALUE DOMAIN to the storage dtype first: u8 levels
    # hold 0..255 (the kernel folds 1/255 into its resample weights, keyed
    # on levels[0].dtype), float levels hold [0, 1].  Without this, a u8
    # frame stored as float (dtype=float32 "exact parity" runs) kept
    # 0..255 values that the kernel no longer rescaled — patches came
    # back 255x hot with no error (caught by review r2).
    u8 = jnp.uint8 == (dtype or (jnp.uint8 if gray.dtype == jnp.uint8
                                 else PYRAMID_DTYPE))
    dtype = jnp.uint8 if u8 else (dtype or PYRAMID_DTYPE)
    if gray.dtype != jnp.uint8:
        # Value-domain guard (advisor r2): a float frame may arrive in
        # EITHER unit [0, 1] (to_gray output) or byte [0, 255] domain
        # (e.g. a decoder handing back float pixels).  Rescale keyed on
        # the observed max — a traced select, one extra frame reduction —
        # instead of silently saturating every pixel to 255 on the u8
        # conversion below.  1.5 cleanly separates the domains (a real
        # frame in byte domain has max >> 1.5; a unit frame cannot).
        unit = jnp.max(gray) <= 1.5
        gray = gray * jnp.where(unit, 1.0, 1.0 / 255.0)
    if u8 and gray.dtype != jnp.uint8:
        gray = jnp.clip(gray * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    elif not u8 and gray.dtype == jnp.uint8:
        gray = gray.astype(jnp.float32) / 255.0
    levels = []
    cur = gray
    for lv in range(N_LEVELS):
        ch, cw = cur.shape
        ph, pw = shapes[lv]
        levels.append(jnp.pad(cur, ((0, ph - ch),
                                    (0, pw - cw))).astype(dtype))
        if lv + 1 < N_LEVELS:
            # 2x2 average pool via reduce_window — one fused pass; the
            # reshape-mean formulation costs ~2 ms/frame at 1080p in
            # layout-change copies (profiled).
            pooled = jax.lax.reduce_window(
                cur.astype(jnp.float32), 0.0, jax.lax.add,
                (2, 2), (2, 2), "SAME") * 0.25
            cur = (jnp.clip(pooled + 0.5, 0.0, 255.0).astype(jnp.uint8)
                   if u8 else pooled)
    return levels


# Tracks resampled per grid program; window DMAs run N_BUFFERS deep so
# several tracks' HBM→VMEM copies are in flight while track k resamples
# on the MXU (each window block is a 37 KB u8 / 74 KB bf16 copy —
# latency, not bandwidth, bound).  Swept on the v5e
# (tools/bench_roi_sweep_r2.log): 8 buffers at 16 tracks/program is ~12%
# faster than the old 4-deep pipeline; 32 tracks/program is equivalent
# but doubles the padding waste for small banks.  The r4 re-sweep at the
# detect-site operating point read nbuf=4 faster on the STANDALONE
# float chain (tools/bench_roi_sweep_r4.log) — env overrides below
# exist so bench.py can A/B the full pipeline without a code edit.
def _pos_env_int(env_var: str, default: str) -> int:
    """Validated positive-int env knob (ADVICE r4: 0/negative/garbage
    used to fail far away as an opaque Pallas grid/DMA error)."""
    raw = _os.environ.get(env_var, default)
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(f"{env_var}={raw!r} is not an integer") from None
    if val < 1:
        raise ValueError(f"{env_var}={val} must be >= 1 (it sizes a "
                         "Pallas grid/DMA pipeline)")
    return val


TRACKS_PER_PROG = _pos_env_int("TPU_MOT_ROI_TPP", "16")
N_BUFFERS = _pos_env_int("TPU_MOT_ROI_NBUF", "8")
# Resample matmul precision. Mosaic supports DEFAULT (1 bf16 pass) and
# HIGHEST (6 passes) only; DEFAULT quantizes [0,1] pixel data to ~0.4%
# (bf16 mantissa), far below detector jitter and sensor noise, and halves
# the step's dominant cost (the two ROI kernels were 54% of the frame at
# HIGHEST). MOTA parity is asserted by bench.py's sanity gate and the CPU
# test tier remains exact (interpret mode).
_DOT_PRECISION = jax.lax.Precision.DEFAULT


def _roi_kernel(lvl_ref, r0_ref, c0_ref, ys_ref, xs_ref,
                l0, l1, l2, l3, out_ref, scratch, sem,
                tpp: int = TRACKS_PER_PROG, nbuf: int = N_BUFFERS,
                scale: float = 1.0, dot_impl: str = "default"):
    g = pl.program_id(0)
    levels = (l0, l1, l2, l3)

    def start_dma(k, slot):
        t = g * tpp + k
        lvl = lvl_ref[t]
        r0 = pl.multiple_of(r0_ref[t], 8)
        c0 = pl.multiple_of(c0_ref[t], 128)
        for lv in range(N_LEVELS):
            @pl.when(lvl == lv)
            def _():
                pltpu.make_async_copy(
                    levels[lv].at[pl.ds(r0, BLK_ROWS), pl.ds(c0, BLK_COLS)],
                    scratch.at[slot], sem.at[slot]).start()

    def wait_dma(k, slot):
        t = g * tpp + k
        lvl = lvl_ref[t]
        r0 = pl.multiple_of(r0_ref[t], 8)
        c0 = pl.multiple_of(c0_ref[t], 128)
        for lv in range(N_LEVELS):
            @pl.when(lvl == lv)
            def _():
                pltpu.make_async_copy(
                    levels[lv].at[pl.ds(r0, BLK_ROWS), pl.ds(c0, BLK_COLS)],
                    scratch.at[slot], sem.at[slot]).wait()

    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, BLK_ROWS), 1).astype(jnp.float32)
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, BLK_COLS), 1).astype(jnp.float32)

    for j in range(min(nbuf - 1, tpp)):
        start_dma(j, j % nbuf)
    for k in range(tpp):
        slot = k % nbuf
        nxt = k + nbuf - 1
        if nxt < tpp:
            start_dma(nxt, nxt % nbuf)
        wait_dma(k, slot)
        t = g * tpp + k
        r0f = r0_ref[t].astype(jnp.float32)
        c0f = c0_ref[t].astype(jnp.float32)
        # Bilinear resample via one-hot weight matmuls on the MXU.
        ys = ys_ref[t, :] - r0f                       # [S] block-local rows
        xs = xs_ref[t, :] - c0f                       # [S] block-local cols
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - row_iota))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - col_iota))
        blk = scratch[slot]
        if dot_impl == "nodot":
            # Diagnostic only: skip the resample dots to attribute the
            # kernel's DMA vs MXU split (output is garbage).
            b32 = blk[0:out_ref.shape[1], 0:out_ref.shape[2]]
            if b32.dtype == jnp.uint8:
                b32 = b32.astype(jnp.int32)
            out_ref[k] = b32.astype(jnp.float32) * scale + wy[0, 0] + wx[0, 0]
            continue
        if dot_impl == "int8" and blk.dtype == jnp.uint8:
            # Row resample on the int8 MXU (2x the bf16 rate): quantize
            # the hat weights to 1/127 steps (<=0.4% — the same class as
            # the DEFAULT-precision bf16 rounding of the f32 path) and
            # center the u8 pixels at zero so they fit int8:
            #   wy @ blk/255 = (wq @ (blk-128) + 128*rowsum(wq)) / (127*255)
            wq = (wy * 127.0 + 0.5).astype(jnp.int8)
            x128 = (blk.astype(jnp.int32) - 128).astype(jnp.int8)
            c = jax.lax.dot_general(wq, x128, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            rsq = jnp.sum(wq.astype(jnp.int32), axis=1, keepdims=True)
            tmp = (c + 128 * rsq).astype(jnp.float32) * (1.0 / (127.0 * 255.0))
        elif dot_impl == "colfirst":
            # Contract the column axis first: [R, C] @ [C, S] runs the
            # MXU at K=256 (two full passes) and shrinks the second dot
            # to [S, R] @ [R, S] — 5.9 vs 6.8 MFLOP per track.
            if scale != 1.0:
                wy = wy * scale
            if blk.dtype == jnp.uint8:
                blk = blk.astype(jnp.int32)
            tmpc = jax.lax.dot_general(blk.astype(jnp.float32), wx,
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=_DOT_PRECISION)
            out_ref[k] = jnp.dot(wy, tmpc,
                                 preferred_element_type=jnp.float32,
                                 precision=_DOT_PRECISION)
            continue
        else:
            if scale != 1.0:
                # u8 pyramid dequantization (1/255) folded into the row
                # weights — free relative to a separate elementwise pass
                # over the block.
                wy = wy * scale
            if blk.dtype == jnp.uint8:
                # Mosaic has no direct u8->f32 cast (NotImplementedError);
                # widen through int32 first (verified, 2026-08-16).
                blk = blk.astype(jnp.int32)
            tmp = jnp.dot(wy, blk.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=_DOT_PRECISION)
        out = jax.lax.dot_general(tmp, wx, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=_DOT_PRECISION)
        out_ref[k] = out


def _scales_kernel(lvl_ref, r0_ref, c0_ref, ys_ref, xs_ref,
                   l0, l1, l2, l3, out_ref, scratch, sem,
                   tpp: int = TRACKS_PER_PROG, nbuf: int = N_BUFFERS,
                   n_scales: int = 3, scale: float = 1.0):
    """Multi-scale variant of _roi_kernel: ONE window DMA per track feeds
    n_scales resamples (the ±5% scale windows overlap ~95%, so re-reading
    the block per scale — what the [3T]-batched layout does — wastes 2/3
    of the ROI DMA traffic and grid programs).

    ys_ref/xs_ref : [n_scales, T, S] per-scale sample coords (scale-major
        so the kernel indexes scales statically — a [T, K*S] layout hits
        Mosaic's "dynamic load with unaligned indices" on the 64-px
        column offsets, bisected 2026-08-17).
    out_ref block : [tpp, n_scales, S, S].
    """
    g = pl.program_id(0)
    levels = (l0, l1, l2, l3)

    def start_dma(k, slot):
        t = g * tpp + k
        lvl = lvl_ref[t]
        r0 = pl.multiple_of(r0_ref[t], 8)
        c0 = pl.multiple_of(c0_ref[t], 128)
        for lv in range(N_LEVELS):
            @pl.when(lvl == lv)
            def _():
                pltpu.make_async_copy(
                    levels[lv].at[pl.ds(r0, BLK_ROWS), pl.ds(c0, BLK_COLS)],
                    scratch.at[slot], sem.at[slot]).start()

    def wait_dma(k, slot):
        t = g * tpp + k
        lvl = lvl_ref[t]
        r0 = pl.multiple_of(r0_ref[t], 8)
        c0 = pl.multiple_of(c0_ref[t], 128)
        for lv in range(N_LEVELS):
            @pl.when(lvl == lv)
            def _():
                pltpu.make_async_copy(
                    levels[lv].at[pl.ds(r0, BLK_ROWS), pl.ds(c0, BLK_COLS)],
                    scratch.at[slot], sem.at[slot]).wait()

    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, BLK_ROWS), 1).astype(jnp.float32)
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, BLK_COLS), 1).astype(jnp.float32)
    s_out = out_ref.shape[-1]

    for j in range(min(nbuf - 1, tpp)):
        start_dma(j, j % nbuf)
    for k in range(tpp):
        slot = k % nbuf
        nxt = k + nbuf - 1
        if nxt < tpp:
            start_dma(nxt, nxt % nbuf)
        wait_dma(k, slot)
        t = g * tpp + k
        r0f = r0_ref[t].astype(jnp.float32)
        c0f = c0_ref[t].astype(jnp.float32)
        blk = scratch[slot]
        if blk.dtype == jnp.uint8:
            # Mosaic has no direct u8->f32 cast; widen through int32.
            blk = blk.astype(jnp.int32)
        blk = blk.astype(jnp.float32)
        for sc in range(n_scales):
            ys = ys_ref[sc, t, :] - r0f
            xs = xs_ref[sc, t, :] - c0f
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - row_iota))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - col_iota))
            if scale != 1.0:
                wy = wy * scale          # u8 dequant folded into weights
            tmp = jnp.dot(wy, blk, preferred_element_type=jnp.float32,
                          precision=_DOT_PRECISION)
            out_ref[k, sc] = jax.lax.dot_general(
                tmp, wx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION)


def extract_patches_scales_pallas(gray: jnp.ndarray, boxes: jnp.ndarray,
                                  padding: float, size: int,
                                  scale_vals: tuple,
                                  interpret: bool | None = None,
                                  levels=None, frame_hw=None,
                                  dtype=None,
                                  tracks_per_prog: int | None = None,
                                  n_buffers: int | None = None
                                  ) -> jnp.ndarray:
    """Scale-pyramid ROI extraction with one DMA per track:
    [H, W] frame + [T, 4] boxes + K static scales → [K, T, S, S].

    Semantics vs K separate extract_patches_pallas calls: identical
    except the pyramid LEVEL is chosen once per track from the LARGEST
    scale window (so one block covers all K windows).  Tracks whose
    windows straddle a level boundary (win/MAX_WIN within the scale
    spread of a power of two) sample the coarser level for their smaller
    scales — the same approximation class as the mip pyramid itself
    (quality asserted by the bench MOTA gate; exactness tested for
    non-straddling tracks in tests/test_roi_kernel.py).
    """
    if interpret is None:      # interpret-auto: CPU tier runs the
        interpret = jax.default_backend() == "cpu"  # kernel in interpret mode
    t_cap = boxes.shape[0]
    k_sc = len(scale_vals)
    if levels is None:
        h, w = gray.shape
        levels = build_pyramid(gray, dtype=dtype)
    else:
        h, w = frame_hw
    shapes = _level_shapes(h, w)

    cx, cy, bw, bh = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(bw, 1.0)
    bh = jnp.maximum(bh, 1.0)
    smax = float(max(scale_vals))
    win_max = jnp.maximum(bw, bh) * (padding * smax)
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(win_max / MAX_WIN, 1.0))),
                   0, N_LEVELS - 1).astype(jnp.int32)
    scale = 2.0 ** lvl.astype(jnp.float32)
    lh = jnp.asarray([-(-h // (1 << k)) for k in range(N_LEVELS)],
                     jnp.float32)[lvl]
    lw = jnp.asarray([-(-w // (1 << k)) for k in range(N_LEVELS)],
                     jnp.float32)[lvl]
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size - 0.5
    ys_k, xs_k = [], []
    for sv in scale_vals:
        win_w = bw * (padding * float(sv))
        win_h = bh * (padding * float(sv))
        ys_k.append(jnp.clip(
            (cy[:, None] + u[None, :] * win_h[:, None] + 0.5)
            / scale[:, None] - 0.5, 0.0, (lh - 1.0)[:, None]))
        xs_k.append(jnp.clip(
            (cx[:, None] + u[None, :] * win_w[:, None] + 0.5)
            / scale[:, None] - 0.5, 0.0, (lw - 1.0)[:, None]))
    ys = jnp.stack(ys_k, axis=0)                     # [K, T, S]
    xs = jnp.stack(xs_k, axis=0)
    # Block origin from the EARLIEST first-row/col over scales (largest
    # window starts first; clamping can reorder, so take the min).
    y0 = jnp.min(jnp.stack([yk[:, 0] for yk in ys_k]), axis=0)
    x0 = jnp.min(jnp.stack([xk[:, 0] for xk in xs_k]), axis=0)
    max_r0 = jnp.asarray([s[0] - BLK_ROWS for s in shapes], jnp.int32)[lvl]
    max_c0 = jnp.asarray([s[1] - BLK_COLS for s in shapes], jnp.int32)[lvl]
    r0 = jnp.clip((jnp.floor(y0).astype(jnp.int32) // 8) * 8, 0, max_r0)
    c0 = jnp.clip((jnp.floor(x0).astype(jnp.int32) // 128) * 128, 0, max_c0)

    tpp = tracks_per_prog or TRACKS_PER_PROG
    nbuf = n_buffers or N_BUFFERS
    t_pad = _ceil_mult(t_cap, tpp)
    if t_pad != t_cap:
        pad = ((0, t_pad - t_cap),)
        lvl = jnp.pad(lvl, pad)
        r0 = jnp.pad(r0, pad)
        c0 = jnp.pad(c0, pad)
        ys = jnp.pad(ys, ((0, 0),) + pad + ((0, 0),))
        xs = jnp.pad(xs, ((0, 0),) + pad + ((0, 0),))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # ys [K, T, S]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # xs
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * N_LEVELS,
        out_specs=pl.BlockSpec((tpp, k_sc, size, size),
                               lambda g, *_: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, BLK_ROWS, BLK_COLS), levels[0].dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    dequant = 1.0 / 255.0 if levels[0].dtype == jnp.uint8 else 1.0
    out = pl.pallas_call(
        functools.partial(_scales_kernel, tpp=tpp, nbuf=nbuf,
                          n_scales=k_sc, scale=dequant),
        out_shape=jax.ShapeDtypeStruct((t_pad, k_sc, size, size),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lvl, r0, c0, ys, xs, *levels)
    return jnp.swapaxes(out[:t_cap], 0, 1)           # [K, T, S, S]


def _sample_coords(boxes, padding, size, scales):
    """Per-track pyramid level + block origin + block-level sample coords."""
    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    w = jnp.maximum(w, 1.0)
    h = jnp.maximum(h, 1.0)
    if scales is not None:
        w = w * scales
        h = h * scales
    win_w = w * padding
    win_h = h * padding
    win = jnp.maximum(win_w, win_h)
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(win / MAX_WIN, 1.0))),
                   0, N_LEVELS - 1).astype(jnp.int32)
    return lvl, win_w, win_h, cx, cy


def extract_patches_pallas(gray: jnp.ndarray, boxes: jnp.ndarray,
                           padding: float, size: int,
                           scales: jnp.ndarray | None = None,
                           interpret: bool | None = None,
                           levels=None, frame_hw=None,
                           dtype=None, tracks_per_prog: int | None = None,
                           n_buffers: int | None = None,
                           dot_impl: str = "default") -> jnp.ndarray:
    """Pallas ROI extraction: [H, W] frame + [T, 4] boxes → [T, S, S].

    Equivalent to ops.patch.extract_patches up to the mip-level resampling
    for windows wider than MAX_WIN px (larger boxes sample a downscaled
    level; the XLA path always samples full resolution).

    levels/frame_hw: pass a prebuilt pyramid (build_pyramid) to amortize
    the once-per-frame reduction across extraction sites — rebuilding it
    per call costs ~2.7 ms at 1080p vs ~0.03 ms for the kernel itself.
    """
    if interpret is None:      # interpret-auto: CPU tier runs the
        interpret = jax.default_backend() == "cpu"  # kernel in interpret mode
    t_cap = boxes.shape[0]
    if levels is None:
        h, w = gray.shape
        levels = build_pyramid(gray, dtype=dtype)
    else:
        h, w = frame_hw
    shapes = _level_shapes(h, w)

    lvl, win_w, win_h, cx, cy = _sample_coords(boxes, padding, size, scales)
    scale = (2.0 ** lvl.astype(jnp.float32))
    # True (unpadded) extent of each level, for coordinate clamping.
    lh = jnp.asarray([-(-h // (1 << k)) for k in range(N_LEVELS)],
                     jnp.float32)[lvl]                 # [T]
    lw = jnp.asarray([-(-w // (1 << k)) for k in range(N_LEVELS)],
                     jnp.float32)[lvl]
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size - 0.5
    # Full-res coordinate y maps to level-k coordinate (y + .5)/2^k - .5
    # (level pixel centers); at level 0 this is exactly the XLA path's y.
    ys = jnp.clip(
        (cy[:, None] + u[None, :] * win_h[:, None] + 0.5) / scale[:, None]
        - 0.5, 0.0, (lh - 1.0)[:, None])               # [T, S]
    xs = jnp.clip(
        (cx[:, None] + u[None, :] * win_w[:, None] + 0.5) / scale[:, None]
        - 0.5, 0.0, (lw - 1.0)[:, None])
    # Aligned block origins; clamp so a full block stays inside the padded
    # level (padded rows/cols are >= BLK and real coords never index them
    # with nonzero weight beyond one zero row/col at the true edge).
    max_r0 = jnp.asarray([s[0] - BLK_ROWS for s in shapes], jnp.int32)[lvl]
    max_c0 = jnp.asarray([s[1] - BLK_COLS for s in shapes], jnp.int32)[lvl]
    r0 = jnp.clip((jnp.floor(ys[:, 0]).astype(jnp.int32) // 8) * 8,
                  0, max_r0)
    c0 = jnp.clip((jnp.floor(xs[:, 0]).astype(jnp.int32) // 128) * 128,
                  0, max_c0)

    tpp = tracks_per_prog or TRACKS_PER_PROG
    nbuf = n_buffers or N_BUFFERS
    t_pad = _ceil_mult(t_cap, tpp)
    if t_pad != t_cap:
        pad = ((0, t_pad - t_cap),)
        lvl = jnp.pad(lvl, pad)
        r0 = jnp.pad(r0, pad)
        c0 = jnp.pad(c0, pad)
        ys = jnp.pad(ys, pad + ((0, 0),))
        xs = jnp.pad(xs, pad + ((0, 0),))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # ys (full [T, S])
            pl.BlockSpec(memory_space=pltpu.VMEM),      # xs
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * N_LEVELS,
        out_specs=pl.BlockSpec((tpp, size, size),
                               lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, BLK_ROWS, BLK_COLS), levels[0].dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    dequant = 1.0 / 255.0 if levels[0].dtype == jnp.uint8 else 1.0
    if dot_impl == "int8" and levels[0].dtype != jnp.uint8:
        raise ValueError(
            "dot_impl='int8' requires a uint8 pyramid (u8 ingest frames); "
            f"got {levels[0].dtype} — it would silently measure the "
            "default path")
    out = pl.pallas_call(
        functools.partial(_roi_kernel, tpp=tpp, nbuf=nbuf, scale=dequant,
                          dot_impl=dot_impl),
        out_shape=jax.ShapeDtypeStruct((t_pad, size, size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lvl, r0, c0, ys, xs, *levels)
    return out[:t_cap]
