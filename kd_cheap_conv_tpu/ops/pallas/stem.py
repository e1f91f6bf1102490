"""Fused MobileNetV2 stem (features[1..2]) in channel-sublane layout.

Why: at 513² the student's early blocks run on (N, 257, 257, C) tensors with
C ∈ {16..96}. XLA:TPU lane-pads the minor (channel) dim to 128, so every
conv/BN/elementwise op pays 1.3-8x HBM traffic — profiled at ~18 ms of the
71 ms KD step (round-2 xplane profile), 10-20x over the memory roofline.
Forcing NCHW at the jnp level does not help (XLA re-canonicalizes layouts).

Here the stem activations live in (N, H, C, W) — channels in SUBLANES
(16/24/32/96 are all multiples of 8; zero padding), W in lanes — and the
whole f1+f2 chain runs as a handful of Pallas passes with HBM intermediates
in that layout:

    a0 -(bn0+relu6, dw3x3)-> a1 -(bn1+relu6, pw 32->16)-> a2
       -(bn2, pw 16->96)-> a3 -(bn3+relu6, dw3x3 s2)-> a4
       -(bn4+relu6, pw 96->24)-> a5 ; out = bn5(a5)

Each pass applies the previous BatchNorm (training-mode batch stats, flax
semantics: biased variance, y = (x-mu)*rsqrt(var+eps)*gamma+beta), the relu6
where the reference has one, one conv, and accumulates the NEXT BN's batch
moments on the fly — so every BN barrier costs exactly one read+write of one
unpadded tensor.

All inter-pass tensors live in ONE uniform padded row layout
(N, PAD + ceil/BH blocks, C, W): valid rows start at row PAD (= 2 BH
blocks, so blocked output specs stay block-aligned and the stride-2
pair view (N, R/2, 2, C, W) — a free bitcast — starts at pair block 1).
Passes read/write that layout directly (blocked or Element specs with a
PAD offset), so there is NO XLA pad/slice/copy between passes — the v1
implementation lost 13+ ms/step to exactly that glue. Rows outside the
written region are uninitialized; every halo read is where()-masked (not
multiplied) so NaN/inf garbage cannot propagate.

Stride-2 tricks (no strided lane/sublane access needed):
  * H stride 2: tensors are viewed as (N, R/2, 2, C, W) — row pairs are a
    free reshape of the same memory, so taps 2r-1 / 2r / 2r+1 are plain
    major-dim slices.
  * W stride 2: the lane contraction out[w'] = sum_dw k*x[2w'+dw-1] is a
    matmul with a static 0/1 selection matrix S_dw (W, W'), batched over
    rows and channels as one ((bh*C), W) @ (W, W') MXU op per tap.

Backward mirrors the passes in reverse: each bwd pass recomputes the needed
activations from the saved pre-BN conv outputs, applies the analytic
train-mode BN backward (which needs per-channel sums of g and g*xhat —
accumulated by the *previous* bwd pass), the conv transpose, and the conv
weight gradients (revisited-output accumulators). Activation gradients
between passes are stored in the activation dtype (bf16 on TPU).

Reference semantics: torchvision-scheme MobileNetV2 InvertedResidual
(SURVEY.md §2.1); numerics pinned against the plain NNX module path by
tests/test_pallas_stem.py (values, grads, and BN batch stats).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BH = int(os.environ.get("KDCC_STEM_BH", "16"))  # output rows per grid cell
# 120 MiB of v5e's 128 MiB VMEM: the NW-folded IR-chain s2 pass (irchain.py)
# carries three f32 (2176, 1152) selection matrices (8 KiB over the default
# 100 MiB scoped limit), and the s1 dw BACKWARD at BH_IR=8 stacks 113.8 MiB
# of live halo tensors (measured v5e compile: 1.8 MiB over a 112 MiB cap).
_CP = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
PAD = 2 * BH  # top pad rows: 2 BH blocks; PAD//2 = BH = 1 pair block


def _geom(H: int):
    """Row geometry: (nh, H2, nh2, R, R2) for the uniform padded layout."""
    nh = pl.cdiv(H, BH)
    H2 = (H + 1) // 2
    nh2 = pl.cdiv(H2, BH)
    # full-res arrays must hold: stride-1 halos (nh*BH + 1 bottom row) and
    # the stride-2 pair-view window (pairs up to PAD//2 + nh2*BH + 1)
    need = max(nh * BH + 2, 2 * (nh2 * BH + 1))
    R = PAD + pl.cdiv(need, BH) * BH
    R2 = PAD + (pl.cdiv(nh2 * BH + 2, BH)) * BH
    return nh, H2, nh2, R, R2


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def _lanes(w: int) -> int:
    """Logical lane extent: rounded up to the 128-lane tile. The physical
    tiled memref is this wide anyway; making it LOGICAL lets sliced DMAs
    (Mosaic requires tile-aligned slice shapes) and costs no HBM traffic.
    Lanes in [w, _lanes(w)) are pad — kept zero at every pass output."""
    return ((w + 127) // 128) * 128


def _mask_lanes(x, wreal):
    """Zero pad lanes >= wreal (last dim)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < wreal, x, 0.0)


def _sel_matrices(w_in: int, w_out: int, wp_in: int, wp_out: int,
                  n_img: int = 1):
    """Static 0/1 selection matrices S_dw (wp_in, wp_out): S[w, w'] = 1 iff
    w == 2*w' + dw - 1 (stride-2, pad-1 3-tap contraction along W), zero
    outside the real (w_in, w_out) ranges — pad-lane garbage multiplies
    zero rows, and pad output lanes get zero columns.

    n_img > 1: batch-folded (NW-on-lanes) layout — the matrix is block-
    diagonal over per-image [w_in]/[w_out] lane segments (wp_* then pad the
    FOLDED extents n_img*w_in / n_img*w_out)."""
    mats = []
    for dw in range(3):
        s = np.zeros((wp_in, wp_out), np.float32)
        for img in range(n_img):
            for wp in range(w_out):
                w = 2 * wp + dw - 1
                if 0 <= w < w_in:
                    s[img * w_in + w, img * w_out + wp] = 1.0
        mats.append(s)
    return mats


def _mm(a, b, dt):
    """MXU matmul in the model dtype (bf16 on TPU — f32 MXU runs at a
    fraction of bf16 rate; stock XLA convs are bf16 too), f32 accumulation.
    dt is the HBM array dtype; f32 kept for CPU-interpret parity tests."""
    return jnp.dot(a.astype(dt), b.astype(dt),
                   preferred_element_type=jnp.float32)


def _act(u, relu):
    """Activation selector: False = identity, True = relu6 (MobileNetV2),
    'relu' = plain ReLU (Xception)."""
    if relu == "relu":
        return jnp.maximum(u, 0.0)
    return jnp.clip(u, 0.0, 6.0) if relu else u


def _act_grad(u, relu):
    """d(_act)/du as an f32 0/1 mask (call only when relu is truthy)."""
    if relu == "relu":
        return (u > 0.0).astype(jnp.float32)
    return ((u > 0.0) & (u < 6.0)).astype(jnp.float32)


def _bn_apply(x, bn, relu, eps):
    """x (rows, C, W) f32; bn (C, 4) = [mean, var, gamma, beta] f32."""
    mu = bn[:, 0:1][None]
    var = bn[:, 1:2][None]
    g = bn[:, 2:3][None]
    b = bn[:, 3:4][None]
    u = (x - mu) * jax.lax.rsqrt(var + eps) * g + b
    return _act(u, relu)


def _rows_in(nrows, j, bh, first_global, H):
    """(nrows,1,1) bool: rows whose GLOBAL index is inside [0, H)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1, 1), 0)
    gr = r + j * bh + first_global
    return (gr >= 0) & (gr < H)


def _mask_rows(x, j, bh, first_global, H):
    """Zero rows outside [0, H) with where() — halo reads may contain
    uninitialized garbage (NaN/inf), so multiplication is not enough."""
    return jnp.where(_rows_in(x.shape[0], j, bh, first_global, H), x, 0.0)


def _stats_tile(y, mask, C):
    """Per-channel [sum, sumsq] packed in a (C, 128) tile (cols 0/1).
    y must already be garbage-free; mask zeroes rows beyond H."""
    ym = jnp.where(mask, y, 0.0)
    s = jnp.sum(ym, axis=(0, 2))
    s2 = jnp.sum(ym * ym, axis=(0, 2))
    col = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    return (jnp.where(col == 0, s[:, None], 0.0)
            + jnp.where(col == 1, s2[:, None], 0.0))


def _accum(ref, j, tile):
    @pl.when(j == 0)
    def _():
        ref[0] = tile

    @pl.when(j > 0)
    def _():
        ref[0] += tile


def _dma_enabled() -> bool:
    """Manual double-buffered halo DMA (opt-in, KDCC_STEM_DMA=1): one
    contiguous async copy per (input, cell), prefetching cell j+1's windows
    during cell j's compute. Built against the round-2 theory that the
    Element-window fetches were latency-bound (~7.6us/cell, no overlap) —
    but MEASURED round 3 on v5e b16/513²: 230.5 img/s (DMA) vs 232.7
    (Element windows), and BH=32 (which only the DMA path can compile)
    225.5. The overlap does not pay here, so the Element path stays the
    default; the DMA path is kept parity-tested for future shapes. Note the
    DMA path requires the lane-padded logical layout (_lanes) — which is
    now used unconditionally (physically free; Mosaic needs tile-aligned
    sliced copies)."""
    return os.environ.get("KDCC_STEM_DMA", "0") not in ("0", "false", "False")


def _halo_fetch(refs, starts, rows, bufs, sems, j, nh):
    """Double-buffered fetch of per-cell halo row windows.

    refs[k] is a full (N, R, C, W)-like HBM ref; window k for cell jj is the
    contiguous row slice [starts[k](jj), +rows[k]) of image program_id(0) —
    ONE contiguous DMA per (input, cell). Returns the VMEM views for cell j
    after starting cell j+1's copies."""
    i = pl.program_id(0)

    def dma(k, slot, jj):
        return pltpu.make_async_copy(
            refs[k].at[i, pl.ds(starts[k](jj), rows[k])],
            bufs[k].at[slot], sems[k].at[slot])

    for k in range(len(refs)):
        @pl.when(j == 0)
        def _(k=k):
            dma(k, 0, 0).start()

        @pl.when(j + 1 < nh)
        def _(k=k):
            dma(k, (j + 1) % 2, j + 1).start()

    out = []
    for k in range(len(refs)):
        dma(k, j % 2, j).wait()
        out.append(bufs[k][j % 2])
    return out


def _dw_taps(h, k, bh, W, flip=False, wseg=None, dil=1):
    """Stride-1 3x3 depthwise (dilation `dil`, pad=dil) on bn'd halo rows
    h (bh + 2*dil, C, W) with per-channel kernel k (C, 9). flip=True uses
    the spatially flipped kernel (transpose conv) via static tap
    reindexing — Mosaic has no `rev` lowering. Returns (bh, C, W) f32.

    wseg: per-image lane-segment width for the batch-folded (NW-on-lanes)
    layout — the conv zero-pad boundary is then at every multiple of wseg
    (the circular roll leaks image i-1's edge columns into image i's first
    `dil` positions, which are exactly the masked positions).

    The dh-sum folds BEFORE the lane roll (shift_dw commutes with row sums):
    2 rolls + 2 masks per call instead of 6 + 6 — these passes measured
    VPU-bound, not bandwidth-bound (round-4 profile: dw1 fwd 0.74 ms vs a
    0.28 ms traffic floor), so cutting the per-element roll/mask work is
    the lever; the same trick fixed the s2 pass in round 3."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    if wseg is not None:
        lane = lane % wseg
        edge = wseg
    else:
        edge = W
    C = h.shape[1]
    acc = jnp.zeros((bh, C, W), jnp.float32)
    for dw in range(3):
        g = jnp.zeros((bh, C, W), jnp.float32)
        for dh in range(3):
            t = 8 - (dh * 3 + dw) if flip else dh * 3 + dw
            g = g + h[dh * dil:dh * dil + bh] * k[:, t:t + 1][None]
        if dw == 1:
            acc = acc + g
        else:
            # dw=0: tap x[w-dil] -> roll right by dil; dw=2: left
            # (pltpu.roll is circular and needs a non-negative shift)
            shift = dil if dw == 0 else W - dil
            sh = pltpu.roll(g, shift, axis=2)
            if dw == 0:
                sh = jnp.where(lane >= dil, sh, 0.0)
            else:
                sh = jnp.where(lane < edge - dil, sh, 0.0)
            acc = acc + sh
    return acc


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _bn_dw_body(x, bn_ref, k_ref, y_ref, s_ref, j, *, bh, H, W, relu, eps,
                wseg=None, dil=1):
    x = x.astype(jnp.float32)
    h = _bn_apply(x, bn_ref[...].astype(jnp.float32), relu, eps)
    h = _mask_rows(h, j, bh, -dil, H)            # conv zero-pad + garbage
    h = _mask_lanes(h, W)                        # pad lanes: bn beta garbage
    y = _dw_taps(h, k_ref[...].astype(jnp.float32), bh, x.shape[2],
                 wseg=wseg, dil=dil)
    y = _mask_lanes(y, W)                        # roll spill into pad lanes
    y_ref[0] = y.astype(y_ref.dtype)
    m = _rows_in(bh, j, bh, 0, H)
    _accum(s_ref, j, _stats_tile(y, m, y.shape[1]))


def _k_bn_dw(x_ref, bn_ref, k_ref, y_ref, s_ref, *, bh, H, W, relu, eps,
             wseg=None, dil=1):
    """bn(+act) -> depthwise 3x3 s1 (dilation dil) -> y + next-BN moments.
    x block (1, bh+2*dil, C, Wp) halo rows starting at global j*bh-dil."""
    j = pl.program_id(1)
    _bn_dw_body(x_ref[0], bn_ref, k_ref, y_ref, s_ref, j,
                bh=bh, H=H, W=W, relu=relu, eps=eps, wseg=wseg, dil=dil)


def _k_bn_dw_dma(x_hbm, bn_ref, k_ref, y_ref, s_ref, buf, sem, *,
                 bh, H, W, relu, eps, wseg=None, dil=1):
    """_k_bn_dw with the halo window fetched by double-buffered DMA."""
    j = pl.program_id(1)
    (x,) = _halo_fetch([x_hbm], [lambda jj: PAD + jj * bh - dil],
                       [bh + 2 * dil], [buf], [sem], j, pl.num_programs(1))
    _bn_dw_body(x, bn_ref, k_ref, y_ref, s_ref, j,
                bh=bh, H=H, W=W, relu=relu, eps=eps, wseg=wseg, dil=dil)


def _k_bn_pw(x_ref, bn_ref, w_ref, y_ref, s_ref, *, bh, H, W, relu, eps):
    """bn(+relu6 opt) -> pointwise (Ci->Co) -> y + next-BN moments.
    x block (1, bh, Ci, Wp); w (Co, Ci). x rows are always producer-written
    (zeros beyond H), so no where-masking needed before the matmul."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    h = _bn_apply(x, bn_ref[...].astype(jnp.float32), relu, eps)
    h = _mask_rows(h, j, bh, 0, H)
    w = w_ref[...]
    rows = [_mm(w, h[r], y_ref.dtype) for r in range(bh)]
    y = jnp.stack(rows, axis=0)                      # (bh, Co, Wp)
    y = _mask_lanes(y, W)        # pad-lane columns: matmul of bn beta
    y_ref[0] = y.astype(y_ref.dtype)
    m = _rows_in(bh, j, bh, 0, H)
    _accum(s_ref, j, _stats_tile(y, m, y.shape[1]))


def _k_bn_dw_s2(xp_ref, bn_ref, k_ref, s0_ref, s1_ref, s2_ref,
                y_ref, st_ref, *, bh, Hin, Hout, eps, relu=True):
    """bn+relu6 -> depthwise 3x3 STRIDE-2 -> y (Hout=Hin//2+..) + moments.

    xp block (1, bh+1, 2, C, Win): row PAIRS of the (N, R/2, 2, C, W)
    view, starting at global pair j*bh-1. Output row r (global R=j*bh+r)
    taps input rows 2R-1,2R,2R+1 = pairs (R-1,1),(R,0),(R,1). W stride-2
    via the selection matmuls s0/s1/s2.
    """
    j = pl.program_id(1)
    _bn_dw_s2_body(xp_ref[0], bn_ref, k_ref, s0_ref, s1_ref, s2_ref,
                   y_ref, st_ref, j, bh=bh, Hin=Hin, Hout=Hout, eps=eps,
                   relu=relu)


def _k_bn_dw_s2_dma(xp_hbm, bn_ref, k_ref, s0_ref, s1_ref, s2_ref,
                    y_ref, st_ref, buf, sem, *, bh, Hin, Hout, eps,
                    relu=True):
    j = pl.program_id(1)
    (xp,) = _halo_fetch([xp_hbm], [lambda jj: PAD // 2 + jj * bh - 1],
                        [bh + 1], [buf], [sem], j, pl.num_programs(1))
    _bn_dw_s2_body(xp, bn_ref, k_ref, s0_ref, s1_ref, s2_ref,
                   y_ref, st_ref, j, bh=bh, Hin=Hin, Hout=Hout, eps=eps,
                   relu=relu)


def _bn_dw_s2_body(xp, bn_ref, k_ref, s0_ref, s1_ref, s2_ref,
                   y_ref, st_ref, j, *, bh, Hin, Hout, eps, relu=True):
    xp = xp.astype(jnp.float32)                      # (bh+1, 2C, Win)
    C = xp.shape[1] // 2
    bn = bn_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)               # (C, 9)

    # the pair dim is FOLDED into the sublane dim: row pair p is
    # (xp[p, 0:C], xp[p, C:2C]) — aligned sublane slices (C % 8 == 0),
    # which keeps the halo window 4D (5D Element windows DMA poorly)
    taps_rows = []
    for dh in range(3):
        if dh == 0:
            rows = xp[0:bh, C:2 * C]                 # global row 2R-1
            first = -1
        else:
            lo = (dh - 1) * C
            rows = xp[1:bh + 1, lo:lo + C]           # 2R (dh=1) / 2R+1 (dh=2)
            first = dh - 1
        taps_rows.append((rows, first))

    sels = [s0_ref[...], s1_ref[...], s2_ref[...]]   # (Win, Wout) f32
    Wout = sels[0].shape[1]
    # Fold the per-channel kernel scale and the dh-sum BEFORE the lane
    # selection matmul (k scales channels = rows of the flattened matmul
    # operand, so it commutes with S_dw): 3 matmuls/cell instead of 9.
    # The 0/1 selection matmuls are this pass's dominant cost — MXU-bound
    # at ~2.7 GF/cell the old way (profiled 2.05 ms/step at b16/513²).
    hs = []
    for dh, (rows, first) in enumerate(taps_rows):
        h = _bn_apply(rows, bn, relu, eps)
        # zero conv padding + garbage: global input row = 2*(j*bh+r)+first
        r = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0)
        gr = 2 * (r + j * bh) + first
        h = jnp.where((gr >= 0) & (gr < Hin), h, 0.0)
        hs.append(h)
    acc = jnp.zeros((bh, C, Wout), jnp.float32)
    for dw in range(3):
        hk = sum(hs[dh] * k[:, dh * 3 + dw:dh * 3 + dw + 1][None]
                 for dh in range(3))
        flat = hk.reshape(bh * C, hk.shape[2])
        tap = _mm(flat, sels[dw], y_ref.dtype)
        acc = acc + tap.reshape(bh, C, Wout)
    y_ref[0] = acc.astype(y_ref.dtype)
    m = _rows_in(bh, j, bh, 0, Hout)
    _accum(st_ref, j, _stats_tile(acc, m, C))


# ---------------------------------------------------------------------------
# f0-in-chain: the MobileNetV2 entry conv (3x3 / stride-2 / pad-1), consumed
# as its host-packed S2D 2x2-VALID rewrite (ops.conv.s2d_pack with
# channel_sublane=True -> (N, Hp, 12, Wp) NHCW), computed INSIDE the fused
# stem chain. Round-4 xplane profile of the stock entry: 0.85 ms XLA conv +
# two ~0.49 ms layout copies + 0.76 ms wgrad fusion per step at b16/513² —
# all four replaced by in-chain matmul passes with zero layout glue.
#
# Geometry: a0 output row R taps packed rows R+1, R+2 and, at output lane w,
# packed lanes w+1+dw (the conv2d_s2d_packed off=1 window for padding=1).
# hcat stacking: the four (dh, dw) taps concatenate 12-channel sublane
# blocks in (dh, dw)-major order, so the whole 2x2x12 contraction is ONE
# (32, 48) x (48, Wp) matmul per row; w0 param = transpose(w2.reshape(4, 12,
# 32), (2, 0, 1)).reshape(32, 48) of conv2d_s2d_packed's w2.
# ---------------------------------------------------------------------------


def _f0_hcat(v, bh):
    """v (bh+1, 12, Wp) f32 packed rows j*bh+1.. -> (bh, 48, Wp) tap stack.
    v1/v2 = lanes shifted left by 1/2; real packed lanes (Wr = W+3) cover
    every valid read (w+2 <= W+1 < Wr), and the circular wrap only lands on
    pad lanes, which the caller masks off the result."""
    Wp = v.shape[2]
    v1 = pltpu.roll(v, Wp - 1, axis=2)
    v2 = pltpu.roll(v, Wp - 2, axis=2)
    return jnp.concatenate(
        [v1[:bh], v2[:bh], v1[1:bh + 1], v2[1:bh + 1]], axis=1)


def _k_f0(v_ref, w_ref, y_ref, s_ref, *, bh, H, W):
    """2x2-VALID entry conv + bn0 moment sums. v (1, bh+1, 12, Wp) packed
    rows j*bh+1..; w (32, 48); out a0 block (1, bh, 32, Wp)."""
    j = pl.program_id(1)
    v = v_ref[0].astype(jnp.float32)
    hcat = _f0_hcat(v, bh)
    w0 = w_ref[...]
    rows = [_mm(w0, hcat[r], y_ref.dtype) for r in range(bh)]
    y = jnp.stack(rows, axis=0)                      # (bh, 32, Wp)
    y = _mask_lanes(y, W)                            # roll wrap on pad lanes
    y_ref[0] = y.astype(y_ref.dtype)
    m = _rows_in(bh, j, bh, 0, H)
    _accum(s_ref, j, _stats_tile(y, m, y.shape[1]))


def _f0_vspec(ci, wp, bh):
    """Element window (1, bh+1, ci, wp) over the RAW packed-row indexing
    (a0 row j*bh+r taps packed rows j*bh+r+1, +2 — no PAD offset)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 1), pl.Element(ci),
         pl.Element(wp)),
        lambda i, j: (i, j * bh + 1, 0, 0),
        memory_space=pltpu.VMEM)


def _run_f0(vp, w0, H, W, R, interpret, out_dtype, axis=None, nsh=1, bh=BH):
    """vp (N, Rv, 12, Wp) zero-padded channel-sublane packed input; w0
    (32, 48). Returns (a0p (N, R, 32, Wp) in the chain's padded layout —
    rows outside [PAD, PAD+nh*bh) are UNWRITTEN garbage, which every
    downstream halo read already masks — plus bn0 batch mean/var)."""
    n, _, ci, wp = vp.shape
    nh = pl.cdiv(H, bh)
    co = w0.shape[0]
    y, sums = pl.pallas_call(
        functools.partial(_k_f0, bh=bh, H=H, W=W),
        out_shape=(jax.ShapeDtypeStruct((n, R, co, wp), out_dtype),
                   jax.ShapeDtypeStruct((n, co, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=[_f0_vspec(ci, wp, bh), _const((co, 4 * ci))],
        out_specs=(_blk(co, wp, bh), _stats_out(co)),
        interpret=interpret,
        compiler_params=_CP,
    )(vp, w0)
    mean, var = _moments(sums, float(n * H * W) * nsh, axis)
    return y, mean, var


def _k_f0_wgrad(gy_ref, a_ref, v_ref, pn_ref, dw_ref, *, bh, H, W, eps):
    """dW0 accumulation: ga = bn0 train backward of gy0 (relu6' already
    applied by the dw1 backward pass), then dW0^T += hcat @ ga^T per row."""
    i, j = pl.program_id(0), pl.program_id(1)
    gy = gy_ref[0].astype(jnp.float32)               # (bh, 32, Wp)
    a = a_ref[0].astype(jnp.float32)
    ga = _bn_bwd_apply(gy, a, pn_ref[...].astype(jnp.float32), eps)
    ga = jnp.where(_rows_in(bh, j, bh, 0, H), ga, 0.0)
    ga = _mask_lanes(ga, W)
    hcat = _f0_hcat(v_ref[0].astype(jnp.float32), bh)
    mdt = gy_ref.dtype
    dims = (((1,), (1,)), ((), ()))                  # contract lanes
    tile = jnp.zeros((hcat.shape[1], ga.shape[1]), jnp.float32)
    for r in range(bh):
        tile += jax.lax.dot_general(hcat[r].astype(mdt), ga[r].astype(mdt),
                                    dims,
                                    preferred_element_type=jnp.float32)
    _accum_global(dw_ref, i, j, tile)


def _k_f0_xgrad(gy_ref, a_ref, pn_ref, w_ref, gv_ref, *, bh, H, W, eps):
    """gxpk rows j*bh..: gv[rx] = sum_t W2[t] @ (ga rows rx-1-dh, lanes
    shifted right by 1+dw) — the exact transpose of _k_f0's taps. Separate
    pallas_call so XLA dead-code-eliminates it when the input cotangent is
    unused (the real KD step takes grads only w.r.t. params)."""
    j = pl.program_id(1)
    gy = gy_ref[0].astype(jnp.float32)               # (bh+1, 32, Wp)
    a = a_ref[0].astype(jnp.float32)
    ga = _bn_bwd_apply(gy, a, pn_ref[...].astype(jnp.float32), eps)
    ga = jnp.where(_rows_in(bh + 1, j, bh, -2, H), ga, 0.0)
    ga = _mask_lanes(ga, W)
    Wp = ga.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wp), 2)
    g1 = jnp.where(lane >= 1, pltpu.roll(ga, 1, axis=2), 0.0)
    g2 = jnp.where(lane >= 2, pltpu.roll(ga, 2, axis=2), 0.0)
    w0g = w_ref[...]                                 # (12, 128)
    rows = []
    for r in range(bh):
        gcat = jnp.concatenate([g1[r + 1], g2[r + 1], g1[r], g2[r]], axis=0)
        rows.append(_mm(w0g, gcat, gv_ref.dtype))
    gv_ref[0] = jnp.stack(rows, axis=0).astype(gv_ref.dtype)


def _run_f0_bwd(gy, a0p, vp, pn0, w0g, H, W, eps, interpret, gdt, bh=BH):
    """Backward of _run_f0 given gy0/a0p from the dw1 backward pass.
    Returns (dW0^T (48, 32) f32, gxpk (N, nh_gv*bh, 12, Wp) — slice to the
    packed input extent)."""
    n, R, c0, wp = gy.shape
    ci = vp.shape[2]
    nh = pl.cdiv(H, bh)
    dw0t = pl.pallas_call(
        functools.partial(_k_f0_wgrad, bh=bh, H=H, W=W, eps=eps),
        out_shape=jax.ShapeDtypeStruct((4 * ci, c0), jnp.float32),
        grid=(n, nh),
        in_specs=[_blk(c0, wp, bh), _blk(c0, wp, bh), _f0_vspec(ci, wp, bh),
                  _const((c0, 6))],
        out_specs=pl.BlockSpec((4 * ci, c0), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(gy, a0p, vp, pn0)

    nh_gv = pl.cdiv(H + 3, bh)                       # cover the packed rows
    halo2 = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 1), pl.Element(c0),
         pl.Element(wp)),
        lambda i, j: (i, PAD + j * bh - 2, 0, 0),
        memory_space=pltpu.VMEM)
    gv = pl.pallas_call(
        functools.partial(_k_f0_xgrad, bh=bh, H=H, W=W, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, nh_gv * bh, ci, wp), gdt),
        grid=(n, nh_gv),
        in_specs=[halo2, halo2, _const((c0, 6)), _const((ci, 4 * c0))],
        out_specs=pl.BlockSpec((1, bh, ci, wp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(gy, a0p, pn0, w0g)
    return dw0t, gv


# ---------------------------------------------------------------------------
# forward pass drivers — all operate on the uniform padded layout
# (N, R, C, W) with valid data at rows [PAD, PAD+H).
# ---------------------------------------------------------------------------

def _bn_pack(mean, var, gamma, beta):
    return jnp.stack([mean, var, gamma, beta], axis=1).astype(jnp.float32)


def _moments(sums, count, axis=None):
    """Batch moments from per-image [sum, sumsq] tiles. `axis` (shard_map
    axis name) psums the partials so each shard sees GLOBAL moments — the
    SPMD equivalent of sync-BN; `count` must then be the global count."""
    s = sums[:, :, 0].sum(0)
    s2 = sums[:, :, 1].sum(0)
    if axis is not None:
        s, s2 = jax.lax.psum((s, s2), axis)
    mean = s / count
    var = s2 / count - mean * mean
    return mean, var


def _blk(c, w, bh=BH):
    """Standard blocked (1, bh, c, w) spec with the PAD block offset."""
    off = PAD // bh
    return pl.BlockSpec((1, bh, c, w), lambda i, j, off=off: (i, j + off, 0, 0),
                        memory_space=pltpu.VMEM)


def _halo(c, w, bh=BH, dil=1):
    """Element (1, bh+2*dil, c, w) halo spec starting at row j*bh-dil."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2 * dil), pl.Element(c),
         pl.Element(w)),
        lambda i, j: (i, PAD + j * bh - dil, 0, 0),
        memory_space=pltpu.VMEM)


def _const(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, j: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _stats_out(c):
    return pl.BlockSpec((1, c, 128), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _run_bn_dw(x, bn, k, H, W, relu, eps, interpret, out_dtype,
               axis=None, nsh=1, wseg=None, bh=BH, dil=1):
    """x (N,R,C,Wp) padded pre-BN; W = real lane extent; returns
    (y padded, mean, var of y)."""
    n, R, c, w = x.shape
    nh = pl.cdiv(H, bh)
    if _dma_enabled():
        kern = functools.partial(_k_bn_dw_dma, bh=bh, H=H, W=W, relu=relu,
                                 eps=eps, wseg=wseg, dil=dil)
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((2, bh + 2 * dil, c, w), x.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(_k_bn_dw, bh=bh, H=H, W=W, relu=relu,
                                 eps=eps, wseg=wseg, dil=dil)
        x_spec = _halo(c, w, bh, dil)
        scratch = []
    y, sums = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((n, R, c, w), out_dtype),
                   jax.ShapeDtypeStruct((n, c, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=[x_spec, _const((c, 4)), _const((c, 9))],
        out_specs=(_blk(c, w, bh), _stats_out(c)),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_CP,
    )(x, bn, k)
    mean, var = _moments(sums, float(n * H * W) * nsh, axis)
    return y, mean, var


def _run_bn_pw(x, bn, w2, H, W, relu, eps, interpret, out_dtype,
               axis=None, nsh=1, bh=BH):
    """x (N,R,Ci,Wp) padded; w2 (Co,Ci); W = real lane extent; returns
    (y padded, mean, var)."""
    n, R, ci, w = x.shape
    co = w2.shape[0]
    nh = pl.cdiv(H, bh)
    y, sums = pl.pallas_call(
        functools.partial(_k_bn_pw, bh=bh, H=H, W=W, relu=relu, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((n, R, co, w), out_dtype),
                   jax.ShapeDtypeStruct((n, co, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=[_blk(ci, w, bh), _const((ci, 4)), _const((co, ci))],
        out_specs=(_blk(co, w, bh), _stats_out(co)),
        interpret=interpret,
        compiler_params=_CP,
    )(x, bn, w2)
    mean, var = _moments(sums, float(n * H * W) * nsh, axis)
    return y, mean, var


def _run_bn_dw_s2(x, bn, k, Hin, Win, R2, eps, interpret, out_dtype,
                  axis=None, nsh=1, n_img=1, bh=BH, relu=True):
    """x (N,R,C,Wp) padded pre-BN; Win = real lane extent; stride-2 dw;
    returns (y (N,R2,C,Wout_p) padded, mean, var). Hout = (Hin+1)//2,
    Wout = (Win+1)//2 (pad-1) — pad lanes handled by the zero-extended
    selection matrices."""
    n, R, c, wp = x.shape
    hout = (Hin + 1) // 2
    wseg_in = Win // n_img
    wseg_out = (wseg_in + 1) // 2
    wout_real = wseg_out * n_img
    wout = _lanes(wout_real)
    win = wp
    nh = pl.cdiv(hout, bh)
    xp = x.reshape(n, R // 2, 2 * c, wp)             # free pair-view bitcast
    sels = [jnp.asarray(s)
            for s in _sel_matrices(wseg_in, wseg_out, wp, wout, n_img)]
    if _dma_enabled():
        kern = functools.partial(_k_bn_dw_s2_dma, bh=bh, Hin=Hin, Hout=hout,
                                 eps=eps, relu=relu)
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((2, bh + 1, 2 * c, win), x.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(_k_bn_dw_s2, bh=bh, Hin=Hin, Hout=hout,
                                 eps=eps, relu=relu)
        x_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 1), pl.Element(2 * c),
             pl.Element(win)),
            lambda i, j: (i, PAD // 2 + j * bh - 1, 0, 0),
            memory_space=pltpu.VMEM)
        scratch = []
    y, sums = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((n, R2, c, wout), out_dtype),
                   jax.ShapeDtypeStruct((n, c, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=[x_spec, _const((c, 4)), _const((c, 9)),
                  _const((win, wout)), _const((win, wout)),
                  _const((win, wout))],
        out_specs=(_blk(c, wout, bh), _stats_out(c)),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_CP,
    )(xp, bn, k, *sels)
    mean, var = _moments(sums, float(n * hout * wout_real) * nsh, axis)
    return y, mean, var


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------
#
# Convention: gy_k = dL/d(u_k) where u_k is BN_k's pre-clip output (the relu6
# mask is applied by the pass that PRODUCES gy_k). Each pass receives
# gy_{next} plus its per-channel totals (needed by the train-mode BN backward:
# g_a = gamma*inv * (gy - mean(gy) - xhat*mean(gy*xhat))), applies the conv
# transpose + weight grads, and emits gy_k + its totals for the next pass.
# dgamma = sum(gy*xhat), dbeta = sum(gy) come free from the same totals.


def _bn_bwd_apply(gy, a, p, eps):
    """p (C, 6): [mean, var, gamma, sum_g, sum_gx, inv_count]."""
    mu = p[:, 0:1][None]
    var = p[:, 1:2][None]
    g = p[:, 2:3][None]
    sg = p[:, 3:4][None]
    sgx = p[:, 4:5][None]
    im = p[:, 5:6][None]
    inv = jax.lax.rsqrt(var + eps)
    xh = (a - mu) * inv
    return g * inv * (gy - sg * im - xh * (sgx * im))


def _bn_u_xh(a, bn, eps):
    """Returns (u pre-clip, xhat) for bn (C,4)."""
    mu = bn[:, 0:1][None]
    var = bn[:, 1:2][None]
    g = bn[:, 2:3][None]
    b = bn[:, 3:4][None]
    inv = jax.lax.rsqrt(var + eps)
    xh = (a - mu) * inv
    return xh * g + b, xh


def _grad_sums_tile(gu, xh, C):
    s = jnp.sum(gu, axis=(0, 2))
    sx = jnp.sum(gu * xh, axis=(0, 2))
    col = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    return (jnp.where(col == 0, s[:, None], 0.0)
            + jnp.where(col == 1, sx[:, None], 0.0))


def _accum_global(ref, i, j, tile):
    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        ref[...] = tile

    @pl.when(jnp.logical_not(first))
    def _():
        ref[...] += tile


def _k_pw_bwd(gy_ref, an_ref, ak_ref, pn_ref, bnk_ref, wt_ref,
              gyk_ref, sums_ref, dw_ref, *, bh, H, W, relu_k, eps):
    """Backward over [bn_k(+relu_k) -> pw -> a_next] given gy_next.

    gy (1,bh,Co,W); a_next (1,bh,Co,W); a_k (1,bh,Ci,W); pn (Co,6) next-BN
    backward params/totals; bnk (Ci,4); wt = W^T (Ci,Co). All blocked reads
    — rows beyond H are producer-written zeros, never garbage.
    Outputs: gy_k (1,bh,Ci,W); sums (1,Ci,128) per-image accum;
    dw (Co,Ci) global accum.
    """
    i, j = pl.program_id(0), pl.program_id(1)
    gy = gy_ref[0].astype(jnp.float32)
    an = an_ref[0].astype(jnp.float32)
    ak = ak_ref[0].astype(jnp.float32)
    m = _rows_in(bh, j, bh, 0, H)
    ga = _bn_bwd_apply(gy, an, pn_ref[...].astype(jnp.float32), eps)
    ga = jnp.where(m, ga, 0.0)
    # pad lanes: the -sum/M terms of the BN backward are per-channel
    # constants, nonzero even where gy is zero; the dW dot contracts lanes
    ga = _mask_lanes(ga, W)

    bnk = bnk_ref[...].astype(jnp.float32)
    u, xh = _bn_u_xh(ak, bnk, eps)
    z = _act(u, relu_k)
    z = jnp.where(m, z, 0.0)
    xh = jnp.where(m, xh, 0.0)

    wt = wt_ref[...]                                # (Ci, Co)
    mdt = gyk_ref.dtype
    dims = (((1,), (1,)), ((), ()))                 # contract W
    dw_tile = jnp.zeros((wt.shape[1], wt.shape[0]), jnp.float32)
    gz_rows = []
    for r in range(bh):
        dw_tile += jax.lax.dot_general(ga[r].astype(mdt), z[r].astype(mdt),
                                       dims,
                                       preferred_element_type=jnp.float32)
        gz_rows.append(_mm(wt, ga[r], mdt))
    gz = jnp.stack(gz_rows, axis=0)                 # (bh, Ci, W)
    if relu_k:
        gu = gz * _act_grad(u, relu_k)
    else:
        gu = gz
    gu = jnp.where(m, gu, 0.0)
    gyk_ref[0] = gu.astype(gyk_ref.dtype)
    _accum(sums_ref, j, _grad_sums_tile(gu, xh, gu.shape[1]))
    _accum_global(dw_ref, i, j, dw_tile)


def _k_dw_bwd(gy_ref, an_ref, ak_ref, pn_ref, bnk_ref, k_ref,
              gyk_ref, sums_ref, dk_ref, *, bh, H, W, eps, wseg=None,
              relu_k=True, dil=1):
    """Backward over [bn_k(relu6) -> dw3x3 s1 -> a_next] given gy_next.

    gy/a_next halo blocks (1,bh+2,C,W) (transpose-conv needs g halos; the
    weight grad needs h halos); a_k halo (1,bh+2,C,W). Halo rows may be
    uninitialized — everything derived from them is where()-masked.
    Outputs gy_k (1,bh,C,W), sums, dk (C, 128) cols 0..8 global accum.
    """
    _dw_bwd_body(gy_ref[0], an_ref[0], ak_ref[0], pn_ref, bnk_ref, k_ref,
                 gyk_ref, sums_ref, dk_ref, bh=bh, H=H, Wreal=W, eps=eps,
                 wseg=wseg, relu_k=relu_k, dil=dil)


def _k_dw_bwd_dma(gy_hbm, an_hbm, ak_hbm, pn_ref, bnk_ref, k_ref,
                  gyk_ref, sums_ref, dk_ref, bufg, bufa, bufk,
                  semg, sema, semk, *, bh, H, W, eps, relu_k=True, dil=1):
    j = pl.program_id(1)
    start = lambda jj: PAD + jj * bh - dil
    gy, an, ak = _halo_fetch([gy_hbm, an_hbm, ak_hbm], [start] * 3,
                             [bh + 2 * dil] * 3, [bufg, bufa, bufk],
                             [semg, sema, semk], j, pl.num_programs(1))
    _dw_bwd_body(gy, an, ak, pn_ref, bnk_ref, k_ref,
                 gyk_ref, sums_ref, dk_ref, bh=bh, H=H, Wreal=W, eps=eps,
                 relu_k=relu_k, dil=dil)


def _dw_bwd_body(gy, an, ak, pn_ref, bnk_ref, k_ref,
                 gyk_ref, sums_ref, dk_ref, *, bh, H, Wreal, eps,
                 wseg=None, relu_k=True, dil=1):
    i, j = pl.program_id(0), pl.program_id(1)
    gy = gy.astype(jnp.float32)                     # (bh+2*dil, C, Wp)
    an = an.astype(jnp.float32)
    ak = ak.astype(jnp.float32)
    C, W = gy.shape[1], gy.shape[2]                 # W = PADDED lane extent
    pn = pn_ref[...].astype(jnp.float32)
    mh = _rows_in(bh + 2 * dil, j, bh, -dil, H)
    ga = _bn_bwd_apply(gy, an, pn, eps)             # (bh+2*dil, C, Wp)
    ga = jnp.where(mh, ga, 0.0)
    ga = _mask_lanes(ga, Wreal)  # BN-backward constants at pad lanes; the
    #                              dk sums and gh tap rolls both touch lanes

    bnk = bnk_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)              # (C, 9)
    u, xh = _bn_u_xh(ak, bnk, eps)
    h = jnp.where(mh, _act(u, relu_k), 0.0)
    h = _mask_lanes(h, Wreal)  # dk taps roll pad-lane garbage into lane W-1

    # transpose conv: gh[h,w] = sum K[dh,dw] * ga[h-(dh-1)d, w-(dw-1)d]
    # == dw-conv of ga with the spatially flipped kernel
    gh = _dw_taps(ga, k, bh, W, flip=True, wseg=wseg, dil=dil)  # (bh, C, W)

    # weight grad: dk[c, t] = sum taps(h)[t] * ga_center. The lane shifts
    # are hoisted to the FULL halo block (2 rolls + 2 masks instead of 6+6;
    # these passes are VPU-bound — see _dw_taps).
    ga_c = ga[dil:dil + bh]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    if wseg is not None:
        lane = lane % wseg
        edge = wseg
    else:
        edge = W
    h_l = jnp.where(lane >= dil, pltpu.roll(h, dil, axis=2), 0.0)
    h_r = jnp.where(lane < edge - dil, pltpu.roll(h, W - dil, axis=2), 0.0)
    shifted = (h_l, h, h_r)
    cols = []
    for dh in range(3):
        for dw in range(3):
            sh = shifted[dw][dh * dil:dh * dil + bh]
            cols.append(jnp.sum(sh * ga_c, axis=(0, 2)))  # (C,)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    dk_tile = jnp.zeros((C, 128), jnp.float32)
    for t in range(9):
        dk_tile += jnp.where(col == t, cols[t][:, None], 0.0)

    m = _rows_in(bh, j, bh, 0, H)
    u_c = u[dil:dil + bh]
    xh_c = jnp.where(m, xh[dil:dil + bh], 0.0)
    gu = gh * (_act_grad(u_c, relu_k) if relu_k else 1.0)
    # zero padded rows: gh taps reach real ga rows from beyond H, and the
    # garbage would pollute the per-channel sums; pad lanes: roll spill +
    # garbage relu mask
    gu = jnp.where(m, gu, 0.0)
    gu = _mask_lanes(gu, Wreal)
    gyk_ref[0] = gu.astype(gyk_ref.dtype)
    _accum(sums_ref, j, _grad_sums_tile(gu, xh_c, C))
    _accum_global(dk_ref, i, j, dk_tile)


def _k_dw_s2_bwd(gy_ref, an_ref, akp_ref, pn_ref, bnk_ref, k_ref,
                 st0_ref, st1_ref, st2_ref,
                 gyk_ref, sums_ref, dk_ref, *, bh, Hin, Hout, eps,
                 relu_k=True):
    """Backward over [bn_k(relu6) -> dw3x3 STRIDE-2 -> a_next].

    Grid over the low-res g rows m in [j*bh, j*bh+bh). Blocks:
      gy / a_next: (1, bh+1, C, Wout) Element rows starting j*bh (one halo
        row at the bottom for the dh=0 contribution of g[m+1]);
      a_k: PAIR-VIEW halo (1, bh+1, 2C, Win) Element pairs starting
        j*bh-1 global (same window as the fwd kernel; the pair dim is
        folded into sublanes — see _k_bn_dw_s2).
    sf* = S_dw (Win, Wout) fwd selection; st* = S_dw^T (Wout, Win).
    gy_k written in PAIR VIEW (1, bh, 2C, Win): pair m holds rows
    (2m, 2m+1) — even from g[m] (dh=1 weights), odd from g[m] (dh=2) +
    g[m+1] (dh=0). No overlapping writes.
    """
    _dw_s2_bwd_body(gy_ref[0], an_ref[0], akp_ref[0], pn_ref, bnk_ref,
                    k_ref, st0_ref, st1_ref, st2_ref,
                    gyk_ref, sums_ref, dk_ref,
                    bh=bh, Hin=Hin, Hout=Hout, eps=eps, relu_k=relu_k)


def _k_dw_s2_bwd_dma(gy_hbm, an_hbm, akp_hbm, pn_ref, bnk_ref, k_ref,
                     st0_ref, st1_ref, st2_ref,
                     gyk_ref, sums_ref, dk_ref, bufg, bufa, bufk,
                     semg, sema, semk, *, bh, Hin, Hout, eps, relu_k=True):
    j = pl.program_id(1)
    g_start = lambda jj: PAD + jj * bh
    p_start = lambda jj: PAD // 2 + jj * bh - 1
    gy, an, akp = _halo_fetch(
        [gy_hbm, an_hbm, akp_hbm], [g_start, g_start, p_start],
        [bh + 1, bh + 1, bh + 1], [bufg, bufa, bufk],
        [semg, sema, semk], j, pl.num_programs(1))
    _dw_s2_bwd_body(gy, an, akp, pn_ref, bnk_ref, k_ref,
                    st0_ref, st1_ref, st2_ref,
                    gyk_ref, sums_ref, dk_ref,
                    bh=bh, Hin=Hin, Hout=Hout, eps=eps, relu_k=relu_k)


def _dw_s2_bwd_body(gy, an, akp, pn_ref, bnk_ref, k_ref,
                    st0_ref, st1_ref, st2_ref,
                    gyk_ref, sums_ref, dk_ref, *, bh, Hin, Hout, eps,
                    relu_k=True):
    i, j = pl.program_id(0), pl.program_id(1)
    gy = gy.astype(jnp.float32)                     # (bh+1, C, Wout)
    an = an.astype(jnp.float32)
    akp = akp.astype(jnp.float32)                   # (bh+1, 2C, Win)
    C = gy.shape[1]
    Win = akp.shape[2]
    pn = pn_ref[...].astype(jnp.float32)
    bnk = bnk_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)              # (C, 9)

    mg = _rows_in(bh + 1, j, bh, 0, Hout)
    ga = _bn_bwd_apply(gy, an, pn, eps)             # (bh+1, C, Wout)
    ga = jnp.where(mg, ga, 0.0)

    sts = [st0_ref[...], st1_ref[...], st2_ref[...]]

    mdt = gyk_ref.dtype

    # ONE lane transform per dw over all bh+1 rows (T_dw = ga @ S_dw^T),
    # then even/odd are elementwise row-slice combinations and the weight
    # grad reuses the same T_dw tensors — 3 matmuls/cell total. The old
    # form (per-slice transforms + 9 activation-side transforms for dk) was
    # 15 matmuls ≈ 4.6 GF/cell, MXU-bound at 3.7 ms/step (b16/513² xplane).
    ga_flat = ga.reshape((bh + 1) * C, ga.shape[2])
    T = [_mm(ga_flat, sts[dw], mdt).reshape(bh + 1, C, Win)
         for dw in range(3)]

    even = jnp.zeros((bh, C, Win), jnp.float32)
    odd = jnp.zeros((bh, C, Win), jnp.float32)
    for dw in range(3):
        even = even + T[dw][0:bh] * k[:, 3 + dw:4 + dw][None]
        odd = (odd + T[dw][0:bh] * k[:, 6 + dw:7 + dw][None]
               + T[dw][1:bh + 1] * k[:, dw:dw + 1][None])

    # relu mask + xhat at the high-res output rows: pairs m = j*bh + p - 1
    # live at akp local p in [1, bh+1)
    a_even = akp[1:bh + 1, 0:C]
    a_odd = akp[1:bh + 1, C:2 * C]
    u_e, xh_e = _bn_u_xh(a_even, bnk, eps)
    u_o, xh_o = _bn_u_xh(a_odd, bnk, eps)
    re = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0) + j * bh
    m_e = (2 * re) < Hin
    m_o = (2 * re + 1) < Hin
    gu_e = jnp.where(m_e, even * (_act_grad(u_e, relu_k)
                                  if relu_k else 1.0), 0.0)
    gu_o = jnp.where(m_o, odd * (_act_grad(u_o, relu_k)
                                 if relu_k else 1.0), 0.0)
    xh_e = jnp.where(m_e, xh_e, 0.0)
    xh_o = jnp.where(m_o, xh_o, 0.0)
    gyk_ref[0, :, 0:C] = gu_e.astype(gyk_ref.dtype)
    gyk_ref[0, :, C:2 * C] = gu_o.astype(gyk_ref.dtype)
    _accum(sums_ref, j,
           _grad_sums_tile(gu_e, xh_e, C) + _grad_sums_tile(gu_o, xh_o, C))

    # weight grad dk[c, dh*3+dw] = sum_{m,w'} h[2m+dh-1][2w'+dw-1] * ga[m,w']
    #                            = sum_{m,w} h_dh[m,c,w] * T_dw[m,c,w]
    # — reuses the already-computed T_dw lane transforms: zero extra matmuls
    col = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    dk_tile = jnp.zeros((C, 128), jnp.float32)
    for dh in range(3):
        if dh == 0:
            rows, first = akp[0:bh, C:2 * C], -1     # rows 2m-1
        else:
            lo = (dh - 1) * C
            rows, first = akp[1:bh + 1, lo:lo + C], dh - 1
        uu, _ = _bn_u_xh(rows, bnk, eps)
        rr = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0)
        gr = 2 * (rr + j * bh) + first
        hh = jnp.where((gr >= 0) & (gr < Hin), _act(uu, relu_k), 0.0)
        for dw in range(3):
            v = jnp.sum(hh * T[dw][0:bh].astype(jnp.float32), axis=(0, 2))
            dk_tile += jnp.where(col == dh * 3 + dw, v[:, None], 0.0)
    _accum_global(dk_ref, i, j, dk_tile)


# ---------------------------------------------------------------------------
# backward pass drivers — padded layout in and out, grads in `gdt` dtype
# ---------------------------------------------------------------------------

def _bnbwd_pack(mean, var, gamma, sum_g, sum_gx, count):
    inv = jnp.full_like(mean, 1.0 / count)
    return jnp.stack([mean, var, gamma, sum_g, sum_gx, inv],
                     axis=1).astype(jnp.float32)


def _bnbwd_identity(c):
    """Identity 'next-BN backward': g_a passes through unchanged."""
    z = jnp.zeros((c,), jnp.float32)
    return jnp.stack([z, 1.0 - 0.0 * z, 1.0 + 0.0 * z, z, z, z], axis=1)


def _run_pw_bwd(gy, a_next, a_k, pn, bnk, w2, H, W, relu_k, eps, interpret,
                gdt, bh=BH):
    """All arrays padded (N,R,·,Wp); W = real lane extent. Returns
    (gy_k padded, sums (Ci,2), dW (Co,Ci))."""
    n, R, co, w = gy.shape
    ci = a_k.shape[2]
    nh = pl.cdiv(H, bh)
    wt = jnp.transpose(w2, (1, 0))                  # (Ci, Co)
    gyk, sums, dw = pl.pallas_call(
        functools.partial(_k_pw_bwd, bh=bh, H=H, W=W, relu_k=relu_k,
                          eps=eps),
        out_shape=(jax.ShapeDtypeStruct((n, R, ci, w), gdt),
                   jax.ShapeDtypeStruct((n, ci, 128), jnp.float32),
                   jax.ShapeDtypeStruct((co, ci), jnp.float32)),
        grid=(n, nh),
        in_specs=[_blk(co, w, bh), _blk(co, w, bh), _blk(ci, w, bh),
                  _const((co, 6)), _const((ci, 4)), _const((ci, co))],
        out_specs=(_blk(ci, w, bh), _stats_out(ci),
                   pl.BlockSpec((co, ci), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
        compiler_params=_CP,
    )(gy, a_next, a_k, pn, bnk, wt)
    s = sums.sum(0)[:, :2]
    return gyk, s, dw


def _run_dw_bwd(gy, a_next, a_k, pn, bnk, k, H, W, eps, interpret, gdt,
                wseg=None, bh=BH, relu_k=True, dil=1):
    """Stride-1 dw backward on padded arrays; W = real lane extent.
    Returns (gy_k padded, sums (C,2), dk (C,9))."""
    n, R, c, w = gy.shape
    nh = pl.cdiv(H, bh)
    if _dma_enabled():
        kern = functools.partial(_k_dw_bwd_dma, bh=bh, H=H, W=W, eps=eps,
                                 relu_k=relu_k, dil=dil)
        halo_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
        buf = lambda: pltpu.VMEM((2, bh + 2 * dil, c, w), gy.dtype)
        scratch = [buf(), buf(), buf()] + [pltpu.SemaphoreType.DMA((2,))] * 3
    else:
        kern = functools.partial(_k_dw_bwd, bh=bh, H=H, W=W, eps=eps,
                                 wseg=wseg, relu_k=relu_k, dil=dil)
        halo_specs = [_halo(c, w, bh, dil)] * 3
        scratch = []
    gyk, sums, dk = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((n, R, c, w), gdt),
                   jax.ShapeDtypeStruct((n, c, 128), jnp.float32),
                   jax.ShapeDtypeStruct((c, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=halo_specs + [
            _const((c, 6)), _const((c, 4)), _const((c, 9))],
        out_specs=(_blk(c, w, bh), _stats_out(c),
                   pl.BlockSpec((c, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_CP,
    )(gy, a_next, a_k, pn, bnk, k)
    return gyk, sums.sum(0)[:, :2], dk[:, :9]


def _run_dw_s2_bwd(gy, a_next, a_k, pn, bnk, k, Hin, Win, eps, interpret,
                   gdt, n_img=1, bh=BH, relu_k=True):
    """Stride-2 dw backward. gy/a_next (N,R2,C,Wout_p) padded;
    a_k (N,R,C,Wp) padded; Win = real input lane extent. Returns
    (gy_k (N,R,C,Wp) padded in pair-block writes, sums (C,2), dk (C,9))."""
    n, R2, c, wout = gy.shape
    R = a_k.shape[1]
    win = a_k.shape[3]
    wseg_in = Win // n_img
    wseg_out = (wseg_in + 1) // 2
    wout_real = wseg_out * n_img
    hout = (Hin + 1) // 2
    nh = pl.cdiv(hout, bh)
    akp = a_k.reshape(n, R // 2, 2 * c, win)         # free pair-view bitcast
    st = [jnp.asarray(np.ascontiguousarray(s.T))
          for s in _sel_matrices(wseg_in, wseg_out, win, wout, n_img)]
    if _dma_enabled():
        kern = functools.partial(_k_dw_s2_bwd_dma, bh=bh, Hin=Hin, Hout=hout,
                                 eps=eps, relu_k=relu_k)
        win_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
        scratch = [pltpu.VMEM((2, bh + 1, c, wout), gy.dtype),
                   pltpu.VMEM((2, bh + 1, c, wout), a_next.dtype),
                   pltpu.VMEM((2, bh + 1, 2 * c, win), a_k.dtype),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(_k_dw_s2_bwd, bh=bh, Hin=Hin, Hout=hout,
                                 eps=eps, relu_k=relu_k)
        halo_g = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 1), pl.Element(c),
             pl.Element(wout)),
            lambda i, j: (i, PAD + j * bh, 0, 0),
            memory_space=pltpu.VMEM)
        pair_halo = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 1), pl.Element(2 * c),
             pl.Element(win)),
            lambda i, j: (i, PAD // 2 + j * bh - 1, 0, 0),
            memory_space=pltpu.VMEM)
        win_specs = [halo_g, halo_g, pair_halo]
        scratch = []
    gykp, sums, dk = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((n, R // 2, 2 * c, win), gdt),
                   jax.ShapeDtypeStruct((n, c, 128), jnp.float32),
                   jax.ShapeDtypeStruct((c, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=win_specs + [
            _const((c, 6)), _const((c, 4)), _const((c, 9)),
            _const((wout, win)), _const((wout, win)), _const((wout, win)),
        ],
        out_specs=(
            pl.BlockSpec((1, bh, 2 * c, win),
                         lambda i, j, off=PAD // (2 * bh): (i, j + off, 0, 0),
                         memory_space=pltpu.VMEM),
            _stats_out(c),
            pl.BlockSpec((c, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_CP,
    )(gy, a_next, akp, pn, bnk, k, *st)
    gyk = gykp.reshape(n, R, c, win)                 # free bitcast back
    return gyk, sums.sum(0)[:, :2], dk[:, :9]


# ---------------------------------------------------------------------------
# public entry: fused f1+f2 with custom VJP
# ---------------------------------------------------------------------------

def _stem_fwd(a0, p, eps, interpret, axis=None, nsh=1, nw_out=False):
    """a0: (N, H, C, W) channel-sublane, unpadded (LOCAL shard under
    shard_map — `axis`/`nsh` then make every BN moment global, sync-BN
    style). Returns (out, stats, padded residual activations); out is NHWC,
    or with nw_out=True the IR-chain entry layout (1, _geom(H2)[3], C, NWp)
    (irchain._nhwc_to_nw's output, emitted directly — the NHWC round trip
    between the two fused chains lane-pads C=24 to 128 and cost ~1.3 ms of
    pure layout copies per step, VERDICT r3 item 2)."""
    f0_in = "w0" in p                # a0 is the NHCW-packed S2D input
    if f0_in:
        n, Hp, _, Wr = a0.shape
        H, W = Hp - 3, Wr - 3
    else:
        n, H, c0, W = a0.shape
    dt = a0.dtype
    nh, H2, nh2, R, R2 = _geom(H)
    wp = _lanes(W)
    W2 = (W + 1) // 2
    if f0_in:
        Rv = nh * BH + 2                 # last f0 window reads packed row
        assert wp >= Wr and Rv >= Hp, (wp, Wr, Rv, Hp)  # nh*BH + 1
        vp = jnp.pad(a0, ((0, 0), (0, Rv - Hp), (0, 0), (0, wp - Wr)))
        a0p, m0, v0 = _run_f0(vp, p["w0"], H, W, R, interpret, dt, axis, nsh)
    else:
        vp = None
        a0p = jnp.pad(a0, ((0, 0), (PAD, R - PAD - H), (0, 0), (0, wp - W)))
        # bn0 batch moments in XLA — fuses with the producing conv epilogue
        a0f = a0.astype(jnp.float32)
        s0m = a0f.sum(axis=(0, 1, 3))
        s0s2 = (a0f * a0f).sum(axis=(0, 1, 3))
        if axis is not None:
            s0m, s0s2 = jax.lax.psum((s0m, s0s2), axis)
        cnt0 = float(n * H * W) * nsh
        m0 = s0m / cnt0
        v0 = s0s2 / cnt0 - m0 * m0
    a1, m1, v1 = _run_bn_dw(a0p, _bn_pack(m0, v0, p["g0"], p["b0"]),
                            p["k1"], H, W, True, eps, interpret, dt,
                            axis, nsh)
    a2, m2, v2 = _run_bn_pw(a1, _bn_pack(m1, v1, p["g1"], p["b1"]),
                            p["w1"], H, W, True, eps, interpret, dt,
                            axis, nsh)
    a3, m3, v3 = _run_bn_pw(a2, _bn_pack(m2, v2, p["g2"], p["b2"]),
                            p["w2"], H, W, False, eps, interpret, dt,
                            axis, nsh)
    a4, m4, v4 = _run_bn_dw_s2(a3, _bn_pack(m3, v3, p["g3"], p["b3"]),
                               p["k2"], H, W, R2, eps, interpret, dt,
                               axis, nsh)
    a5, m5, v5 = _run_bn_pw(a4, _bn_pack(m4, v4, p["g4"], p["b4"]),
                            p["w3"], H2, W2, True, eps, interpret, dt,
                            axis, nsh)
    # final bn5 + layout exit in XLA (small half-res C=24 tensor)
    a5v = a5[:, PAD:PAD + H2, :, :W2]
    inv5 = jax.lax.rsqrt(v5 + eps)
    z2 = ((a5v.astype(jnp.float32) - m5[None, None, :, None])
          * (inv5 * p["g5"])[None, None, :, None]
          + p["b5"][None, None, :, None])
    if nw_out:
        # (N, H2, C, W2) -> padded (1, R_ir, C, N*W2) — one fused
        # transpose+reshape+pad, no lane-padded NHWC intermediate
        c5 = z2.shape[2]
        nw = n * W2
        z_nw = jnp.transpose(z2.astype(dt), (1, 2, 0, 3)).reshape(
            H2, c5, nw)[None]
        R_ir = _geom(H2)[3]
        out = jnp.pad(z_nw, ((0, 0), (PAD, R_ir - PAD - H2), (0, 0),
                             (0, _lanes(nw) - nw)))
    else:
        out = jnp.transpose(z2.astype(dt), (0, 1, 3, 2))  # NHCW -> NHWC
    stats = ((m0, v0), (m1, v1), (m2, v2), (m3, v3), (m4, v4), (m5, v5))
    acts = (a0p, a1, a2, a3, a4, a5, vp)
    return out, stats, acts


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_stem_f1f2(a0, params, eps: float = 1e-5,
                    interpret: bool = False):
    """MobileNetV2 features[1..2] (IR t=1 + IR t=6 s2), training mode, fused.

    a0: conv-stem output PRE-BN in channel-sublane layout (N, H, 32, W) —
    emit it directly from the stem conv via dimension_numbers
    ("NHWC", "HWIO", "NHCW"). params dict:
      k1 (32,9) dw kernel [dh*3+dw]; w1 (16,32), w2 (96,16), w3 (24,96)
      pointwise [Co,Ci]; k2 (96,9) stride-2 dw; g*/b* the six BN affine
      pairs (bn0=stem bn .. bn5=f2.pw_bn).
    f0-in-chain mode (KDCC_PALLAS_F0): params additionally hold w0 (32, 48)
    — the hcat-packed 2x2-VALID rewrite of the 3x3/s2/pad1 entry conv — and
    a0 is then the HOST-PACKED channel-sublane S2D input (N, H+3, 12, W+3)
    from ops.conv.s2d_pack(channel_sublane=True); the entry conv runs as an
    extra Pallas pass (fwd + wgrad/input-grad), with zero XLA layout glue.
    Returns (f2 output (N, H', W', 24) NHWC, tuple of 6 (mean, var)).
    """
    out, stats, _ = _stem_fwd(a0, params, eps, interpret)
    return out, stats


def _stem_fwd_rule(a0, p, eps, interpret):
    out, stats, acts = _stem_fwd(a0, p, eps, interpret)
    return (out, stats), (p, stats, acts, a0.shape)


def _stem_bwd_impl(p, stats, acts, a0_shape, gz, eps, interpret,
                   axis=None, nsh=1):
    """Backward body over LOCAL shards. Under shard_map (`axis` set) every
    per-channel BN sum and weight grad is psum'd — the BN train-mode
    backward couples all images of the (global) batch, so the s* totals must
    be global before they feed the next link's _bn_bwd_apply.

    gz: output cotangent in NHCW (N, H2, C, W2), any float dtype — the
    custom_vjp rules adapt from NHWC (transpose) or the IR-chain NW layout
    (slice+reshape+transpose) before calling this."""
    g_psum = ((lambda v: jax.lax.psum(v, axis)) if axis is not None
              else (lambda v: v))
    a0p, a1, a2, a3, a4, a5, vp = acts
    dt = a0p.dtype
    (m0, v0), (m1, v1), (m2, v2), (m3, v3), (m4, v4), (m5, v5) = stats
    f0_in = "w0" in p                # a0_shape is then the packed-input shape
    n = a0_shape[0]
    if f0_in:
        H, W = a0_shape[1] - 3, a0_shape[3] - 3
    else:
        H, W = a0_shape[1], a0_shape[3]
    _, H2, _, _, R2 = _geom(H)
    W2 = gz.shape[3]

    wp = _lanes(W)
    wp2 = _lanes(W2)
    # bn5 backward in XLA (small tensor, needs global sums first)
    gz = gz.astype(jnp.float32)
    a5v = a5[:, PAD:PAD + H2, :, :W2].astype(jnp.float32)
    inv5 = jax.lax.rsqrt(v5 + eps)
    xh5 = (a5v - m5[None, None, :, None]) * inv5[None, None, :, None]
    M5 = float(n * H2 * W2) * nsh
    sg5 = g_psum(gz.sum(axis=(0, 1, 3)))
    sgx5 = g_psum((gz * xh5).sum(axis=(0, 1, 3)))
    ga5 = (p["g5"] * inv5)[None, None, :, None] * (
        gz - (sg5 / M5)[None, None, :, None]
        - xh5 * (sgx5 / M5)[None, None, :, None])
    ga5p = jnp.pad(ga5.astype(dt),
                   ((0, 0), (PAD, R2 - PAD - H2), (0, 0), (0, wp2 - W2)))

    # pw3 link (bn4 relu6 -> pw3): first pass takes g_a directly
    pn_id = _bnbwd_identity(ga5.shape[2])
    bn4 = _bn_pack(m4, v4, p["g4"], p["b4"])
    gy4, s4, dW3 = _run_pw_bwd(ga5p, a5, a4, pn_id, bn4, p["w3"],
                               H2, W2, True, eps, interpret, dt)
    s4 = g_psum(s4)

    # dw2 stride-2 link (bn3 relu6 -> dw s2)
    pn4 = _bnbwd_pack(m4, v4, p["g4"], s4[:, 0], s4[:, 1], M5)
    bn3 = _bn_pack(m3, v3, p["g3"], p["b3"])
    gy3, s3, dk2 = _run_dw_s2_bwd(gy4, a4, a3, pn4, bn3, p["k2"],
                                  H, W, eps, interpret, dt)
    s3 = g_psum(s3)

    M = float(n * H * W) * nsh
    # pw2 link (bn2 -> pw2)
    pn3 = _bnbwd_pack(m3, v3, p["g3"], s3[:, 0], s3[:, 1], M)
    bn2 = _bn_pack(m2, v2, p["g2"], p["b2"])
    gy2, s2, dW2 = _run_pw_bwd(gy3, a3, a2, pn3, bn2, p["w2"],
                               H, W, False, eps, interpret, dt)
    s2 = g_psum(s2)

    # pw1 link (bn1 relu6 -> pw1)
    pn2 = _bnbwd_pack(m2, v2, p["g2"], s2[:, 0], s2[:, 1], M)
    bn1 = _bn_pack(m1, v1, p["g1"], p["b1"])
    gy1, s1, dW1 = _run_pw_bwd(gy2, a2, a1, pn2, bn1, p["w1"],
                               H, W, True, eps, interpret, dt)
    s1 = g_psum(s1)

    # dw1 link (bn0 relu6 -> dw1)
    pn1 = _bnbwd_pack(m1, v1, p["g1"], s1[:, 0], s1[:, 1], M)
    bn0 = _bn_pack(m0, v0, p["g0"], p["b0"])
    gy0, s0, dk1 = _run_dw_bwd(gy1, a1, a0p, pn1, bn0, p["k1"],
                               H, W, eps, interpret, dt)
    s0 = g_psum(s0)

    if f0_in:
        # bn0 backward + the entry-conv wgrad/input-grad inside Pallas —
        # ga0 never materializes, and dW0 needs no XLA layout copies
        pn0 = _bnbwd_pack(m0, v0, p["g0"], s0[:, 0], s0[:, 1], M)
        c0 = p["w0"].shape[0]
        w0g = jnp.transpose(p["w0"].reshape(c0, 4, 12),
                            (2, 1, 0)).reshape(12, 4 * c0)
        dW0t, gv = _run_f0_bwd(gy0, a0p, vp, pn0, w0g, H, W, eps,
                               interpret, dt)
        if axis is not None:
            dW0t = jax.lax.psum(dW0t, axis)
        da0 = gv[:, :a0_shape[1], :, :a0_shape[3]].astype(dt)
        dW0 = jnp.transpose(dW0t)
    else:
        # bn0 backward in XLA on the unpadded slice
        gy0v = gy0[:, PAD:PAD + H, :, :W].astype(jnp.float32)
        a0v = a0p[:, PAD:PAD + H, :, :W].astype(jnp.float32)
        inv0 = jax.lax.rsqrt(v0 + eps)
        xh0 = (a0v - m0[None, None, :, None]) * inv0[None, None, :, None]
        ga0 = (p["g0"] * inv0)[None, None, :, None] * (
            gy0v - (s0[:, 0] / M)[None, None, :, None]
            - xh0 * (s0[:, 1] / M)[None, None, :, None])
        da0 = ga0.astype(dt)

    if axis is not None:
        dW1, dW2, dW3, dk1, dk2 = jax.lax.psum((dW1, dW2, dW3, dk1, dk2),
                                               axis)

    dp = {
        "k1": dk1.astype(p["k1"].dtype), "k2": dk2.astype(p["k2"].dtype),
        "w1": dW1.astype(p["w1"].dtype), "w2": dW2.astype(p["w2"].dtype),
        "w3": dW3.astype(p["w3"].dtype),
        "g0": s0[:, 1].astype(p["g0"].dtype),
        "b0": s0[:, 0].astype(p["b0"].dtype),
        "g1": s1[:, 1].astype(p["g1"].dtype),
        "b1": s1[:, 0].astype(p["b1"].dtype),
        "g2": s2[:, 1].astype(p["g2"].dtype),
        "b2": s2[:, 0].astype(p["b2"].dtype),
        "g3": s3[:, 1].astype(p["g3"].dtype),
        "b3": s3[:, 0].astype(p["b3"].dtype),
        "g4": s4[:, 1].astype(p["g4"].dtype),
        "b4": s4[:, 0].astype(p["b4"].dtype),
        "g5": sgx5.astype(p["g5"].dtype),
        "b5": sg5.astype(p["b5"].dtype),
    }
    if f0_in:
        dp["w0"] = dW0.astype(p["w0"].dtype)
    return da0, dp


def _stem_bwd_rule(eps, interpret, res, cts):
    p, stats, acts, a0_shape = res
    g_out = cts[0]                                   # stats cotangents unused
    gz = jnp.transpose(g_out, (0, 1, 3, 2))          # NHWC -> NHCW
    return _stem_bwd_impl(p, stats, acts, a0_shape, gz, eps, interpret)


fused_stem_f1f2.defvjp(_stem_fwd_rule, _stem_bwd_rule)


def _nw_gz(g_nw, n, H2, W2):
    """IR-entry-layout cotangent (1, R_ir, C, NWp) -> NHCW (N, H2, C, W2).
    Pad rows/lanes may hold garbage from the IR backward — sliced off here."""
    c = g_nw.shape[2]
    v = g_nw[0, PAD:PAD + H2, :, :n * W2].reshape(H2, c, n, W2)
    return jnp.transpose(v, (2, 0, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_stem_f1f2_nw(a0, params, eps: float = 1e-5,
                       interpret: bool = False):
    """fused_stem_f1f2, but the f2 output is emitted in the IR chain's
    batch-folded entry layout (1, _geom(H2)[3], 24, _lanes(N*W2)) — feed it
    to irchain.fused_ir_chain_nw. Skips the lane-padded NHWC round trip
    between the two fused chains in BOTH directions (VERDICT r3 item 2)."""
    out, stats, _ = _stem_fwd(a0, params, eps, interpret, nw_out=True)
    return out, stats


def _stem_nw_fwd_rule(a0, p, eps, interpret):
    out, stats, acts = _stem_fwd(a0, p, eps, interpret, nw_out=True)
    return (out, stats), (p, stats, acts, a0.shape)


def _stem_hw(p, a0_shape):
    """(H, W) of the f0 conv OUTPUT — a0_shape is the packed-input shape in
    f0-in-chain mode (ops.conv.s2d_pack extent = H + 3)."""
    if "w0" in p:
        return a0_shape[1] - 3, a0_shape[3] - 3
    return a0_shape[1], a0_shape[3]


def _stem_nw_bwd_rule(eps, interpret, res, cts):
    p, stats, acts, a0_shape = res
    g_nw = cts[0]
    n = a0_shape[0]
    H, W = _stem_hw(p, a0_shape)
    H2, W2 = (H + 1) // 2, (W + 1) // 2
    gz = _nw_gz(g_nw, n, H2, W2)
    return _stem_bwd_impl(p, stats, acts, a0_shape, gz, eps, interpret)


fused_stem_f1f2_nw.defvjp(_stem_nw_fwd_rule, _stem_nw_bwd_rule)


# ---------------------------------------------------------------------------
# SPMD variant: the same passes wrapped in shard_map over a 1-D data mesh
# (pallas_call has no GSPMD partitioning rule). Forward psums the per-pass
# batch moments — sync-BN over the global batch, numerically identical to
# the single-device kernel on the unsharded batch; backward psums the BN
# totals and weight grads (SURVEY.md §2.5 "sync-BN across mesh via pmean
# of batch moments").
# ---------------------------------------------------------------------------


def _shmap(fn, mesh, in_specs, out_specs):
    from jax import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_stem_f1f2_sharded(a0, params, mesh, eps: float = 1e-5,
                            interpret: bool = False):
    """fused_stem_f1f2 over a batch-sharded a0 on `mesh` (1-D data mesh);
    params replicated. Same returns; BN stats are GLOBAL batch moments."""
    (out, stats), _ = _sh_stem_fwd(a0, params, mesh, eps, interpret)
    return out, stats


def _sh_specs(mesh):
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return axis, P(axis), P()


# trace-time evidence counter (see ops.pallas.losses.sharded_fused_trace_count)
_sharded_stem_traces = 0


def sharded_stem_trace_count() -> int:
    return _sharded_stem_traces


def _sh_stem_fwd(a0, params, mesh, eps, interpret):
    global _sharded_stem_traces
    _sharded_stem_traces += 1
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]
    n_local = a0.shape[0] // nsh
    local_shape = (n_local,) + a0.shape[1:]

    def local(a0, p):
        return _stem_fwd(a0, p, eps, interpret, axis, nsh)

    out, stats, acts = _shmap(local, mesh, (Pd, Pr), (Pd, Pr, Pd))(a0, params)
    return (out, stats), (params, stats, acts, local_shape)


def _sh_stem_fwd_rule(a0, params, mesh, eps, interpret):
    return _sh_stem_fwd(a0, params, mesh, eps, interpret)


def _sh_stem_bwd_rule(mesh, eps, interpret, res, cts):
    p, stats, acts, local_shape = res
    g_out = cts[0]
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(p, stats, acts, g_out):
        gz = jnp.transpose(g_out, (0, 1, 3, 2))      # NHWC -> NHCW
        return _stem_bwd_impl(p, stats, acts, local_shape, gz, eps,
                              interpret, axis, nsh)

    da0, dp = _shmap(local, mesh, (Pr, Pr, Pd, Pd),
                     (Pd, Pr))(p, stats, acts, g_out)
    return da0, dp


fused_stem_f1f2_sharded.defvjp(_sh_stem_fwd_rule, _sh_stem_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_stem_f1f2_sharded_nw(a0, params, mesh, eps: float = 1e-5,
                               interpret: bool = False):
    """fused_stem_f1f2_sharded with the f2 output in the PER-SHARD IR entry
    layout: global (nsh, R_ir, 24, _lanes(n_local*W2)), shard-major — feed
    to irchain.fused_ir_chain_sharded_nw, which consumes one (1, R, C, NWp)
    slice per device. BN stats are GLOBAL batch moments (sync-BN psum)."""
    (out, stats), _ = _sh_stem_nw_fwd(a0, params, mesh, eps, interpret)
    return out, stats


def _sh_stem_nw_fwd(a0, params, mesh, eps, interpret):
    global _sharded_stem_traces
    _sharded_stem_traces += 1
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]
    n_local = a0.shape[0] // nsh
    local_shape = (n_local,) + a0.shape[1:]

    def local(a0, p):
        return _stem_fwd(a0, p, eps, interpret, axis, nsh, nw_out=True)

    out, stats, acts = _shmap(local, mesh, (Pd, Pr), (Pd, Pr, Pd))(a0, params)
    return (out, stats), (params, stats, acts, local_shape)


def _sh_stem_nw_fwd_rule(a0, params, mesh, eps, interpret):
    return _sh_stem_nw_fwd(a0, params, mesh, eps, interpret)


def _sh_stem_nw_bwd_rule(mesh, eps, interpret, res, cts):
    p, stats, acts, local_shape = res
    g_nw = cts[0]                       # (nsh, R_ir, C, NWp_local)
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]
    n_loc = local_shape[0]
    H, W = _stem_hw(p, local_shape)
    H2, W2 = (H + 1) // 2, (W + 1) // 2

    def local(p, stats, acts, g_nw):
        gz = _nw_gz(g_nw, n_loc, H2, W2)
        return _stem_bwd_impl(p, stats, acts, local_shape, gz, eps,
                              interpret, axis, nsh)

    da0, dp = _shmap(local, mesh, (Pr, Pr, Pd, Pd),
                     (Pd, Pr))(p, stats, acts, g_nw)
    return da0, dp


fused_stem_f1f2_sharded_nw.defvjp(_sh_stem_nw_fwd_rule, _sh_stem_nw_bwd_rule)
