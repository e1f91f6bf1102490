"""Fused DeepLabV3+ decoder head: sep-conv -> BN -> ReLU -> 1x1 classifier.

Why: after cheap-conv replacement the head's hot chain at 129² (b16/513²,
OS16) is concat(48+256) -> dw3x3(304) -> pw(304->256) -> train-BN -> relu ->
1x1(256->nc). Stock XLA spends ~8.5 ms/step on this cluster (fwd+bwd;
round-2 profile: the depthwise batch-group rewrite plus layout-conversion
pad/copy fusions around it). The chain has ONE BatchNorm barrier, so it runs
as 2 Pallas forward passes + 2 backward passes in the stem's channel-sublane
(N, row, C, W) layout — one entry transpose, one exit transpose, zero XLA
glue in between (the ops.pallas.stem v2 lesson: only fused chains with a
single entry/exit beat XLA; single-op Pallas replacements just move the
boundary copies).

Passes (BH-row grid cells, uniform padded row layout, PAD top rows):
  P1: x halo -> dw3x3 taps (lane rolls) -> per-row pw matmul on the MXU ->
      a (256) + streaming batch moments of a.
  P2: a -> BN(batch stats)+relu -> per-row 1x1 matmul + bias -> logits (nc).
  B1: g_logits + a -> dW_cls/db_cls accums, gu = W^T g * relu'(u), plus the
      per-channel sums the analytic train-BN backward needs.
  B2: gu/a/x halos -> ga (BN backward) -> gt = pw^T ga -> gx (transposed dw
      taps) + dk/dpw accums.

Reference semantics: DeepLabHeadV3Plus fuse+classifier with the reference's
AtrousSeparableConvolution replacement (SURVEY.md §2.1/§2.2); numerics
pinned against the module path by tests/test_pallas_decoder.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import (BH, PAD, _CP, _accum, _accum_global, _bn_bwd_apply,
                   _bn_pack, _bn_u_xh, _bnbwd_pack, _dw_taps, _grad_sums_tile,
                   _lanes, _mask_lanes, _mm, _moments, _rows_in, _stats_tile)

# Row-block heights for the batch-folded (NW-on-lanes) variant. The folded
# lane dim is wide (2176 at b16/129²), so the legacy BH=16 blocks blow the
# scoped-VMEM budget; the backward passes hold several live f32 copies per
# row (g/a/u/xh/gz then ga/gt/x/t/gx) and need smaller blocks still.
BH_DEC = int(os.environ.get("KDCC_DEC_BH", "8"))
BH_DEC_BWD = int(os.environ.get("KDCC_DEC_BH_BWD", "2"))


def _geom_rows(H: int, bh: int = BH):
    nh = pl.cdiv(H, bh)
    return nh, PAD + (nh + 1) * bh     # extra block for the bh+4 x halo


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _k_sep_fwd(x_ref, k_ref, pw_ref, a_ref, s_ref, *, bh, H, wseg=None,
               wreal=None):
    """dw3x3(304) -> pw(304->256) -> a + batch moments of a.
    x halo (1, bh+2, Ci, W) at global rows j*bh-1 (zero-padded buffer).
    wseg: per-image lane-segment width for the batch-folded layout (the dw
    tap rolls then mask at every multiple of wseg). wreal: real lane extent
    — the circular roll wraps image 0's first column into the LAST pad lane
    (whose lane%wseg is generally interior, so wseg masking misses it);
    zero everything past wreal so the streaming stats stay exact."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    x = jnp.where(_rows_in(x.shape[0], j, bh, -1, H), x, 0.0)
    t = _dw_taps(x, k_ref[...].astype(jnp.float32), bh, x.shape[2],
                 wseg=wseg)
    pw = pw_ref[...]                                  # (Co, Ci)
    rows = [_mm(pw, t[r], a_ref.dtype) for r in range(bh)]
    a = jnp.stack(rows, axis=0)                       # (bh, Co, W)
    if wreal is not None:
        a = _mask_lanes(a, wreal)
    a_ref[0] = a.astype(a_ref.dtype)
    m = _rows_in(bh, j, bh, 0, H)
    _accum(s_ref, j, _stats_tile(a, m, a.shape[1]))


def _k_head_fwd(a_ref, bn_ref, w_ref, b_ref, y_ref, *, bh, H, eps):
    """BN(batch stats)+relu -> 1x1 (Cm->nc) + bias -> logits."""
    j = pl.program_id(1)
    a = a_ref[0].astype(jnp.float32)
    u, _ = _bn_u_xh(a, bn_ref[...].astype(jnp.float32), eps)
    z = jnp.maximum(u, 0.0)
    z = jnp.where(_rows_in(bh, j, bh, 0, H), z, 0.0)
    w = w_ref[...]                                    # (nc, Cm)
    b = b_ref[...].astype(jnp.float32)                # (nc, 1)
    rows = [_mm(w, z[r], y_ref.dtype) + b for r in range(bh)]
    y_ref[0] = jnp.stack(rows, axis=0).astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _k_head_bwd(g_ref, a_ref, bn_ref, wt_ref, gu_ref, s_ref, dw_ref,
                db_ref, *, bh, H, eps):
    """gu = W^T g * relu'(u); accumulate dW (nc, Cm), db (8, nc_pad) row 0,
    and the BN-backward sums (sum gu, sum gu*xhat)."""
    i, j = pl.program_id(0), pl.program_id(1)
    g = g_ref[0].astype(jnp.float32)                  # (bh, nc, W)
    a = a_ref[0].astype(jnp.float32)
    m = _rows_in(bh, j, bh, 0, H)
    g = jnp.where(m, g, 0.0)
    u, xh = _bn_u_xh(a, bn_ref[...].astype(jnp.float32), eps)
    z = jnp.where(m, jnp.maximum(u, 0.0), 0.0)
    xh = jnp.where(m, xh, 0.0)

    wt = wt_ref[...]                                  # (Cm, nc)
    mdt = gu_ref.dtype
    dims = (((1,), (1,)), ((), ()))                   # contract W
    dw_tile = jnp.zeros(
        (wt.shape[1], wt.shape[0]), jnp.float32)
    gz_rows = []
    for r in range(bh):
        dw_tile += jax.lax.dot_general(g[r].astype(mdt), z[r].astype(mdt),
                                       dims,
                                       preferred_element_type=jnp.float32)
        gz_rows.append(_mm(wt, g[r], mdt))
    gz = jnp.stack(gz_rows, axis=0)                   # (bh, Cm, W)
    gu = jnp.where(m, gz * (u > 0.0), 0.0)
    gu_ref[0] = gu.astype(gu_ref.dtype)
    _accum(s_ref, j, _grad_sums_tile(gu, xh, gu.shape[1]))
    _accum_global(dw_ref, i, j, dw_tile)
    db_tile = jnp.sum(g, axis=(0, 2))                 # (nc,)
    pad = db_ref.shape[1] - db_tile.shape[0]
    _accum_global(db_ref, i, j,
                  jnp.pad(db_tile, (0, pad))[None, :]
                  * jnp.ones((db_ref.shape[0], 1), jnp.float32)
                  * (jax.lax.broadcasted_iota(
                      jnp.int32, (db_ref.shape[0], 1), 0) == 0))


def _k_sep_bwd(gu_ref, a_ref, x_ref, pnp_ref, bn_ref, pwt_ref, k_ref,
               gx_ref, dpw_ref, dk_ref, *, bh, H, eps, wseg=None,
               wreal=None):
    """ga (BN bwd) -> gt = pw^T ga -> gx (flipped dw taps), dpw, dk.

    gu/a halos (1, bh+2, Cm, W); x halo (1, bh+4, Ci, W) (t recomputed on
    the ga halo rows needs one more x row each side). wreal: real lane
    extent in the folded layout — the train-BN backward's constant terms
    make ga nonzero on pad lanes; zero them so dpw/dk contractions and the
    circular-roll wrap stay exact."""
    i, j = pl.program_id(0), pl.program_id(1)
    gu = gu_ref[0].astype(jnp.float32)                # (bh+2, Cm, W)
    a = a_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)                  # (bh+4, Ci, W)
    mh = _rows_in(bh + 2, j, bh, -1, H)
    ga = _bn_bwd_apply(gu, a, pnp_ref[...].astype(jnp.float32), eps)
    ga = jnp.where(mh, ga, 0.0)
    if wreal is not None:
        ga = _mask_lanes(ga, wreal)
    x = jnp.where(_rows_in(bh + 4, j, bh, -2, H), x, 0.0)

    pwt = pwt_ref[...]                                # (Ci, Cm)
    k = k_ref[...].astype(jnp.float32)                # (Ci, 9)
    mdt = gx_ref.dtype
    gt_rows = [_mm(pwt, ga[r], mdt) for r in range(bh + 2)]
    gt = jnp.stack(gt_rows, axis=0)                   # (bh+2, Ci, W)
    gx = _dw_taps(gt, k, bh, gt.shape[2], flip=True, wseg=wseg)
    gx_ref[0] = gx.astype(gx_ref.dtype)

    # t on the ga halo rows (for dpw) and dk from x taps x gt center
    t = _dw_taps(x, k, bh + 2, x.shape[2], wseg=wseg)  # rows j*bh-1 ..
    dims = (((1,), (1,)), ((), ()))
    dpw_tile = jnp.zeros((ga.shape[1], gt.shape[1]), jnp.float32)
    for r in range(1, bh + 1):                        # center rows only
        dpw_tile += jax.lax.dot_general(ga[r].astype(mdt),
                                        t[r].astype(mdt), dims,
                                        preferred_element_type=jnp.float32)
    _accum_global(dpw_ref, i, j, dpw_tile)

    gt_c = gt[1:1 + bh]
    Ci, W = gt.shape[1], gt.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    if wseg is not None:
        lane = lane % wseg
        edge = wseg
    else:
        edge = W
    cols = []
    for dh in range(3):
        rows = x[dh + 1:dh + 1 + bh]                  # x rows j*bh+dh-1 ..
        for dw in range(3):
            if dw == 1:
                sh = rows
            else:
                shift = 1 if dw == 0 else W - 1
                sh = pltpu.roll(rows, shift, axis=2)
                if dw == 0:
                    sh = jnp.where(lane >= 1, sh, 0.0)
                else:
                    sh = jnp.where(lane < edge - 1, sh, 0.0)
            cols.append(jnp.sum(sh * gt_c, axis=(0, 2)))  # (Ci,)
    col = jax.lax.broadcasted_iota(jnp.int32, (Ci, 128), 1)
    dk_tile = jnp.zeros((Ci, 128), jnp.float32)
    for t_idx in range(9):
        dk_tile += jnp.where(col == t_idx, cols[t_idx][:, None], 0.0)
    _accum_global(dk_ref, i, j, dk_tile)


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

def _blkc(c, w, bh=BH):
    off = PAD // bh
    return pl.BlockSpec((1, bh, c, w),
                        lambda i, j, off=off: (i, j + off, 0, 0),
                        memory_space=pltpu.VMEM)


def _haloc(rows_extra, c, w, first=-1, bh=BH):
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + rows_extra), pl.Element(c),
         pl.Element(w)),
        lambda i, j: (i, PAD + j * bh + first, 0, 0),
        memory_space=pltpu.VMEM)


def _constc(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, j: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _stats_outc(c):
    return pl.BlockSpec((1, c, 128), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _decoder_fwd(x, p, eps, interpret, *, wseg=None, bh=BH, w_real=None,
                 axis=None, nsh=1):
    """x: (N, H, Ci, W) channel-sublane concat(low48, up256) — or the
    batch-folded (1, H, Ci, NWp) variant with wseg = per-image lane width
    and w_real = real (unpadded) lane extent. Returns
    (logits (N, H, nc, W), stats, residuals)."""
    n, H, ci, W = x.shape
    dt = x.dtype
    cm = p["pw"].shape[0]
    nc = p["wc"].shape[0]
    nh, R = _geom_rows(H, bh)
    count = float(n * H * (w_real if w_real is not None else W)) * nsh
    xp = jnp.pad(x, ((0, 0), (PAD, R - PAD - H), (0, 0), (0, 0)))

    a, sums = pl.pallas_call(
        functools.partial(_k_sep_fwd, bh=bh, H=H, wseg=wseg,
                          wreal=w_real),
        out_shape=(jax.ShapeDtypeStruct((n, R, cm, W), dt),
                   jax.ShapeDtypeStruct((n, cm, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=[_haloc(2, ci, W, bh=bh), _constc((ci, 9)),
                  _constc((cm, ci))],
        out_specs=(_blkc(cm, W, bh), _stats_outc(cm)),
        interpret=interpret, compiler_params=_CP,
    )(xp, p["k"], p["pw"])
    mean, var = _moments(sums, count, axis)

    bnp = _bn_pack(mean, var, p["g"], p["b"])
    bc = p["bc"].astype(jnp.float32)[:, None]
    logits = pl.pallas_call(
        functools.partial(_k_head_fwd, bh=bh, H=H, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, nh * bh, nc, W), dt),
        grid=(n, nh),
        in_specs=[_blkc(cm, W, bh), _constc((cm, 4)), _constc((nc, cm)),
                  _constc((nc, 1))],
        out_specs=pl.BlockSpec((1, bh, nc, W), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret, compiler_params=_CP,
    )(a, bnp, p["wc"], bc)
    return logits[:, :H], (mean, var), (xp, a)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_decoder_head(x, params, eps: float = 1e-5,
                       interpret: bool = False):
    """sep(Ci->Cm, 3x3 d=1) -> train-BN -> relu -> 1x1(Cm->nc)+bias, fused.

    x: (N, H, Ci, W) channel-sublane (Ci, Cm multiples of 8). params:
      k (Ci, 9) dw taps [dh*3+dw]; pw (Cm, Ci); g/b (Cm,) BN affine;
      wc (nc, Cm); bc (nc,).
    Returns (logits (N, H, nc, W), (batch_mean, batch_var) of the BN input).
    """
    logits, stats, _ = _decoder_fwd(x, params, eps, interpret)
    return logits, stats


def _fwd_rule(x, p, eps, interpret):
    logits, stats, res = _decoder_fwd(x, p, eps, interpret)
    return (logits, stats), (p, stats, res, x.shape)


def _decoder_bwd(g_out, p, mean, var, xp, a, x_shape, eps, interpret, *,
                 wseg=None, bh=BH, w_real=None, axis=None, nsh=1):
    """Backward passes B1+B2 given the fwd residuals. g_out (N, H, nc, W).
    Returns (gx (N, H, Ci, W), param grads dict in f32 accumulators)."""
    n, H, ci, W = x_shape
    dt = xp.dtype
    cm = p["pw"].shape[0]
    nc = p["wc"].shape[0]
    nh = pl.cdiv(H, bh)
    R = xp.shape[1]
    # the halo reads reach rows PAD-2 .. PAD + nh*bh + 1 of the residual
    # arrays laid out by the (possibly larger-block) forward
    assert R >= PAD + nh * bh + 2, (R, H, bh)
    nc_pad = ((nc + 127) // 128) * 128
    count = float(n * H * (w_real if w_real is not None else W)) * nsh
    g_psum = ((lambda v: jax.lax.psum(v, axis)) if axis is not None
              else (lambda v: v))

    gp = jnp.pad(g_out, ((0, 0), (0, nh * bh - H), (0, 0), (0, 0)))
    bnp = _bn_pack(mean, var, p["g"], p["b"])
    wct = jnp.transpose(p["wc"], (1, 0))

    gu, sums, dWc, dbc = pl.pallas_call(
        functools.partial(_k_head_bwd, bh=bh, H=H, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((n, R, cm, W), dt),
                   jax.ShapeDtypeStruct((n, cm, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nc, cm), jnp.float32),
                   jax.ShapeDtypeStruct((8, nc_pad), jnp.float32)),
        grid=(n, nh),
        in_specs=[pl.BlockSpec((1, bh, nc, W), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  _blkc(cm, W, bh), _constc((cm, 4)), _constc((cm, nc))],
        out_specs=(_blkc(cm, W, bh), _stats_outc(cm),
                   pl.BlockSpec((nc, cm), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, nc_pad), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret, compiler_params=_CP,
    )(gp, a, bnp, wct)
    s = g_psum(sums.sum(0)[:, :2])

    pnp = _bnbwd_pack(mean, var, p["g"], s[:, 0], s[:, 1], count)
    pwt = jnp.transpose(p["pw"], (1, 0))
    gx, dpw, dk = pl.pallas_call(
        functools.partial(_k_sep_bwd, bh=bh, H=H, eps=eps, wseg=wseg,
                          wreal=w_real),
        out_shape=(jax.ShapeDtypeStruct((n, nh * bh, ci, W), dt),
                   jax.ShapeDtypeStruct((cm, ci), jnp.float32),
                   jax.ShapeDtypeStruct((ci, 128), jnp.float32)),
        grid=(n, nh),
        in_specs=[_haloc(2, cm, W, bh=bh), _haloc(2, cm, W, bh=bh),
                  _haloc(4, ci, W, first=-2, bh=bh),
                  _constc((cm, 6)), _constc((cm, 4)), _constc((ci, cm)),
                  _constc((ci, 9))],
        out_specs=(pl.BlockSpec((1, bh, ci, W), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((cm, ci), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((ci, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret, compiler_params=_CP,
    )(gu, a, xp, pnp, bnp, pwt, p["k"])

    dWc, dbc, dpw, dk = g_psum((dWc, dbc, dpw, dk))
    dp = {
        "k": dk[:, :9].astype(p["k"].dtype),
        "pw": dpw.astype(p["pw"].dtype),
        "g": s[:, 1].astype(p["g"].dtype),
        "b": s[:, 0].astype(p["b"].dtype),
        "wc": dWc.astype(p["wc"].dtype),
        "bc": dbc[0, :nc].astype(p["bc"].dtype),
    }
    return gx[:, :H], dp


def _bwd_rule(eps, interpret, resids, cts):
    p, (mean, var), (xp, a), x_shape = resids
    return _decoder_bwd(cts[0], p, mean, var, xp, a, x_shape, eps, interpret)


fused_decoder_head.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Batch-folded (NW-on-lanes) variant.
#
# At the decoder's resolution (129² for 513² inputs at OS16) the legacy
# channel-sublane layout pads the lane dim 129 -> 256 (1.98x — why the
# legacy kernel measured slower than XLA). Folding the batch into the lane
# dim gives lanes = N*W = 16*129 = 2064 -> 2176 (1.05x pad) while Ci=304 /
# Cm=256 are exact sublane multiples (the ops.pallas.irchain lesson). The
# per-image boundary is handled by wseg masking in the dw taps; the grid
# collapses to H row-blocks.
# ---------------------------------------------------------------------------


def _fold_nhwc(x):
    """(N, H, W, C) -> (1, H, C, NWp) with zero lane padding."""
    n, h, w, c = x.shape
    nw = n * w
    z = jnp.transpose(x, (1, 3, 0, 2)).reshape(h, c, nw)[None]
    return jnp.pad(z, ((0, 0), (0, 0), (0, 0), (0, _lanes(nw) - nw)))


def _unfold_nhwc(z, n, H, w):
    """(1, >=H, C, NWp) -> (N, H, W, C)."""
    c = z.shape[2]
    v = z[0, :H, :, :n * w].reshape(H, c, n, w)
    return jnp.transpose(v, (2, 0, 3, 1))


def _folded_fwd(low, up, p, eps, interpret, axis=None, nsh=1):
    n, H, w, cl = low.shape
    x = jnp.concatenate([_fold_nhwc(low), _fold_nhwc(up)], axis=2)
    logits, stats, (xp, a) = _decoder_fwd(
        x, p, eps, interpret, wseg=w, bh=BH_DEC, w_real=n * w,
        axis=axis, nsh=nsh)
    y = _unfold_nhwc(logits, n, H, w)
    return y, stats, (xp, a, x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_decoder_head_folded(low, up, params, eps: float = 1e-5,
                              interpret: bool = False):
    """fused_decoder_head on cat(low, up) in the batch-folded layout.

    low: (N, H, W, Cl) NHWC projected low-level features; up: (N, H, W, Cu)
    NHWC upsampled ASPP output. params as fused_decoder_head with
    Ci = Cl + Cu (dw taps / pw in-channels ordered low-then-up, matching
    the concat). Returns (logits (N, H, W, nc) NHWC, (mean, var))."""
    y, stats, _ = _folded_fwd(low, up, params, eps, interpret)
    return y, stats


def _folded_fwd_rule(low, up, p, eps, interpret):
    y, stats, (xp, a, x_shape) = _folded_fwd(low, up, p, eps, interpret)
    return (y, stats), (p, stats, xp, a, x_shape, low.shape)


def _folded_bwd_rule(eps, interpret, resids, cts):
    p, (mean, var), xp, a, x_shape, low_shape = resids
    n, H, w, cl = low_shape
    g = _fold_nhwc(cts[0])
    gx, dp = _decoder_bwd(g, p, mean, var, xp, a, x_shape, eps, interpret,
                          wseg=w, bh=BH_DEC_BWD, w_real=n * w)
    return (_unfold_nhwc(gx[:, :, :cl], n, H, w),
            _unfold_nhwc(gx[:, :, cl:], n, H, w), dp)


fused_decoder_head_folded.defvjp(_folded_fwd_rule, _folded_bwd_rule)


# ---------------------------------------------------------------------------
# SPMD variant: shard_map over a 1-D data mesh (pallas_call has no GSPMD
# partitioning rule). Batch shards along N; each shard folds its LOCAL
# images into lanes; BN moments / BN-backward totals / weight grads are
# psum'd — sync-BN semantics, identical to the unsharded global batch.
# ---------------------------------------------------------------------------

_sharded_decoder_traces = 0


def sharded_decoder_trace_count() -> int:
    return _sharded_decoder_traces


def _dec_specs(mesh):
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return axis, P(axis), P()


def _dec_shmap(fn, mesh, in_specs, out_specs):
    from jax import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_decoder_head_folded_sharded(low, up, params, mesh,
                                      eps: float = 1e-5,
                                      interpret: bool = False):
    """fused_decoder_head_folded over batch-sharded low/up on `mesh`
    (params replicated); BN stats are GLOBAL batch moments."""
    (y, _) = _sh_folded_fwd(low, up, params, mesh, eps, interpret)
    return y


def _sh_folded_fwd(low, up, params, mesh, eps, interpret):
    global _sharded_decoder_traces
    _sharded_decoder_traces += 1
    axis, Pd, Pr = _dec_specs(mesh)
    nsh = mesh.shape[axis]

    def local(low, up, p):
        y, stats, (xp, a, x_shape) = _folded_fwd(low, up, p, eps, interpret,
                                                 axis=axis, nsh=nsh)
        return y, stats, xp, a

    y, stats, xp, a = _dec_shmap(local, mesh, (Pd, Pd, Pr),
                                 (Pd, Pr, Pd, Pd))(low, up, params)
    return ((y, stats), (params, stats, xp, a, low.shape, up.shape[-1]))


def _sh_folded_fwd_rule(low, up, params, mesh, eps, interpret):
    return _sh_folded_fwd(low, up, params, mesh, eps, interpret)


def _sh_folded_bwd_rule(mesh, eps, interpret, resids, cts):
    p, (mean, var), xp, a, low_shape, cu = resids
    n, H, w, cl = low_shape
    axis, Pd, Pr = _dec_specs(mesh)
    nsh = mesh.shape[axis]

    def local(p, mean, var, xp, a, g):
        n_loc = g.shape[0]
        gf = _fold_nhwc(g)
        x_shape = (1, H, cl + cu, xp.shape[3])
        gx, dp = _decoder_bwd(gf, p, mean, var, xp, a, x_shape, eps,
                              interpret, wseg=w, bh=BH_DEC_BWD,
                              w_real=n_loc * w, axis=axis, nsh=nsh)
        return (_unfold_nhwc(gx[:, :, :cl], n_loc, H, w),
                _unfold_nhwc(gx[:, :, cl:], n_loc, H, w), dp)

    dlow, dup, dp = _dec_shmap(local, mesh, (Pr, Pr, Pr, Pd, Pd, Pd),
                               (Pd, Pd, Pr))(p, mean, var, xp, a, cts[0])
    return dlow, dup, dp


fused_decoder_head_folded_sharded.defvjp(_sh_folded_fwd_rule,
                                         _sh_folded_bwd_rule)
