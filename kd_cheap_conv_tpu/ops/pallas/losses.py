"""Fused pixelwise CE + softened-KL Pallas kernel with custom VJP.

Why: at 513²x21 the jnp loss path costs ~32ms fwd on v5e (measured) — each
log-softmax reduction breaks XLA fusion, so the full-res logits cross HBM
~10x. This kernel reads the student/teacher logits ONCE per pass:

  forward:  (s, t, labels) -> per-tile partial sums [nll, valid, kl]
  backward: (s, t, labels, scalars) -> ds in one pass
            ds = g·[ α/Nvalid·(softmax(s) − onehot)·valid
                   + β·T/Npix·(softmax(s/T) − softmax(t/T)) ]

Layout: class-major (N, C, H, W) logits — C is a major dim (no lane padding),
W rides the lanes. Grid (N, H/TH); rows past H are masked via a global-row
iota (blocks arrive zero-padded). All math f32 in VMEM; logits can be bf16.

Semantics match ops.losses.cross_entropy + kd_kl_loss (T², mean-over-all-
pixels KL, mean-over-valid CE, teacher-logit clamp) — pinned by
tests/test_pallas_loss.py against the jnp reference, values and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_CLAMP = -87.0


def _fwd_kernel(s_ref, t_ref, lbl_ref, out_ref, *, C, T, th, H,
                ignore_index, t_clip):
    j = pl.program_id(1)
    s = s_ref[0].astype(jnp.float32)            # (C, th, w)
    t = t_ref[0].astype(jnp.float32)
    if t_clip:
        t = jnp.clip(t, -t_clip, t_clip)
    lbl = lbl_ref[0]                             # (th, w) int32

    row = jax.lax.broadcasted_iota(jnp.int32, lbl.shape, 0) + j * th
    in_bounds = (row < H)
    valid = in_bounds & (lbl != ignore_index)

    # CE at T=1
    max_s = jnp.max(s, axis=0)
    lse_s = max_s + jnp.log(jnp.sum(jnp.exp(s - max_s), axis=0))
    cls = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    onehot = (cls == lbl[None]).astype(jnp.float32)
    s_lbl = jnp.sum(s * onehot, axis=0)
    nll = lse_s - s_lbl

    # softened KL at temperature T
    sT = s / T
    tT = t / T
    max_sT = jnp.max(sT, axis=0)
    lse_sT = max_sT + jnp.log(jnp.sum(jnp.exp(sT - max_sT), axis=0))
    max_tT = jnp.max(tT, axis=0)
    lse_tT = max_tT + jnp.log(jnp.sum(jnp.exp(tT - max_tT), axis=0))
    log_p_t = jnp.maximum(tT - lse_tT[None], _NEG_CLAMP)
    p_t = jnp.exp(log_p_t)
    log_p_s = sT - lse_sT[None]
    kl = jnp.sum(p_t * (log_p_t - log_p_s), axis=0)

    vmask = valid.astype(jnp.float32)
    bmask = in_bounds.astype(jnp.float32)
    # one (8,128) f32 tile per grid cell (TPU min tile for the output);
    # the three partial sums live at [0, 0..2]. Built with iota masks —
    # .at[].set lowers to scatter, which Mosaic doesn't support.
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = (r == 0)
    tile = (jnp.where(row0 & (c0 == 0), jnp.sum(nll * vmask), 0.0)
            + jnp.where(row0 & (c0 == 1), jnp.sum(vmask), 0.0)
            + jnp.where(row0 & (c0 == 2), jnp.sum(kl * bmask), 0.0))
    out_ref[0, 0] = tile


def _bwd_kernel(s_ref, t_ref, lbl_ref, scal_ref, ds_ref, *, C, T, th, H,
                ignore_index, t_clip):
    j = pl.program_id(1)
    s = s_ref[0].astype(jnp.float32)
    t = t_ref[0].astype(jnp.float32)
    if t_clip:
        t = jnp.clip(t, -t_clip, t_clip)
    lbl = lbl_ref[0]
    g = scal_ref[0, 0]         # upstream cotangent of total (folded to 1)
    a_scale = scal_ref[0, 1]   # effective CE grad scale
    k_scale = scal_ref[0, 2]   # effective KL grad scale

    row = jax.lax.broadcasted_iota(jnp.int32, lbl.shape, 0) + j * th
    in_bounds = (row < H)
    valid = in_bounds & (lbl != ignore_index)

    max_s = jnp.max(s, axis=0)
    e1 = jnp.exp(s - max_s[None])
    p1 = e1 / jnp.sum(e1, axis=0)[None]
    cls = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    onehot = (cls == lbl[None]).astype(jnp.float32)

    sT = s / T
    tT = t / T
    eS = jnp.exp(sT - jnp.max(sT, axis=0)[None])
    pS = eS / jnp.sum(eS, axis=0)[None]
    eT = jnp.exp(tT - jnp.max(tT, axis=0)[None])
    pT = eT / jnp.sum(eT, axis=0)[None]

    ds = (a_scale * (p1 - onehot) * valid.astype(jnp.float32)[None]
          + k_scale * (pS - pT) * in_bounds.astype(jnp.float32)[None])
    ds_ref[0] = (g * ds).astype(ds_ref.dtype)


def _pick_th(h: int) -> int:
    return min(16, h)


def _run_fwd(s, t, labels, T, ignore_index, t_clip, interpret):
    n, c, h, w = s.shape
    th = _pick_th(h)
    nh = pl.cdiv(h, th)
    kern = functools.partial(_fwd_kernel, C=c, T=float(T), th=th, H=h,
                             ignore_index=ignore_index, t_clip=float(t_clip))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, nh, 8, 128), jnp.float32),
        grid=(n, nh),
        in_specs=[
            pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(20 * n * c * h * w),
            bytes_accessed=int(2 * s.size * s.dtype.itemsize),
            transcendentals=int(3 * n * c * h * w),
        ),
    )(s, t, labels)
    sums = out[:, :, 0, :3].sum(axis=(0, 1))
    return sums  # [nll_sum, valid_cnt, kl_sum]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_ce_kl_loss(s, t, labels, temperature: float = 4.0,
                     alpha: float = 0.5, beta: float = 0.5,
                     ignore_index: int = 255, teacher_logit_clip: float = 3e4,
                     interpret: bool = False):
    """total = alpha*CE(s, labels) + beta*T^2*mean_pix KL(p_t || p_s).

    s, t: (N, C, H, W) class-major logits (bf16/f32); labels (N, H, W) int32.
    Returns (total, task, kd) scalars.
    """
    total, (task, kd), _ = _fwd(s, t, labels, temperature, alpha, beta,
                                ignore_index, teacher_logit_clip, interpret)
    return total, task, kd


def _fwd(s, t, labels, temperature, alpha, beta, ignore_index,
         teacher_logit_clip, interpret):
    n, c, h, w = s.shape
    sums = _run_fwd(s, t, labels, temperature, ignore_index,
                    teacher_logit_clip, interpret)
    nll_sum, valid, kl_sum = sums[0], sums[1], sums[2]  # noqa: keep order
    denom = jnp.maximum(valid, 1.0)
    npix = float(n * h * w)
    task = nll_sum / denom
    kd = (temperature ** 2) * kl_sum / npix
    total = alpha * task + beta * kd
    return total, (task, kd), (s, t, labels, denom)


def _fwd_rule(s, t, labels, temperature, alpha, beta, ignore_index,
              teacher_logit_clip, interpret):
    total, (task, kd), res = _fwd(s, t, labels, temperature, alpha, beta,
                                  ignore_index, teacher_logit_clip, interpret)
    return (total, task, kd), res


def _bwd_rule(temperature, alpha, beta, ignore_index, teacher_logit_clip,
              interpret, res, cts):
    s, t, labels, denom = res
    g_total, g_task, g_kd = cts
    # fold the aux outputs' cotangents into the same linear combination
    n, c, h, w = s.shape
    npix = float(n * h * w)
    th = _pick_th(h)
    nh = pl.cdiv(h, th)
    # effective scale for task grad: (g_total*alpha + g_task)/denom etc.
    a_scale = (g_total * alpha + g_task) / denom
    k_scale = (g_total * beta + g_kd) * temperature / npix
    scalars = jnp.stack([jnp.float32(1.0),
                         a_scale.astype(jnp.float32),
                         k_scale.astype(jnp.float32)]).reshape(1, 3)
    kern = functools.partial(_bwd_kernel, C=c, T=float(temperature), th=th,
                             H=h, ignore_index=ignore_index,
                             t_clip=float(teacher_logit_clip))
    ds = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(s.shape, s.dtype),
        grid=(n, nh),
        in_specs=[
            pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(20 * n * c * h * w),
            bytes_accessed=int(3 * s.size * s.dtype.itemsize),
            transcendentals=int(3 * n * c * h * w),
        ),
    )(s, t, labels, scalars)
    dt = jnp.zeros_like(t)  # teacher side is stop-gradient by construction
    return ds, dt, None


fused_ce_kl_loss.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Upsample-fused variant: CE+KL over BILINEARLY UPSAMPLED logits without ever
# materializing the full-res logits. The 16x decoder upsample
# (BASELINE.json:5 "decoder bilinear upsample") becomes two tiny matmuls per
# row-tile in VMEM: up = Wr[tile] @ small @ Wc, where Wr (H_out, h) and
# Wc (w, W_out) are the half-pixel bilinear matrices (torch
# align_corners=False). HBM traffic drops from ~2x0.9GB full-res logits to
# the 33² head logits (<1MB) + labels.
#
# Backward accumulates ds_small = sum_tiles Wr[tile]^T @ g_tile @ Wc^T using
# pallas output revisiting over the row-tile grid axis.
# ---------------------------------------------------------------------------

import numpy as np


def bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out, in) half-pixel bilinear interpolation matrix (matches
    torch F.interpolate(align_corners=False) / jax.image.resize)."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    pos = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    pos = np.clip(pos, 0.0, in_size - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - frac)
    np.add.at(m, (rows, hi), frac)
    return m


def _up_tiles(s_ref, t_ref, wr_ref, wc_ref, j, th, C, t_clip):
    """Per-class 2D upsampled tiles (Mosaic rejects 3D dot_general /
    minor-dim transposes; with C static we unroll to 2D matmuls:
    up_c = Wr[tile] @ z_c @ Wc)."""
    wr = wr_ref[pl.ds(j * th, th), :]            # (th, h)
    wc = wc_ref[...]                             # (w, W)
    s_list, t_list = [], []
    for c in range(C):
        zc = s_ref[0, c].astype(jnp.float32)     # (h, w)
        tc = t_ref[0, c].astype(jnp.float32)
        if t_clip:
            tc = jnp.clip(tc, -t_clip, t_clip)
        s_list.append(jnp.dot(jnp.dot(wr, zc,
                                      preferred_element_type=jnp.float32),
                              wc, preferred_element_type=jnp.float32))
        t_list.append(jnp.dot(jnp.dot(wr, tc,
                                      preferred_element_type=jnp.float32),
                              wc, preferred_element_type=jnp.float32))
    return s_list, t_list


def _softmax_parts(xs, T):
    """Streaming per-class softmax pieces over a list of (th,W) tiles:
    returns (probs list at temperature T, logsumexp of x/T)."""
    xTs = [x / T for x in xs]
    mx = xTs[0]
    for x in xTs[1:]:
        mx = jnp.maximum(mx, x)
    es = [jnp.exp(x - mx) for x in xTs]
    tot = es[0]
    for e in es[1:]:
        tot = tot + e
    lse = mx + jnp.log(tot)
    return [e / tot for e in es], lse


def _up_fwd_kernel(s_ref, t_ref, lbl_ref, wr_ref, wc_ref, out_ref, *,
                   C, T, th, H, ignore_index, t_clip, hin):
    j = pl.program_id(1)
    lbl = lbl_ref[0]                             # (th, W)
    s_list, t_list = _up_tiles(s_ref, t_ref, wr_ref, wc_ref, j, th, C, t_clip)

    row = jax.lax.broadcasted_iota(jnp.int32, lbl.shape, 0) + j * th
    in_bounds = (row < H)
    valid = in_bounds & (lbl != ignore_index)

    # CE at T=1
    _, lse_s1 = _softmax_parts(s_list, 1.0)
    s_lbl = jnp.zeros_like(lse_s1)
    for c in range(C):
        s_lbl = s_lbl + jnp.where(lbl == c, s_list[c], 0.0)
    nll = lse_s1 - s_lbl

    # softened KL
    _, lse_sT = _softmax_parts(s_list, T)
    _, lse_tT = _softmax_parts(t_list, T)
    kl = jnp.zeros_like(lse_s1)
    for c in range(C):
        log_p_t = jnp.maximum(t_list[c] / T - lse_tT, _NEG_CLAMP)
        log_p_s = s_list[c] / T - lse_sT
        kl = kl + jnp.exp(log_p_t) * (log_p_t - log_p_s)

    vmask = valid.astype(jnp.float32)
    bmask = in_bounds.astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = (r == 0)
    tile = (jnp.where(row0 & (c0 == 0), jnp.sum(nll * vmask), 0.0)
            + jnp.where(row0 & (c0 == 1), jnp.sum(vmask), 0.0)
            + jnp.where(row0 & (c0 == 2), jnp.sum(kl * bmask), 0.0))
    out_ref[0, 0] = tile


def _up_bwd_kernel(s_ref, t_ref, lbl_ref, wr_ref, wc_ref, scal_ref, ds_ref,
                   *, C, T, th, H, ignore_index, t_clip, hin):
    j = pl.program_id(1)
    lbl = lbl_ref[0]
    a_scale = scal_ref[0, 1]
    k_scale = scal_ref[0, 2]
    wr = wr_ref[pl.ds(j * th, th), :]
    wc = wc_ref[...]
    s_list, t_list = _up_tiles(s_ref, t_ref, wr_ref, wc_ref, j, th, C, t_clip)

    row = jax.lax.broadcasted_iota(jnp.int32, lbl.shape, 0) + j * th
    in_bounds = (row < H).astype(jnp.float32)
    valid = ((row < H) & (lbl != ignore_index)).astype(jnp.float32)

    p1_list, _ = _softmax_parts(s_list, 1.0)
    pS_list, _ = _softmax_parts(s_list, T)
    pT_list, _ = _softmax_parts(t_list, T)

    @pl.when(j == 0)
    def _():
        ds_ref[0] = jnp.zeros_like(ds_ref[0])

    for c in range(C):
        onehot_c = (lbl == c).astype(jnp.float32)
        g_c = (a_scale * (p1_list[c] - onehot_c) * valid
               + k_scale * (pS_list[c] - pT_list[c]) * in_bounds)
        # pull back: ds_c = Wr[tile]^T @ g_c @ Wc^T  -> (h, w)
        tmp = jnp.dot(wr.T, g_c, preferred_element_type=jnp.float32)  # (h, W)
        ds_c = jnp.dot(tmp, wc.T, preferred_element_type=jnp.float32)  # (h, w)
        ds_ref[0, c] += ds_c.astype(ds_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def fused_ce_kl_loss_upsampled(s_small, t_small, labels, out_h: int,
                               out_w: int, temperature: float = 4.0,
                               alpha: float = 0.5, beta: float = 0.5,
                               ignore_index: int = 255,
                               teacher_logit_clip: float = 3e4,
                               interpret: bool = False):
    """CE+KL over bilinearly-upsampled class-major logits, fully fused.

    s_small, t_small: (N, C, h, w) head-resolution logits; labels
    (N, out_h, out_w) int32. Semantically identical to upsampling to
    (out_h, out_w) then fused_ce_kl_loss. Returns (total, task, kd).
    """
    total, (task, kd), _ = _up_fwd(s_small, t_small, labels, out_h, out_w,
                                   temperature, alpha, beta, ignore_index,
                                   teacher_logit_clip, interpret)
    return total, task, kd


def _up_run_fwd(s_small, t_small, labels, out_h, out_w, T, ignore_index,
                t_clip, interpret):
    n, c, hin, win = s_small.shape
    th = _pick_th(out_h)
    nh = pl.cdiv(out_h, th)
    wr = jnp.asarray(bilinear_matrix(hin, out_h))       # (H, h)
    # pad Wr rows so pl.ds(j*th, th) never reads OOB on the last tile
    pad = nh * th - out_h
    if pad:
        wr = jnp.pad(wr, ((0, pad), (0, 0)))
    wc = jnp.asarray(bilinear_matrix(win, out_w).T)     # (w, W)
    kern = functools.partial(_up_fwd_kernel, C=c, T=float(T), th=th,
                             H=out_h, ignore_index=ignore_index,
                             t_clip=float(t_clip), hin=hin)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, nh, 8, 128), jnp.float32),
        grid=(n, nh),
        in_specs=[
            pl.BlockSpec((1, c, hin, win), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hin, win), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, out_w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Wr (padded H, h)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Wc (w, W)
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(4 * n * c * out_h * out_w),
            bytes_accessed=int(2 * s_small.size * s_small.dtype.itemsize
                               + labels.size * 4),
            transcendentals=int(3 * n * c * out_h * out_w),
        ),
    )(s_small, t_small, labels, wr, wc)
    return out[:, :, 0, :3].sum(axis=(0, 1)), wr, wc


def _up_fwd(s_small, t_small, labels, out_h, out_w, temperature, alpha, beta,
            ignore_index, teacher_logit_clip, interpret):
    n = s_small.shape[0]
    sums, _, _ = _up_run_fwd(s_small, t_small, labels, out_h, out_w,
                             temperature, ignore_index, teacher_logit_clip,
                             interpret)
    denom = jnp.maximum(sums[1], 1.0)
    npix = float(n * out_h * out_w)
    task = sums[0] / denom
    kd = (temperature ** 2) * sums[2] / npix
    total = alpha * task + beta * kd
    return total, (task, kd), (s_small, t_small, labels, denom)


def _up_fwd_rule(s_small, t_small, labels, out_h, out_w, temperature, alpha,
                 beta, ignore_index, teacher_logit_clip, interpret):
    total, (task, kd), res = _up_fwd(s_small, t_small, labels, out_h, out_w,
                                     temperature, alpha, beta, ignore_index,
                                     teacher_logit_clip, interpret)
    return (total, task, kd), res


def _up_bwd_rule(out_h, out_w, temperature, alpha, beta, ignore_index,
                 teacher_logit_clip, interpret, res, cts):
    s_small, t_small, labels, denom = res
    g_total, g_task, g_kd = cts
    n, c, hin, win = s_small.shape
    npix = float(n * out_h * out_w)
    th = _pick_th(out_h)
    nh = pl.cdiv(out_h, th)
    wr = jnp.asarray(bilinear_matrix(hin, out_h))
    pad = nh * th - out_h
    if pad:
        wr = jnp.pad(wr, ((0, pad), (0, 0)))
    wc = jnp.asarray(bilinear_matrix(win, out_w).T)
    a_scale = (g_total * alpha + g_task) / denom
    k_scale = (g_total * beta + g_kd) * temperature / npix
    scalars = jnp.stack([jnp.float32(1.0),
                         a_scale.astype(jnp.float32),
                         k_scale.astype(jnp.float32)]).reshape(1, 3)
    kern = functools.partial(_up_bwd_kernel, C=c, T=float(temperature),
                             th=th, H=out_h, ignore_index=ignore_index,
                             t_clip=float(teacher_logit_clip), hin=hin)
    ds = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(s_small.shape, s_small.dtype),
        grid=(n, nh),
        in_specs=[
            pl.BlockSpec((1, c, hin, win), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hin, win), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, out_w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        # output revisited across j: accumulate tile contributions
        out_specs=pl.BlockSpec((1, c, hin, win), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(6 * n * c * out_h * out_w),
            bytes_accessed=int(3 * s_small.size * s_small.dtype.itemsize),
            transcendentals=int(3 * n * c * out_h * out_w),
        ),
    )(s_small, t_small, labels, wr, wc, scalars)
    return ds, jnp.zeros_like(t_small), None


fused_ce_kl_loss_upsampled.defvjp(_up_fwd_rule, _up_bwd_rule)
