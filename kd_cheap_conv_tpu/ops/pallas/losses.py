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


def _run_bwd(s, t, labels, scalars, temperature, ignore_index,
             teacher_logit_clip, interpret):
    n, c, h, w = s.shape
    th = _pick_th(h)
    nh = pl.cdiv(h, th)
    kern = functools.partial(_bwd_kernel, C=c, T=float(temperature), th=th,
                             H=h, ignore_index=ignore_index,
                             t_clip=float(teacher_logit_clip))
    return pl.pallas_call(
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


def _grad_scales(cts, denom, alpha, beta, temperature, npix):
    """Fold the aux outputs' cotangents into per-term grad scales."""
    g_total, g_task, g_kd = cts
    a_scale = (g_total * alpha + g_task) / denom
    k_scale = (g_total * beta + g_kd) * temperature / npix
    return jnp.stack([jnp.float32(1.0),
                      a_scale.astype(jnp.float32),
                      k_scale.astype(jnp.float32)]).reshape(1, 3)


def _bwd_rule(temperature, alpha, beta, ignore_index, teacher_logit_clip,
              interpret, res, cts):
    s, t, labels, denom = res
    n, c, h, w = s.shape
    scalars = _grad_scales(cts, denom, alpha, beta, temperature,
                           float(n * h * w))
    ds = _run_bwd(s, t, labels, scalars, temperature, ignore_index,
                  teacher_logit_clip, interpret)
    dt = jnp.zeros_like(t)  # teacher side is stop-gradient by construction
    return ds, dt, None


fused_ce_kl_loss.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# SPMD variant: the same kernels wrapped in shard_map over a 1-D data mesh.
# pallas_call has no GSPMD partitioning rule, so under plain jit on a mesh
# XLA would all-gather the batch-sharded logits before the kernel; shard_map
# runs the kernel per-shard and psums the three partial sums (forward) —
# the backward is embarrassingly parallel given the global denominators
# (SURVEY.md §2.5 "fused into the single jitted train step ... ICI
# collectives").
# ---------------------------------------------------------------------------


def _shmap(fn, mesh, in_specs, out_specs):
    from jax import shard_map

    # jax.shard_map (v0.8+) renamed check_rep -> check_vma
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_ce_kl_loss_sharded(s, t, labels, mesh, temperature: float = 4.0,
                             alpha: float = 0.5, beta: float = 0.5,
                             ignore_index: int = 255,
                             teacher_logit_clip: float = 3e4,
                             interpret: bool = False):
    """fused_ce_kl_loss over batch-sharded (N,C,H,W) logits on `mesh`
    (1-D data mesh). Same semantics/returns as the single-chip version."""
    total, (task, kd), _ = _sh_fwd(s, t, labels, mesh, temperature, alpha,
                                   beta, ignore_index, teacher_logit_clip,
                                   interpret)
    return total, task, kd


def _sh_fwd(s, t, labels, mesh, temperature, alpha, beta, ignore_index,
            teacher_logit_clip, interpret):
    from jax.sharding import PartitionSpec as P

    _note_sharded_trace()
    n, c, h, w = s.shape
    axis = mesh.axis_names[0]

    def local(s, t, lbl):
        sums = _run_fwd(s, t, lbl, temperature, ignore_index,
                        teacher_logit_clip, interpret)
        return jax.lax.psum(sums, axis)

    sums = _shmap(local, mesh, (P(axis), P(axis), P(axis)), P())(s, t, labels)
    denom = jnp.maximum(sums[1], 1.0)
    npix = float(n * h * w)  # global
    task = sums[0] / denom
    kd = (temperature ** 2) * sums[2] / npix
    total = alpha * task + beta * kd
    return total, (task, kd), (s, t, labels, denom)


def _sh_fwd_rule(s, t, labels, mesh, temperature, alpha, beta, ignore_index,
                 teacher_logit_clip, interpret):
    total, (task, kd), res = _sh_fwd(s, t, labels, mesh, temperature, alpha,
                                     beta, ignore_index, teacher_logit_clip,
                                     interpret)
    return (total, task, kd), res


def _sh_bwd_rule(mesh, temperature, alpha, beta, ignore_index,
                 teacher_logit_clip, interpret, res, cts):
    from jax.sharding import PartitionSpec as P

    s, t, labels, denom = res
    n, c, h, w = s.shape
    axis = mesh.axis_names[0]
    scalars = _grad_scales(cts, denom, alpha, beta, temperature,
                           float(n * h * w))

    def local(s, t, lbl, scal):
        return _run_bwd(s, t, lbl, scal, temperature, ignore_index,
                        teacher_logit_clip, interpret)

    ds = _shmap(local, mesh, (P(axis), P(axis), P(axis), P()),
                P(axis))(s, t, labels, scalars)
    return ds, jnp.zeros_like(t), None


fused_ce_kl_loss_sharded.defvjp(_sh_fwd_rule, _sh_bwd_rule)


# ---------------------------------------------------------------------------
# Upsample-fused variant: CE+KL over BILINEARLY UPSAMPLED logits without ever
# materializing the full-res logits (BASELINE.json:5 "decoder bilinear
# upsample"). v2 design (round 2 — v1 unrolled C per-class 2D matmuls and
# lost to the saved HBM traffic at 513²):
#
#   * the row upsample for ALL classes is ONE block-diagonal matmul
#     BD_j (C·th, C·nw) @ X (C·nw, w), where nw is the static input-row
#     window a th-row output tile depends on (~th/scale + 2);
#   * the column upsample is one (C·th, w) @ Wc (w, W) matmul;
#   * input windows are pre-gathered XLA-side into (N, nh, C, nw, w) with
#     STATIC starts (the bilinear map is shape-only), so plain blocked
#     BlockSpecs drive the kernel — no manual DMA;
#   * backward emits per-tile window grads (no overlap hazard) that XLA
#     scatter-adds back with static dynamic_update_slices.
#
# beta == 0 statically skips every teacher/KL term — the same kernel then
# serves the PLAIN supervised CE path, whose jnp gather-CE costs ~59ms/step
# at b16/513² (profiled round 2).
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


def _window_tables(hin: int, out_h: int, th: int, C: int):
    """Static row-window tables for th-row output tiles of a bilinear
    (hin -> out_h) upsample: each tile j reads input rows
    [starts[j], starts[j]+nw) and applies the block-diagonal matrix
    BD[j] (C*th, C*nw) to upsample ALL classes in one matmul."""
    m = bilinear_matrix(hin, out_h)  # (H, hin)
    nh = -(-out_h // th)
    pad = nh * th - out_h
    if pad:
        m = np.concatenate([m, np.zeros((pad, hin), np.float32)], 0)
    starts, spans = [], []
    for j in range(nh):
        rows = m[j * th:(j + 1) * th]
        nz = np.nonzero(rows.any(axis=0))[0]
        lo = int(nz[0]) if nz.size else 0
        hi = int(nz[-1]) if nz.size else 0
        starts.append(lo)
        spans.append(hi - lo + 1)
    nw = min(max(spans), hin)
    starts = [min(s, hin - nw) for s in starts]
    bd = np.zeros((nh, C * th, C * nw), np.float32)
    for j in range(nh):
        blk = m[j * th:(j + 1) * th, starts[j]:starts[j] + nw]
        for c in range(C):
            bd[j, c * th:(c + 1) * th, c * nw:(c + 1) * nw] = blk
    return starts, nw, bd


def _gather_windows(x, starts: list[int], nw: int):
    """(N, C, h, w) -> (N, nh, C, nw, w) with STATIC row starts."""
    return jnp.stack([jax.lax.slice_in_dim(x, s, s + nw, axis=2)
                      for s in starts], axis=1)


def _up2_tile(ref, bd, wc, C, nw, clip):
    """Upsampled class-major tile: BD @ (X @ Wc) -> (C, th, W) f32.

    The two matmuls run in the logits dtype (bf16 on TPU — the logits were
    computed in bf16 upstream, so this loses nothing; f32 MXU runs at a
    fraction of bf16 rate and these dots burn ~54 GFLOP/step at b16/513²).
    Accumulation stays f32."""
    mdt = ref.dtype if ref.dtype == jnp.bfloat16 else jnp.float32
    x = ref[0, 0].astype(jnp.float32)            # (C, nw, w)
    if clip:
        x = jnp.clip(x, -clip, clip)
    xs = x.reshape(C * nw, x.shape[-1])          # contiguous major merge
    inner = jnp.dot(xs.astype(mdt), wc.astype(mdt),
                    preferred_element_type=jnp.float32)
    up = jnp.dot(bd.astype(mdt), inner.astype(mdt),
                 preferred_element_type=jnp.float32)   # (C*th, W)
    th = bd.shape[0] // C
    return up.reshape(C, th, up.shape[-1])       # contiguous major split


def _celk_fwd_tile(s3, t3, lbl, j, th, H, T, ignore_index):
    """Shared CE(+KL) partial-sum tile from class-major (C, th, W) logits.
    t3 None -> CE only (kl partial = 0)."""
    row = jax.lax.broadcasted_iota(jnp.int32, lbl.shape, 0) + j * th
    in_bounds = (row < H)
    valid = in_bounds & (lbl != ignore_index)

    max_s = jnp.max(s3, axis=0)
    lse_s = max_s + jnp.log(jnp.sum(jnp.exp(s3 - max_s), axis=0))
    cls = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 0)
    onehot = (cls == lbl[None]).astype(jnp.float32)
    nll = lse_s - jnp.sum(s3 * onehot, axis=0)

    if t3 is not None:
        sT = s3 / T
        tT = t3 / T
        max_sT = jnp.max(sT, axis=0)
        lse_sT = max_sT + jnp.log(jnp.sum(jnp.exp(sT - max_sT), axis=0))
        max_tT = jnp.max(tT, axis=0)
        lse_tT = max_tT + jnp.log(jnp.sum(jnp.exp(tT - max_tT), axis=0))
        log_p_t = jnp.maximum(tT - lse_tT[None], _NEG_CLAMP)
        log_p_s = sT - lse_sT[None]
        kl = jnp.sum(jnp.exp(log_p_t) * (log_p_t - log_p_s), axis=0)
    else:
        kl = jnp.zeros_like(nll)

    vmask = valid.astype(jnp.float32)
    bmask = in_bounds.astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = (r == 0)
    return (jnp.where(row0 & (c0 == 0), jnp.sum(nll * vmask), 0.0)
            + jnp.where(row0 & (c0 == 1), jnp.sum(vmask), 0.0)
            + jnp.where(row0 & (c0 == 2), jnp.sum(kl * bmask), 0.0))


def _celk_grad_tile(s3, t3, lbl, j, th, H, T, ignore_index, a_scale, k_scale):
    """Shared d(total)/d(s3) for class-major (C, th, W) logits."""
    row = jax.lax.broadcasted_iota(jnp.int32, lbl.shape, 0) + j * th
    in_bounds = (row < H).astype(jnp.float32)
    valid = ((row < H) & (lbl != ignore_index)).astype(jnp.float32)

    max_s = jnp.max(s3, axis=0)
    e1 = jnp.exp(s3 - max_s[None])
    p1 = e1 / jnp.sum(e1, axis=0)[None]
    cls = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 0)
    onehot = (cls == lbl[None]).astype(jnp.float32)
    g = a_scale * (p1 - onehot) * valid[None]
    if t3 is not None:
        sT = s3 / T
        tT = t3 / T
        eS = jnp.exp(sT - jnp.max(sT, axis=0)[None])
        pS = eS / jnp.sum(eS, axis=0)[None]
        eT = jnp.exp(tT - jnp.max(tT, axis=0)[None])
        pT = eT / jnp.sum(eT, axis=0)[None]
        g = g + k_scale * (pS - pT) * in_bounds[None]
    return g


def _up2_fwd_kernel_kl(s_ref, t_ref, lbl_ref, bd_ref, wc_ref, out_ref, *,
                       C, T, th, nw, H, ignore_index, t_clip):
    j = pl.program_id(1)
    bd = bd_ref[0]
    wc = wc_ref[...]
    s3 = _up2_tile(s_ref, bd, wc, C, nw, 0.0)
    t3 = _up2_tile(t_ref, bd, wc, C, nw, t_clip)
    out_ref[0, 0] = _celk_fwd_tile(s3, t3, lbl_ref[0], j, th, H, T,
                                   ignore_index)


def _up2_fwd_kernel_ce(s_ref, lbl_ref, bd_ref, wc_ref, out_ref, *,
                       C, T, th, nw, H, ignore_index, t_clip):
    j = pl.program_id(1)
    s3 = _up2_tile(s_ref, bd_ref[0], wc_ref[...], C, nw, 0.0)
    out_ref[0, 0] = _celk_fwd_tile(s3, None, lbl_ref[0], j, th, H, T,
                                   ignore_index)


def _up2_bwd_kernel_kl(s_ref, t_ref, lbl_ref, bd_ref, bdt_ref, wc_ref,
                       wct_ref, scal_ref, dwin_ref, *, C, T, th, nw, H,
                       ignore_index, t_clip):
    j = pl.program_id(1)
    bd = bd_ref[0]
    wc = wc_ref[...]
    s3 = _up2_tile(s_ref, bd, wc, C, nw, 0.0)
    t3 = _up2_tile(t_ref, bd, wc, C, nw, t_clip)
    g = _celk_grad_tile(s3, t3, lbl_ref[0], j, th, H, T, ignore_index,
                        scal_ref[0, 1], scal_ref[0, 2])
    g2 = g.reshape(C * th, g.shape[-1])
    mdt = s_ref.dtype if s_ref.dtype == jnp.bfloat16 else jnp.float32
    dxs = jnp.dot(bdt_ref[0].astype(mdt), g2.astype(mdt),
                  preferred_element_type=jnp.float32)
    dwin = jnp.dot(dxs.astype(mdt), wct_ref[...].astype(mdt),
                   preferred_element_type=jnp.float32)
    dwin_ref[0, 0] = dwin.reshape(C, nw, dwin.shape[-1])


def _up2_bwd_kernel_ce(s_ref, lbl_ref, bd_ref, bdt_ref, wc_ref, wct_ref,
                       scal_ref, dwin_ref, *, C, T, th, nw, H,
                       ignore_index, t_clip):
    j = pl.program_id(1)
    s3 = _up2_tile(s_ref, bd_ref[0], wc_ref[...], C, nw, 0.0)
    g = _celk_grad_tile(s3, None, lbl_ref[0], j, th, H, T, ignore_index,
                        scal_ref[0, 1], scal_ref[0, 2])
    g2 = g.reshape(C * th, g.shape[-1])
    mdt = s_ref.dtype if s_ref.dtype == jnp.bfloat16 else jnp.float32
    dxs = jnp.dot(bdt_ref[0].astype(mdt), g2.astype(mdt),
                  preferred_element_type=jnp.float32)
    dwin = jnp.dot(dxs.astype(mdt), wct_ref[...].astype(mdt),
                   preferred_element_type=jnp.float32)
    dwin_ref[0, 0] = dwin.reshape(C, nw, dwin.shape[-1])


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


def _up2_prep(s_small, out_h, out_w):
    """Static tables + gather specs shared by fwd/bwd."""
    n, c, hin, win = s_small.shape
    th = _pick_th(out_h)
    nh = pl.cdiv(out_h, th)
    starts, nw, bd = _window_tables(hin, out_h, th, c)
    wc = bilinear_matrix(win, out_w).T                   # (w, W) np
    return n, c, hin, win, th, nh, starts, nw, bd, wc  # bd/wc stay numpy


def _up_run_fwd(s_small, t_small, labels, out_h, out_w, T, ignore_index,
                t_clip, interpret):
    n, c, hin, win, th, nh, starts, nw, bd, wc = _up2_prep(
        s_small, out_h, out_w)
    s_win = _gather_windows(s_small, starts, nw)
    with_kl = t_small is not None
    win_spec = pl.BlockSpec((1, 1, c, nw, win), lambda i, j: (i, j, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [win_spec]
    operands = [s_win]
    if with_kl:
        in_specs.append(win_spec)
        operands.append(_gather_windows(t_small, starts, nw))
    in_specs += [
        pl.BlockSpec((1, th, out_w), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c * th, c * nw), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Wc (w, W)
    ]
    operands += [labels, jnp.asarray(bd), jnp.asarray(wc)]
    kern = functools.partial(
        _up2_fwd_kernel_kl if with_kl else _up2_fwd_kernel_ce,
        C=c, T=float(T), th=th, nw=nw, H=out_h,
        ignore_index=ignore_index, t_clip=float(t_clip))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, nh, 8, 128), jnp.float32),
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n * nh * (c * th) * (c * nw + out_w)
                      + 10 * n * c * out_h * out_w),
            bytes_accessed=int((2 if with_kl else 1)
                               * n * nh * c * nw * win
                               * s_small.dtype.itemsize + labels.size * 4),
            transcendentals=int(3 * n * c * out_h * out_w),
        ),
    )(*operands)
    return out[:, :, 0, :3].sum(axis=(0, 1))


def _up_fwd(s_small, t_small, labels, out_h, out_w, temperature, alpha, beta,
            ignore_index, teacher_logit_clip, interpret):
    n = s_small.shape[0]
    with_kl = beta != 0.0
    sums = _up_run_fwd(s_small, t_small if with_kl else None, labels,
                       out_h, out_w, temperature, ignore_index,
                       teacher_logit_clip, interpret)
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


def _up_run_bwd(s_small, t_small, labels, scalars, out_h, out_w, temperature,
                ignore_index, teacher_logit_clip, interpret):
    """ds for the upsample-fused loss given folded grad scales. t_small None
    -> CE-only kernels."""
    n, c, hin, win, th, nh, starts, nw, bd, wc = _up2_prep(
        s_small, out_h, out_w)
    with_kl = t_small is not None
    bdt = jnp.asarray(np.ascontiguousarray(bd.transpose(0, 2, 1)))
    wct = jnp.asarray(np.ascontiguousarray(wc.T))

    win_spec = pl.BlockSpec((1, 1, c, nw, win), lambda i, j: (i, j, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [win_spec]
    operands = [_gather_windows(s_small, starts, nw)]
    if with_kl:
        in_specs.append(win_spec)
        operands.append(_gather_windows(t_small, starts, nw))
    in_specs += [
        pl.BlockSpec((1, th, out_w), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c * th, c * nw), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c * nw, c * th), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Wc
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Wc^T
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands += [labels, jnp.asarray(bd), bdt, jnp.asarray(wc), wct, scalars]
    kern = functools.partial(
        _up2_bwd_kernel_kl if with_kl else _up2_bwd_kernel_ce,
        C=c, T=float(temperature), th=th, nw=nw, H=out_h,
        ignore_index=ignore_index, t_clip=float(teacher_logit_clip))
    dwin = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, nh, c, nw, win), jnp.float32),
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, c, nw, win),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(4 * n * nh * (c * th) * (c * nw + out_w)
                      + 12 * n * c * out_h * out_w),
            bytes_accessed=int((3 if with_kl else 2)
                               * n * nh * c * nw * win * 4),
            transcendentals=int(3 * n * c * out_h * out_w),
        ),
    )(*operands)
    # scatter-add the (overlapping) window grads back — static starts, so
    # this unrolls to nh in-place dynamic_update_slices under jit
    ds = jnp.zeros((n, c, hin, win), jnp.float32)
    for j, s0 in enumerate(starts):
        cur = jax.lax.dynamic_slice_in_dim(ds, s0, nw, axis=2)
        ds = jax.lax.dynamic_update_slice_in_dim(ds, cur + dwin[:, j], s0,
                                                 axis=2)
    return ds.astype(s_small.dtype)


def _up_bwd_rule(out_h, out_w, temperature, alpha, beta, ignore_index,
                 teacher_logit_clip, interpret, res, cts):
    s_small, t_small, labels, denom = res
    n = s_small.shape[0]
    scalars = _grad_scales(cts, denom, alpha, beta, temperature,
                           float(n * out_h * out_w))
    ds = _up_run_bwd(s_small, t_small if beta != 0.0 else None, labels,
                     scalars, out_h, out_w, temperature, ignore_index,
                     teacher_logit_clip, interpret)
    return ds, jnp.zeros_like(t_small), None


fused_ce_kl_loss_upsampled.defvjp(_up_fwd_rule, _up_bwd_rule)


def fused_ce_loss_upsampled(s_small, labels, out_h: int, out_w: int,
                            ignore_index: int = 255,
                            interpret: bool = False, mesh=None):
    """Plain supervised CE over bilinearly-upsampled class-major logits —
    the reference hot loop's criterion (SURVEY.md §3.1) without ever
    materializing full-res logits. beta=0 statically removes every KL/teacher
    term from the kernels (the teacher operand isn't even passed). With a
    multi-device `mesh`, runs per-shard under shard_map (batch-sharded)."""
    if mesh is not None:
        total, task, _ = fused_ce_kl_loss_upsampled_sharded(
            s_small, s_small, labels, mesh, out_h, out_w, 1.0, 1.0, 0.0,
            ignore_index, 0.0, interpret)
        return task
    total, task, _ = fused_ce_kl_loss_upsampled(
        s_small, s_small, labels, out_h, out_w, 1.0, 1.0, 0.0,
        ignore_index, 0.0, interpret)
    return task


# ---------------------------------------------------------------------------
# SPMD upsample-fused variant: same shard_map pattern as
# fused_ce_kl_loss_sharded — the kernel (and its XLA-side window gather /
# scatter-add) runs per-shard on the batch-sharded head-resolution logits;
# only the three partial sums cross shards (psum). The backward is
# embarrassingly parallel given the global denominators.
# ---------------------------------------------------------------------------


# trace-time evidence counter: dryrun_multichip asserts the sharded fused
# path actually engaged (incremented when a sharded fwd is TRACED, which
# happens exactly when the jitted step routes through it)
_sharded_fused_traces = 0


def sharded_fused_trace_count() -> int:
    return _sharded_fused_traces


def _note_sharded_trace():
    global _sharded_fused_traces
    _sharded_fused_traces += 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10,
                                                    11))
def fused_ce_kl_loss_upsampled_sharded(s_small, t_small, labels, mesh,
                                       out_h: int, out_w: int,
                                       temperature: float = 4.0,
                                       alpha: float = 0.5, beta: float = 0.5,
                                       ignore_index: int = 255,
                                       teacher_logit_clip: float = 3e4,
                                       interpret: bool = False):
    """fused_ce_kl_loss_upsampled over batch-sharded logits on a 1-D data
    `mesh`. Same semantics/returns as the single-chip version."""
    total, (task, kd), _ = _up_sh_fwd(s_small, t_small, labels, mesh, out_h,
                                      out_w, temperature, alpha, beta,
                                      ignore_index, teacher_logit_clip,
                                      interpret)
    return total, task, kd


def _up_sh_fwd(s_small, t_small, labels, mesh, out_h, out_w, temperature,
               alpha, beta, ignore_index, teacher_logit_clip, interpret):
    from jax.sharding import PartitionSpec as P

    _note_sharded_trace()
    n = s_small.shape[0]  # global batch
    axis = mesh.axis_names[0]
    with_kl = beta != 0.0

    def local(s, t, lbl):
        sums = _up_run_fwd(s, t if with_kl else None, lbl, out_h, out_w,
                           temperature, ignore_index, teacher_logit_clip,
                           interpret)
        return jax.lax.psum(sums, axis)

    sums = _shmap(local, mesh, (P(axis), P(axis), P(axis)),
                  P())(s_small, t_small, labels)
    denom = jnp.maximum(sums[1], 1.0)
    npix = float(n * out_h * out_w)
    task = sums[0] / denom
    kd = (temperature ** 2) * sums[2] / npix
    total = alpha * task + beta * kd
    return total, (task, kd), (s_small, t_small, labels, denom)


def _up_sh_fwd_rule(s_small, t_small, labels, mesh, out_h, out_w, temperature,
                    alpha, beta, ignore_index, teacher_logit_clip, interpret):
    total, (task, kd), res = _up_sh_fwd(s_small, t_small, labels, mesh, out_h,
                                        out_w, temperature, alpha, beta,
                                        ignore_index, teacher_logit_clip,
                                        interpret)
    return (total, task, kd), res


def _up_sh_bwd_rule(mesh, out_h, out_w, temperature, alpha, beta,
                    ignore_index, teacher_logit_clip, interpret, res, cts):
    from jax.sharding import PartitionSpec as P

    s_small, t_small, labels, denom = res
    n = s_small.shape[0]
    axis = mesh.axis_names[0]
    with_kl = beta != 0.0
    scalars = _grad_scales(cts, denom, alpha, beta, temperature,
                           float(n * out_h * out_w))

    def local(s, t, lbl, scal):
        return _up_run_bwd(s, t if with_kl else None, lbl, scal, out_h,
                           out_w, temperature, ignore_index,
                           teacher_logit_clip, interpret)

    ds = _shmap(local, mesh, (P(axis), P(axis), P(axis), P()),
                P(axis))(s_small, t_small, labels, scalars)
    return ds, jnp.zeros_like(t_small), None


fused_ce_kl_loss_upsampled_sharded.defvjp(_up_sh_fwd_rule, _up_sh_bwd_rule)
