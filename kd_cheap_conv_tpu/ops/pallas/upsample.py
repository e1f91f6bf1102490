"""Pallas bilinear upsample in NHWC — the decoder's 33²→129² 4x resize.

Why: XLA lowers `jax.image.resize` to two dense dots and its layout
assignment runs the W-axis dot with w on lanes, materializing ~1.4 ms/step
of pure layout transposes around the dots at 129²xC256/b16 (round-5 xplane:
fusion.2414/.53 fwd + fusion.254/.249 bwd, teacher + student decoders).
Hand-written einsums get the same layouts back (KDCC_MM_UPSAMPLE round-4k
A/B: a wash) — only a kernel that reads AND writes NHWC natively can shed
the copies. Both interpolation axes run in one kernel:

  per output row r (block of BH_UP rows per grid cell):
      z_r = Σ_d  WROW[r, d] · x[hbase(j) + d]     (≤2 nonzero H-taps, VPU)
      y_r = Mw @ z_r                              ((Wo, Wi)@(Wi, C) MXU)

`hbase(j) = (j·bh·Hi)//Ho` is affine-ish in the grid index (integer
floor-div — supported in BlockSpec index maps); the input is pre-padded by
one top row + WH bottom rows so every window is in bounds, and the
host-built WROW weights fold the torch half-pixel clipping (ops.resize
`_halfpix_weights` semantics — parity pinned by tests/test_pallas_upsample).

The backward is the transposed interpolation, same structure with the axes
swapped: u_r = MwT @ gy_r for the rows of a WR-row window, then
gx[h] = Σ_r WCOL[h, r]·u_r.

Reference semantics: DeepLabV3+ decoder `F.interpolate(..., bilinear,
align_corners=False)` (SURVEY.md §2.1); numerically the same operator as
ops.resize.resize_bilinear.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import _CP, _mm

BH_UP = int(os.environ.get("KDCC_UP_BH", "8"))


def _halfpix_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) torch half-pixel bilinear matrix (numpy)."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    scale = n_in / n_out
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = (pos - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, n_in - 1)
    hi_c = np.clip(lo + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, lo_c), 1.0 - frac)
    np.add.at(m, (rows, hi_c), frac)
    return m


def _row_windows(mh: np.ndarray, bh: int, win: int, nblocks: int,
                 margin: int):
    """Pack the (n_out, n_in) H matrix into per-block relative windows:
    WROW (nblocks*bh, win) with WROW[r, d] = mh[r, base(r//bh) + d - margin],
    where base(j) = (j*bh*n_in)//n_out and `margin` top pad rows on the
    kernel input absorb taps below the base (the transposed matrix needs
    more than the forward's 1). Asserts the window covers every nonzero."""
    n_out, n_in = mh.shape
    w = np.zeros((nblocks * bh, win), np.float32)
    for r in range(n_out):
        base = (r // bh) * bh * n_in // n_out  # == index-map floor-div
        for d in range(win):
            src = base + d - margin            # padded row d maps to src
            if 0 <= src < n_in:
                w[r, d] = mh[r, src]
        nz = np.nonzero(mh[r])[0]
        assert nz.size == 0 or (nz.min() >= base - margin and
                                nz.max() <= base + win - margin - 1), \
            (r, base, nz)
    return w


def _k_up_fwd(x_ref, wr_ref, mw_ref, y_ref, *, bh):
    """x window (1, WH, Wi, C); per out row: H-lincomb then Mw matmul."""
    x = x_ref[0].astype(jnp.float32)                  # (WH, Wi, C)
    wr = wr_ref[...].astype(jnp.float32)              # (bh, WH)
    mw = mw_ref[...]                                  # (Wo, Wi)
    rows = []
    for i in range(bh):
        z = jnp.zeros(x.shape[1:], jnp.float32)
        for d in range(x.shape[0]):
            z = z + wr[i, d] * x[d]
        rows.append(_mm(mw, z, y_ref.dtype))          # (Wo, C)
    y_ref[0] = jnp.stack(rows, axis=0).astype(y_ref.dtype)


def _k_up_bwd(g_ref, wc_ref, mwt_ref, gx_ref, *, bh):
    """g window (1, WR, Wo, C); u_r = MwT @ g_r; gx row = WCOL lincomb."""
    g = g_ref[0]                                      # (WR, Wo, C)
    wc = wc_ref[...].astype(jnp.float32)              # (bh, WR)
    mwt = mwt_ref[...]                                # (Wi, Wo)
    u = [_mm(mwt, g[r].astype(jnp.float32), gx_ref.dtype)
         for r in range(g.shape[0])]                  # WR x (Wi, C)
    rows = []
    for i in range(bh):
        z = jnp.zeros(u[0].shape, jnp.float32)
        for r in range(len(u)):
            z = z + wc[i, r] * u[r]
        rows.append(z)
    gx_ref[0] = jnp.stack(rows, axis=0).astype(gx_ref.dtype)


def _pad_rows(x, top: int, bottom: int):
    return jnp.pad(x, ((0, 0), (top, bottom), (0, 0), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def resize_bilinear_up(x, size, bh: int = 0, interpret: bool = False):
    """NHWC half-pixel bilinear upsample via one Pallas kernel.

    x: (N, Hi, Wi, C); size: (Ho, Wo) with Ho >= Hi, Wo >= Wi. Returns
    (N, Ho, Wo, C) in x.dtype. Gradient is the exact transposed resize.
    """
    return _up_fwd(x, size, bh, interpret)[0]


def _up_fwd(x, size, bh, interpret):
    n, hi, wi, c = x.shape
    ho, wo = int(size[0]), int(size[1])
    bh = bh or BH_UP
    nh = pl.cdiv(ho, bh)
    # window: rows base(j)..base(j)+WH-1 of the 1-top-padded input cover
    # every tap of the block's bh output rows (see _row_windows assert)
    wh = int(np.ceil(bh * hi / ho)) + 3
    mh = _halfpix_np(hi, ho)
    mw = _halfpix_np(wi, wo)
    wrow = jnp.asarray(_row_windows(mh, bh, wh, nh, 1))
    mw_j = jnp.asarray(mw, x.dtype if x.dtype != jnp.float64 else jnp.float32)
    xp = _pad_rows(x, 1, max(0, wh + (nh - 1) * bh * hi // ho - hi - 1))

    y = pl.pallas_call(
        functools.partial(_k_up_fwd, bh=bh),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        grid=(n, nh),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(wh), pl.Element(wi),
                 pl.Element(c)),
                lambda i, j: (i, j * bh * hi // ho, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, wh), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mw.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wo, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret, compiler_params=_CP,
    )(xp, wrow, mw_j)
    return y, (n, hi, wi, c, ho, wo)


def _up_fwd_rule(x, size, bh, interpret):
    y, res = _up_fwd(x, size, bh, interpret)
    return y, res


def _up_bwd_rule(size, bh, interpret, res, gy):
    n, hi, wi, c, ho, wo = res
    bh = bh or BH_UP
    nhi = pl.cdiv(hi, bh)
    # transposed H interpolation: input row h draws from output rows in a
    # window reaching up to ~ho/(2*hi)+1 rows BELOW (j*bh*ho)//hi — a wider
    # top margin than the forward's 1 (see _row_windows margin math)
    mb = int(np.ceil(0.5 * ho / hi + 0.5)) + 1
    wr = int(np.ceil((bh + 1) * ho / hi)) + mb + 2
    mht = _halfpix_np(hi, ho).T                       # (hi, ho)
    mwt = _halfpix_np(wi, wo).T                       # (wi, wo)
    wcol = jnp.asarray(_row_windows(mht, bh, wr, nhi, mb))
    mwt_j = jnp.asarray(mwt,
                        gy.dtype if gy.dtype != jnp.float64 else jnp.float32)
    gp = _pad_rows(gy, mb, max(0, wr + (nhi - 1) * bh * ho // hi - ho - mb))

    gx = pl.pallas_call(
        functools.partial(_k_up_bwd, bh=bh),
        out_shape=jax.ShapeDtypeStruct((n, hi, wi, c), gy.dtype),
        grid=(n, nhi),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(wr), pl.Element(wo),
                 pl.Element(c)),
                lambda i, j: (i, j * bh * ho // hi, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, wr), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mwt.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wi, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret, compiler_params=_CP,
    )(gp, wcol, mwt_j)
    return (gx,)


resize_bilinear_up.defvjp(_up_fwd_rule, _up_bwd_rule)


# trace-time evidence counter (dryrun_multichip engagement assertions, same
# pattern as ops.pallas.losses/irchain)
_up_traces = 0


def upsample_trace_count() -> int:
    return _up_traces


def resize_bilinear_up_sharded(x, size, mesh, interpret: bool = False):
    """resize_bilinear_up over a batch-sharded x on a 1-D `mesh` (pallas_call
    has no GSPMD partitioning rule): per-image op, so shard_map over N is
    exact. Caller guarantees N % mesh.size == 0."""
    global _up_traces
    _up_traces += 1
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(xs):
        return resize_bilinear_up(xs, size, 0, interpret)

    return shard_map(local, mesh=mesh, in_specs=(P(axis),),
                     out_specs=P(axis), check_vma=False)(x)


def pallas_upsample_ok(shape, size) -> bool:
    """Structural guard: NHWC, C a lane multiple, genuine upsample, and a
    VMEM-friendly input window (the kernel holds (WH, Wi, C) per cell)."""
    if len(shape) != 4:
        return False
    n, hi, wi, c = shape
    ho, wo = int(size[0]), int(size[1])
    return (c % 128 == 0 and ho >= hi and wo >= wi and (ho, wo) != (hi, wi)
            and wi * c * 4 * 8 <= 16 * 1024 * 1024 and hi >= 2 and wi >= 2)
