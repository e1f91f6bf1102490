"""Fused depthwise-separable conv Pallas kernel (SURVEY.md §7 step 10).

Why: the cheap-conv student is built from depthwise(kxk) + pointwise(1x1)
pairs (BASELINE.json:5). Stock XLA materializes the depthwise output to HBM
between the two convs; the depthwise is memory-bound (arithmetic intensity
~k², SURVEY.md §7 "depthwise conv on TPU is memory-bound"). This kernel keeps
the depthwise result in VMEM and feeds it straight into the pointwise matmul
on the MXU — one HBM read of x, one HBM write of y per tile.

Layout: grid = (N, H/TH). The input row-window (TH + 2p halo rows) is an
overlapping block via `pl.Element` indexing, so Mosaic pipelines the HBM->VMEM
fetch of tile j+1 under the compute of tile j automatically (no manual DMA).
Per step: unrolled k² shifted multiply-accumulate on the VPU (f32 accum),
then (TH*W, C) @ (C, Cout) on the MXU, write the (TH, W, Cout) tile.

Scope: stride 1, square kernel, 'same' torch padding p = d*(k-1)//2 — the
shape-preserving separable blocks that dominate the student (ASPP separable,
decoder, middle-flow Xception). Stride-2 / valid cases fall back to XLA convs
(ops.conv). The forward is wrapped in jax.custom_vjp; the backward uses XLA
convs (correct gradients, standard perf), so the kernel is safe in the train
step.

Correctness pinned by tests/test_pallas.py (interpreter mode vs ops.conv2d);
real-hardware parity + speed exercised on the TPU by bench_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv import depthwise_conv2d


def supports_fused_separable(*, stride, padding, dilation, kernel_size) -> bool:
    def one(v):
        return v[0] if isinstance(v, (tuple, list)) else v

    k, s, d, p = one(kernel_size), one(stride), one(dilation), one(padding)
    kh = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
    kw = kernel_size if isinstance(kernel_size, int) else kernel_size[1]
    # odd k only: even k with p = d*(k-1)//2 is not shape-preserving and the
    # kernel's tap slice would overrun the halo window by one row
    return s == 1 and kh == kw and k >= 3 and k % 2 == 1 and p == d * (k - 1) // 2


def _pick_tile_h(h: int, w: int, c: int, itemsize: int,
                 budget_bytes: int = 2 * 1024 * 1024) -> int:
    """Largest row-tile fitting the VMEM budget. Accounts for the f32
    accumulator (th*w*c*4), the double-buffered input window and the output
    tile (measured: Mosaic's scoped-vmem ceiling is 16MB; stay well under)."""
    def usage(th):
        acc = th * w * c * 4
        inp = 2 * (th + 12) * (w + 12) * c * itemsize  # halo + double buffer
        return acc + inp

    th = h
    while th > 4 and usage(th) > budget_bytes:
        th = (th + 1) // 2
    return max(th, 1)


def _kernel(x_ref, dw_ref, pw_ref, o_ref, acc_ref, *, k, dil, th, w, cin):
    """x block: (1, th+2p, w+2p, cin); dw: (k*k, cin); pw: (cin, cout);
    out block: (1, th, w, cout); acc scratch: (th*w, cin) f32."""
    x = x_ref[0]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for ki in range(k):
        for kj in range(k):
            tap = x[ki * dil:ki * dil + th, kj * dil:kj * dil + w, :]
            acc_ref[...] += (tap.astype(jnp.float32)
                             * dw_ref[ki * k + kj, :]).reshape(th * w, cin)
    out = jnp.dot(acc_ref[...], pw_ref[...].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(th, w, -1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_separable_conv(x, dw, pw, dilation: int = 1, tile_h: int | None = None,
                         interpret: bool = False):
    """y = pointwise(depthwise(x)); x NHWC, dw (kh,kw,1,C), pw (1,1,C,Co).

    Shape-preserving (stride 1, torch padding p = d*(k-1)//2). Gradients via
    XLA convs (custom_vjp with recompute — no depthwise intermediate stored).
    """
    return _fwd_impl(x, dw, pw, dilation, tile_h, interpret)


def _fwd_impl(x, dw, pw, dilation, tile_h, interpret):
    n, h, w, c = x.shape
    kh, kw, _, _ = dw.shape
    co = pw.shape[-1]
    assert kh == kw, "square kernels only"
    p = dilation * (kh - 1) // 2
    th = tile_h or _pick_tile_h(h, w, c, x.dtype.itemsize)
    th = min(th, h)
    n_tiles = pl.cdiv(h, th)
    extra = n_tiles * th - h
    xp = jnp.pad(x, ((0, 0), (p, p + extra), (p, p), (0, 0)))

    dw2 = dw.reshape(kh * kw, c)
    pw2 = pw.reshape(c, co)

    out = pl.pallas_call(
        functools.partial(_kernel, k=kh, dil=dilation, th=th, w=w, cin=c),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * th, w, co), x.dtype),
        grid=(n, n_tiles),
        in_specs=[
            # overlapping halo window: element-offset row indexing (Mosaic
            # requires all dims Element if any is)
            pl.BlockSpec((pl.Element(1), pl.Element(th + 2 * p),
                          pl.Element(w + 2 * p), pl.Element(c)),
                         lambda i, j: (i, j * th, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, co), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th * w, c), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n * h * w * c * (kh * kw + co)),
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + n * h * w * co * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(xp, dw2, pw2)
    return out[:, :h] if extra else out


def _fwd(x, dw, pw, dilation, tile_h, interpret):
    y = _fwd_impl(x, dw, pw, dilation, tile_h, interpret)
    return y, (x, dw, pw)


def _bwd(dilation, tile_h, interpret, res, g):
    """Backward via XLA convs: dL/dx, dL/ddw, dL/dpw."""
    x, dw, pw = res
    n, h, w, c = x.shape
    kh = dw.shape[0]
    co = pw.shape[-1]
    p = dilation * (kh - 1) // 2
    g = g.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    dw32 = dw.astype(jnp.float32)
    pw32 = pw.astype(jnp.float32)

    # depthwise output (recompute; cheap and avoids storing it)
    mid = depthwise_conv2d(x32, dw32, padding=p, dilation=dilation)

    # pointwise grads
    g2 = g.reshape(-1, co)
    dpw = (mid.reshape(-1, c).T @ g2).reshape(1, 1, c, co)
    dmid = (g2 @ pw32.reshape(c, co).T).reshape(n, h, w, c)

    # depthwise input grad: correlate dmid with spatially flipped kernel
    dx = depthwise_conv2d(dmid, dw32[::-1, ::-1], padding=p, dilation=dilation)

    # depthwise weight grad: per-tap reduction of x * dmid
    xp = jnp.pad(x32, ((0, 0), (p, p), (p, p), (0, 0)))
    taps = []
    for ki in range(kh):
        for kj in range(kh):
            tap = jax.lax.dynamic_slice(
                xp, (0, ki * dilation, kj * dilation, 0), (n, h, w, c))
            taps.append(jnp.sum(tap * dmid, axis=(0, 1, 2)))
    ddw = jnp.stack(taps).reshape(kh, kh, 1, c)

    return dx.astype(x.dtype), ddw.astype(dw.dtype), dpw.astype(pw.dtype)


fused_separable_conv.defvjp(_fwd, _bwd)
