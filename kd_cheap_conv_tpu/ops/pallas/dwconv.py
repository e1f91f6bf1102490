"""TPU Pallas depthwise conv (NHWC, stride 1, 'same', any dilation) with a
full Pallas backward (dx and dk).

Why: XLA:TPU lowers training-mode depthwise convolutions (feature_group_count
== C) through a batch-group rewrite that moves H into the batch dimension and
surrounds the op with giant pad/copy/select fusions — measured 12-27x off the
memory roofline at DeepLab shapes (e.g. fwd+bwd of a 3x3 dw at
(4,385,385,64) bf16: 4.6 ms vs 0.4 ms roofline; round-2 profile of config #3
shows ~55 ms/step of pure pad/copy around these ops). The depthwise conv has
no channel contraction, so it is a pure VPU shifted-multiply-accumulate —
exactly what a Pallas kernel does directly.

Layout: plain NHWC — W in sublanes, C in lanes (C is 64..728 at the shapes
this serves, so lane utilization is high; the low-C stem case is handled by
ops.pallas.stem's channel-sublane layout instead). Grid (N, ceil(H/TH)); the
input arrives pre-padded by p = d*(k-1)//2 rows on both H edges (one cheap
XLA pad — 2p rows, not a full-tensor round trip), so every Element-indexed
halo window (TH + 2p rows starting at j*TH) is in bounds. W edges are
handled in-kernel by zero-filling static shifts; H rows beyond the true
height are masked with where() (trailing-block reads may contain garbage).

Backward:
  dx = depthwise conv of g with the spatially flipped kernel — same kernel
       structure, one more Pallas pass over g (padded by p rows).
  dk[c, t] = sum over pixels of x_tap_t * g — accumulated as a (C, 128)
       grid-carry tile (cols 0..k²), like ops.pallas.stem's weight grads.

Reference semantics: torch Conv2d(groups=C) as used by MobileNetV2 inverted
residuals and DeepLab separable convs (SURVEY.md §2.1/§2.2); parity vs
ops.conv.depthwise_conv2d in tests/test_pallas_dwconv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def supports_pallas_dw(*, stride, padding, dilation, kernel_size) -> bool:
    def one(v):
        return v[0] if isinstance(v, (tuple, list)) else v

    k, s, d, p = (one(kernel_size), one(stride), one(dilation), one(padding))
    kh = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
    kw = kernel_size if isinstance(kernel_size, int) else kernel_size[1]
    return s == 1 and kh == kw and k >= 3 and k % 2 == 1 and p == d * (k - 1) // 2


def _shift_w(x, o):
    """Shift x (rows, W, C) along W by tap offset o with zero fill:
    out[:, w] = x[:, w + o] — a circular sublane rotate + edge mask
    (cheaper than materializing concat slices)."""
    if o == 0:
        return x
    W = x.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    # pltpu.roll is circular with non-negative shift: out[w] = x[w - s]
    s = (-o) % W
    r = pltpu.roll(x, s, axis=1)
    if o > 0:
        return jnp.where(sub < W - o, r, 0.0)
    return jnp.where(sub >= -o, r, 0.0)


def _taps(h, kr, k, d, th, flip=False):
    """k x k depthwise MAC over halo rows h (th + 2p, W, C) f32 with
    per-channel kernel kr (C, k*k) -> (th, W, C) f32."""
    p = d * (k - 1) // 2
    acc = jnp.zeros((th,) + h.shape[1:], jnp.float32)
    for dh in range(k):
        rows = h[dh * d:dh * d + th]
        for dw in range(k):
            t = (k * k - 1) - (dh * k + dw) if flip else dh * k + dw
            sh = _shift_w(rows, d * dw - p)
            acc = acc + sh * kr[:, t][None, None, :]
    return acc


def _k_dw_fwd(x_ref, k_ref, y_ref, *, k, d, th):
    """x block (1, th+2p, W, C) halo starting at padded row j*th (= global
    j*th - p); y block (1, th, W, C). The input buffer is zero-padded to
    nh*th + 2p rows, so every halo read is real zeros — no masking."""
    x = x_ref[0].astype(jnp.float32)
    y = _taps(x, k_ref[...].astype(jnp.float32), k, d, th)
    y_ref[0] = y.astype(y_ref.dtype)


def _k_dw_dx(g_ref, k_ref, gx_ref, *, k, d, th):
    """dx = dw-conv of g with the flipped kernel (same padded-buffer
    contract as _k_dw_fwd)."""
    g = g_ref[0].astype(jnp.float32)
    gx = _taps(g, k_ref[...].astype(jnp.float32), k, d, th, flip=True)
    gx_ref[0] = gx.astype(gx_ref.dtype)


def _k_dw_dk(x_ref, g_ref, dk_ref, *, k, d, th, H):
    """dk[c, dh*k+dw] = sum_{pix} x[tap] * g. x halo (1, th+2p, W, C);
    g block (1, th, W, C); dk (kk_pad, C) f32 grid-carried accumulator."""
    i, j = pl.program_id(0), pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    p = d * (k - 1) // 2
    # x halo reads hit the zero-padded buffer; only the blocked g read of a
    # trailing partial block may contain garbage rows
    rg = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0)
    g = jnp.where(rg + j * th < H, g, 0.0)

    C = x.shape[2]
    rows_list = []
    for dh in range(k):
        rows = x[dh * d:dh * d + th]
        for dw in range(k):
            sh = _shift_w(rows, d * dw - p)
            rows_list.append(jnp.sum(sh * g, axis=(0, 1)))  # (C,)
    tile = jnp.stack(rows_list, axis=0)              # (kk, C)
    pad = dk_ref.shape[0] - tile.shape[0]
    tile = jnp.pad(tile, ((0, pad), (0, 0)))
    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        dk_ref[...] = tile

    @pl.when(jnp.logical_not(first))
    def _():
        dk_ref[...] += tile


def _pick_th(h, w, c, itemsize):
    """Row tile: bound in-flight VMEM (halo window x2 buffers + f32 acc +
    out tile) to ~12MB."""
    for th in (64, 32, 16, 8):
        use = (2 * (th + 12) * w * c * itemsize    # halo, double-buffered
               + th * w * c * 4                    # f32 acc
               + 2 * th * w * c * itemsize)        # out (+buffer)
        if use <= 12 * 1024 * 1024:
            return th
    return 8


def _run_fwd(xp, kr, k, d, H, th, interpret):
    """xp (N, H+2p, W, C) H-padded input; kr (C, kk). Returns y (N,H,W,C)."""
    n, hp, w, c = xp.shape
    p = d * (k - 1) // 2
    nh = pl.cdiv(H, th)
    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2 * p), pl.Element(w),
         pl.Element(c)),
        lambda i, j: (i, j * th, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_k_dw_fwd, k=k, d=d, th=th),
        out_shape=jax.ShapeDtypeStruct((n, H, w, c), xp.dtype),
        grid=(n, nh),
        in_specs=[halo,
                  pl.BlockSpec((c, kr.shape[1]), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(xp, kr)


def _run_dk(xp, g, k, d, H, th, interpret):
    n, hp, w, c = xp.shape
    p = d * (k - 1) // 2
    nh = pl.cdiv(H, th)
    kk = k * k
    kk_pad = ((kk + 7) // 8) * 8
    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2 * p), pl.Element(w),
         pl.Element(c)),
        lambda i, j: (i, j * th, 0, 0),
        memory_space=pltpu.VMEM)
    dk = pl.pallas_call(
        functools.partial(_k_dw_dk, k=k, d=d, th=th, H=H),
        out_shape=jax.ShapeDtypeStruct((kk_pad, c), jnp.float32),
        grid=(n, nh),
        in_specs=[halo,
                  pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((kk_pad, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(xp, g)
    return dk[:kk]


def _pad_h(x, p, th):
    """Zero-pad H by p on top and to nh*th + p past the data on the bottom,
    so every (th + 2p)-row Element window reads initialized memory."""
    h = x.shape[1]
    nh = pl.cdiv(h, th)
    return jnp.pad(x, ((0, 0), (p, nh * th + p - h), (0, 0), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def depthwise_conv2d_pallas(x, kr, k: int, dilation: int = 1,
                            interpret: bool = False):
    """Depthwise kxk stride-1 'same' conv, NHWC.

    x (N, H, W, C); kr (C, k*k) per-channel taps in row-major [dh*k + dw]
    order (HWIO (k,k,1,C) kernels reshape via kv[:, :, 0, :] -> transpose).
    """
    p = dilation * (k - 1) // 2
    th = _pick_th(x.shape[1], x.shape[2], x.shape[3], x.dtype.itemsize)
    return _run_fwd(_pad_h(x, p, th), kr, k, dilation, x.shape[1], th,
                    interpret)


def _dw_fwd_rule(x, kr, k, dilation, interpret):
    p = dilation * (k - 1) // 2
    th = _pick_th(x.shape[1], x.shape[2], x.shape[3], x.dtype.itemsize)
    xp = _pad_h(x, p, th)
    y = _run_fwd(xp, kr, k, dilation, x.shape[1], th, interpret)
    return y, (xp, kr)


def _dw_bwd_rule(k, dilation, interpret, res, g):
    xp, kr = res
    p = dilation * (k - 1) // 2
    H = g.shape[1]
    th = _pick_th(H, xp.shape[2], xp.shape[3], xp.dtype.itemsize)
    gp = _pad_h(g, p, th)
    # dx: conv of g with flipped kernel (run through the same fwd driver
    # with flip inside the kernel)
    n, hp, w, c = gp.shape
    nh = pl.cdiv(H, th)
    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2 * p), pl.Element(w),
         pl.Element(c)),
        lambda i, j: (i, j * th, 0, 0),
        memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_k_dw_dx, k=k, d=dilation, th=th),
        out_shape=jax.ShapeDtypeStruct((n, H, w, c), gp.dtype),
        grid=(n, nh),
        in_specs=[halo,
                  pl.BlockSpec((c, kr.shape[1]), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(gp, kr)
    dk = _run_dk(xp, g, k, dilation, H, th, interpret)
    return dx, jnp.transpose(dk, (1, 0)).astype(kr.dtype)


depthwise_conv2d_pallas.defvjp(_dw_fwd_rule, _dw_bwd_rule)


def dw_kernel_to_taps(kv):
    """HWIO depthwise kernel (k, k, 1, C) -> (C, k*k) tap matrix."""
    k = kv.shape[0]
    return jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(kv.shape[3],
                                                            k * k)
