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


def _taps_win(wins, kr, k, d, th, flip=False):
    """k x k depthwise MAC from k pre-shifted halo windows.

    wins[dw] is a (th + 2p, W, C) f32 window of the W-and-H zero-padded
    input, whose W range is [dw*d, dw*d + W) — the W tap shift is done by
    the DMA (Element window offset), so the kernel is pure slicing + FMA:
    no sublane shuffles (measured 28x slower per grid cell than lane work).
    """
    acc = jnp.zeros((th,) + wins[0].shape[1:], jnp.float32)
    for dh in range(k):
        for dw in range(k):
            t = (k * k - 1) - (dh * k + dw) if flip else dh * k + dw
            rows = wins[dw][dh * d:dh * d + th]
            acc = acc + rows * kr[:, t][None, None, :]
    return acc


def _wwin(w):
    """Window W length: Mosaic needs the sublane block dim divisible by 8
    (unless equal to the array dim — ours is an offset window, so round
    up; the extra columns read real zero padding and are sliced off)."""
    return ((w + 7) // 8) * 8


def _k_dw_fwd(*refs, k, d, th):
    """refs = (x_win_0..k-1, kr, y). Each x window (1, th+2p, W, C) is a
    W-shifted halo of the zero-padded input — real zeros, no masking."""
    wins = [r[0].astype(jnp.float32) for r in refs[:k]]
    kr = refs[k][...].astype(jnp.float32)
    y_ref = refs[k + 1]
    y = _taps_win(wins, kr, k, d, th)
    y_ref[0] = y[:, :y_ref.shape[2]].astype(y_ref.dtype)


def _k_dw_dx(*refs, k, d, th):
    """dx = dw-conv of g with the flipped kernel (same windowed contract)."""
    wins = [r[0].astype(jnp.float32) for r in refs[:k]]
    kr = refs[k][...].astype(jnp.float32)
    gx_ref = refs[k + 1]
    gx = _taps_win(wins, kr, k, d, th, flip=True)
    gx_ref[0] = gx[:, :gx_ref.shape[2]].astype(gx_ref.dtype)


def _k_dw_dk(*refs, k, d, th, H):
    """dk[c, dh*k+dw] = sum_{pix} x[tap] * g via the k shifted x windows;
    g block (1, th, W, C); dk (kk_pad, C) f32 grid-carried accumulator."""
    i, j = pl.program_id(0), pl.program_id(1)
    wins = [r[0].astype(jnp.float32) for r in refs[:k]]
    g_ref, dk_ref = refs[k], refs[k + 1]
    g = g_ref[0].astype(jnp.float32)
    # x windows read the zero-padded buffer; only the blocked g read of a
    # trailing partial block may contain garbage rows
    rg = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0)
    g = jnp.where(rg + j * th < H, g, 0.0)

    w = g.shape[1]
    rows_list = []
    for dh in range(k):
        for dw in range(k):
            rows = wins[dw][dh * d:dh * d + th, :w]
            rows_list.append(jnp.sum(rows * g, axis=(0, 1)))  # (C,)
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


def _win_specs(k, d, th, w_out, c):
    """k Element windows of the padded array, one per W tap: window dw
    covers W range [dw*d, dw*d + w_out) and H range [j*th, j*th+th+2p)."""
    p = d * (k - 1) // 2
    ww = _wwin(w_out)
    specs = []
    for dw in range(k):
        specs.append(pl.BlockSpec(
            (pl.Element(1), pl.Element(th + 2 * p), pl.Element(ww),
             pl.Element(c)),
            lambda i, j, dw=dw: (i, j * th, dw * d, 0),
            memory_space=pltpu.VMEM))
    return specs


def _run_fwd(xp, kr, k, d, H, W, th, interpret):
    """xp padded input (H: p top, to block multiple + p bottom; W: p left,
    window overhang right); kr (C, kk). Returns y (N, H, W, C)."""
    n, hp, wp, c = xp.shape
    p = d * (k - 1) // 2
    w = W
    nh = pl.cdiv(H, th)
    return pl.pallas_call(
        functools.partial(_k_dw_fwd, k=k, d=d, th=th),
        out_shape=jax.ShapeDtypeStruct((n, H, w, c), xp.dtype),
        grid=(n, nh),
        in_specs=_win_specs(k, d, th, w, c) + [
            pl.BlockSpec((c, kr.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(*([xp] * k), kr)


def _run_dk(xp, g, k, d, H, th, interpret):
    n, hp, wp, c = xp.shape
    p = d * (k - 1) // 2
    w = g.shape[2]
    nh = pl.cdiv(H, th)
    kk = k * k
    kk_pad = ((kk + 7) // 8) * 8
    dk = pl.pallas_call(
        functools.partial(_k_dw_dk, k=k, d=d, th=th, H=H),
        out_shape=jax.ShapeDtypeStruct((kk_pad, c), jnp.float32),
        grid=(n, nh),
        in_specs=_win_specs(k, d, th, w, c) + [
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((kk_pad, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(*([xp] * k), g)
    return dk[:kk]


def _pad_h(x, p, th):
    """Zero-pad H by p on top and to nh*th + p past the data on the bottom
    (every Element window reads initialized memory) and W by p both sides
    (the per-tap window offsets index the padded W range)."""
    h = x.shape[1]
    nh = pl.cdiv(h, th)
    w = x.shape[2]
    wpad = (_wwin(w) - w) + p   # window overhang + right pad
    return jnp.pad(x, ((0, 0), (p, nh * th + p - h), (p, wpad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def depthwise_conv2d_pallas(x, kr, k: int, dilation: int = 1,
                            interpret: bool = False):
    """Depthwise kxk stride-1 'same' conv, NHWC.

    x (N, H, W, C); kr (C, k*k) per-channel taps in row-major [dh*k + dw]
    order (HWIO (k,k,1,C) kernels reshape via kv[:, :, 0, :] -> transpose).
    """
    p = dilation * (k - 1) // 2
    th = _pick_th(x.shape[1], x.shape[2], x.shape[3], x.dtype.itemsize)
    return _run_fwd(_pad_h(x, p, th), kr, k, dilation, x.shape[1],
                    x.shape[2], th, interpret)


def _dw_fwd_rule(x, kr, k, dilation, interpret):
    p = dilation * (k - 1) // 2
    th = _pick_th(x.shape[1], x.shape[2], x.shape[3], x.dtype.itemsize)
    xp = _pad_h(x, p, th)
    y = _run_fwd(xp, kr, k, dilation, x.shape[1], x.shape[2], th, interpret)
    return y, (xp, kr)


def _dw_bwd_rule(k, dilation, interpret, res, g):
    xp, kr = res
    p = dilation * (k - 1) // 2
    H = g.shape[1]
    # re-derive the forward's exact tile choice from the UNPADDED dims (g has
    # x's shape for this shape-preserving conv) — xp's bottom padding was
    # sized for that th, so the dk windows (indexed j*th over xp) need it
    th = _pick_th(H, g.shape[2], g.shape[3], xp.dtype.itemsize)
    gp = _pad_h(g, p, th)
    # dx: conv of g with flipped kernel (same windowed structure)
    n, hp, wp, c = gp.shape
    w = g.shape[2]
    nh = pl.cdiv(H, th)
    dx = pl.pallas_call(
        functools.partial(_k_dw_dx, k=k, d=dilation, th=th),
        out_shape=jax.ShapeDtypeStruct((n, H, w, c), gp.dtype),
        grid=(n, nh),
        in_specs=_win_specs(k, dilation, th, w, c) + [
            pl.BlockSpec((c, kr.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(*([gp] * k), kr)
    dk = _run_dk(xp, g, k, dilation, H, th, interpret)
    return dx, jnp.transpose(dk, (1, 0)).astype(kr.dtype)


depthwise_conv2d_pallas.defvjp(_dw_fwd_rule, _dw_bwd_rule)


def dw_kernel_to_taps(kv):
    """HWIO depthwise kernel (k, k, 1, C) -> (C, k*k) tap matrix."""
    k = kv.shape[0]
    return jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(kv.shape[3],
                                                            k * k)
