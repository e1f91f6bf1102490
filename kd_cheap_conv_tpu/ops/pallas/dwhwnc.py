"""TPU Pallas depthwise conv in the (H, W, N, C) bitcast layout — full
fwd+bwd (dx and dk), stride 1, 'same' padding, any dilation.

Why another depthwise kernel: the plain-NHWC kernel (ops.pallas.dwconv)
loses in real graphs because XLA:TPU's preferred conv layout is
{3,0,2,1} (minor-to-major: C, N, W, H) while a Pallas custom-call pins its
operands to the default {3,2,1,0} (C, W, N, H) — every kernel boundary
materializes a layout copy, and the W tap shifts land on the sublane dim
where VPU shuffles are expensive (round-2/3 A/B: 0.25-0.87x, NOTES.md).

The fix measured this round: for the LOGICAL shape (H, W, N, C) the default
Pallas layout is byte-identical to XLA's {3,0,2,1} layout of the (N, H, W, C)
tensor.  `transpose(x, (1, 2, 0, 3))` into the kernel and back therefore
compiles to pure bitcasts (verified in the optimized HLO: zero copy ops,
where the same kernel fed plain NHWC pays two full-tensor copies).  Inside
the kernel both H and W are outer (row) dims, so every tap shift is a free
static slice — no sublane rolls, no per-tap DMA windows, no selection
matmuls.  Sublanes carry N (>= 8), lanes carry C: exactly how XLA itself
tiles these tensors.

Tiling: a 2-D (H, W) grid of (TH, TW) output tiles per cell, each fed by an
Element-indexed halo window (TH+2p, TW+2p) of the zero-padded input.  The
accumulator must stay a small SSA value: a single-cell unrolled W loop
spills Mosaic's register allocator catastrophically (first cut: 99-112 MB
of stack at C>=512), so the W chunking lives in the GRID, where the DMA
pipeline sequences it.

Serves the depthwise 3x3 convs that remain on XLA at HEAD: the student
decoder separable fuse (129², C48/C256 — the largest profiled decoder ops:
1.64 ms fwd + ~2 ms dgrad + 0.44 ms wgrad at b16/513² vs a ~0.33 ms traffic
floor), ASPP separable branches, the MobileNetV2 f7+ blocks, and the
backbone-replacement variant's layer3/4 pairs (33², dilation 1-2).

Reference semantics: torch Conv2d(groups=C, stride=1, padding=d*(k-1)//2)
as used by the replaced cheap convs (SURVEY.md §2.1/§2.2, BASELINE.json:5);
parity vs ops.conv.depthwise_conv2d in tests/test_pallas_dwhwnc.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def supports_dw_hwnc(*, stride, padding, dilation, kernel_size, n, c,
                     hw=None) -> bool:
    """Structural gate: stride-1 odd square kernel, torch 'same' padding,
    batch a sublane multiple (N on sublanes), lane-friendly C — and, when
    `hw` (H, W) is known, a halo read amplification <= 3x at the feasible
    tile. Large-dilation small-extent convs (the 33² ASPP branches at
    d=12/18) have NO VMEM-feasible tile: tiles collapse to (1, 1) with
    30-37x read amplification, measured 11-24 ms PER PASS on v5e (round-5
    A/B: 290 -> 92 img/s with those sites dispatched)."""
    def one(v):
        return v[0] if isinstance(v, (tuple, list)) else v

    k, s, d, p = (one(kernel_size), one(stride), one(dilation), one(padding))
    kh = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
    kw = kernel_size if isinstance(kernel_size, int) else kernel_size[1]
    ok = (s == 1 and kh == kw and k >= 3 and k % 2 == 1
          and p == d * (k - 1) // 2 and n % 8 == 0 and c >= 8)
    if not ok:
        return False
    if hw is not None:
        th, tw = _pick_tiles(hw[0], hw[1], n, c, 2, p)
        amp = (th + 2 * p) * (tw + 2 * p) / float(th * tw)
        if amp > 3.0:
            return False
    return True


def _c_eff(c):
    """Lane-padded channel extent (VMEM stores full 128-lane tiles)."""
    return ((c + 127) // 128) * 128


def _pick_tiles(h, w, n, c, itemsize, p):
    """(TH, TW) output tile: keep the f32 accumulator value <= ~1MB (Mosaic
    register allocator) and the double-buffered halo window + out tile
    within ~12MB of VMEM."""
    ce = _c_eff(c)
    best, best_key = (1, 1), None
    for th in (16, 8, 4, 2, 1):
        for tw in (128, 64, 32, 16, 8, 4, 2, 1):
            acc = th * tw * n * ce * 4
            win = 2 * (th + 2 * p) * (tw + 2 * p) * n * ce * itemsize
            out = 2 * th * tw * n * ce * itemsize
            if acc <= 2 * 1024 * 1024 and win + out <= 12 * 1024 * 1024:
                # maximize tile area; tie-break on minimal halo read
                # amplification (square-ish tiles)
                key = (th * tw,
                       -(th + 2 * p) * (tw + 2 * p) / float(th * tw))
                if best_key is None or key > best_key:
                    best, best_key = (th, tw), key
                break
    return best


def _taps(win_ref, kr, k, d, th, tw, flip):
    """k x k MAC over static slices of the (TH+2p, TW+2p, N, C) halo window.
    Every shift is a free outer-dim slice; kr (C, kk) broadcasts on lanes."""
    acc = None
    for dh in range(k):
        for dw in range(k):
            t = (k * k - 1) - (dh * k + dw) if flip else dh * k + dw
            rows = win_ref[dh * d:dh * d + th,
                           dw * d:dw * d + tw].astype(jnp.float32)
            term = rows * kr[:, t][None, None, None, :]
            acc = term if acc is None else acc + term
    return acc


def _k_conv(x_ref, kr_ref, y_ref, *, k, d, th, tw, flip):
    kr = kr_ref[...].astype(jnp.float32)
    y_ref[...] = _taps(x_ref, kr, k, d, th, tw, flip).astype(y_ref.dtype)


def _k_dk(x_ref, g_ref, dk_ref, *, k, d, th, tw, H, W):
    """dk[t, c] = sum_{h,w,n} x[tap t] * g — (kk_pad, C) grid-carried f32
    accumulator.  x halo windows read zero padding (real zeros); the blocked
    g read may contain garbage in partial edge tiles — mask rows and cols."""
    j, l = pl.program_id(0), pl.program_id(1)
    g = g_ref[...].astype(jnp.float32)
    rh = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1, 1), 0)
    rw = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1, 1), 1)
    g = jnp.where((rh + j * th < H) & (rw + l * tw < W), g, 0.0)
    sums = []
    for dh in range(k):
        for dw in range(k):
            rows = x_ref[dh * d:dh * d + th,
                         dw * d:dw * d + tw].astype(jnp.float32)
            sums.append(jnp.sum(rows * g, axis=(0, 1, 2)))   # (C,)
    tile = jnp.stack(sums, axis=0)                           # (kk, C)
    tile = jnp.pad(tile, ((0, dk_ref.shape[0] - tile.shape[0]), (0, 0)))
    first = jnp.logical_and(j == 0, l == 0)

    @pl.when(first)
    def _():
        dk_ref[...] = tile

    @pl.when(jnp.logical_not(first))
    def _():
        dk_ref[...] += tile


def _pad_hwnc(xt, p, th, tw):
    """Zero-pad the (H, W, N, C) view: p leading + round-up-to-tile + p
    trailing on both H and W.  Outer-dim pads in this layout are row writes
    XLA fuses into the producer."""
    h, w = xt.shape[0], xt.shape[1]
    nh, nw = pl.cdiv(h, th), pl.cdiv(w, tw)
    return jnp.pad(xt, ((p, nh * th + p - h), (p, nw * tw + p - w),
                        (0, 0), (0, 0)))


def _win_spec(k, d, th, tw, n, c):
    p = d * (k - 1) // 2
    return pl.BlockSpec(
        (pl.Element(th + 2 * p), pl.Element(tw + 2 * p), pl.Element(n),
         pl.Element(c)),
        lambda j, l: (j * th, l * tw, 0, 0),
        memory_space=pltpu.VMEM)


def _run_conv(xp, kr, k, d, H, W, th, tw, interpret, flip):
    """One dw-conv pass over the padded (Hp, Wp, N, C) tensor."""
    _, _, n, c = xp.shape
    return pl.pallas_call(
        functools.partial(_k_conv, k=k, d=d, th=th, tw=tw, flip=flip),
        out_shape=jax.ShapeDtypeStruct((H, W, n, c), xp.dtype),
        grid=(pl.cdiv(H, th), pl.cdiv(W, tw)),
        in_specs=[_win_spec(k, d, th, tw, n, c),
                  pl.BlockSpec((c, kr.shape[1]), lambda j, l: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, tw, n, c), lambda j, l: (j, l, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(xp, kr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def depthwise_conv2d_hwnc(x, kr, k: int, dilation: int = 1,
                          interpret: bool = False):
    """Depthwise kxk stride-1 'same' conv; x (N, H, W, C) NHWC, kr (C, k*k)
    row-major taps (ops.pallas.dwconv.dw_kernel_to_taps)."""
    y, _ = _fwd_rule(x, kr, k, dilation, interpret)
    return y


def _fwd_rule(x, kr, k, dilation, interpret):
    n, H, W, c = x.shape
    p = dilation * (k - 1) // 2
    th, tw = _pick_tiles(H, W, n, c, x.dtype.itemsize, p)
    xt = jnp.transpose(x, (1, 2, 0, 3))          # bitcast in optimized HLO
    xp = _pad_hwnc(xt, p, th, tw)
    y = _run_conv(xp, kr, k, dilation, H, W, th, tw, interpret, flip=False)
    return jnp.transpose(y, (2, 0, 1, 3)), (xp, kr)


def _bwd_rule(k, dilation, interpret, res, g):
    xp, kr = res
    n, H, W, c = g.shape
    p = dilation * (k - 1) // 2
    th, tw = _pick_tiles(H, W, n, c, g.dtype.itemsize, p)
    gt = jnp.transpose(g, (1, 2, 0, 3))
    gp = _pad_hwnc(gt, p, th, tw)
    dx = _run_conv(gp, kr, k, dilation, H, W, th, tw, interpret, flip=True)
    kk = k * k
    kk_pad = ((kk + 7) // 8) * 8
    dk = pl.pallas_call(
        functools.partial(_k_dk, k=k, d=dilation, th=th, tw=tw, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((kk_pad, c), jnp.float32),
        grid=(pl.cdiv(H, th), pl.cdiv(W, tw)),
        in_specs=[_win_spec(k, dilation, th, tw, n, c),
                  pl.BlockSpec((th, tw, n, c), lambda j, l: (j, l, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((kk_pad, c), lambda j, l: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_CP,
    )(xp, gt)[:kk]
    return (jnp.transpose(dx, (2, 0, 1, 3)),
            jnp.transpose(dk, (1, 0)).astype(kr.dtype))


depthwise_conv2d_hwnc.defvjp(_fwd_rule, _bwd_rule)
