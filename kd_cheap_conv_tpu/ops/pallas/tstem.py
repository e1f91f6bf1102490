"""Fused eval-mode ResNet stem: 7x7/s2 conv + BN + relu + 3x3/s2 maxpool
as ONE forward-only Pallas kernel over the HOST-packed S2D input.

Why: at b16/513² the teacher's entry cluster measures ~1.8 ms vs a ~0.25 ms
traffic floor (round-5 xplane: 0.89 ms conv fusion + 0.52 ms layout copy +
0.39 ms maxpool fusion). The copy exists because the packed NHCW tensor
feeds two consumers wanting different layouts — the student's Pallas f0
chain reads the default {3,2,1,0} while XLA's conv wants {2,0,3,1}. A
Pallas consumer reads the default layout by construction, so routing the
teacher stem through this kernel deletes the copy outright; the conv+pool
fusion goes with it.

Formulation (channel-sublane, the ops.pallas.stem house style — sublanes
carry the 12 packed channels, lanes carry W):
  * conv: the 7x7/s2/pad3 conv over the packed tensor is a 4x4-VALID conv
    with a 192-wide contraction (ops.conv.conv2d_s2d_packed). The kernel
    builds a (rows, 4*12, Wp) tap stack ONCE per window (3 lane rolls + one
    sublane concat), flattens rows into sublanes (free collapse), and runs
    ONE (64, 192) x (192, Wp) MXU matmul per conv row — K=192 keeps the
    systolic array fed where per-(a,b) K=12 matmuls would run it at ~9%.
  * BN (eval running stats) folds into the matmul weight and bias.
  * maxpool 3x3/s2/pad1: row maxes are free outer-dim slices; lane maxes
    are two pltpu.rolls + a select mask (edges -> -1e9, finite so the
    selection matmul below cannot produce -inf * 0 = NaN); the stride-2
    lane decimation is an EXACT 0/1 selection matmul (one nonzero per
    output column — a max value passes through a single-entry dot
    unchanged).

Output is (N, 129, 64, 129) NHCW; the wrapper transposes to NHWC (one
~34 MB copy, ~0.05 ms — the price of handing back to XLA's layer1 convs).

Reference semantics: torchvision ResNet stem + MaxPool2d(3, 2, padding=1)
(SURVEY.md §2.1); parity vs the stock path in tests/test_pallas_tstem.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import _CP, _mm

BO = 16          # pooled output rows per grid cell
NEG = -1.0e9     # finite -inf stand-in (see module docstring)


def _w0_from_conv(kernel, bn, dt):
    """(7,7,3,64) HWIO stem kernel + eval BN -> (64, 192) matmul weight and
    (64, 1) bias, K order (a, b, ph, pw, ci) matching the kernel's tap
    stack. Mirrors ops.conv.conv2d_s2d_packed's weight transform."""
    kh, kw, ci, co = kernel.shape
    ka, kb = (kh + 1) // 2, (kw + 1) // 2
    w2 = jnp.pad(kernel, ((0, 2 * ka - kh), (0, 2 * kb - kw), (0, 0),
                          (0, 0)))
    w2 = jnp.transpose(w2.reshape(ka, 2, kb, 2, ci, co),
                       (0, 2, 1, 3, 4, 5)).reshape(ka, kb, 4 * ci, co)
    # (co, kb, ka*4ci): K blocks ordered (b, a, ci) so the kernel can take
    # per-b column slices (the b shift rides an input lane roll)
    w0 = jnp.transpose(w2, (3, 1, 0, 2)).reshape(co, ka * kb * 4 * ci)
    s = bn.scale[...] * jax.lax.rsqrt(bn.var[...] + bn.epsilon)
    t = bn.bias[...] - bn.mean[...] * s
    w0 = (w0.astype(jnp.float32) * s[:, None]).astype(dt)
    return w0, t.astype(jnp.float32)[:, None]


def _sel_even(wp: int, wo: int) -> np.ndarray:
    """(wp, wo) 0/1 matrix selecting lanes 2*c (the stride-2 pool
    decimation); exact pass-through for the max values."""
    m = np.zeros((wp, wo), np.float32)
    for c in range(wo):
        m[2 * c, c] = 1.0
    return m


def _k_tstem(v_ref, w_ref, b_ref, s_ref, y_ref, *, bo, Hc, Wc, Ho):
    """v (1, 2bo+4, 12, Wpw) window of the packed input; w (64, 192) with
    K blocks ordered (b, a, ci); b (64, 1); s (Wpw, Wo). Out
    (1, bo, 64, Wo).

    The W tap shift (packed col w+b) is an f32 lane roll of the INPUT
    window, consumed by a per-b K=48 matmul. Rejected alternatives, both
    measured as Mosaic compile errors on v5e: a sublane concat of the four
    rolled copies feeding one K=192 matmul ("result/input offset mismatch
    on non-concat dimension" — rolled layouts carry lane offsets), and
    DMA-shifted Element windows ("tiling (128) divides index" — lane
    offsets must be tile-aligned)."""
    j = pl.program_id(1)
    # f32: Mosaic's dynamic_rotate has no bf16 path (stem._f0_hcat ditto)
    v = v_ref[0].astype(jnp.float32)                 # (2bo+4, 12, Wpw)
    wp = v.shape[2]
    nrow = v.shape[0]
    flats = [v.reshape(nrow * 12, wp)]
    for b in range(1, 4):
        flats.append(pltpu.roll(v, wp - b, axis=2).reshape(nrow * 12, wp))
    w0 = w_ref[...]
    bias = b_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (64, wp), 1)
    rows = []
    for t in range(2 * bo + 1):
        # conv row g = 2*(j*bo) - 1 + t taps packed rows g..g+3 = window
        # rows t..t+3 (the +1 top pad makes the window offset 2*j*bo)
        h = None
        for b in range(4):
            part = _mm(w0[:, b * 48:(b + 1) * 48],
                       flats[b][t * 12:(t + 4) * 12], y_ref.dtype)
            h = part if h is None else h + part
        h = jnp.maximum(h + bias, 0.0)
        # mask invalid conv rows (pool zero-pad row -1 / rows >= Hc) and
        # pad/garbage lanes (conv cols >= Wc) with a finite -inf
        g = 2 * j * bo - 1 + t
        valid = jnp.logical_and(g >= 0, g < Hc)
        rows.append(jnp.where(valid & (lane < Wc), h, NEG))
    sel = s_ref[...]
    outs = []
    for r in range(bo):
        # out row r <- conv rows 2r-1..2r+1 = local t = 2r..2r+2
        pr = jnp.maximum(jnp.maximum(rows[2 * r], rows[2 * r + 1]),
                         rows[2 * r + 2])            # (64, Wp)
        # lane maxes: wraps land on NEG/never-selected lanes; lane 0's
        # left neighbour is the pool zero-pad -> NEG
        ml = jnp.where(lane >= 1, pltpu.roll(pr, 1, axis=1), NEG)
        mr = pltpu.roll(pr, wp - 1, axis=1)          # lane w -> pr[w+1]
        m = jnp.maximum(jnp.maximum(ml, pr), mr)
        # stride-2 decimation: exact single-entry selection matmul
        outs.append(_mm(m, sel, y_ref.dtype))
    y_ref[0] = jnp.stack(outs, axis=0).astype(y_ref.dtype)


def fused_stem_pool_eval_nhcw(xpk, kernel, bn, interpret: bool = False,
                              bo: int = 0):
    """xpk (N, Hp, 12, Wp) host-packed NHCW S2D input (ops.conv.s2d_pack
    channel_sublane form); kernel (7,7,3,64) HWIO; bn an eval-mode
    BatchNorm. Returns relu(bn(conv7x7s2))-maxpooled (N, Ho, Wo, 64) NHWC.
    """
    bo = bo or BO
    n, hp, ci4, wp = xpk.shape
    assert ci4 == 12, "NHCW packed input expected"
    Hc, Wc = hp - 3, wp - 3                  # conv output extent (257)
    Ho, Wo = (Hc + 1) // 2, (Wc + 1) // 2    # pooled extent (129)
    dt = xpk.dtype
    w0, bias = _w0_from_conv(kernel[...].astype(dt), bn, dt)
    # full-array-width lane windows are exempt from the 128-divisible
    # block rule, and the 384-lane padded variant measured 1.48x slower
    # (matmul lanes are compute, not just storage)
    sel = jnp.asarray(_sel_even(wp, Wo), dt)
    nh = pl.cdiv(Ho, bo)
    # +1 zero top row (window base 2*j*bo - 1 stays in bounds at j=0) and
    # bottom rows so the last window's 2bo+4 reads are initialized
    xp = jnp.pad(xpk, ((0, 0), (1, max(0, 2 * nh * bo + 4 - 1 - hp)),
                       (0, 0), (0, 0)))
    y = pl.pallas_call(
        functools.partial(_k_tstem, bo=bo, Hc=Hc, Wc=Wc, Ho=Ho),
        out_shape=jax.ShapeDtypeStruct((n, Ho, 64, Wo), dt),
        grid=(n, nh),
        in_specs=[pl.BlockSpec(
                      (pl.Element(1), pl.Element(2 * bo + 4),
                       pl.Element(12), pl.Element(wp)),
                      lambda i, j: (i, 2 * j * bo, 0, 0),
                      memory_space=pltpu.VMEM),
                  pl.BlockSpec(w0.shape, lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(bias.shape, lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(sel.shape, lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bo, 64, Wo), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret, compiler_params=_CP,
    )(xp, w0, bias, sel)
    return jnp.transpose(y, (0, 1, 3, 2))
