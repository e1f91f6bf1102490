"""Fused eval-mode ResNet bottleneck STAGES in the (H, W, N, C) bitcast
layout — one Pallas kernel per run of consecutive stride-1 blocks.

Two generations of this idea exist in the repo:
- ops.pallas.rchain (round 3): one kernel PER BLOCK in the batch-folded
  channel-sublane layout. Measured LOSING (-2.7 ms at b16/513², BASELINE.md)
  — the NHWC<->folded boundary copies at every block edge ate the prize,
  and W-taps needed pltpu.roll + lane masks.
- this file (round 5): the (H, W, N, C) trick — the default Pallas layout of
  the transposed view is byte-identical to XLA's preferred {3,0,2,1} NHWC
  conv layout, so entry/exit transposes are bitcasts (zero copies, verified
  in optimized HLO), 3x3 tap shifts are free outer-dim slices, and 1x1
  convs are lane-contraction matmuls on the MXU. On top of that the WHOLE
  stage runs in ONE kernel via recompute-halo: each (TH, TW) output tile
  reads a (TH+2B, TW+2B) input window (B = number of blocks) and recomputes
  the margin rows through the chain, so NO intermediate ever touches HBM —
  cross-block fusion XLA cannot do (its per-block structure writes/reads
  three tensors + the residual per block; the teacher's layer1+layer2
  cluster measured ~5.3 ms vs a ~2.6 ms bound, round-3 segments).

Eval-mode only (teacher under stop_gradient / TTA student): every BN folds
into its conv's weight and bias, so the chain has no barriers. Engaged for
the high-res low-mid-channel stages (layer1, layer2 mid<=128); layer3/4
measure AT the conv bound on XLA (round-3 segment table) and stay stock.

Reference semantics: torchvision Bottleneck stacks (SURVEY.md §2.1);
numerics pinned against the stock NNX path by tests/test_pallas_rchain.py
(::hwnc tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rchain import _bn_fold

_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def bneck_hwnc_fusable(blk) -> bool:
    """Stride-1 dilation-1 bottleneck with a lane-friendly mid width (the
    high-res stages XLA runs off-bound); 1x1 downsample ok."""
    c2 = blk.conv2
    ds = blk.downsample
    return (c2.kernel_size == (3, 3) and c2.stride == (1, 1)
            and c2.dilation == (1, 1) and c2.groups == 1
            and c2.kernel[...].shape[2] <= 128
            and blk.conv1.kernel_size == (1, 1)
            and blk.conv3.kernel_size == (1, 1)
            and (ds is None or (ds.conv.kernel_size == (1, 1)
                                and ds.conv.stride == (1, 1))))


def _fold_bneck(blk, dt):
    """Folded consts for one eval bottleneck in input-major matmul form:
    w1 (C, Cm), b1 (Cm), w2 (9, Cm, Cm) tap-major, b2, w3 (Cm, Co), b3,
    has_ds, wd (C, Co)|None, bd|None."""
    s1, t1 = _bn_fold(blk.bn1)
    s2, t2 = _bn_fold(blk.bn2)
    s3, t3 = _bn_fold(blk.bn3)
    f32 = jnp.float32
    w1 = (blk.conv1.kernel[...][0, 0].astype(f32) * s1[None, :]).astype(dt)
    kv2 = blk.conv2.kernel[...].astype(f32)                 # (3,3,Cm,Cm)
    w2 = (kv2 * s2[None, None, None, :]).reshape(9, kv2.shape[2],
                                                 kv2.shape[3]).astype(dt)
    w3 = (blk.conv3.kernel[...][0, 0].astype(f32) * s3[None, :]).astype(dt)
    if blk.downsample is not None:
        sd, td = _bn_fold(blk.downsample.bn)
        wd = (blk.downsample.conv.kernel[...][0, 0].astype(f32)
              * sd[None, :]).astype(dt)
        bd = td.astype(f32)[None, :]
    else:
        wd, bd = None, None
    return (w1, t1.astype(f32)[None, :], w2, t2.astype(f32)[None, :],
            w3, t3.astype(f32)[None, :], wd, bd)


def _mm2(x4, w):
    """(A, B, N, C) @ (C, D) -> (A, B, N, D): lane-contraction matmul on a
    free leading-dim collapse (N stays the sublane dim)."""
    a, b, n, c = x4.shape
    y = jax.lax.dot_general(x4.reshape(a * b * n, c), w,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(a, b, n, w.shape[1])


def _k_stage(x_ref, *refs, nblk, th, tw, m, H, W, has_ds):
    """refs = per-block const refs (7 each: w1 b1 w2 b2 w3 b3 [wd bd] packed
    flat with placeholders skipped) + y_ref last.  x window
    (th+2m, tw+2m, N, C) over the m-padded input at (j*th, l*tw)."""
    j, l = pl.program_id(0), pl.program_id(1)
    y_ref = refs[-1]
    consts = refs[:-1]
    x = x_ref[...]
    ci = 0
    for b in range(nblk):
        mb = m - b                       # input margin of this block
        rh, rw = th + 2 * mb, tw + 2 * mb
        w1 = consts[ci][...]
        b1 = consts[ci + 1][...]
        w2 = consts[ci + 2]
        b2 = consts[ci + 3][...]
        w3 = consts[ci + 4][...]
        b3 = consts[ci + 5][...]
        ci += 6
        h1 = jnp.maximum(_mm2(x, w1) + b1[0][None, None, None, :], 0.0)
        # conv2's zero padding: taps outside the true image are zeros, but
        # pad-row x reads give relu(b1) — mask h1 by global position
        gr = jax.lax.broadcasted_iota(jnp.int32, (rh, rw, 1, 1), 0) \
            + j * th - mb
        gc = jax.lax.broadcasted_iota(jnp.int32, (rh, rw, 1, 1), 1) \
            + l * tw - mb
        h1 = jnp.where((gr >= 0) & (gr < H) & (gc >= 0) & (gc < W), h1, 0.0)
        h1 = h1.astype(x.dtype)
        acc = None
        for dh in range(3):
            for dw in range(3):
                t = _mm2(h1[dh:dh + rh - 2, dw:dw + rw - 2],
                         w2[dh * 3 + dw])
                acc = t if acc is None else acc + t
        h2 = jnp.maximum(acc + b2[0][None, None, None, :], 0.0).astype(x.dtype)
        y = _mm2(h2, w3) + b3[0][None, None, None, :]
        if b == 0 and has_ds:
            wd = consts[ci][...]
            bd = consts[ci + 1][...]
            ci += 2
            skip = _mm2(x[1:1 + rh - 2, 1:1 + rw - 2], wd) \
                + bd[0][None, None, None, :]
        else:
            skip = x[1:1 + rh - 2, 1:1 + rw - 2].astype(jnp.float32)
        x = jnp.maximum(y + skip, 0.0).astype(y_ref.dtype)
    y_ref[...] = x


def fused_resnet_stage_eval_hwnc(x_nhwc, blocks, interpret: bool = False,
                                 th: int = 0, tw: int = 0):
    """Run consecutive fusable bottlenecks in eval mode as ONE kernel.

    x_nhwc (N, H, W, C) with N % 8 == 0. Returns NHWC. The entry transpose
    + pad fuse into the producer; the exit transpose is a bitcast."""
    n, H, W, c = x_nhwc.shape
    if not th:
        th = 8
    if not tw:
        tw = 24 if c <= 256 else 16
    nblk = len(blocks)
    m = nblk
    dt = x_nhwc.dtype
    xt = jnp.transpose(x_nhwc, (1, 2, 0, 3))
    nh, nw = pl.cdiv(H, th), pl.cdiv(W, tw)
    xp = jnp.pad(xt, ((m, nh * th + m - H), (m, nw * tw + m - W),
                      (0, 0), (0, 0)))
    consts = []
    has_ds = blocks[0].downsample is not None
    for i, blk in enumerate(blocks):
        w1, b1, w2, b2, w3, b3, wd, bd = _fold_bneck(blk, dt)
        consts += [w1, b1, w2, b2, w3, b3]
        if i == 0 and has_ds:
            consts += [wd, bd]
        else:
            assert blk.downsample is None, \
                "only the first block of a fused run may downsample"
    co = blocks[-1].conv3.kernel[...].shape[3]
    specs = [pl.BlockSpec(a.shape, lambda j, l, nd=a.ndim: (0,) * nd,
                          memory_space=pltpu.VMEM) for a in consts]
    win = pl.BlockSpec(
        (pl.Element(th + 2 * m), pl.Element(tw + 2 * m), pl.Element(n),
         pl.Element(c)),
        lambda j, l: (j * th, l * tw, 0, 0),
        memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_k_stage, nblk=nblk, th=th, tw=tw, m=m, H=H,
                          W=W, has_ds=has_ds),
        out_shape=jax.ShapeDtypeStruct((H, W, n, co), dt),
        grid=(nh, nw),
        in_specs=[win] + specs,
        out_specs=pl.BlockSpec((th, tw, n, co), lambda j, l: (j, l, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret, compiler_params=_CP,
    )(xp, *consts)
    return jnp.transpose(y, (2, 0, 1, 3))
