"""Fused eval-mode ResNet bottlenecks in the batch-folded layout.

Why: the config-#2 TEACHER (ResNet-101 DeepLabV3+, eval-mode BN under
stop_gradient) spends most of its residual-stage time on HBM round trips,
not FLOPs — each bottleneck writes/reads three intermediates plus the
residual read, ~0.8-1.0 ms/block at 129² C256 (round-3 teacher segment
profile: stem..layer2 = 7.7 ms vs a ~3 ms conv bound; layer3/4 are AT
bound and stay stock). In eval mode every BN is a per-channel affine that
folds into its conv's weights/bias, so a whole bottleneck
(1x1 -> 3x3 -> 1x1 [+ 1x1 downsample] + residual, relu between) has no
cross-row barriers and runs as ONE Pallas kernel per block: only the block
input and output touch HBM.

Forward-only (the teacher is under stop_gradient); the structural guard
only engages stride-1 dilation-1 blocks (layer1 fully; layer2 blocks 2..N —
its stride-2 first block stays stock), eval-mode BN.

Reference semantics: torchvision Bottleneck (SURVEY.md §2.1); numerics
pinned against the stock NNX path by tests/test_pallas_rchain.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import _CP, PAD, _lanes, _mask_lanes, _mm, _rows_in
from .xchain import _fold, _geom, _unfold

BH_RN = int(os.environ.get("KDCC_RNET_BH", "8"))


def _k_bneck_eval(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  *refs, bh, H, W, wseg, skip):
    """One bottleneck: relu(bn1(1x1)) -> relu(bn2(3x3)) -> bn3(1x1),
    + identity or bn_d(1x1 downsample), final relu. BNs pre-folded.

    x halo (1, bh+2, C1, Wp) at rows j*bh-1. w2 (9, C2, C2) tap-major;
    biases (C, 1). refs = [wd, bd,] y_ref."""
    y_ref = refs[-1]
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)                  # (bh+2, C1, Wp)
    x_c = jnp.where(_rows_in(bh, j, bh, 0, H), x[1:1 + bh], 0.0)
    x_c = _mask_lanes(x_c, W)

    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    h = jnp.stack([_mm(w1, x[r], y_ref.dtype) for r in range(bh + 2)],
                  axis=0) + b1
    h = jnp.maximum(h, 0.0)
    h = jnp.where(_rows_in(bh + 2, j, bh, -1, H), h, 0.0)  # conv zero-pad
    h = _mask_lanes(h, W)                         # b1 is nonzero on pads

    Wp = h.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wp), 2) % wseg
    c2 = w2_ref.shape[1]
    acc = jnp.zeros((bh, c2, Wp), jnp.float32)
    for dh in range(3):
        rows = h[dh:dh + bh]
        for dw in range(3):
            if dw == 1:
                sh = rows
            else:
                shift = 1 if dw == 0 else Wp - 1
                sh = pltpu.roll(rows, shift, axis=2)
                if dw == 0:
                    sh = jnp.where(lane >= 1, sh, 0.0)
                else:
                    sh = jnp.where(lane < wseg - 1, sh, 0.0)
            wt = w2_ref[dh * 3 + dw]
            acc = acc + jnp.stack(
                [_mm(wt, sh[r], y_ref.dtype) for r in range(bh)], axis=0)
    h2 = jnp.maximum(acc + b2_ref[...].astype(jnp.float32), 0.0)

    w3 = w3_ref[...]
    h3 = jnp.stack([_mm(w3, h2[r], y_ref.dtype) for r in range(bh)],
                   axis=0) + b3_ref[...].astype(jnp.float32)
    if skip:
        wd, bd = refs[0], refs[1]
        sk = jnp.stack([_mm(wd[...], x_c[r], y_ref.dtype)
                        for r in range(bh)],
                       axis=0) + bd[...].astype(jnp.float32)
    else:
        sk = x_c
    y_ref[0] = jnp.maximum(h3 + sk, 0.0).astype(y_ref.dtype)


def _bn_fold(bn):
    s = bn.scale[...] * jax.lax.rsqrt(bn.var[...] + bn.epsilon)
    return s, bn.bias[...] - bn.mean[...] * s


def _fold_bneck_eval(blk, dt):
    """Folded consts for one eval bottleneck: (w1,b1,w2(9 taps),b2,w3,b3
    [,wd,bd])."""
    out = []
    for conv, bn, taps in ((blk.conv1, blk.bn1, False),
                           (blk.conv2, blk.bn2, True),
                           (blk.conv3, blk.bn3, False)):
        s, t = _bn_fold(bn)
        kv = conv.kernel[...].astype(jnp.float32)     # HWIO
        if taps:
            w = jnp.transpose(kv, (0, 1, 3, 2)).reshape(9, kv.shape[3],
                                                        kv.shape[2])
            w = w * s[None, :, None]
        else:
            w = s[:, None] * kv[0, 0].T
        out += [w.astype(dt), t[:, None]]
    if blk.downsample is not None:
        s, t = _bn_fold(blk.downsample.bn)
        wd = s[:, None] * blk.downsample.conv.kernel[...][0, 0].T.astype(
            jnp.float32)
        out += [wd.astype(dt), t[:, None]]
    return out


def _bneck_fusable(blk) -> bool:
    c2 = blk.conv2
    ds = blk.downsample
    return (c2.kernel_size == (3, 3) and c2.stride == (1, 1)
            and c2.dilation == (1, 1) and c2.groups == 1
            and blk.conv1.kernel_size == (1, 1)
            and blk.conv3.kernel_size == (1, 1)
            and (ds is None or (ds.conv.kernel_size == (1, 1)
                                and ds.conv.stride == (1, 1))))


def fused_resnet_blocks_eval(x_nhwc, blocks, interpret: bool = False,
                             bh: int | None = None):
    """Run consecutive fusable bottlenecks in eval mode, one kernel per
    block, on the folded tensor (one fold/unfold for the whole run)."""
    bh = bh or BH_RN
    n, H, w, c = x_nhwc.shape
    nh, R = _geom(H, bh)
    dt = x_nhwc.dtype
    z = _fold(x_nhwc, R)
    W = z.shape[3]
    for blk in blocks:
        halo = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 2), pl.Element(z.shape[2]),
             pl.Element(W)),
            lambda i, j: (i, PAD + j * bh - 1, 0, 0),
            memory_space=pltpu.VMEM)
        consts = _fold_bneck_eval(blk, dt)
        cout = blk.conv3.kernel[...].shape[3]
        specs = [pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for a in consts]
        z = pl.pallas_call(
            functools.partial(_k_bneck_eval, bh=bh, H=H, W=n * w, wseg=w,
                              skip=blk.downsample is not None),
            out_shape=jax.ShapeDtypeStruct((1, R, cout, W), dt),
            grid=(1, nh),
            in_specs=[halo] + specs,
            out_specs=pl.BlockSpec(
                (1, bh, cout, W),
                lambda i, j, off=PAD // bh: (i, j + off, 0, 0),
                memory_space=pltpu.VMEM),
            interpret=interpret, compiler_params=_CP,
        )(z, *consts)
        # out pad rows/lanes are zero (relu of masked sums with zero skip);
        # the next block's halo masks anyway
    return _unfold(z, n, H, w)
