"""Fused Xception-65 chains — middle flow (16 residual blocks of 3
sep-convs, C=728), exit flow (dilated exit_block + 3 post-relu exit seps),
and entry blocks (stride-2 sep3 + 1x1/s2 skip) — in the batch-folded
channel-sublane layout (1, R, C, N·W), each in a training (BN-barrier
passes + analytic backward, shard_map sync-BN variants) and an eval
(folded running-stat BN) flavor.

Why: config #3 (BASELINE.json:9) runs Xception-65 at 769² / OS16, where the
middle flow lives at 49² — stock XLA lane-pads W=49 -> 128 (2.6x HBM bytes)
and lowers the 48 depthwise convs through its slow feature-group path; the
whole config measured 0.21 of its conv roofline. Folding the batch into
lanes gives N·W = 4·49 = 196 -> 256 (1.3x pad) and C=728 is an exact
sublane multiple.

Two regimes:

- EVAL (the config-#3 TEACHER, and student TTA inference, config #5): BN
  uses running stats, so every BN is a per-channel affine that folds into
  the pointwise weights/biases. A whole residual block (relu -> dw -> pw ->
  affine, x3, + residual) then has NO cross-row barriers and runs as ONE
  Pallas kernel per block — intermediates never touch HBM (6 tensors/block
  in stock XLA -> 0). Forward-only: the teacher is under stop_gradient.

- TRAIN (the config-#3 student backbone): every BN needs global batch
  moments, so each sep conv runs as the irchain-style BN-barrier pass pair
  (dw pass + pw pass via ops.pallas.stem runners, relu='relu' plain-ReLU
  mode) with the analytic train-BN backward links in reverse; the residual
  add + final BN is an XLA elementwise finish per block.

Reference semantics: Xception middle flow (SURVEY.md §2.1; arXiv
1802.02611). Numerics pinned against the stock NNX path by
tests/test_pallas_xchain.py (values, grads, BN batch stats).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .irchain import _affine, _identity_bn_eps, _valid_mask
from .stem import (_CP, PAD, _bn_pack, _bnbwd_identity, _bnbwd_pack,
                   _dw_taps, _lanes, _mask_lanes, _mm, _rows_in, _run_bn_dw,
                   _run_bn_pw, _run_dw_bwd, _run_pw_bwd)

# Row-block heights. Eval holds one block's whole chain in VMEM (x halo +
# ~4 f32 intermediates at C=728); train passes match the irchain defaults.
BH_XE = int(os.environ.get("KDCC_XMID_BH_EVAL", "8"))
BH_XT = int(os.environ.get("KDCC_XMID_BH", "8"))
# Exit-flow (tail) segments reach C=1536/2048: at bh=8 the dil-2 dw
# BACKWARD's three double-buffered (bh+4, 1536, 256) bf16 windows alone are
# ~57 MiB and the v5e compile OOMs at 143.9M/128M (measured, round 4).
# Wide-channel convs drop to bh=4. Window bytes scale with C x LANES, not C
# alone: entry block3 (C=728, NW lanes 512 at 769²) OOM'd by 876K at bh=8
# (measured, round 4) while the middle flow (C=728, lanes 256) fits — so the
# wide cut is on the c*lanes product, calibrated to that boundary.
BH_XT_WIDE = int(os.environ.get("KDCC_XMID_BH_WIDE", "4"))
_WIDE_C = 1024
_WIDE_CL = 728 * 512


def _bh_for(c: int, nw: int = 0) -> int:
    if c >= _WIDE_C or c * _lanes(max(nw, 1)) >= _WIDE_CL:
        return BH_XT_WIDE
    return BH_XT

NCONV = 3          # sep convs per middle block


def _geom(H, bh):
    nh = pl.cdiv(H, bh)
    return nh, PAD + (nh + 1) * bh


def _fold(x, R):
    """(N, H, W, C) -> (1, R, C, NWp) zero row/lane padding, PAD top rows."""
    n, h, w, c = x.shape
    nw = n * w
    z = jnp.transpose(x, (1, 3, 0, 2)).reshape(h, c, nw)[None]
    return jnp.pad(z, ((0, 0), (PAD, R - PAD - h), (0, 0),
                       (0, _lanes(nw) - nw)))


def _unfold(z, n, H, w):
    c = z.shape[2]
    v = z[0, PAD:PAD + H, :, :n * w]
    return jnp.transpose(v.reshape(H, c, n, w), (2, 0, 3, 1))


# ---------------------------------------------------------------------------
# EVAL: one kernel per residual block, BN folded into pw weights/biases
# ---------------------------------------------------------------------------


def _k_block_eval(x_ref, k_ref, w_ref, b_ref, y_ref, *, bh, H, W, wseg,
                  dil=1):
    """One middle block: (relu -> dw3x3(dil) -> pw + bias) x3 + residual.

    x halo (1, bh+6*dil, C, W) at global rows j*bh-3*dil (PAD top rows
    cover the first block). k (3, C, 9); w (3, C, C) BN-folded pw;
    b (3, C, 1) folded biases. Each level masks rows (conv zero padding)
    and lanes (folded biases are nonzero on pad lanes; the circular roll
    wraps lane 0 into the last pad lane) before the taps.
    """
    j = pl.program_id(1)
    h = x_ref[0].astype(jnp.float32)                  # (bh+6*dil, C, W)
    res = h[3 * dil:3 * dil + bh]
    for i in range(NCONV):
        rows = h.shape[0]
        h = jnp.maximum(h, 0.0)
        h = jnp.where(_rows_in(rows, j, bh, (i - 3) * dil, H), h, 0.0)
        h = _mask_lanes(h, W)
        t = _dw_taps(h, k_ref[i].astype(jnp.float32), rows - 2 * dil,
                     h.shape[2], wseg=wseg, dil=dil)
        w = w_ref[i]                                  # (C, C)
        b = b_ref[i].astype(jnp.float32)              # (C, 1)
        h = jnp.stack([_mm(w, t[r], y_ref.dtype) + b
                       for r in range(rows - 2 * dil)], axis=0)
    y_ref[0] = (h + res).astype(y_ref.dtype)


def _fold_block_eval(block):
    """(k (3,C,9), w (3,C,C), b (3,C,1)) with eval-BN affines folded in.

    Per conv: out = bnP(pw(bnD(dw(h)))) = W''ᵀ dw(h) + b'' with
    W'' = sP ⊙ W ⊙ sD and b'' = sP·(W @ tD) + tP where s = γ/σ, t = β-μs.
    """
    ks, ws, bs = [], [], []
    for sep_bn in (block.sep1, block.sep2, block.sep3):
        sep = sep_bn.sep
        kv = sep.depthwise.kernel[...]
        c = kv.shape[3]
        k = jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(c, 9)
        w = sep.pointwise.kernel[...][0, 0].T.astype(jnp.float32)  # (Co, Ci)
        bd, bp = sep.bn_dw, sep_bn.bn
        sd = bd.scale[...] * jax.lax.rsqrt(bd.var[...] + bd.epsilon)
        td = bd.bias[...] - bd.mean[...] * sd
        sp = bp.scale[...] * jax.lax.rsqrt(bp.var[...] + bp.epsilon)
        tp = bp.bias[...] - bp.mean[...] * sp
        wf = sp[:, None] * w * sd[None, :]
        bf = sp * (w @ td) + tp
        ks.append(k)
        ws.append(wf)
        bs.append(bf[:, None])
    return jnp.stack(ks), jnp.stack(ws), jnp.stack(bs)


def fused_x_middle_eval(x_nhwc, blocks, interpret: bool = False,
                        bh: int | None = None, dil: int = 1):
    """Run the 16 middle blocks in eval mode (running-stat BN), one Pallas
    kernel per block. blocks: iterable of XceptionBlock modules (their BN
    affines are folded at trace time). Forward-only."""
    bh = bh or BH_XE
    n, H, w, c = x_nhwc.shape
    nh, R = _geom(H, bh)
    nw = n * w
    W = _lanes(nw)
    dt = x_nhwc.dtype
    z = _fold(x_nhwc, R)
    blk = pl.BlockSpec((1, bh, c, W),
                       lambda i, j, off=PAD // bh: (i, j + off, 0, 0),
                       memory_space=pltpu.VMEM)
    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 6 * dil), pl.Element(c),
         pl.Element(W)),
        lambda i, j: (i, PAD + j * bh - 3 * dil, 0, 0),
        memory_space=pltpu.VMEM)
    const3 = lambda s: pl.BlockSpec((3,) + s, lambda i, j: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
    for b in blocks:
        k3, w3, b3 = _fold_block_eval(b)
        z = pl.pallas_call(
            functools.partial(_k_block_eval, bh=bh, H=H, W=nw, wseg=w,
                              dil=dil),
            out_shape=jax.ShapeDtypeStruct(z.shape, dt),
            grid=(1, nh),
            in_specs=[halo, const3((c, 9)), const3((c, c)), const3((c, 1))],
            out_specs=blk,
            interpret=interpret, compiler_params=_CP,
        )(z, k3, w3.astype(dt), b3)
        # pad rows/lanes of z are garbage after the folded biases; the next
        # block's kernel masks both before its taps, the unfold slices them
    return _unfold(z, n, H, w)


# ---------------------------------------------------------------------------
# TRAIN: BN-barrier pass pairs per sep conv + analytic backward links
# ---------------------------------------------------------------------------


def _xm_fwd(x0, p, nblk, H, wseg, NW, eps, interpret, axis=None, nsh=1,
            dil=1):
    """x0 (1, R, C, NWp) padded FINISHED middle-flow input. p: per block b,
    conv i: k{b}_{i} (C,9), w{b}_{i} (C,C), gd/bd/gp/bp{b}_{i} (C,).
    Returns (x_out, stats, acts)."""
    dt = x0.dtype
    c = x0.shape[2]
    x = x0
    stats, acts = [], []
    for b in range(nblk):
        a_entry = x
        entry_bn = _identity_bn_eps(c, eps)
        blk_acts, blk_stats = [x], []
        for i in range(NCONV):
            aD, mD, vD = _run_bn_dw(a_entry, entry_bn, p[f"k{b}_{i}"], H, NW,
                                    "relu", eps, interpret, dt, axis, nsh,
                                    wseg=wseg, bh=_bh_for(c, NW), dil=dil)
            aP, mP, vP = _run_bn_pw(aD, _bn_pack(mD, vD, p[f"gd{b}_{i}"],
                                                 p[f"bd{b}_{i}"]),
                                    p[f"w{b}_{i}"], H, NW, False, eps,
                                    interpret, dt, axis, nsh,
                                    bh=_bh_for(c, NW))
            blk_acts += [aD, aP]
            blk_stats += [(mD, vD), (mP, vP)]
            a_entry = aP
            entry_bn = _bn_pack(mP, vP, p[f"gp{b}_{i}"], p[f"bp{b}_{i}"])
        i = NCONV - 1
        xn = _affine(blk_acts[-1], blk_stats[-1][0], blk_stats[-1][1],
                     p[f"gp{b}_{i}"], p[f"bp{b}_{i}"], eps)
        x = (xn + x.astype(jnp.float32)).astype(dt)
        stats.append(blk_stats)
        acts.append(blk_acts)
    return x, stats, acts


def _xm_bwd(p, stats, acts, nblk, H, wseg, NW, g, eps, interpret,
            axis=None, nsh=1, dil=1):
    g_psum = ((lambda v: jax.lax.psum(v, axis)) if axis is not None
              else (lambda v: v))
    dt = acts[0][0].dtype
    c = acts[0][0].shape[2]
    M = float(H * NW) * nsh
    dp = {}
    G = g
    for b in reversed(range(nblk)):
        blk_acts, blk_stats = acts[b], stats[b]
        i = NCONV - 1
        aP = blk_acts[2 * i + 2]
        mP, vP = blk_stats[2 * i + 1]

        # block finish backward (XLA): bnP3 train-BN backward on the masked
        # global sums; the residual cotangent Gm also flows to x_in
        Gm = jnp.where(_valid_mask(G.shape, H, NW), G.astype(jnp.float32),
                       0.0)
        invP = jax.lax.rsqrt(vP + eps)
        xhP = jnp.where(
            _valid_mask(aP.shape, H, NW),
            (aP.astype(jnp.float32) - mP[None, None, :, None])
            * invP[None, None, :, None], 0.0)
        sg = g_psum(Gm.sum(axis=(0, 1, 3)))
        sgx = g_psum((Gm * xhP).sum(axis=(0, 1, 3)))
        gy = ((p[f"gp{b}_{i}"] * invP)[None, None, :, None]
              * (Gm - (sg / M)[None, None, :, None]
                 - xhP * (sgx / M)[None, None, :, None])).astype(dt)
        dp[f"gp{b}_{i}"] = sgx
        dp[f"bp{b}_{i}"] = sg
        pn = _bnbwd_identity(c)

        for i in reversed(range(NCONV)):
            aD, aP = blk_acts[2 * i + 1], blk_acts[2 * i + 2]
            (mD, vD), (mP, vP) = blk_stats[2 * i], blk_stats[2 * i + 1]
            a_entry = blk_acts[2 * i]
            # pw link: [bnD (no act) -> pw -> aP]
            bnD = _bn_pack(mD, vD, p[f"gd{b}_{i}"], p[f"bd{b}_{i}"])
            gyD, sD, dW = _run_pw_bwd(gy, aP, aD, pn, bnD, p[f"w{b}_{i}"],
                                      H, NW, False, eps, interpret, dt,
                                      bh=_bh_for(c, NW))
            sD = g_psum(sD)
            dp[f"w{b}_{i}"] = dW
            dp[f"gd{b}_{i}"] = sD[:, 1]
            dp[f"bd{b}_{i}"] = sD[:, 0]
            # dw link: [entry bn (+plain relu) -> dw3x3 -> aD]
            pnD = _bnbwd_pack(mD, vD, p[f"gd{b}_{i}"], sD[:, 0], sD[:, 1], M)
            if i == 0:
                entry_bn = _identity_bn_eps(c, eps)
            else:
                mE, vE = blk_stats[2 * i - 1]
                entry_bn = _bn_pack(mE, vE, p[f"gp{b}_{i - 1}"],
                                    p[f"bp{b}_{i - 1}"])
            gy, sE, dk = _run_dw_bwd(gyD, aD, a_entry, pnD, entry_bn,
                                     p[f"k{b}_{i}"], H, NW, eps, interpret,
                                     dt, wseg=wseg, bh=_bh_for(c, NW),
                                     relu_k="relu", dil=dil)
            sE = g_psum(sE)
            dp[f"k{b}_{i}"] = dk
            if i > 0:
                dp[f"gp{b}_{i - 1}"] = sE[:, 1]
                dp[f"bp{b}_{i - 1}"] = sE[:, 0]
                pn = _bnbwd_pack(blk_stats[2 * i - 1][0],
                                 blk_stats[2 * i - 1][1],
                                 p[f"gp{b}_{i - 1}"], sE[:, 0], sE[:, 1], M)
        # conv1's entry is the identity: gy is dL/dx via the conv path;
        # add the residual cotangent
        G = (gy.astype(jnp.float32) + Gm).astype(dt)

    wk = [k for k in dp if k[0] in "wk"]
    if axis is not None:
        for k, v in zip(wk, jax.lax.psum(tuple(dp[k] for k in wk), axis)):
            dp[k] = v
    return G, {k: v.astype(p[k].dtype) for k, v in dp.items()}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_x_middle_train(x_nhwc, params, nblk: int, eps: float = 1e-5,
                         interpret: bool = False, dil: int = 1):
    """Xception middle flow, training mode (batch-moment BN).

    x_nhwc (N, H, W, 728) finished block3 output. Returns (out NHWC,
    stats: per block a tuple of 2*NCONV (mean, var) pairs ordered
    (dwBN, pwBN) per conv)."""
    n, H, w, c = x_nhwc.shape
    nh, R = _geom(H, BH_XT)
    x0 = _fold(x_nhwc, R)
    out, stats, _ = _xm_fwd(x0, params, nblk, H, w, n * w, eps, interpret,
                            dil=dil)
    flat = tuple(mv for blk in stats for mv in blk)
    return _unfold(out, n, H, w), flat


def _xmt_fwd_rule(x_nhwc, params, nblk, eps, interpret, dil=1):
    n, H, w, c = x_nhwc.shape
    nh, R = _geom(H, BH_XT)
    x0 = _fold(x_nhwc, R)
    out, stats, acts = _xm_fwd(x0, params, nblk, H, w, n * w, eps,
                               interpret, dil=dil)
    flat = tuple(mv for blk in stats for mv in blk)
    y = (_unfold(out, n, H, w), flat)
    return y, (params, stats, acts, x_nhwc.shape)


def _xmt_bwd_rule(nblk, eps, interpret, dil, res, cts):
    p, stats, acts, x_shape = res
    n, H, w, c = x_shape
    nh, R = _geom(H, BH_XT)
    g = _fold(cts[0], R)
    gx, dp = _xm_bwd(p, stats, acts, nblk, H, w, n * w, g, eps, interpret,
                     dil=dil)
    return _unfold(gx, n, H, w), dp


fused_x_middle_train.defvjp(_xmt_fwd_rule, _xmt_bwd_rule)


# ---------------------------------------------------------------------------
# SPMD variant (train): shard_map over a 1-D data mesh, psum'd BN moments /
# BN-backward totals / weight grads — sync-BN semantics
# ---------------------------------------------------------------------------

_sharded_xm_traces = 0


def sharded_xm_trace_count() -> int:
    return _sharded_xm_traces


def _shmap(fn, mesh, in_specs, out_specs):
    from jax import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_x_middle_train_sharded(x_nhwc, params, mesh, nblk: int,
                                 eps: float = 1e-5,
                                 interpret: bool = False, dil: int = 1):
    (y, _) = _sh_xm_fwd(x_nhwc, params, mesh, nblk, eps, interpret, dil)
    return y


def _sh_specs(mesh):
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return axis, P(axis), P()


def _sh_xm_fwd(x_nhwc, params, mesh, nblk, eps, interpret, dil=1):
    global _sharded_xm_traces
    _sharded_xm_traces += 1
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(x, p):
        n, H, w, c = x.shape
        nh, R = _geom(H, BH_XT)
        x0 = _fold(x, R)
        out, stats, acts = _xm_fwd(x0, p, nblk, H, w, n * w, eps, interpret,
                                   axis, nsh, dil=dil)
        flat = tuple(mv for blk in stats for mv in blk)
        return _unfold(out, n, H, w), flat, stats, acts

    out, flat, stats, acts = _shmap(local, mesh, (Pd, Pr),
                                    (Pd, Pr, Pr, Pd))(x_nhwc, params)
    return ((out, flat), (params, stats, acts, x_nhwc.shape))


def _sh_xmt_fwd_rule(x_nhwc, params, mesh, nblk, eps, interpret, dil=1):
    return _sh_xm_fwd(x_nhwc, params, mesh, nblk, eps, interpret, dil)


def _sh_xmt_bwd_rule(mesh, nblk, eps, interpret, dil, res, cts):
    p, stats, acts, x_shape = res
    _, H, w, c = x_shape
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(p, stats, acts, g):
        n_loc = g.shape[0]
        nh, R = _geom(H, BH_XT)
        gf = _fold(g, R)
        gx, dp = _xm_bwd(p, stats, acts, nblk, H, w, n_loc * w, gf, eps,
                         interpret, axis, nsh, dil=dil)
        return _unfold(gx, n_loc, H, w), dp

    dx, dp = _shmap(local, mesh, (Pr, Pr, Pd, Pd), (Pd, Pr))(
        p, stats, acts, cts[0])
    return dx, dp


fused_x_middle_train_sharded.defvjp(_sh_xmt_fwd_rule, _sh_xmt_bwd_rule)


def middle_train_params(blocks):
    """Extract the train-chain param dict from the middle-block modules."""
    p = {}
    for b, blk in enumerate(blocks):
        for i, sep_bn in enumerate((blk.sep1, blk.sep2, blk.sep3)):
            sep = sep_bn.sep
            kv = sep.depthwise.kernel[...]
            c = kv.shape[3]
            p[f"k{b}_{i}"] = jnp.transpose(kv[:, :, 0, :],
                                           (2, 0, 1)).reshape(c, 9)
            p[f"w{b}_{i}"] = sep.pointwise.kernel[...][0, 0].T
            p[f"gd{b}_{i}"] = sep.bn_dw.scale[...]
            p[f"bd{b}_{i}"] = sep.bn_dw.bias[...]
            p[f"gp{b}_{i}"] = sep_bn.bn.scale[...]
            p[f"bp{b}_{i}"] = sep_bn.bn.bias[...]
    return p


# ---------------------------------------------------------------------------
# Exit flow ("tail"): exit_block (3 sep convs 728->1024 + 1x1 skip) then the
# three exit sep convs (1024->1536->1536->2048, post-relu). All dilation 2
# at OS16. Same machinery as the middle flow plus: dilated taps, channel
# changes, an XLA skip-conv branch with its own train-BN, and a relu finish.
# ---------------------------------------------------------------------------

# (cin, cout, entry act) per conv; dil comes from the model (2 at OS16)
_TAIL_A = ((728, 728, "relu"), (728, 1024, "relu"), (1024, 1024, "relu"))
_TAIL_B = ((1024, 1536, False), (1536, 1536, "relu"), (1536, 2048, "relu"))


def _seg_fwd(x, p, pre, specs, dil, H, wseg, NW, eps, interpret, axis, nsh):
    """Run a segment of sep convs (dw pass + pw pass per conv) with BN
    barriers. x is a FINISHED folded tensor; conv j's entry applies
    (identity if j==0 else bnP_{j-1}) + the spec'd activation."""
    dt = x.dtype
    a_entry = x
    entry_bn = _identity_bn_eps(specs[0][0], eps)
    acts, stats = [x], []
    for j, (cin, cout, act) in enumerate(specs):
        aD, mD, vD = _run_bn_dw(a_entry, entry_bn, p[f"k{pre}{j}"], H, NW,
                                act, eps, interpret, dt, axis, nsh,
                                wseg=wseg, bh=_bh_for(cin, NW), dil=dil)
        aP, mP, vP = _run_bn_pw(aD, _bn_pack(mD, vD, p[f"gd{pre}{j}"],
                                             p[f"bd{pre}{j}"]),
                                p[f"w{pre}{j}"], H, NW, False, eps,
                                interpret, dt, axis, nsh,
                                bh=_bh_for(max(cin, cout), NW))
        acts += [aD, aP]
        stats += [(mD, vD), (mP, vP)]
        a_entry = aP
        entry_bn = _bn_pack(mP, vP, p[f"gp{pre}{j}"], p[f"bp{pre}{j}"])
    return acts, stats


def _seg_bwd(gy, pn, p, pre, specs, dil, acts, stats, H, wseg, NW, M, eps,
             interpret, dp, g_psum):
    """Backward through a _seg_fwd segment. gy = dL/d(u) of the NEXT BN
    (pre-act) with pn its backward pack — identity if the caller already
    applied the last pw BN's backward. Returns dL/d(segment input)."""
    dt = acts[0].dtype
    for j in reversed(range(len(specs))):
        cin, cout, act = specs[j]
        aD, aP = acts[2 * j + 1], acts[2 * j + 2]
        (mD, vD), (mP, vP) = stats[2 * j], stats[2 * j + 1]
        bnD = _bn_pack(mD, vD, p[f"gd{pre}{j}"], p[f"bd{pre}{j}"])
        gyD, sD, dW = _run_pw_bwd(gy, aP, aD, pn, bnD, p[f"w{pre}{j}"],
                                  H, NW, False, eps, interpret, dt,
                                  bh=_bh_for(max(cin, cout), NW))
        sD = g_psum(sD)
        dp[f"w{pre}{j}"] = dW
        dp[f"gd{pre}{j}"] = sD[:, 1]
        dp[f"bd{pre}{j}"] = sD[:, 0]
        pnD = _bnbwd_pack(mD, vD, p[f"gd{pre}{j}"], sD[:, 0], sD[:, 1], M)
        if j == 0:
            entry_bn = _identity_bn_eps(cin, eps)
        else:
            mE, vE = stats[2 * j - 1]
            entry_bn = _bn_pack(mE, vE, p[f"gp{pre}{j - 1}"],
                                p[f"bp{pre}{j - 1}"])
        gy, sE, dk = _run_dw_bwd(gyD, aD, acts[2 * j], pnD, entry_bn,
                                 p[f"k{pre}{j}"], H, NW, eps, interpret, dt,
                                 wseg=wseg, bh=_bh_for(cin, NW), relu_k=act,
                                 dil=dil)
        sE = g_psum(sE)
        dp[f"k{pre}{j}"] = dk
        if j > 0:
            dp[f"gp{pre}{j - 1}"] = sE[:, 1]
            dp[f"bp{pre}{j - 1}"] = sE[:, 0]
            pn = _bnbwd_pack(stats[2 * j - 1][0], stats[2 * j - 1][1],
                             p[f"gp{pre}{j - 1}"], sE[:, 0], sE[:, 1], M)
    return gy


def _masked_moments(a, H, NW, M, g_psum):
    af = jnp.where(_valid_mask(a.shape, H, NW), a.astype(jnp.float32), 0.0)
    s = g_psum(af.sum(axis=(0, 1, 3)))
    s2 = g_psum((af * af).sum(axis=(0, 1, 3)))
    mu = s / M
    return mu, s2 / M - mu * mu


def _bn_fin_bwd(G, a, m, v, g, H, NW, M, eps, g_psum):
    """Train-BN backward of an XLA 'finish' BN: returns (ga, dgamma, dbeta).
    G must already be valid-masked."""
    inv = jax.lax.rsqrt(v + eps)
    xh = jnp.where(_valid_mask(a.shape, H, NW),
                   (a.astype(jnp.float32) - m[None, None, :, None])
                   * inv[None, None, :, None], 0.0)
    sg = g_psum(G.sum(axis=(0, 1, 3)))
    sgx = g_psum((G * xh).sum(axis=(0, 1, 3)))
    ga = ((g * inv)[None, None, :, None]
          * (G - (sg / M)[None, None, :, None]
             - xh * (sgx / M)[None, None, :, None]))
    return ga, sgx, sg


def _tail_fwd(x0, p, dil, H, wseg, NW, eps, interpret, axis=None, nsh=1,
              specs=None):
    """x0 (1,R,728,NWp) folded FINISHED middle-flow output. Returns
    (out folded (2048), stats, acts, skip residuals)."""
    specA, specB = specs or (_TAIL_A, _TAIL_B)
    dt = x0.dtype
    M = float(H * NW) * nsh
    g_psum = ((lambda u: jax.lax.psum(u, axis)) if axis is not None
              else (lambda u: u))
    actsA, statsA = _seg_fwd(x0, p, "eb", specA, dil, H, wseg, NW, eps,
                             interpret, axis, nsh)
    # skip branch (XLA): 1x1 conv over C + train BN
    xf = x0.astype(jnp.float32)
    s = jnp.einsum("oc,nrcl->nrol", p["wsk"].astype(jnp.float32), xf)
    msk, vsk = _masked_moments(s, H, NW, M, g_psum)
    xb = (_affine(actsA[-1], statsA[-1][0], statsA[-1][1], p["gpeb2"],
                  p["bpeb2"], eps)
          + _affine(s, msk, vsk, p["gsk"], p["bsk"], eps)).astype(dt)
    actsB, statsB = _seg_fwd(xb, p, "es", specB, dil, H, wseg, NW, eps,
                             interpret, axis, nsh)
    uB = _affine(actsB[-1], statsB[-1][0], statsB[-1][1], p["gpes2"],
                 p["bpes2"], eps)
    out = jnp.maximum(uB, 0.0).astype(dt)
    return out, (statsA, (msk, vsk), statsB), (actsA, s, actsB)


def _tail_bwd(p, dil, stats, acts, H, wseg, NW, g, eps, interpret,
              axis=None, nsh=1, specs=None):
    specA, specB = specs or (_TAIL_A, _TAIL_B)
    g_psum = ((lambda u: jax.lax.psum(u, axis)) if axis is not None
              else (lambda u: u))
    statsA, (msk, vsk), statsB = stats
    actsA, s, actsB = acts
    dt = actsA[0].dtype
    M = float(H * NW) * nsh
    dp = {}

    # finish B backward: relu mask + bnP_es2 backward
    uB = _affine(actsB[-1], statsB[-1][0], statsB[-1][1], p["gpes2"],
                 p["bpes2"], eps)
    Gm = jnp.where(_valid_mask(g.shape, H, NW), g.astype(jnp.float32), 0.0)
    Gm = Gm * (uB > 0.0)
    gaB, sgx, sg = _bn_fin_bwd(Gm, actsB[-1], statsB[-1][0], statsB[-1][1],
                               p["gpes2"], H, NW, M, eps, g_psum)
    dp["gpes2"] = g_psum(sgx)
    dp["bpes2"] = g_psum(sg)
    g_xb = _seg_bwd(gaB.astype(dt), _bnbwd_identity(specB[-1][1]), p,
                    "es", specB, dil, actsB, statsB, H, wseg, NW, M, eps,
                    interpret, dp, g_psum)

    # finish A backward: main branch bnP_eb2 + skip branch bn_skip
    Ga = jnp.where(_valid_mask(g_xb.shape, H, NW),
                   g_xb.astype(jnp.float32), 0.0)
    gaA, sgx, sg = _bn_fin_bwd(Ga, actsA[-1], statsA[-1][0], statsA[-1][1],
                               p["gpeb2"], H, NW, M, eps, g_psum)
    dp["gpeb2"] = g_psum(sgx)
    dp["bpeb2"] = g_psum(sg)
    gs, sgxs, sgs = _bn_fin_bwd(Ga, s, msk, vsk, p["gsk"], H, NW, M, eps,
                                g_psum)
    dp["gsk"] = g_psum(sgxs)
    dp["bsk"] = g_psum(sgs)
    xf = actsA[0].astype(jnp.float32)
    xv = jnp.where(_valid_mask(xf.shape, H, NW), xf, 0.0)
    dp["wsk"] = g_psum(jnp.einsum("nrol,nrcl->oc", gs, xv))
    gx_skip = jnp.einsum("oc,nrol->nrcl", p["wsk"].astype(jnp.float32), gs)

    gxA = _seg_bwd(gaA.astype(dt), _bnbwd_identity(specA[-1][1]), p,
                   "eb", specA, dil, actsA, statsA, H, wseg, NW, M, eps,
                   interpret, dp, g_psum)
    gx = (gxA.astype(jnp.float32) + gx_skip).astype(dt)

    wk = [k for k in dp if k[0] in "wk"]
    if axis is not None:
        for k, v in zip(wk, jax.lax.psum(tuple(dp[k] for k in wk), axis)):
            dp[k] = v
    return gx, {k: v.astype(p[k].dtype) for k, v in dp.items()}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_x_tail_train(x_nhwc, params, dil: int = 2, eps: float = 1e-5,
                       interpret: bool = False, specs=None):
    """Xception exit flow (exit_block + 3 exit seps), training mode.
    x_nhwc (N, H, W, 728) finished middle-flow output. Returns (out NHWC
    (2048), stats: (segA 6 pairs, skip pair, segB 6 pairs) flattened).
    specs: ((cin,cout,act)x3, (cin,cout,act)x3) override (tests)."""
    n, H, w, c = x_nhwc.shape
    nh, R = _geom(H, BH_XT)
    out, stats, acts = _tail_fwd(_fold(x_nhwc, R), params, dil, H, w,
                                 n * w, eps, interpret, specs=specs)
    statsA, sk, statsB = stats
    flat = tuple(statsA) + (sk,) + tuple(statsB)
    return _unfold(out, n, H, w), flat


def _xt_fwd_rule(x_nhwc, params, dil, eps, interpret, specs=None):
    n, H, w, c = x_nhwc.shape
    nh, R = _geom(H, BH_XT)
    out, stats, acts = _tail_fwd(_fold(x_nhwc, R), params, dil, H, w,
                                 n * w, eps, interpret, specs=specs)
    statsA, sk, statsB = stats
    flat = tuple(statsA) + (sk,) + tuple(statsB)
    return (_unfold(out, n, H, w), flat), (params, stats, acts,
                                           x_nhwc.shape)


def _xt_bwd_rule(dil, eps, interpret, specs, res, cts):
    p, stats, acts, x_shape = res
    n, H, w, c = x_shape
    nh, R = _geom(H, BH_XT)
    g = _fold(cts[0], R)
    gx, dp = _tail_bwd(p, dil, stats, acts, H, w, n * w, g, eps, interpret,
                       specs=specs)
    return _unfold(gx, n, H, w), dp


fused_x_tail_train.defvjp(_xt_fwd_rule, _xt_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_x_tail_train_sharded(x_nhwc, params, mesh, dil: int = 2,
                               eps: float = 1e-5, interpret: bool = False):
    (y, _) = _sh_xt_fwd(x_nhwc, params, mesh, dil, eps, interpret)
    return y


def _sh_xt_fwd(x_nhwc, params, mesh, dil, eps, interpret):
    global _sharded_xm_traces
    _sharded_xm_traces += 1
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(x, p):
        n, H, w, c = x.shape
        nh, R = _geom(H, BH_XT)
        out, stats, acts = _tail_fwd(_fold(x, R), p, dil, H, w, n * w, eps,
                                     interpret, axis, nsh)
        statsA, sk, statsB = stats
        flat = tuple(statsA) + (sk,) + tuple(statsB)
        return _unfold(out, n, H, w), flat, stats, acts

    out, flat, stats, acts = _shmap(local, mesh, (Pd, Pr),
                                    (Pd, Pr, Pr, Pd))(x_nhwc, params)
    return ((out, flat), (params, stats, acts, x_nhwc.shape))


def _sh_xt_fwd_rule(x_nhwc, params, mesh, dil, eps, interpret):
    return _sh_xt_fwd(x_nhwc, params, mesh, dil, eps, interpret)


def _sh_xt_bwd_rule(mesh, dil, eps, interpret, res, cts):
    p, stats, acts, x_shape = res
    _, H, w, c = x_shape
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(p, stats, acts, g):
        n_loc = g.shape[0]
        nh, R = _geom(H, BH_XT)
        gf = _fold(g, R)
        gx, dp = _tail_bwd(p, dil, stats, acts, H, w, n_loc * w, gf, eps,
                           interpret, axis, nsh)
        return _unfold(gx, n_loc, H, w), dp

    dx, dp = _shmap(local, mesh, (Pr, Pr, Pd, Pd), (Pd, Pr))(
        p, stats, acts, cts[0])
    return dx, dp


fused_x_tail_train_sharded.defvjp(_sh_xt_fwd_rule, _sh_xt_bwd_rule)


def tail_train_params(exit_block, exit_seps):
    """Extract the tail param dict from the exit modules."""
    p = {}
    for pre, seps in (("eb", (exit_block.sep1, exit_block.sep2,
                              exit_block.sep3)),
                      ("es", tuple(exit_seps))):
        for j, s in enumerate(seps):
            sep = s.sep
            kv = sep.depthwise.kernel[...]
            c = kv.shape[3]
            p[f"k{pre}{j}"] = jnp.transpose(kv[:, :, 0, :],
                                            (2, 0, 1)).reshape(c, 9)
            p[f"w{pre}{j}"] = sep.pointwise.kernel[...][0, 0].T
            p[f"gd{pre}{j}"] = sep.bn_dw.scale[...]
            p[f"bd{pre}{j}"] = sep.bn_dw.bias[...]
            p[f"gp{pre}{j}"] = s.bn.scale[...]
            p[f"bp{pre}{j}"] = s.bn.bias[...]
    p["wsk"] = exit_block.skip_conv.kernel[...][0, 0].T
    p["gsk"] = exit_block.skip_bn.scale[...]
    p["bsk"] = exit_block.skip_bn.bias[...]
    return p


# ---------------------------------------------------------------------------
# EVAL tail: one kernel per segment, BN folded into pw weights/biases,
# dilation-2 taps, in-kernel 1x1 skip branch and final relu
# ---------------------------------------------------------------------------

BH_XE_TAIL = int(os.environ.get("KDCC_XMID_BH_EVAL_TAIL", "4"))


def _k_seg_eval(x_ref, *refs, bh, H, W, wseg, dil, acts, skip, final_relu):
    """A 3-conv eval segment: (entry act -> dw3x3(dil) -> pw + bias) x3
    [+ skip 1x1 on the raw input] [+ final relu].

    refs: k0,w0,b0,k1,w1,b1,k2,w2,b2 [, wsk, bsk], then y_ref last.
    x halo (1, bh + 6*dil, C0, Wp) at global rows j*bh - 3*dil."""
    y_ref = refs[-1]
    consts = refs[:-1]
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    if skip:
        x_c = x[3 * dil:3 * dil + bh]
        x_c = jnp.where(_rows_in(bh, j, bh, 0, H), x_c, 0.0)
        x_c = _mask_lanes(x_c, W)
    h = x
    for i in range(3):
        k, w, b = consts[3 * i], consts[3 * i + 1], consts[3 * i + 2]
        rows = h.shape[0]
        if acts[i]:
            h = jnp.maximum(h, 0.0)
        h = jnp.where(_rows_in(rows, j, bh, (i - 3) * dil, H), h, 0.0)
        h = _mask_lanes(h, W)
        t = _dw_taps(h, k[...].astype(jnp.float32), rows - 2 * dil,
                     h.shape[2], wseg=wseg, dil=dil)
        bf = b[...].astype(jnp.float32)
        h = jnp.stack([_mm(w[...], t[r], y_ref.dtype) + bf
                       for r in range(rows - 2 * dil)], axis=0)
    if skip:
        wsk, bsk = consts[9], consts[10]
        bskf = bsk[...].astype(jnp.float32)
        h = h + jnp.stack([_mm(wsk[...], x_c[r], y_ref.dtype) + bskf
                           for r in range(bh)], axis=0)
    if final_relu:
        h = jnp.maximum(h, 0.0)
    y_ref[0] = h.astype(y_ref.dtype)


def _fold_sep_eval(sep_bn):
    """Folded (k, w'', b'') for one SepConvBN in eval mode."""
    sep = sep_bn.sep
    kv = sep.depthwise.kernel[...]
    c = kv.shape[3]
    k = jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(c, 9)
    w = sep.pointwise.kernel[...][0, 0].T.astype(jnp.float32)
    bd, bp = sep.bn_dw, sep_bn.bn
    sd = bd.scale[...] * jax.lax.rsqrt(bd.var[...] + bd.epsilon)
    td = bd.bias[...] - bd.mean[...] * sd
    sp = bp.scale[...] * jax.lax.rsqrt(bp.var[...] + bp.epsilon)
    tp = bp.bias[...] - bp.mean[...] * sp
    return k, sp[:, None] * w * sd[None, :], (sp * (w @ td) + tp)[:, None]


def _run_seg_eval(z, seps, dil, acts, skip_wb, final_relu, H, nw, wseg, dt,
                  interpret, bh):
    """One eval segment on the folded tensor z. seps: 3 SepConvBN modules;
    skip_wb: (wsk_folded, bsk_folded) or None."""
    nh = pl.cdiv(H, bh)
    W = z.shape[3]
    cout = seps[2].sep.pointwise.kernel[...].shape[3]
    consts, specs = [], []
    for s in seps:
        k, wf, bf = _fold_sep_eval(s)
        for arr in (k, wf.astype(dt), bf):
            consts.append(arr)
            specs.append(pl.BlockSpec(arr.shape,
                                      lambda i, j, nd=arr.ndim: (0,) * nd,
                                      memory_space=pltpu.VMEM))
    if skip_wb is not None:
        for arr in skip_wb:
            consts.append(arr)
            specs.append(pl.BlockSpec(arr.shape,
                                      lambda i, j, nd=arr.ndim: (0,) * nd,
                                      memory_space=pltpu.VMEM))
    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 6 * dil), pl.Element(z.shape[2]),
         pl.Element(W)),
        lambda i, j: (i, PAD + j * bh - 3 * dil, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_k_seg_eval, bh=bh, H=H, W=nw, wseg=wseg, dil=dil,
                          acts=acts, skip=skip_wb is not None,
                          final_relu=final_relu),
        out_shape=jax.ShapeDtypeStruct(
            (1, z.shape[1], cout, W), dt),
        grid=(1, nh),
        in_specs=[halo] + specs,
        out_specs=pl.BlockSpec((1, bh, cout, W),
                               lambda i, j, off=PAD // bh: (i, j + off, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret, compiler_params=_CP,
    )(z, *consts)
    return out


def fused_x_tail_eval(x_nhwc, exit_block, exit_seps, dil: int = 2,
                      interpret: bool = False, bh: int | None = None):
    """Exit flow in eval mode: two kernels (exit_block with in-kernel skip,
    then the three post-relu exit seps). Forward-only."""
    bh = bh or BH_XE_TAIL
    n, H, w, c = x_nhwc.shape
    nh, R = _geom(H, bh)
    dt = x_nhwc.dtype
    z = _fold(x_nhwc, R)
    sk = exit_block.skip_bn
    ssk = sk.scale[...] * jax.lax.rsqrt(sk.var[...] + sk.epsilon)
    tsk = sk.bias[...] - sk.mean[...] * ssk
    wsk = exit_block.skip_conv.kernel[...][0, 0].T.astype(jnp.float32)
    skip_wb = ((ssk[:, None] * wsk).astype(dt), tsk[:, None])
    z = _run_seg_eval(z, (exit_block.sep1, exit_block.sep2,
                          exit_block.sep3), dil, (True, True, True),
                      skip_wb, False, H, n * w, w, dt, interpret, bh)
    z = _run_seg_eval(z, tuple(exit_seps), dil, (False, True, True),
                      None, True, H, n * w, w, dt, interpret, bh)
    return _unfold(z, n, H, w)


# ---------------------------------------------------------------------------
# Entry flow blocks: sep1 (s1) -> sep2 (s1) -> sep3 (STRIDE 2) + 1x1/s2
# skip. Training mode; the stride-2 dw rides the stem's pair-view +
# block-diagonal selection-matmul machinery (irchain's f4 pattern), the
# skip branch runs in XLA on NHWC (strided slice + matmul + train BN).
# ---------------------------------------------------------------------------

from .stem import _geom as _stem_geom
from .stem import _run_bn_dw_s2, _run_dw_s2_bwd

BH_XT_S2B = int(os.environ.get("KDCC_XENTRY_BH_S2B", "2"))


def _entry_fwd(x_nhwc, p, act1, eps, interpret, axis=None, nsh=1):
    n, H, w, cin = x_nhwc.shape
    _, H2, _, R, R2 = _stem_geom(H)
    NW = n * w
    w2seg = (w + 1) // 2
    NW2 = n * w2seg
    dt = x_nhwc.dtype
    M = float(H * NW) * nsh

    x0 = _fold(x_nhwc, R)
    acts, stats = [x0], []
    a_entry, entry_bn, act = x0, _identity_bn_eps(cin, eps), act1
    for i in range(3):
        if i < 2:
            aD, mD, vD = _run_bn_dw(a_entry, entry_bn, p[f"k{i}"], H, NW,
                                    act, eps, interpret, dt, axis, nsh,
                                    wseg=w,
                                    bh=_bh_for(p[f"k{i}"].shape[0], NW))
            Ho, NWo = H, NW
        else:
            aD, mD, vD = _run_bn_dw_s2(a_entry, entry_bn, p[f"k{i}"], H, NW,
                                       R2, eps, interpret, dt, axis, nsh,
                                       n_img=n,
                                       bh=_bh_for(p[f"k{i}"].shape[0], NW),
                                       relu=act)
            Ho, NWo = H2, NW2
        aP, mP, vP = _run_bn_pw(aD, _bn_pack(mD, vD, p[f"gd{i}"],
                                             p[f"bd{i}"]),
                                p[f"w{i}"], Ho, NWo, False, eps, interpret,
                                dt, axis, nsh,
                                bh=_bh_for(max(p[f"w{i}"].shape), NWo))
        acts += [aD, aP]
        stats += [(mD, vD), (mP, vP)]
        a_entry = aP
        entry_bn = _bn_pack(mP, vP, p[f"gp{i}"], p[f"bp{i}"])
        act = "relu"

    main = _affine(acts[-1], stats[-1][0], stats[-1][1], p["gp2"], p["bp2"],
                   eps).astype(dt)
    # skip: 1x1/s2 conv + train BN, plain XLA on NHWC (x[::2, ::2])
    g_psum = ((lambda u: jax.lax.psum(u, axis)) if axis is not None
              else (lambda u: u))
    xs = x_nhwc[:, ::2, ::2, :].astype(jnp.float32)
    s = jnp.einsum("nhwc,oc->nhwo", xs, p["wsk"].astype(jnp.float32))
    cnt = float(xs.shape[0] * xs.shape[1] * xs.shape[2]) * nsh
    ms = g_psum(s.sum(axis=(0, 1, 2))) / cnt
    vs = g_psum((s * s).sum(axis=(0, 1, 2))) / cnt - ms * ms
    sk = ((s - ms) * jax.lax.rsqrt(vs + eps) * p["gsk"] + p["bsk"])
    out = _unfold(main, n, H2, w2seg) + sk.astype(dt)
    return out, stats + [(ms, vs)], (acts, s)


def _entry_bwd(p, act1, stats, acts_s, x_shape, g, eps, interpret,
               axis=None, nsh=1):
    acts, s = acts_s
    n, H, w, cin = x_shape
    _, H2, _, R, R2 = _stem_geom(H)
    NW = n * w
    w2seg = (w + 1) // 2
    NW2 = n * w2seg
    dt = acts[0].dtype
    M = float(H * NW) * nsh
    M2 = float(H2 * NW2) * nsh
    g_psum = ((lambda u: jax.lax.psum(u, axis)) if axis is not None
              else (lambda u: u))
    dp = {}

    gf = g.astype(jnp.float32)
    # skip branch backward (XLA, NHWC): bn_skip train backward
    ms, vs = stats[6]
    inv = jax.lax.rsqrt(vs + eps)
    xh = (s - ms) * inv
    sg = g_psum(gf.sum(axis=(0, 1, 2)))
    sgx = g_psum((gf * xh).sum(axis=(0, 1, 2)))
    cnt = float(s.shape[0] * s.shape[1] * s.shape[2]) * nsh
    gs = (p["gsk"] * inv) * (gf - sg / cnt - xh * (sgx / cnt))
    dp["gsk"] = sgx
    dp["bsk"] = sg
    # main branch: fold g, bnP3 backward at the low-res geometry
    gmain = _fold(g, R2)
    aP3 = acts[6]
    mP3, vP3 = stats[5]
    Gm = jnp.where(_valid_mask(gmain.shape, H2, NW2),
                   gmain.astype(jnp.float32), 0.0)
    invP = jax.lax.rsqrt(vP3 + eps)
    xhP = jnp.where(
        _valid_mask(aP3.shape, H2, NW2),
        (aP3.astype(jnp.float32) - mP3[None, None, :, None])
        * invP[None, None, :, None], 0.0)
    sgm = g_psum(Gm.sum(axis=(0, 1, 3)))
    sgxm = g_psum((Gm * xhP).sum(axis=(0, 1, 3)))
    gy = ((p["gp2"] * invP)[None, None, :, None]
          * (Gm - (sgm / M2)[None, None, :, None]
             - xhP * (sgxm / M2)[None, None, :, None])).astype(dt)
    dp["gp2"] = sgxm
    dp["bp2"] = sgm
    pn = _bnbwd_identity(p["w2"].shape[0])

    for i in reversed(range(3)):
        aD, aP = acts[2 * i + 1], acts[2 * i + 2]
        (mD, vD), (mP, vP) = stats[2 * i], stats[2 * i + 1]
        Ho, NWo, Mo = (H2, NW2, M2) if i == 2 else (H, NW, M)
        bnD = _bn_pack(mD, vD, p[f"gd{i}"], p[f"bd{i}"])
        gyD, sD, dW = _run_pw_bwd(gy, aP, aD, pn, bnD, p[f"w{i}"],
                                  Ho, NWo, False, eps, interpret, dt,
                                  bh=_bh_for(max(p[f"w{i}"].shape), NWo))
        sD = g_psum(sD)
        dp[f"w{i}"] = dW
        dp[f"gd{i}"] = sD[:, 1]
        dp[f"bd{i}"] = sD[:, 0]
        pnD = _bnbwd_pack(mD, vD, p[f"gd{i}"], sD[:, 0], sD[:, 1], Mo)
        if i == 0:
            entry_bn = _identity_bn_eps(cin, eps)
            act = act1
        else:
            mE, vE = stats[2 * i - 1]
            entry_bn = _bn_pack(mE, vE, p[f"gp{i - 1}"], p[f"bp{i - 1}"])
            act = "relu"
        if i == 2:
            gy, sE, dk = _run_dw_s2_bwd(gyD, aD, acts[2 * i], pnD, entry_bn,
                                        p[f"k{i}"], H, NW, eps, interpret,
                                        dt, n_img=n, bh=BH_XT_S2B,
                                        relu_k=act)
        else:
            gy, sE, dk = _run_dw_bwd(gyD, aD, acts[2 * i], pnD, entry_bn,
                                     p[f"k{i}"], H, NW, eps, interpret, dt,
                                     wseg=w,
                                     bh=_bh_for(p[f"k{i}"].shape[0], NW),
                                     relu_k=act)
        sE = g_psum(sE)
        dp[f"k{i}"] = dk
        if i > 0:
            dp[f"gp{i - 1}"] = sE[:, 1]
            dp[f"bp{i - 1}"] = sE[:, 0]
            # bnP_{i-1} lives at conv i's INPUT resolution — full-res for
            # every entry conv (only conv 2's OUTPUT is low-res)
            pn = _bnbwd_pack(stats[2 * i - 1][0], stats[2 * i - 1][1],
                             p[f"gp{i - 1}"], sE[:, 0], sE[:, 1], M)

    dx = _unfold(gy, n, H, w).astype(jnp.float32)
    # skip transpose: dx[::2, ::2] += gs @ Wsk; dWsk = sum gs . xs
    dxs = jnp.einsum("nhwo,oc->nhwc", gs, p["wsk"].astype(jnp.float32))
    dx = dx.at[:, ::2, ::2, :].add(dxs)
    # dWsk needs xs = x[::2, ::2]; x is acts[0] folded — unfold it
    x_rec = _unfold(acts[0], n, H, w).astype(jnp.float32)
    # NOT psum'd here: the weight-grad sweep below covers every 'w*'/'k*'
    dp["wsk"] = jnp.einsum("nhwo,nhwc->oc", gs, x_rec[:, ::2, ::2, :])

    wk = [k for k in dp if k[0] in "wk"]
    if axis is not None:
        for k, v in zip(wk, jax.lax.psum(tuple(dp[k] for k in wk), axis)):
            dp[k] = v
    return dx.astype(dt), {k: v.astype(p[k].dtype) for k, v in dp.items()}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_x_entry_block_train(x_nhwc, params, act1, eps: float = 1e-5,
                              interpret: bool = False):
    """One Xception entry block (sep1/sep2 stride-1, sep3 stride-2, 1x1/s2
    skip with its own train BN), training mode. act1 = sep1's pre-act
    ('relu', or False for block1's first_relu=False). Returns (out NHWC at
    (H+1)//2, stats: 6 conv (mean, var) pairs + the skip pair)."""
    out, stats, _ = _entry_fwd(x_nhwc, params, act1, eps, interpret)
    return out, tuple(stats)


def _xe_fwd_rule(x_nhwc, params, act1, eps, interpret):
    out, stats, acts_s = _entry_fwd(x_nhwc, params, act1, eps, interpret)
    return (out, tuple(stats)), (params, stats, acts_s, x_nhwc.shape)


def _xe_bwd_rule(act1, eps, interpret, res, cts):
    p, stats, acts_s, x_shape = res
    return _entry_bwd(p, act1, stats, acts_s, x_shape, cts[0], eps,
                      interpret)


fused_x_entry_block_train.defvjp(_xe_fwd_rule, _xe_bwd_rule)


def entry_block_params(blk):
    p = {}
    for i, s in enumerate((blk.sep1, blk.sep2, blk.sep3)):
        sep = s.sep
        kv = sep.depthwise.kernel[...]
        c = kv.shape[3]
        p[f"k{i}"] = jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(c, 9)
        p[f"w{i}"] = sep.pointwise.kernel[...][0, 0].T
        p[f"gd{i}"] = sep.bn_dw.scale[...]
        p[f"bd{i}"] = sep.bn_dw.bias[...]
        p[f"gp{i}"] = s.bn.scale[...]
        p[f"bp{i}"] = s.bn.bias[...]
    p["wsk"] = blk.skip_conv.kernel[...][0, 0].T
    p["gsk"] = blk.skip_bn.scale[...]
    p["bsk"] = blk.skip_bn.bias[...]
    return p


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_x_entry_block_train_sharded(x_nhwc, params, mesh, act1,
                                      eps: float = 1e-5,
                                      interpret: bool = False):
    """fused_x_entry_block_train over a batch-sharded x (params
    replicated); BN stats are GLOBAL batch moments (sync-BN)."""
    (y, _) = _sh_xe_fwd(x_nhwc, params, mesh, act1, eps, interpret)
    return y


def _sh_xe_fwd(x_nhwc, params, mesh, act1, eps, interpret):
    global _sharded_xm_traces
    _sharded_xm_traces += 1
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(x, p):
        out, stats, acts_s = _entry_fwd(x, p, act1, eps, interpret, axis,
                                        nsh)
        return out, tuple(stats), stats, acts_s

    out, flat, stats, acts_s = _shmap(local, mesh, (Pd, Pr),
                                      (Pd, Pr, Pr, Pd))(x_nhwc, params)
    return ((out, flat), (params, stats, acts_s, x_nhwc.shape))


def _sh_xe_fwd_rule(x_nhwc, params, mesh, act1, eps, interpret):
    return _sh_xe_fwd(x_nhwc, params, mesh, act1, eps, interpret)


def _sh_xe_bwd_rule(mesh, act1, eps, interpret, res, cts):
    p, stats, acts_s, x_shape = res
    n, H, w, cin = x_shape
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(p, stats, acts_s, g):
        n_loc = g.shape[0]
        return _entry_bwd(p, act1, stats, acts_s, (n_loc, H, w, cin), g,
                          eps, interpret, axis, nsh)

    dx, dp = _shmap(local, mesh, (Pr, Pr, Pd, Pd), (Pd, Pr))(
        p, stats, acts_s, cts[0])
    return dx, dp


fused_x_entry_block_train_sharded.defvjp(_sh_xe_fwd_rule, _sh_xe_bwd_rule)


def fused_x_entry_block_eval(x_nhwc, blk, interpret: bool = False):
    """Entry block in eval mode: the same dw/pw Pallas passes as the train
    chain but with RUNNING-stat BN packs (emitted batch moments are
    ignored). Forward-only — the config-#3 teacher and TTA path."""
    n, H, w, cin = x_nhwc.shape
    _, H2, _, R, R2 = _stem_geom(H)
    NW = n * w
    w2seg = (w + 1) // 2
    dt = x_nhwc.dtype
    eps = float(blk.sep1.sep.bn_dw.epsilon)

    def rs_pack(bn):
        return _bn_pack(bn.mean[...], bn.var[...], bn.scale[...],
                        bn.bias[...])

    seps = (blk.sep1, blk.sep2, blk.sep3)
    x0 = _fold(x_nhwc, R)
    a_entry = x0
    entry_bn = _identity_bn_eps(cin, eps)
    act = "relu" if blk.sep1.pre_relu else False
    for i, s in enumerate(seps):
        kv = s.sep.depthwise.kernel[...]
        c = kv.shape[3]
        k = jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(c, 9)
        wp = s.sep.pointwise.kernel[...][0, 0].T
        if i < 2:
            aD, _, _ = _run_bn_dw(a_entry, entry_bn, k, H, NW, act, eps,
                                  interpret, dt, wseg=w,
                                  bh=_bh_for(c, NW))
            Ho, NWo = H, NW
        else:
            aD, _, _ = _run_bn_dw_s2(a_entry, entry_bn, k, H, NW, R2, eps,
                                     interpret, dt, n_img=n,
                                     bh=_bh_for(c, NW), relu=act)
            Ho, NWo = H2, n * w2seg
        aP, _, _ = _run_bn_pw(aD, rs_pack(s.sep.bn_dw), wp, Ho, NWo, False,
                              eps, interpret, dt,
                              bh=_bh_for(max(wp.shape), NWo))
        a_entry = aP
        entry_bn = rs_pack(s.bn)
        act = "relu"

    bn3 = blk.sep3.bn
    main = _affine(a_entry, bn3.mean[...], bn3.var[...], bn3.scale[...],
                   bn3.bias[...], eps).astype(dt)
    sk = blk.skip_bn(blk.skip_conv(x_nhwc))
    return _unfold(main, n, H2, w2seg) + sk.astype(dt)
