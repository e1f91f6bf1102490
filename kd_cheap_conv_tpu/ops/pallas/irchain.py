"""Fused MobileNetV2 inverted-residual chain features[3..6] in the
batch-folded channel-sublane layout (1, R, C, N·W).

Why a THIRD layout: at 129²/65² every 2-D layout pads badly — NHWC lane-pads
C144->256 (1.78x) and C24->128 (5.3x); channel-sublane (stem layout, W on
lanes) pads W129->256 (1.98x). Folding the batch into the lane dim gives
lanes = N·W = 16·129 = 2064 -> 2176 (1.05x pad) while C=24/32/144/192 are
exact sublane multiples — the whole cluster's HBM traffic roughly halves vs
either alternative, and the grid collapses to H-blocks only. Profiled round 3
(xplane, b16/513²): this stock-XLA cluster costs 9.4 ms fwd+bwd against a
2.8 ms conv-only bound, almost all of it in the backward.

Implementation: the generic BN-barrier pass runners from ops.pallas.stem
(`_run_bn_pw`, `_run_bn_dw`, `_run_bn_dw_s2` + their backward links), which
are layout-agnostic given `wseg` (per-image lane-segment width: dw-tap rolls
mask at every multiple of wseg) and `n_img` (block-diagonal stride-2
selection matrices). Arrays keep the stem's uniform padded row layout with a
leading N=1 dim, so every runner works unchanged.

Per block b (IR: expand pw -> bn+relu6 -> dw3x3 [s1|s2] -> bn+relu6 ->
project pw -> bn [+ residual]):
    aE, mE = pw(x_b,  identity-bn, We)      # x_b is a FINISHED tensor
    aD, mD = dw(aE,   bnE(mE)+relu6, k)     # s1 or s2
    aP, mP = pw(aD,   bnD(mD)+relu6, Wp)
    x_{b+1} = bnP(aP) [+ x_b]               # XLA elementwise 'finish'
The finish runs in XLA on the small C24/32 tensors (~26 MB) — only the
expanded C144/192 tensors stay inside Pallas passes. The backward mirrors
the stem's two-phase BN-backward links in reverse, with the residual grad
added between blocks and the low_level cotangent injected at the f3/f4
boundary.

Reference semantics: torchvision MobileNetV2 InvertedResidual (SURVEY.md
§2.1); numerics pinned against the stock NNX path by tests/test_pallas_ir.py
(values, grads, BN batch stats).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Row-block height for the chain's passes. The NW-folded lane dim is wide
# (2176 lanes at b16/129²), so BH=16 blocks blow Mosaic's scoped-VMEM limit
# (measured 109M vs the 100M cap on the C144 dw pass); 8 fits comfortably.
BH_IR = int(os.environ.get("KDCC_IR_BH", "8"))
# The stride-2 dw BACKWARD holds ~3x more live f32 per row (3 lane-transform
# tensors + even/odd splits + the pair-view window) — at bh=8 the register
# allocator spills 82 MiB to VMEM (163M total vs the 128M chip). Smaller
# blocks for just that pass.
BH_IR_S2B = int(os.environ.get("KDCC_IR_BH_S2B", "2"))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import (_CP, PAD, _bn_pack, _bnbwd_identity, _bnbwd_pack, _geom,
                   _lanes, _run_bn_dw, _run_bn_dw_s2, _run_bn_pw,
                   _run_dw_bwd, _run_dw_s2_bwd, _run_pw_bwd)


def _identity_bn_eps(c, eps):
    """BN pack that makes _bn_apply exactly the identity:
    (x - 0) * rsqrt((1-eps) + eps) * 1 + 0 = x."""
    z = jnp.zeros((c,), jnp.float32)
    one = jnp.ones((c,), jnp.float32)
    return jnp.stack([z, one - eps, one, z], axis=1)


def _affine(a, m, v, g, b, eps):
    """Train-mode BN affine with known batch moments, on the padded array
    (garbage pad rows stay garbage — every consumer masks reads)."""
    inv = jax.lax.rsqrt(v + eps)
    return ((a.astype(jnp.float32) - m[None, None, :, None])
            * (inv * g)[None, None, :, None]
            + b[None, None, :, None])


def _valid_mask(shape, H, NW):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    return (row >= PAD) & (row < PAD + H) & (lane < NW)


# block spec: (stride, Cin, Ce, Cout, residual)
_BLOCKS = ((1, 24, 144, 24, True),     # f3
           (2, 24, 144, 32, False),    # f4
           (1, 32, 192, 32, True),     # f5
           (1, 32, 192, 32, True))     # f6


def _ir_fwd(x0, p, n_img, H0, W0, eps, interpret, axis=None, nsh=1):
    """x0: (1, R, 24, NWp) padded FINISHED entry (f2 output) in NW layout.
    p: dict with we{i} (Ce,Cin), k{i} (Ce,9), wp{i} (Cout,Ce), and
    ge/be/gd/bd/gp/bp{i} BN affine pairs, i in 0..3.
    Returns (x_out, low_level (= f3 out), stats, acts)."""
    dt = x0.dtype
    H, wseg = H0, W0
    NW = n_img * wseg
    x = x0
    stats, acts = [], []
    low = None
    for i, (stride, cin, ce, cout, res) in enumerate(_BLOCKS):
        aE, mE, vE = _run_bn_pw(x, _identity_bn_eps(cin, eps), p[f"we{i}"],
                                H, NW, False, eps, interpret, dt, axis, nsh,
                                bh=BH_IR)
        bnE = _bn_pack(mE, vE, p[f"ge{i}"], p[f"be{i}"])
        if stride == 1:
            aD, mD, vD = _run_bn_dw(aE, bnE, p[f"k{i}"], H, NW, True, eps,
                                    interpret, dt, axis, nsh, wseg=wseg,
                                    bh=BH_IR)
            Hd, wsegd = H, wseg
        else:
            R2 = _geom(H)[4]
            aD, mD, vD = _run_bn_dw_s2(aE, bnE, p[f"k{i}"], H, NW, R2, eps,
                                       interpret, dt, axis, nsh,
                                       n_img=n_img, bh=BH_IR)
            Hd, wsegd = (H + 1) // 2, (wseg + 1) // 2
        NWd = n_img * wsegd
        bnD = _bn_pack(mD, vD, p[f"gd{i}"], p[f"bd{i}"])
        aP, mP, vP = _run_bn_pw(aD, bnD, p[f"wp{i}"], Hd, NWd, True, eps,
                                interpret, dt, axis, nsh, bh=BH_IR)
        xn = _affine(aP, mP, vP, p[f"gp{i}"], p[f"bp{i}"], eps)
        if res:
            xn = xn + x.astype(jnp.float32)
        xn = xn.astype(dt)
        acts.append((x, aE, aD, aP))
        stats.append(((mE, vE), (mD, vD), (mP, vP)))
        x = xn
        H, wseg, NW = Hd, wsegd, NWd
        if i == 0:
            low = x                                   # f3 output tap
    return x, low, stats, acts


def _nhwc_to_nw(x, R):
    """(N, H, W, C) -> padded (1, R, C, NWp). R must match the row extent of
    the arrays the result is combined with (entry/129² arrays use
    _geom(129)[3]; post-stride-2 65² arrays use _geom(129)[4])."""
    n, h, w, c = x.shape
    nw = n * w
    z = jnp.transpose(x, (1, 3, 0, 2)).reshape(h, c, nw)[None]
    return jnp.pad(z, ((0, 0), (PAD, R - PAD - h), (0, 0),
                       (0, _lanes(nw) - nw)))


def _nw_to_nhwc(z, n_img, H, wseg):
    """(1, R, C, NWp) padded -> (N, H, W, C)."""
    c = z.shape[2]
    v = z[0, PAD:PAD + H, :, :n_img * wseg]
    v = v.reshape(H, c, n_img, wseg)
    return jnp.transpose(v, (2, 0, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_ir_chain(x_nhwc, params, n_img, eps: float = 1e-5,
                   interpret: bool = False):
    """MobileNetV2 features[3..6] fused, training mode.

    x_nhwc: f2 output (N, H, W, 24) NHWC (finished: BN applied); H=W=129 in
    the real model, smaller in interpret-mode tests.
    Returns (f6 out at (H+1)//2, low_level = f3 out at H,
    stats: tuple of 12 (mean, var) pairs ordered (E, D, P) per block).
    """
    _, H0, W0, _ = x_nhwc.shape
    out, low, stats, _ = _ir_fwd(_nhwc_to_nw(x_nhwc, _geom(H0)[3]), params,
                                 n_img, H0, W0, eps, interpret)
    flat = tuple(mv for blk in stats for mv in blk)
    return (_nw_to_nhwc(out, n_img, (H0 + 1) // 2, (W0 + 1) // 2),
            _nw_to_nhwc(low, n_img, H0, W0), flat)


def _ir_fwd_rule(x_nhwc, params, n_img, eps, interpret):
    _, H0, W0, _ = x_nhwc.shape
    x0 = _nhwc_to_nw(x_nhwc, _geom(H0)[3])
    out, low, stats, acts = _ir_fwd(x0, params, n_img, H0, W0, eps,
                                    interpret)
    flat = tuple(mv for blk in stats for mv in blk)
    y = (_nw_to_nhwc(out, n_img, (H0 + 1) // 2, (W0 + 1) // 2),
         _nw_to_nhwc(low, n_img, H0, W0), flat)
    return y, (params, stats, acts, H0, W0)


def _ir_bwd_impl(p, stats, acts, H0, W0, g_out_nhwc, g_low_nhwc, n_img, eps,
                 interpret, axis=None, nsh=1, nw_dx=False):
    g_psum = ((lambda v: jax.lax.psum(v, axis)) if axis is not None
              else (lambda v: v))
    dt = acts[0][0].dtype
    dp = {}
    # geometry per block (input-side H/wseg)
    geo = []
    H, wseg = H0, W0
    for stride, *_ in _BLOCKS:
        geo.append((H, wseg))
        if stride == 2:
            H, wseg = (H + 1) // 2, (wseg + 1) // 2

    # f6-side arrays carry the post-stride-2 row extent R2(H0); H0-side
    # arrays (g_low joins at the f3/f4 boundary) carry R(H0)
    G = _nhwc_to_nw(g_out_nhwc, _geom(H0)[4]).astype(dt)
    g_low = _nhwc_to_nw(g_low_nhwc, _geom(H0)[3]).astype(dt)

    for i in reversed(range(len(_BLOCKS))):
        stride, cin, ce, cout, res = _BLOCKS[i]
        Hin, wsin = geo[i]
        Ho = Hin if stride == 1 else (Hin + 1) // 2
        wso = wsin if stride == 1 else (wsin + 1) // 2
        NWo, NWi = n_img * wso, n_img * wsin
        x_in, aE, aD, aP = acts[i]
        (mE, vE), (mD, vD), (mP, vP) = stats[i]
        Mo = float(Ho * NWo) * nsh
        Mi = float(Hin * NWi) * nsh

        # finish backward (XLA): bnP train-mode backward with global sums
        Gm = jnp.where(_valid_mask(G.shape, Ho, NWo), G.astype(jnp.float32),
                       0.0)
        invP = jax.lax.rsqrt(vP + eps)
        xhP = jnp.where(
            _valid_mask(aP.shape, Ho, NWo),
            (aP.astype(jnp.float32) - mP[None, None, :, None])
            * invP[None, None, :, None], 0.0)
        sgP = g_psum(Gm.sum(axis=(0, 1, 3)))
        sgxP = g_psum((Gm * xhP).sum(axis=(0, 1, 3)))
        gaP = ((p[f"gp{i}"] * invP)[None, None, :, None]
               * (Gm - (sgP / Mo)[None, None, :, None]
                  - xhP * (sgxP / Mo)[None, None, :, None])).astype(dt)
        dp[f"gp{i}"] = sgxP
        dp[f"bp{i}"] = sgP

        # project pw link (bnD relu6 -> pw): gaP arrives fully BN-backwarded
        bnD = _bn_pack(mD, vD, p[f"gd{i}"], p[f"bd{i}"])
        gyD, sD, dWp = _run_pw_bwd(gaP, aP, aD, _bnbwd_identity(cout), bnD,
                                   p[f"wp{i}"], Ho, NWo, True, eps,
                                   interpret, dt, bh=BH_IR)
        sD = g_psum(sD)
        dp[f"wp{i}"] = dWp
        dp[f"gd{i}"] = sD[:, 1]
        dp[f"bd{i}"] = sD[:, 0]

        # dw link (bnE relu6 -> dw)
        pnD = _bnbwd_pack(mD, vD, p[f"gd{i}"], sD[:, 0], sD[:, 1], Mo)
        bnE = _bn_pack(mE, vE, p[f"ge{i}"], p[f"be{i}"])
        if stride == 1:
            gyE, sE, dk = _run_dw_bwd(gyD, aD, aE, pnD, bnE, p[f"k{i}"],
                                      Hin, NWi, eps, interpret, dt,
                                      wseg=wsin, bh=BH_IR)
        else:
            gyE, sE, dk = _run_dw_s2_bwd(gyD, aD, aE, pnD, bnE, p[f"k{i}"],
                                         Hin, NWi, eps, interpret, dt,
                                         n_img=n_img, bh=BH_IR_S2B)
        sE = g_psum(sE)
        dp[f"k{i}"] = dk
        dp[f"ge{i}"] = sE[:, 1]
        dp[f"be{i}"] = sE[:, 0]

        # expand pw link (identity input-"BN": x_in is finished)
        pnE = _bnbwd_pack(mE, vE, p[f"ge{i}"], sE[:, 0], sE[:, 1], Mi)
        gx, _, dWe = _run_pw_bwd(gyE, aE, x_in, pnE,
                                 _identity_bn_eps(cin, eps),
                                 p[f"we{i}"], Hin, NWi, False, eps,
                                 interpret, dt, bh=BH_IR)
        dp[f"we{i}"] = dWe

        G = gx
        if res:
            G = (G.astype(jnp.float32) + Gm).astype(dt)
        if i == 1:
            # low_level tap grad joins at the f3/f4 boundary
            G = (G.astype(jnp.float32)
                 + g_low.astype(jnp.float32)).astype(dt)

    if axis is not None:
        wg = jax.lax.psum(tuple(dp[k] for k in dp if k[0] in "wk"), axis)
        for k, v in zip([k for k in dp if k[0] in "wk"], wg):
            dp[k] = v

    dpc = {k: v.astype(p[k].dtype) for k, v in dp.items()}
    # nw_dx: hand the entry cotangent back in the padded NW layout (direct
    # stem handoff — stem's bwd slices the valid region itself)
    dx = G if nw_dx else _nw_to_nhwc(G, n_img, H0, W0)
    return dx, dpc


def _ir_bwd_rule(n_img, eps, interpret, res, cts):
    p, stats, acts, H0, W0 = res
    g_out, g_low = cts[0], cts[1]                    # stats cotangents unused
    return _ir_bwd_impl(p, stats, acts, H0, W0, g_out, g_low, n_img, eps,
                        interpret)


fused_ir_chain.defvjp(_ir_fwd_rule, _ir_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_ir_chain_nw(x_nw, params, n_img, H0, W0, eps: float = 1e-5,
                      interpret: bool = False):
    """fused_ir_chain consuming the entry DIRECTLY in the padded NW layout
    (1, _geom(H0)[3], 24, _lanes(n_img*W0)) — i.e. stem.fused_stem_f1f2_nw's
    output; the entry cotangent is returned in the same layout. Eliminates
    the lane-padded NHWC handoff both ways (VERDICT r3 item 2). Outputs
    (f6 out, low_level) stay NHWC — they feed stock XLA modules."""
    out, low, stats, _ = _ir_fwd(x_nw, params, n_img, H0, W0, eps, interpret)
    flat = tuple(mv for blk in stats for mv in blk)
    return (_nw_to_nhwc(out, n_img, (H0 + 1) // 2, (W0 + 1) // 2),
            _nw_to_nhwc(low, n_img, H0, W0), flat)


def _ir_nw_fwd_rule(x_nw, params, n_img, H0, W0, eps, interpret):
    out, low, stats, acts = _ir_fwd(x_nw, params, n_img, H0, W0, eps,
                                    interpret)
    flat = tuple(mv for blk in stats for mv in blk)
    y = (_nw_to_nhwc(out, n_img, (H0 + 1) // 2, (W0 + 1) // 2),
         _nw_to_nhwc(low, n_img, H0, W0), flat)
    return y, (params, stats, acts)


def _ir_nw_bwd_rule(n_img, H0, W0, eps, interpret, res, cts):
    p, stats, acts = res
    g_out, g_low = cts[0], cts[1]
    return _ir_bwd_impl(p, stats, acts, H0, W0, g_out, g_low, n_img, eps,
                        interpret, nw_dx=True)


fused_ir_chain_nw.defvjp(_ir_nw_fwd_rule, _ir_nw_bwd_rule)


# ---------------------------------------------------------------------------
# SPMD variant: the same passes wrapped in shard_map over a 1-D data mesh
# (pallas_call has no GSPMD partitioning rule). The batch shards along the
# NHWC N dim; each shard folds its LOCAL images into lanes, and every BN
# moment / BN-backward total / weight grad is psum'd — sync-BN semantics,
# numerically identical to the unsharded global batch.
# ---------------------------------------------------------------------------


def _shmap(fn, mesh, in_specs, out_specs):
    from jax import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


def _sh_specs(mesh):
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return axis, P(axis), P()


# trace-time evidence counter (see ops.pallas.losses.sharded_fused_trace_count)
_sharded_ir_traces = 0


def sharded_ir_trace_count() -> int:
    return _sharded_ir_traces


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_ir_chain_sharded(x_nhwc, params, mesh, eps: float = 1e-5,
                           interpret: bool = False):
    """fused_ir_chain over a batch-sharded x on `mesh` (1-D data mesh);
    params replicated. Same returns; BN stats are GLOBAL batch moments."""
    (y, _) = _sh_ir_fwd(x_nhwc, params, mesh, eps, interpret)
    return y


def _sh_ir_fwd(x_nhwc, params, mesh, eps, interpret):
    global _sharded_ir_traces
    _sharded_ir_traces += 1
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(x, p):
        n_loc, H0, W0, _ = x.shape
        x0 = _nhwc_to_nw(x, _geom(H0)[3])
        out, low, stats, acts = _ir_fwd(x0, p, n_loc, H0, W0, eps,
                                        interpret, axis, nsh)
        flat = tuple(mv for blk in stats for mv in blk)
        return (_nw_to_nhwc(out, n_loc, (H0 + 1) // 2, (W0 + 1) // 2),
                _nw_to_nhwc(low, n_loc, H0, W0), flat, stats, acts)

    out, low, flat, stats, acts = _shmap(
        local, mesh, (Pd, Pr), (Pd, Pd, Pr, Pr, Pd))(x_nhwc, params)
    H0, W0 = x_nhwc.shape[1], x_nhwc.shape[2]
    return ((out, low, flat),
            (params, stats, acts, H0, W0, x_nhwc.shape[0]))


def _sh_ir_fwd_rule(x_nhwc, params, mesh, eps, interpret):
    return _sh_ir_fwd(x_nhwc, params, mesh, eps, interpret)


def _sh_ir_bwd_rule(mesh, eps, interpret, res, cts):
    p, stats, acts, H0, W0, n_glob = res
    g_out, g_low = cts[0], cts[1]
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(p, stats, acts, g_out, g_low):
        return _ir_bwd_impl(p, stats, acts, H0, W0, g_out, g_low,
                            g_out.shape[0], eps, interpret, axis, nsh)

    dx, dp = _shmap(local, mesh, (Pr, Pr, Pd, Pd, Pd),
                    (Pd, Pr))(p, stats, acts, g_out, g_low)
    return dx, dp


fused_ir_chain_sharded.defvjp(_sh_ir_fwd_rule, _sh_ir_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def fused_ir_chain_sharded_nw(x_nw, params, mesh, n_loc, H0, W0,
                              eps: float = 1e-5, interpret: bool = False):
    """fused_ir_chain_sharded consuming stem.fused_stem_f1f2_sharded_nw's
    shard-major NW output (nsh, R_ir, 24, _lanes(n_loc*W0)) — one
    (1, R, C, NWp) slice per device, no NHWC handoff. Outputs stay NHWC
    (batch-sharded); BN stats are GLOBAL batch moments."""
    (y, _) = _sh_ir_nw_fwd(x_nw, params, mesh, n_loc, H0, W0, eps, interpret)
    return y


def _sh_ir_nw_fwd(x_nw, params, mesh, n_loc, H0, W0, eps, interpret):
    global _sharded_ir_traces
    _sharded_ir_traces += 1
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(x0, p):
        out, low, stats, acts = _ir_fwd(x0, p, n_loc, H0, W0, eps,
                                        interpret, axis, nsh)
        flat = tuple(mv for blk in stats for mv in blk)
        return (_nw_to_nhwc(out, n_loc, (H0 + 1) // 2, (W0 + 1) // 2),
                _nw_to_nhwc(low, n_loc, H0, W0), flat, stats, acts)

    out, low, flat, stats, acts = _shmap(
        local, mesh, (Pd, Pr), (Pd, Pd, Pr, Pr, Pd))(x_nw, params)
    return ((out, low, flat), (params, stats, acts))


def _sh_ir_nw_fwd_rule(x_nw, params, mesh, n_loc, H0, W0, eps, interpret):
    return _sh_ir_nw_fwd(x_nw, params, mesh, n_loc, H0, W0, eps, interpret)


def _sh_ir_nw_bwd_rule(mesh, n_loc, H0, W0, eps, interpret, res, cts):
    p, stats, acts = res
    g_out, g_low = cts[0], cts[1]
    axis, Pd, Pr = _sh_specs(mesh)
    nsh = mesh.shape[axis]

    def local(p, stats, acts, g_out, g_low):
        return _ir_bwd_impl(p, stats, acts, H0, W0, g_out, g_low, n_loc,
                            eps, interpret, axis, nsh, nw_dx=True)

    dx, dp = _shmap(local, mesh, (Pr, Pr, Pd, Pd, Pd),
                    (Pd, Pr))(p, stats, acts, g_out, g_low)
    return dx, dp


fused_ir_chain_sharded_nw.defvjp(_sh_ir_nw_fwd_rule, _sh_ir_nw_bwd_rule)


# ---------------------------------------------------------------------------
# EVAL: folded-BN inverted-residual kernels (one per block) for inference
# (TTA, config #5) and eval epochs. BN affines fold into the expand/project
# weights and the dw kernel; relu6 stays in-kernel. Forward-only.
# ---------------------------------------------------------------------------

BH_IR_EVAL = int(os.environ.get("KDCC_IR_BH_EVAL", "8"))


def _k_ir_eval(x_ref, *refs, bh, H, W, wseg, dil, expand, res):
    """One s1 inverted residual: [pw-expand + relu6] -> dw3x3(dil) + relu6
    -> pw-project [+ residual]. refs = [we, be,] kd, bd, wp, bp, y_ref.
    x halo (1, bh+2*dil, Cin, Wp) at rows j*bh-dil; biases (C, 1)."""
    from .stem import _dw_taps, _mask_lanes, _mm, _rows_in

    y_ref = refs[-1]
    consts = refs[:-1]
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    if res:
        x_c = jnp.where(_rows_in(bh, j, bh, 0, H), x[dil:dil + bh], 0.0)
        x_c = _mask_lanes(x_c, W)
    if expand:
        we, be = consts[0], consts[1]
        consts = consts[2:]
        bef = be[...].astype(jnp.float32)
        h = jnp.stack([_mm(we[...], x[r], y_ref.dtype) + bef
                       for r in range(x.shape[0])], axis=0)
        h = jnp.clip(h, 0.0, 6.0)
    else:
        h = x
    kd, bd, wp, bp = consts
    h = jnp.where(_rows_in(h.shape[0], j, bh, -dil, H), h, 0.0)
    h = _mask_lanes(h, W)
    t = _dw_taps(h, kd[...].astype(jnp.float32), bh, h.shape[2],
                 wseg=wseg, dil=dil)
    h2 = jnp.clip(t + bd[...].astype(jnp.float32), 0.0, 6.0)
    bpf = bp[...].astype(jnp.float32)
    h3 = jnp.stack([_mm(wp[...], h2[r], y_ref.dtype) + bpf
                    for r in range(bh)], axis=0)
    if res:
        h3 = h3 + x_c
    y_ref[0] = h3.astype(y_ref.dtype)


def _bn_fold_eval(bn):
    s = bn.scale[...] * jax.lax.rsqrt(bn.var[...] + bn.epsilon)
    return s, bn.bias[...] - bn.mean[...] * s


def _fold_ir_eval(f, dt):
    """(consts, expand, dil, cout) for one eval InvertedResidual."""
    consts = []
    expand = len(f.body) == 2
    if expand:
        e = f.body[0]
        s, t = _bn_fold_eval(e.bn)
        consts += [(s[:, None] * e.conv.kernel[...][0, 0].T.astype(
            jnp.float32)).astype(dt), t[:, None]]
    d = f.body[-1]
    s, t = _bn_fold_eval(d.bn)
    kv = d.conv.kernel[...]
    c = kv.shape[3]
    kd = jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(c, 9)
    consts += [kd * s[:, None], t[:, None]]
    s, t = _bn_fold_eval(f.pw_bn)
    consts += [(s[:, None] * f.pw_linear.kernel[...][0, 0].T.astype(
        jnp.float32)).astype(dt), t[:, None]]
    return consts, expand, int(d.conv.dilation[0]), \
        f.pw_linear.kernel[...].shape[3]


def ir_block_fusable(f) -> bool:
    try:
        d = f.body[-1].conv
        return (d.kernel_size == (3, 3) and d.stride == (1, 1)
                and d.groups == d.in_channels and d.bias is None
                and f.pw_linear.kernel_size == (1, 1)
                and f.pw_linear.bias is None
                and (len(f.body) == 1
                     or f.body[0].conv.kernel_size == (1, 1)))
    except AttributeError:
        return False


def fused_mnv2_blocks_eval(x_nhwc, blocks, interpret: bool = False,
                           bh: int | None = None):
    """Run consecutive stride-1 InvertedResiduals in eval mode, one folded
    kernel per block (only block input/output touch HBM)."""
    from .stem import _lanes

    bh = bh or BH_IR_EVAL
    n, H, w, c = x_nhwc.shape
    nh = pl.cdiv(H, bh)
    R = PAD + (nh + 1) * bh
    dt = x_nhwc.dtype
    z = _nhwc_to_nw(x_nhwc, R)
    W = z.shape[3]
    for f in blocks:
        consts, expand, dil, cout = _fold_ir_eval(f, dt)
        halo = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 2 * dil),
             pl.Element(z.shape[2]), pl.Element(W)),
            lambda i, j, d=dil: (i, PAD + j * bh - d, 0, 0),
            memory_space=pltpu.VMEM)
        specs = [pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for a in consts]
        z = pl.pallas_call(
            functools.partial(_k_ir_eval, bh=bh, H=H, W=n * w, wseg=w,
                              dil=dil, expand=expand,
                              res=f.use_res_connect),
            out_shape=jax.ShapeDtypeStruct((1, R, cout, W), dt),
            grid=(1, nh),
            in_specs=[halo] + specs,
            out_specs=pl.BlockSpec(
                (1, bh, cout, W),
                lambda i, j, off=PAD // bh: (i, j + off, 0, 0),
                memory_space=pltpu.VMEM),
            interpret=interpret, compiler_params=_CP,
        )(z, *consts)
    return _nw_to_nhwc(z, n, H, w)


def fused_ir_block_s2_eval(x_nhwc, f, interpret: bool = False):
    """A stride-2 InvertedResidual in eval mode via the BN-barrier pass
    runners with RUNNING-stat packs (batch moments ignored): expand pw ->
    relu6 -> dw3x3 s2 -> relu6 -> project pw -> affine. Forward-only."""
    from .stem import _geom as _sgeom
    from .stem import _run_bn_dw_s2

    n, H, w, cin = x_nhwc.shape
    _, H2, _, R, R2 = _sgeom(H)
    NW = n * w
    w2seg = (w + 1) // 2
    dt = x_nhwc.dtype
    eps = float(f.pw_bn.epsilon)

    def rs_pack(bn):
        return _bn_pack(bn.mean[...], bn.var[...], bn.scale[...],
                        bn.bias[...])

    x0 = _nhwc_to_nw(x_nhwc, R)
    expand = len(f.body) == 2
    if expand:
        e = f.body[0]
        we = e.conv.kernel[...][0, 0].T
        aE, _, _ = _run_bn_pw(x0, _identity_bn_eps(cin, eps), we, H, NW,
                              False, eps, interpret, dt, bh=BH_IR)
        entry_bn = rs_pack(e.bn)
    else:
        aE, entry_bn = x0, _identity_bn_eps(cin, eps)
    d = f.body[-1]
    kv = d.conv.kernel[...]
    c = kv.shape[3]
    kd = jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(c, 9)
    aD, _, _ = _run_bn_dw_s2(aE, entry_bn, kd, H, NW, R2, eps, interpret,
                             dt, n_img=n, bh=BH_IR, relu=True)
    wp = f.pw_linear.kernel[...][0, 0].T
    aP, _, _ = _run_bn_pw(aD, rs_pack(d.bn), wp, H2, n * w2seg, True, eps,
                          interpret, dt, bh=BH_IR)
    bn = f.pw_bn
    out = _affine(aP, bn.mean[...], bn.var[...], bn.scale[...],
                  bn.bias[...], eps).astype(dt)
    return _nw_to_nhwc(out, n, H2, w2seg)


def ir_block_s2_fusable(f) -> bool:
    try:
        d = f.body[-1].conv
        return (d.kernel_size == (3, 3) and d.stride == (2, 2)
                and d.dilation == (1, 1) and d.groups == d.in_channels
                and d.bias is None and not f.use_res_connect
                and f.pw_linear.kernel_size == (1, 1)
                and f.pw_linear.bias is None
                and (len(f.body) == 1
                     or f.body[0].conv.kernel_size == (1, 1)))
    except AttributeError:
        return False
