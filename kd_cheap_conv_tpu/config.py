"""Global runtime knobs.

`use_pallas_separable`: None = auto (on when the default JAX backend is TPU),
True/False = force. The fused kernel only engages for shape-preserving
stride-1 separable pairs; everything else uses the XLA conv path regardless.
Env override: KDCC_PALLAS=0/1.
"""

from __future__ import annotations

import contextlib
import os

# When True, every fast-path knob below reports disabled regardless of env /
# module settings. Used by utils.flops so the roofline denominator is traced
# from the STOCK conv graph — Pallas chain kernels hide their convs inside
# pallas_call, which would otherwise shrink the counted FLOPs (and inflate
# the roofline) whenever a fused path is on.
_force_stock = False


@contextlib.contextmanager
def stock_graph():
    """Trace with all fast paths disabled (see _force_stock)."""
    global _force_stock
    prev = _force_stock
    _force_stock = True
    try:
        yield
    finally:
        _force_stock = prev


use_pallas_separable: bool | None = None

# Fused kernel engages only for dilation >= this. Default 0 = NEVER (the
# kernel is opt-in). History: round 1 measured it 1.6x vs XLA standalone for
# dilated (ASPP atrous) pairs and 0.85x for dilation-1 at decoder shapes
# (129², C=304), so >=2 was the round 1-4a default. Round-4 in-context A/B
# on v5e at b16/513² REVERSED it: KDCC_SEP_MIN_DIL=99 (all separable pairs
# through XLA) measured 289.5 vs 274.9 img/s — the only default-engaged
# sites left are the three 33² ASPP branches, where the per-image grid is
# latency-bound (~0.55 ms/conv vs a ~0.05 ms floor; round-4 xplane) and the
# custom_vjp backward recomputes the depthwise via XLA anyway. The dil-1
# variant also lost (175.0 vs 186.0 on the backbone-replacement bench).
# Env KDCC_SEP_MIN_DIL re-enables (e.g. =2 restores the old gating).
pallas_min_dilation: int = int(os.environ.get("KDCC_SEP_MIN_DIL", "0"))


use_gemm_dilated_conv: bool | None = None

# dilation >= this routes dense stride-1 convs through the shifted-matmul
# (GEMM) formulation instead of lax.conv (ops.conv.conv2d_gemm).
gemm_conv_min_dilation: int = 2


def gemm_dilated_conv_enabled() -> bool:
    """Default OFF: A/B on the full KD step measured 85.6ms (GEMM) vs 73.7ms
    (XLA conv) at b16/513² — XLA's dilated conv wins in-context despite
    looking slow in (unreliable, dispatch-dominated) single-op microbenches.
    Kept as an opt-in experiment (KDCC_GEMM=1)."""
    if _force_stock:
        return False
    env = os.environ.get("KDCC_GEMM")
    if env is not None:
        return env not in ("0", "false", "False")
    return bool(use_gemm_dilated_conv)


# Upsample-into-loss fusion (ops.pallas.losses.fused_ce_kl_loss_upsampled).
# v2 (block-diagonal row matmul over static windows) measured FASTER at
# 513² b16: 72.0ms vs 73.7ms full-res fused loss (v1's per-class matmul
# unroll was 79.5ms). Default ON for single-device TPU; KDCC_FUSE_UPSAMPLE=0
# to disable.
fuse_upsample_into_loss: bool | None = True


def fuse_upsample_into_loss_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_FUSE_UPSAMPLE")
    if env is not None:
        return env not in ("0", "false", "False")
    return bool(fuse_upsample_into_loss)


# Active data-parallel mesh for model-internal Pallas fast paths.
#
# pallas_call has no GSPMD partitioning rule, so kernels that live INSIDE the
# model forward (the fused stem) must be wrapped in shard_map when the step
# runs SPMD over a mesh. The mesh can't be threaded through the nnx module
# call chain without polluting every __call__ signature, so the step builders
# (train.steps, bench, dryrun) register it here and model code reads it at
# TRACE time (jit traces once; the captured mesh is static).
_active_mesh = None


def set_active_mesh(mesh) -> None:
    """Register the 1-D data mesh the jitted step shards over (None to
    clear). Call BEFORE the first step invocation (trace time)."""
    global _active_mesh
    _active_mesh = mesh


def active_mesh():
    return _active_mesh


# Fused Pallas MobileNetV2 stem (ops.pallas.stem): runs features[1..2] as
# channel-sublane Pallas passes in training mode. v2 (uniform padded
# layout, zero XLA glue between passes) measured 68.6ms vs 72.1 at
# b16/513² (222 -> 233 img/s). None = auto: on for TPU when single-device
# OR an active mesh is registered (multi-device runs the shard_map-wrapped
# variant with psum'd BN moments). Env: KDCC_PALLAS_STEM=0/1.
use_pallas_stem: bool | None = None


def pallas_stem_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_STEM")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_stem is not None:
        return use_pallas_stem
    try:
        import jax

        return (jax.default_backend() in ("tpu", "axon")
                and (jax.device_count() == 1 or _active_mesh is not None))
    except Exception:
        return False


# Fused Pallas decoder head (ops.pallas.decoder): runs the DeepLabV3+
# fuse(sep-conv+BN+relu)+classifier chain as 2+2 Pallas passes in training
# mode. Measured SLOWER at b16/513² (74.8 vs 68.9ms): at W=129 the
# channel-sublane layout's lane dim pads 129->256, so every stored tensor
# doubles and the entry pad/transposes add ~3ms of glue (profiled; chain
# ~11ms vs the 8.5ms XLA cluster it replaces). Opt-in; the layout only pays
# at W >= ~200 (stem resolutions). Env: KDCC_PALLAS_DECODER=0/1.
use_pallas_decoder: bool | None = False


def pallas_decoder_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_DECODER")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_decoder is not None:
        return use_pallas_decoder
    return False


# Batch-folded fused decoder head (ops.pallas.decoder
# fused_decoder_head_folded): the same sep-conv+BN+relu+classifier chain as
# use_pallas_decoder but with lanes = N·W (2064 -> 2176, 1.05x pad, vs the
# 129 -> 256 = 1.98x pad that made the legacy layout lose). Measured LOSING
# at b16/513²: round 3 250.6 -> 236.3; round 4 (after the dh-fold VPU cut)
# 260.2 -> 249.8 (-2.6 ms) — the NHWC<->NW boundary transposes still
# dominate the prize. Opt-in. Env: KDCC_PALLAS_DECODER_NW=0/1.
use_pallas_decoder_nw: bool | None = False


def pallas_decoder_nw_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_DECODER_NW")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_decoder_nw is not None:
        return use_pallas_decoder_nw
    return False


# Fused Xception middle flow (ops.pallas.xchain): the 16 residual blocks of
# 3 sep-convs (C=728) in the batch-folded layout. Eval mode (config #3
# teacher / TTA student) folds the running-stat BNs into the pointwise
# weights and runs ONE kernel per block; train mode (config #3 student)
# runs irchain-style BN-barrier passes with the analytic backward.
# Round-4k hardware A/B (v5e, 769²/b4 KD step, bench_xception.py): train
# chains 18.13 -> 28.65 img/s (220.7 -> 139.6 ms, 1.58x) — default ON for
# TPU. The EVAL mega-kernels reproducibly abort the combined KD program at
# runtime ("TPU backend error (Aborted)"; student-only and teacher-only
# programs both run) — eval parts default OFF until diagnosed; see
# pallas_xmid_part_enabled. NOTE (behavior change round 4k): setting
# KDCC_PALLAS_XMID=1 no longer enables the eval mega-kernels — eval/TTA
# experiments must ALSO set KDCC_XMID_EVAL=1 to reproduce pre-round-4k
# XMID=1 behavior. Env: KDCC_PALLAS_XMID=0/1.
use_pallas_xception_middle: bool | None = None


def pallas_xmid_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_XMID")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_xception_middle is not None:
        return use_pallas_xception_middle
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def pallas_xmid_part_enabled(part: str, mode: str) -> bool:
    """Per-segment/mode gates for the xchain kernels under
    pallas_xmid_enabled(): KDCC_XMID_{ENTRY,MIDDLE,TAIL}=0 disables a
    segment, KDCC_XMID_{EVAL,TRAIN}=0/1 a mode. Defaults: train chains ON
    (measured 1.58x in-context win, round-4k A/B); eval mega-kernels OFF —
    they reproducibly abort the combined KD program on v5e at 769²/b4
    (runtime "Aborted"; each half runs alone) and carry no in-context win
    measurement yet. KDCC_XMID_EVAL=1 re-enables for TTA/eval experiments."""
    part_env = os.environ.get("KDCC_XMID_" + part.upper())
    mode_env = os.environ.get("KDCC_XMID_" + mode.upper())
    part_ok = (part_env not in ("0", "false", "False")
               if part_env is not None else True)
    mode_ok = (mode_env not in ("0", "false", "False")
               if mode_env is not None else mode != "eval")
    return part_ok and mode_ok


# (H,W,N,C) bitcast-layout Pallas depthwise conv (ops.pallas.dwhwnc):
# round-5 experiment. Its operand layout is byte-identical to XLA's
# preferred {3,0,2,1} conv layout, so the entry/exit transposes compile to
# bitcasts (zero boundary copies — verified in optimized HLO) and tap
# shifts are free outer-dim slices. Measured on v5e b16/513² anyway:
# LOSES. Ungated: 289.4 -> 91.7 img/s (the d=12/18 ASPP branches have no
# VMEM-feasible tile — 30x halo read amplification, 11-24 ms/pass); with
# the amp<=3 gate (decoder d1 + f7..17 d1/d2 sites only): 289.4 -> 238.9
# (-11 ms). Root cause: a lone depthwise conv is VPU-FLOP-bound once
# layout glue is gone (~9 f32 MACs/element), and XLA's dw fusions at
# C>=256 are already near that floor — the kernel adds halo re-reads and
# bf16->f32 conversion work with no matmul to hide them behind. The
# bitcast-layout discovery pays in MXU-dominated CHAINS instead (see
# ops.pallas.rchain_hwnc). Kept opt-in, parity-tested
# (tests/test_pallas_dwhwnc.py). Env: KDCC_DW_HWNC=0/1.
use_dw_hwnc: bool | None = False


def dw_hwnc_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_DW_HWNC")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_dw_hwnc is not None:
        return use_dw_hwnc
    return False


# Pallas depthwise conv routing (ops.pallas.dwconv): replaces XLA's
# feature-group depthwise lowering wherever groups == C, stride 1, odd k,
# 'same' padding. Measured SLOWER standalone (0.25-0.87x of lax) but the
# in-context picture differs (XLA wraps its dw lowering in layout copies);
# opt-in until the in-context numbers justify a default.
# Env: KDCC_PALLAS_DW=0/1.
use_pallas_dw: bool | None = False


def pallas_dw_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_DW")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_dw is not None:
        return use_pallas_dw
    return False


def pallas_interpret_mode() -> bool:
    """Pallas kernels need interpret=True off-TPU (tests force-enable the
    fused paths on the CPU mesh)."""
    try:
        import jax

        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


# Fused Pallas IR chain (ops.pallas.irchain): runs MobileNetV2
# features[3..6] as batch-folded (N·W-on-lanes) channel-sublane passes in
# training mode — the stock-XLA cluster is 9.4ms fwd+bwd vs a 2.8ms bound
# at b16/513² (round-3 profile). None = auto: same policy as the stem.
# Measured on the real v5e (round-3 A/B, b16/513²): 250.6 -> 253.4/255.1
# img/s — a ~1ms/step win capped by the NHWC<->NW boundary transposes.
# Default ON (auto); parity pinned by tests/test_pallas_ir.py.
# Env: KDCC_PALLAS_IR=0/1.
use_pallas_ir: bool | None = None


def pallas_ir_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_IR")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_ir is not None:
        return use_pallas_ir
    try:
        import jax

        return (jax.default_backend() in ("tpu", "axon")
                and (jax.device_count() == 1 or _active_mesh is not None))
    except Exception:
        return False


# Fused eval-mode ResNet bottlenecks (ops.pallas.rchain): the config-#2
# teacher's layer1/layer2 stride-1 blocks as one folded-BN kernel per
# block (only block input/output touch HBM). Measured round 3 (A/B at
# b16/513², real v5e): LOSES in context, 255.8 -> 245.2 img/s (-2.7
# ms/step) — same layout-copy-boundary story as the standalone dwconv;
# XLA's layer1/2 fusions were already near the residual-stream bound.
# Kept opt-in, parity-tested. Env: KDCC_PALLAS_RNET=0/1.
use_pallas_resnet_eval: bool | None = False


def pallas_resnet_eval_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_RNET")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_resnet_eval is not None:
        return use_pallas_resnet_eval
    return False


# Fused eval-mode ResNet STAGES in the (H,W,N,C) bitcast layout
# (ops.pallas.rchain_hwnc): the round-5 successor to KDCC_PALLAS_RNET —
# one kernel per RUN of stride-1 bottlenecks (layer1 all, layer2 blocks
# 2..N) with recompute-halo, so no intermediate and no boundary copy
# touches HBM (the two taxes that made the round-3 kernel lose). Measured
# on v5e b16/513²: still LOSES, 289.4 -> 279.2 (-2 ms). The boundaries ARE
# free this time (xplane: pad+transpose glue only ~0.6 ms) — the kernel
# body itself is the cost (layer1 stage 3.37 ms, layer2 1.29): bottleneck
# mid-widths 64/128 run the MXU at 25-50% utilization (K=N=64 tap matmuls
# on a 128x128 array), while XLA's grouped conv lowering for the same
# stage is ~2.5 ms. The bitcast-chain recipe needs >=128-wide matmuls to
# pay. Kept opt-in, parity-tested. Env: KDCC_RNET_HWNC=0/1.
use_resnet_eval_hwnc: bool | None = False


def resnet_eval_hwnc_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_RNET_HWNC")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_resnet_eval_hwnc is not None:
        return use_resnet_eval_hwnc
    return False


# Fused eval-mode ResNet stem+maxpool Pallas kernel (ops.pallas.tstem):
# consumes the host-packed NHCW S2D input in its DEFAULT layout — deleting
# the 0.52 ms layout copy the two-consumer packed tensor otherwise pays
# (student f0 chain reads default, XLA's teacher conv wants {2,0,3,1}) —
# and fuses conv7x7/s2 + BN + relu + maxpool3x3/s2 into one fwd-only
# kernel (the XLA trio costs 0.89 + 0.52 + 0.39 ms, round-5 xplane).
# Measured on v5e b16/513²: WASH (289.7/290.3 vs 289.4/290.2 baseline;
# kernel 0.93-1.38 ms in xplane vs the ~1.8 ms it replaces, minus a new
# exit transpose). The C_out=64 matmuls run the MXU at <40% utilization —
# same narrow-width floor XLA's own lowering pays, so removing the copy
# only trades glue for kernel time. Opt-in, parity-tested
# (tests/test_pallas_tstem.py). Env: KDCC_TSTEM=0/1.
use_pallas_teacher_stem: bool | None = False


def pallas_teacher_stem_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_TSTEM")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_teacher_stem is not None:
        return use_pallas_teacher_stem
    return False


# ResNet 7x7-s2 stem as a space-to-depth 4x4-s1 conv (exact rewrite):
# XLA's C_in=3 7x7 conv lowering measured 1.54ms vs a 0.2ms memory bound at
# b16/513² (round-3 teacher segment profile); S2D(2) turns it into a
# contraction-192 conv the MXU can tile. Opt-in until measured.
# Env: KDCC_S2D_STEM=0/1.
use_s2d_stem: bool | None = False


def s2d_stem_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_S2D_STEM")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_s2d_stem is not None:
        return use_s2d_stem
    return False


# Host-side space-to-depth: the data pipeline emits s2d_pack'ed images
# (N, (H-1)//2+4, ., 12) so BOTH entry stems (teacher 7x7/s2, student
# 3x3/s2) consume the packed tensor directly via conv2d_s2d_packed — the
# device-side gather that made KDCC_S2D_STEM lose never runs (VERDICT r3
# item 5). H2D bytes unchanged. Models detect the packed input by its 12
# channels when this knob is on; eval/TTA paths keep normal images.
# Default-ON (measured WIN round 4: 260.2 -> 262.4 img/s at b16/513²);
# pack sites additionally require ops.conv.supports_host_s2d(model) so
# nonstandard stems (cheap-conv surgery on the entry conv, channel-major
# stem) silently keep normal images. Env: KDCC_HOST_S2D=0/1.
use_host_s2d: bool | None = None


def host_s2d_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_HOST_S2D")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_host_s2d is not None:
        return use_host_s2d
    return True


# f0-in-chain: the MobileNetV2 entry conv computed INSIDE the fused Pallas
# stem as a 2x2-VALID pass over the host-packed channel-sublane S2D input
# (s2d_pack(channel_sublane=True)). Kills the f0 cluster the round-4 xplane
# profile itemized: 0.85 ms XLA conv + 2x ~0.49 ms layout copies + 0.76 ms
# wgrad fusion, replaced by in-chain matmul passes (+ the host pipeline
# emitting NHCW-packed tensors, same host transpose count). Requires
# host-S2D; pack sites choose the NHCW form only when a MobileNetV2 fused
# stem will actually consume it (ops.conv shape detection keeps every other
# consumer on the dimension-numbers path). Env: KDCC_PALLAS_F0=0/1.
use_pallas_f0: bool | None = None


def pallas_f0_enabled() -> bool:
    if _force_stock or not host_s2d_enabled():
        return False
    env = os.environ.get("KDCC_PALLAS_F0")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_f0 is not None:
        return use_pallas_f0
    # default-on with the stem chain (measured WIN round 4: 262.4 -> 274.8
    # img/s at b16/513², the full ~2.6 ms f0 cluster recovered)
    return pallas_stem_enabled()


# Decoder concat-split: compute fuse(cat(low, up)) as fuseA(low) + fuseB(up)
# (channel-split of the fuse kernel — exact algebra for dense AND separable
# fuse convs), so the 304-channel concat tensor and its pad/copy glue never
# materialize. Profiled at b16/513²: the 129²xC304 cluster (concat pads,
# layout copies, the 2.25ms fuse fusion) is ~9ms of the 68.5ms step.
# Default ON everywhere (pure jnp; helps any backend). KDCC_SPLIT_DECODER=0.
split_decoder_concat: bool | None = True


def split_decoder_concat_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_SPLIT_DECODER")
    if env is not None:
        return env not in ("0", "false", "False")
    return bool(split_decoder_concat)


# Decoder 4x upsample as two explicit matmuls
# (ops.resize.resize_bilinear_matmul) instead of jax.image.resize. Built to
# kill the ~0.9 ms of layout transposes around XLA's W-axis resize dot at
# 129²xC256/b16 (round-4 head xplane, fusion.29/.335) — MEASURED A WASH
# (290.23 vs 290.08 img/s; head device busy 7.93 vs 7.94 ms): XLA's layout
# assignment re-derives the same (c,w)-minor dot layouts whatever the
# einsum order, because the W-dot's non-contracted w lands on lanes either
# way; the transposes are inherent to its dot lowering, not the operand
# order. Kept opt-in as an engineering record. Env: KDCC_MM_UPSAMPLE=1.
mm_upsample: bool | None = False


def mm_upsample_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_MM_UPSAMPLE")
    if env is not None:
        return env not in ("0", "false", "False")
    return bool(mm_upsample)


# Decoder 4x upsample as ONE Pallas kernel (ops.pallas.upsample), both
# interpolation axes NHWC-native: built to kill the ~1.4 ms/step of layout
# transposes around XLA's resize dots at 129²xC256/b16 (round-5 xplane:
# fusion.2414/.53 fwd, .254/.249 bwd; the einsum reorder above proved the
# transposes are inherent to XLA's dot lowering). MEASURED LOSING in
# context (round 5, b16/513² KD step): 289.1 -> 280.6 img/s (+1.7 ms) —
# the Pallas {3,2,1,0} output/cotangent boundary copies against the convs'
# {3,0,2,1} layouts plus the per-cell Element-window DMAs cost more than
# the transposes saved (the decoder-NW lesson again: layout boundaries
# move, they don't disappear). Opt-in engineering record, parity-tested
# (tests/test_pallas_upsample.py). Env: KDCC_PALLAS_UPSAMPLE=0/1.
use_pallas_upsample: bool | None = None


def pallas_upsample_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS_UPSAMPLE")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_upsample is not None:
        return use_pallas_upsample
    return False


# ASPP concat-split: project(cat(b1..b5)) as sum of per-branch 1x1 convs
# (exact channel-split of the project kernel, same algebra as the decoder
# split), so the 5*256-channel concat never materializes and the pool
# branch's contribution is a broadcast-add of a 1x1 projection instead of
# a conv on the broadcast tensor. Default ON (pure jnp). KDCC_SPLIT_ASPP=0.
split_aspp_concat: bool | None = True


def split_aspp_concat_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_SPLIT_ASPP")
    if env is not None:
        return env not in ("0", "false", "False")
    return bool(split_aspp_concat)


# MobileNetV2 stem layout: run the first K feature blocks channel-major
# (NCHW) so low-channel high-resolution activations (C=16..96 at 257²) don't
# lane-pad channels to 128 (4-8x HBM traffic). 0 = off. Env: KDCC_STEM_CM=K.
stem_channel_major: int | None = None


def stem_channel_major_until() -> int:
    if _force_stock:
        return 0
    env = os.environ.get("KDCC_STEM_CM")
    if env is not None:
        return int(env)
    return int(stem_channel_major or 0)


def pallas_separable_enabled() -> bool:
    if _force_stock:
        return False
    env = os.environ.get("KDCC_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_separable is not None:
        return use_pallas_separable
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
