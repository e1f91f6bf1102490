"""DeepLabV3 / DeepLabV3+ heads and the segmentation model wrapper.

Reference capability (SURVEY.md §2.1):
- `DeepLabHeadV3Plus`: 1x1-project low-level features to 48ch, ASPP on the
  high-level features, bilinear-upsample ASPP output to the low-level
  resolution, concat (304ch), one 3x3 conv to 256ch, 1x1 classifier.
- `DeepLabHead` (V3, no decoder): ASPP -> 3x3 conv 256 -> 1x1 classifier.
- `_SimpleSegmentationModel` equivalent: backbone -> head -> bilinear
  upsample logits to input resolution.

The model can also return its KD feature taps (low-level, backbone out, head
pre-logit features) for the hint L2 loss (BASELINE.json:5).
"""

from __future__ import annotations

from flax import nnx

from ..ops.resize import resize_bilinear
from .aspp import ASPP
from .layers import Conv2d, ConvBNReLU


class DeepLabHeadV3Plus(nnx.Module):
    def __init__(self, in_channels: int, low_level_channels: int,
                 num_classes: int, aspp_dilate=(6, 12, 18), *, dtype=None,
                 rngs: nnx.Rngs):
        self.project = ConvBNReLU(low_level_channels, 48, 1, dtype=dtype, rngs=rngs)
        self.aspp = ASPP(in_channels, tuple(aspp_dilate), dtype=dtype, rngs=rngs)
        self.fuse = ConvBNReLU(304, 256, 3, padding=1, dtype=dtype, rngs=rngs)
        self.classifier = Conv2d(256, num_classes, 1, dtype=dtype, rngs=rngs)

    def _fused_head_active(self, return_features: bool) -> bool:
        """Structural guard for the fused Pallas decoder chain
        (ops.pallas.decoder): sep-conv fuse + train-mode BN + biased 1x1
        classifier, no hint taps requested."""
        from .. import config

        if return_features or not config.pallas_decoder_enabled():
            return False
        try:
            sep = self.fuse.conv
            dw, pw = sep.depthwise, sep.pointwise
            return (self.fuse.bn.use_running_average is False
                    and dw.kernel_size == (3, 3) and dw.stride == (1, 1)
                    and dw.dilation == (1, 1) and dw.padding == (1, 1)
                    and dw.groups == dw.in_channels
                    and pw.bias is None and pw.kernel_size == (1, 1)
                    and self.classifier.kernel_size == (1, 1)
                    and self.classifier.bias is not None
                    and dw.in_channels % 8 == 0)
        except AttributeError:
            return False

    def _call_fused_head(self, xcat):
        """xcat (N, H, W, 304) NHWC -> fused chain -> logits NHWC; BN
        running stats updated with the module's own momentum."""
        import jax.numpy as jnp

        from .. import config
        from ..ops.pallas.decoder import fused_decoder_head

        p = self._head_params()
        xc = jnp.transpose(xcat, (0, 1, 3, 2))        # NHWC -> NHCW
        logits, (m, v) = fused_decoder_head(xc, p, float(self.fuse.bn.epsilon),
                                            config.pallas_interpret_mode())
        bn = self.fuse.bn
        mom = bn.momentum
        bn.mean[...] = mom * bn.mean[...] + (1.0 - mom) * m
        bn.var[...] = mom * bn.var[...] + (1.0 - mom) * v
        return jnp.transpose(logits, (0, 1, 3, 2))    # NHCW -> NHWC

    def _fused_head_nw_active(self, return_features: bool) -> bool:
        """Structural guard for the batch-folded fused decoder chain
        (ops.pallas.decoder.fused_decoder_head_folded) — same structure as
        _fused_head_active under the KDCC_PALLAS_DECODER_NW knob."""
        from .. import config

        if return_features or not config.pallas_decoder_nw_enabled():
            return False
        try:
            sep = self.fuse.conv
            dw, pw = sep.depthwise, sep.pointwise
            return (self.fuse.bn.use_running_average is False
                    and dw.kernel_size == (3, 3) and dw.stride == (1, 1)
                    and dw.dilation == (1, 1) and dw.padding == (1, 1)
                    and dw.groups == dw.in_channels
                    and pw.bias is None and pw.kernel_size == (1, 1)
                    and self.classifier.kernel_size == (1, 1)
                    and self.classifier.bias is not None
                    and dw.in_channels % 8 == 0)
        except AttributeError:
            return False

    def _head_params(self):
        import jax.numpy as jnp

        sep = self.fuse.conv
        kv = sep.depthwise.kernel[...]
        return {
            "k": jnp.transpose(kv[:, :, 0, :], (2, 0, 1)).reshape(
                kv.shape[3], 9),
            "pw": sep.pointwise.kernel[...][0, 0].T,
            "g": self.fuse.bn.scale[...],
            "b": self.fuse.bn.bias[...],
            "wc": self.classifier.kernel[...][0, 0].T,
            "bc": self.classifier.bias[...],
        }

    def _call_fused_head_nw(self, low, up):
        """low/up (N, H, W, C) NHWC (concat order low-then-up matches the
        dw/pw channel order) -> batch-folded fused chain -> logits NHWC;
        BN running stats updated with the module's own momentum."""
        import jax

        from .. import config
        from ..ops.pallas.decoder import (fused_decoder_head_folded,
                                          fused_decoder_head_folded_sharded)

        p = self._head_params()
        eps = float(self.fuse.bn.epsilon)
        mesh = config.active_mesh()
        if (mesh is not None and jax.device_count() > 1
                and low.shape[0] % mesh.devices.size == 0):
            logits, (m, v) = fused_decoder_head_folded_sharded(
                low, up, p, mesh, eps, config.pallas_interpret_mode())
        else:
            logits, (m, v) = fused_decoder_head_folded(
                low, up, p, eps, config.pallas_interpret_mode())
        bn = self.fuse.bn
        mom = bn.momentum
        bn.mean[...] = mom * bn.mean[...] + (1.0 - mom) * m
        bn.var[...] = mom * bn.var[...] + (1.0 - mom) * v
        return logits

    def _split_fuse_kind(self) -> str | None:
        """Can fuse(cat(low, up)) be computed as fuseA(low) + fuseB(up)?

        Exact for a dense groups-1 conv (split the in-channel axis of the
        kernel) and for a separable pair (depthwise is per-channel, so it
        splits too; the pointwise splits like the dense case). NOT exact for
        grouped convs whose block boundaries straddle the 48/256 split —
        those fall back to the materialized concat.
        """
        conv = self.fuse.conv
        if isinstance(conv, Conv2d):
            return "dense" if conv.groups == 1 else None
        dw = getattr(conv, "depthwise", None)
        pw = getattr(conv, "pointwise", None)
        if (isinstance(dw, Conv2d) and isinstance(pw, Conv2d)
                and dw.groups == dw.in_channels and pw.groups == 1
                and pw.kernel_size == (1, 1) and dw.bias is None
                and getattr(conv, "bn_dw", None) is None):
            return "separable"
        return None

    def _call_split_fuse(self, low, up, kind: str):
        """fuse(cat(low, up)) without materializing the 304ch concat: the
        pad/copy/layout glue around the concat is ~9ms of the 68.5ms KD step
        at b16/513² (xplane profile, round 3). Same math, same BN."""
        from ..ops.conv import conv2d

        conv = self.fuse.conv
        cl = low.shape[-1]
        if kind == "dense":
            w = conv.kernel[...]
            dtype = conv.dtype
            if dtype is not None:
                low, up, w = (low.astype(dtype), up.astype(dtype),
                              w.astype(dtype))
            y = conv2d(low, w[:, :, :cl], None, stride=conv.stride,
                       padding=conv.padding, dilation=conv.dilation)
            y = y + conv2d(up, w[:, :, cl:], None, stride=conv.stride,
                           padding=conv.padding, dilation=conv.dilation)
            if conv.bias is not None:
                y = y + conv.bias[...].astype(y.dtype)
        else:  # separable
            dw, pw = conv.depthwise, conv.pointwise
            dwk = dw.kernel[...]
            pwk = pw.kernel[...]
            dtype = dw.dtype
            if dtype is not None:
                low, up = low.astype(dtype), up.astype(dtype)
                dwk, pwk = dwk.astype(dtype), pwk.astype(dtype)
            ylo = conv2d(low, dwk[:, :, :, :cl], None, stride=dw.stride,
                         padding=dw.padding, dilation=dw.dilation, groups=cl)
            yup = conv2d(up, dwk[:, :, :, cl:], None, stride=dw.stride,
                         padding=dw.padding, dilation=dw.dilation,
                         groups=dwk.shape[3] - cl)
            y = conv2d(ylo, pwk[:, :, :cl], None)
            y = y + conv2d(yup, pwk[:, :, cl:], None)
            if pw.bias is not None:
                y = y + pw.bias[...].astype(y.dtype)
        y = self.fuse.bn(y)
        return nnx.relu(y) if self.fuse.relu else y

    def __call__(self, features: dict, *, return_features: bool = False):
        import jax.numpy as jnp

        from .. import config

        low = self.project(features["low_level"])
        x = self.aspp(features["out"])
        size = low.shape[1:3]
        if config.pallas_upsample_enabled():
            import jax

            from ..ops.pallas.upsample import (pallas_upsample_ok,
                                               resize_bilinear_up,
                                               resize_bilinear_up_sharded)

            sz = (int(size[0]), int(size[1]))
            mesh = config.active_mesh()
            if not pallas_upsample_ok(x.shape, size):
                x = resize_bilinear(x, size)
            elif (mesh is not None and jax.device_count() > 1
                    and x.shape[0] % mesh.devices.size == 0):
                x = resize_bilinear_up_sharded(
                    x, sz, mesh, config.pallas_interpret_mode())
            elif mesh is None or jax.device_count() == 1:
                x = resize_bilinear_up(
                    x, sz, interpret=config.pallas_interpret_mode())
            else:
                x = resize_bilinear(x, size)
        elif config.mm_upsample_enabled():
            from ..ops.resize import resize_bilinear_matmul

            x = resize_bilinear_matmul(x, size)
        else:
            x = resize_bilinear(x, size)
        if self._fused_head_nw_active(return_features):
            return self._call_fused_head_nw(low, x)
        split_kind = (self._split_fuse_kind()
                      if config.split_decoder_concat_enabled() else None)
        if split_kind is not None and not self._fused_head_active(
                return_features):
            x = self._call_split_fuse(low, x, split_kind)
            logits = self.classifier(x)
            if return_features:
                return logits, {"head": x}
            return logits
        xcat = jnp.concatenate([low, x], axis=-1)
        if self._fused_head_active(return_features):
            return self._call_fused_head(xcat)
        x = self.fuse(xcat)
        logits = self.classifier(x)
        if return_features:
            return logits, {"head": x}
        return logits


class DeepLabHead(nnx.Module):
    def __init__(self, in_channels: int, num_classes: int,
                 aspp_dilate=(6, 12, 18), *, dtype=None, rngs: nnx.Rngs):
        self.aspp = ASPP(in_channels, tuple(aspp_dilate), dtype=dtype, rngs=rngs)
        self.fuse = ConvBNReLU(256, 256, 3, padding=1, dtype=dtype, rngs=rngs)
        self.classifier = Conv2d(256, num_classes, 1, dtype=dtype, rngs=rngs)

    def __call__(self, features: dict, *, return_features: bool = False):
        x = self.fuse(self.aspp(features["out"]))
        logits = self.classifier(x)
        if return_features:
            return logits, {"head": x}
        return logits


class SegmentationModel(nnx.Module):
    """backbone -> head -> bilinear upsample to input size.

    Logits are NHWC by default (reference semantics). With
    `class_major=True` they come back as (N, C, H, W): the transpose happens
    at head resolution (cheap) and the 16x bilinear upsample runs in the
    class-major layout, so the full-res logits never materialize with a
    21-wide lane dim (which TPU pads to 128 — 6x memory). The loss path uses
    this (ops.losses channel_axis=1); numerics are identical.
    """

    def __init__(self, backbone: nnx.Module, classifier: nnx.Module):
        self.backbone = backbone
        self.classifier = classifier

    def __call__(self, x, *, return_features: bool = False,
                 class_major: bool = False, upsample: bool = True):
        import jax.numpy as jnp

        from .. import config
        from ..ops.resize import resize_bilinear_nchw

        from ..ops.conv import s2d_packed_form

        form = s2d_packed_form(x) if config.host_s2d_enabled() else None
        if form is not None:
            # host-packed S2D input (ops.conv.s2d_pack): logits upsample to
            # the ORIGINAL odd resolution, not the packed extent
            from ..ops.conv import s2d_orig_size

            wdim = 3 if form == "nhcw" else 2
            size = s2d_orig_size(x.shape[1], x.shape[wdim])
        else:
            size = x.shape[1:3]
        feats = self.backbone(x)
        if return_features:
            logits, head_feats = self.classifier(feats, return_features=True)
        else:
            logits = self.classifier(feats)
            head_feats = None
        if class_major:
            logits = jnp.transpose(logits, (0, 3, 1, 2))
            if upsample:
                logits = resize_bilinear_nchw(logits, size)
        elif upsample:
            logits = resize_bilinear(logits, size)
        # upsample=False returns head-resolution logits — the fused
        # upsample+loss kernel (ops.pallas.losses) applies the 16x bilinear
        # itself, so full-res logits never touch HBM.
        if return_features:
            taps = {"low_level": feats["low_level"], "out": feats["out"],
                    **head_feats}
            return logits, taps
        return logits
