"""ResNet-50/101 backbones with dilated final stages (DeepLab style).

Reference capability (SURVEY.md §2.1, BASELINE.json:5): ResNet backbone with
`replace_stride_with_dilation` so the output stride is 8 or 16 instead of 32;
exposes the stride-4 `layer1` output ('low_level') and the final `layer4`
output ('out') for the DeepLabV3+ decoder and KD feature taps.

NHWC / NNX. Stage-3/4 dilation mirrors the torchvision scheme the reference
inherits: when a stage is dilated, its stride moves into `dilation *= stride`
and the first block keeps the *previous* dilation for its 3x3 conv.
"""

from __future__ import annotations

from flax import nnx

from .layers import BatchNorm, Conv2d, ConvBNReLU


class Bottleneck(nnx.Module):
    expansion = 4

    def __init__(self, inplanes, planes, *, stride=1, dilation=1,
                 downsample=None, dtype=None, rngs: nnx.Rngs):
        self.conv1 = Conv2d(inplanes, planes, 1, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn1 = BatchNorm(planes, dtype=dtype, rngs=rngs)
        self.conv2 = Conv2d(planes, planes, 3, stride=stride, padding=dilation,
                            dilation=dilation, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn2 = BatchNorm(planes, dtype=dtype, rngs=rngs)
        self.conv3 = Conv2d(planes, planes * 4, 1, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn3 = BatchNorm(planes * 4, dtype=dtype, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x):
        identity = x
        out = nnx.relu(self.bn1(self.conv1(x)))
        out = nnx.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return nnx.relu(out + identity)


class _Downsample(nnx.Module):
    def __init__(self, in_ch, out_ch, stride, *, dtype=None, rngs: nnx.Rngs):
        self.conv = Conv2d(in_ch, out_ch, 1, stride=stride, use_bias=False,
                           dtype=dtype, rngs=rngs)
        self.bn = BatchNorm(out_ch, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return self.bn(self.conv(x))


class ResNet(nnx.Module):
    """Dilated ResNet returning {'low_level': layer1, 'out': layer4}."""

    def __init__(self, layers: tuple[int, ...], *, output_stride: int = 16,
                 dtype=None, rngs: nnx.Rngs):
        if output_stride == 16:
            dilate = (False, False, True)
        elif output_stride == 8:
            dilate = (False, True, True)
        elif output_stride == 32:
            dilate = (False, False, False)
        else:
            raise ValueError(f"output_stride must be 8/16/32, got {output_stride}")

        self.stem = ConvBNReLU(3, 64, 7, stride=2, padding=3, dtype=dtype, rngs=rngs)
        self._inplanes = 64
        self._dilation = 1
        self.layer1 = self._make_layer(64, layers[0], stride=1, dilate=False, dtype=dtype, rngs=rngs)
        self.layer2 = self._make_layer(128, layers[1], stride=2, dilate=dilate[0], dtype=dtype, rngs=rngs)
        self.layer3 = self._make_layer(256, layers[2], stride=2, dilate=dilate[1], dtype=dtype, rngs=rngs)
        self.layer4 = self._make_layer(512, layers[3], stride=2, dilate=dilate[2], dtype=dtype, rngs=rngs)
        self.low_level_channels = 256
        self.out_channels = 2048

    def _make_layer(self, planes, blocks, *, stride, dilate, dtype, rngs):
        previous_dilation = self._dilation
        if dilate:
            self._dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self._inplanes != planes * Bottleneck.expansion:
            downsample = _Downsample(self._inplanes, planes * Bottleneck.expansion,
                                     stride, dtype=dtype, rngs=rngs)
        layer = [Bottleneck(self._inplanes, planes, stride=stride,
                            dilation=previous_dilation, downsample=downsample,
                            dtype=dtype, rngs=rngs)]
        self._inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layer.append(Bottleneck(self._inplanes, planes, dilation=self._dilation,
                                    dtype=dtype, rngs=rngs))
        return nnx.List(layer)

    def _stem_s2d_active(self) -> bool:
        from .. import config

        if not config.s2d_stem_enabled():
            return False
        c = self.stem.conv
        return (c.kernel_size == (7, 7) and c.stride == (2, 2)
                and c.padding == (3, 3) and c.dilation == (1, 1)
                and c.bias is None)

    def _stem_s2d(self, x):
        """Exact space-to-depth rewrite of the 7x7/s2 stem conv
        (ops.conv.conv2d_s2d): the contraction becomes 4x4x12=192 wide so
        XLA tiles it onto the MXU instead of its small-channel path.
        BN+relu stay on the module (identical train/eval semantics)."""
        from ..ops.conv import conv2d_s2d

        conv = self.stem.conv
        w = conv.kernel[...]                          # (7, 7, 3, 64) HWIO
        if conv.dtype is not None:
            x = x.astype(conv.dtype)
            w = w.astype(conv.dtype)
        return nnx.relu(self.stem.bn(conv2d_s2d(x, w, 3)))

    def _stem_s2d_packed(self, x, form: str = "nhwc"):
        """7x7/s2 stem over a HOST-packed S2D input (ops.conv.s2d_pack, 12
        channels — NHWC or the channel-sublane NHCW form): the 4x4 VALID
        conv reads the packed tensor directly — no device gather
        (KDCC_HOST_S2D, VERDICT r3 item 5)."""
        from ..ops.conv import conv2d_s2d_packed

        conv = self.stem.conv
        if conv.kernel_size != (7, 7) or conv.stride != (2, 2) \
                or conv.padding != (3, 3):
            raise ValueError("host-S2D input requires the standard "
                             "7x7/s2/pad3 ResNet stem")
        w = conv.kernel[...]
        if conv.dtype is not None:
            x = x.astype(conv.dtype)
            w = w.astype(conv.dtype)
        dn = (("NHCW" if form == "nhcw" else "NHWC"), "HWIO", "NHWC")
        return nnx.relu(self.stem.bn(conv2d_s2d_packed(
            x, w, 3, dimension_numbers=dn)))

    def _maxpool(self, x):
        # torch MaxPool2d(kernel_size=3, stride=2, padding=1).
        # init must be the literal -inf for JAX to recognize the max monoid
        # (select-and-scatter grad rule); finfo.min breaks reverse-mode AD.
        from jax import lax
        return lax.reduce_window(
            x, -float("inf"), lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    def _run_layer(self, x, layer):
        """Run a residual stage; in eval mode under KDCC_PALLAS_RNET,
        consecutive stride-1 bottlenecks run as fused folded-BN kernels
        (ops.pallas.rchain), others (e.g. a stride-2 first block) stock."""
        from .. import config

        if (config.resnet_eval_hwnc_enabled()
                and layer[0].bn1.use_running_average
                and x.shape[0] % 8 == 0):
            out = self._run_layer_hwnc(x, layer)
            if out is not None:
                return out
        if (not config.pallas_resnet_eval_enabled()
                or not layer[0].bn1.use_running_average
                or x.shape[-1] % 8 != 0):
            for b in layer:
                x = b(x)
            return x
        from ..ops.pallas.rchain import _bneck_fusable, fused_resnet_blocks_eval
        from .layers import maybe_shard_eval

        interp = config.pallas_interpret_mode()

        def flush(x, run):
            blocks = tuple(run)
            fn = maybe_shard_eval(
                lambda t: fused_resnet_blocks_eval(t, blocks, interp),
                x.shape[0])
            if fn is None:                   # multi-device, no usable mesh
                for b in blocks:
                    x = b(x)
                return x
            return fn(x)

        run = []
        for b in layer:
            if _bneck_fusable(b):
                run.append(b)
                continue
            if run:
                x = flush(x, run)
                run = []
            x = b(x)
        if run:
            x = flush(x, run)
        return x

    def _run_layer_hwnc(self, x, layer):
        """Round-5 eval fast path (KDCC_RNET_HWNC): runs of stride-1
        bottlenecks as ONE (H,W,N,C)-layout kernel with recompute-halo
        (ops.pallas.rchain_hwnc). Returns None when no block engages (the
        caller falls through to the older paths)."""
        from .. import config
        from ..ops.pallas.rchain_hwnc import (bneck_hwnc_fusable,
                                              fused_resnet_stage_eval_hwnc)
        from .layers import maybe_shard_eval

        if not any(bneck_hwnc_fusable(b) for b in layer):
            return None
        interp = config.pallas_interpret_mode()

        def flush(x, run):
            blocks = tuple(run)
            fn = maybe_shard_eval(
                lambda t: fused_resnet_stage_eval_hwnc(t, blocks, interp),
                x.shape[0])
            if fn is None:                   # multi-device, no usable mesh
                for b in blocks:
                    x = b(x)
                return x
            return fn(x)

        run = []
        for b in layer:
            # only the first block of a fused run may carry a downsample
            if bneck_hwnc_fusable(b) and (not run or b.downsample is None):
                run.append(b)
                continue
            if run:
                x = flush(x, run)
                run = []
            x = b(x)
        if run:
            x = flush(x, run)
        return x

    def __call__(self, x):
        from .. import config
        from ..ops.conv import s2d_packed_form

        form = s2d_packed_form(x) if config.host_s2d_enabled() else None
        if (form == "nhcw" and config.pallas_teacher_stem_enabled()
                and self.stem.bn.use_running_average
                and self.stem.conv.kernel_size == (7, 7)
                and self.stem.conv.stride == (2, 2)
                and self.stem.conv.padding == (3, 3)):
            # fused eval stem+maxpool over the packed NHCW input
            # (ops.pallas.tstem — fwd-only; teacher / TTA eval graphs)
            from ..ops.pallas.tstem import fused_stem_pool_eval_nhcw

            dt = self.stem.conv.dtype
            x = fused_stem_pool_eval_nhcw(
                x.astype(dt) if dt is not None else x,
                self.stem.conv.kernel, self.stem.bn,
                config.pallas_interpret_mode())
        else:
            if form is not None:
                x = self._stem_s2d_packed(x, form)
            else:
                x = (self._stem_s2d(x) if self._stem_s2d_active()
                     else self.stem(x))
            x = self._maxpool(x)
        x = self._run_layer(x, self.layer1)
        low_level = x
        x = self._run_layer(x, self.layer2)
        for b in self.layer3:
            x = b(x)
        for b in self.layer4:
            x = b(x)
        return {"low_level": low_level, "out": x}


def resnet50(*, output_stride=16, dtype=None, rngs: nnx.Rngs) -> ResNet:
    return ResNet((3, 4, 6, 3), output_stride=output_stride, dtype=dtype, rngs=rngs)


def resnet101(*, output_stride=16, dtype=None, rngs: nnx.Rngs) -> ResNet:
    return ResNet((3, 4, 23, 3), output_stride=output_stride, dtype=dtype, rngs=rngs)
