"""Modified aligned Xception-65 backbone (DeepLabV3+ teacher, config #3).

Reference capability (SURVEY.md §2.1, BASELINE.json:5/10): Xception-65 with
depthwise-separable convs throughout, entry/middle/exit flows, strides
replaced with dilation for output-stride control, and `fixed_padding` so
stride-2 separable convs stay alignment-invariant.

Structure (aligned / "modified" Xception per DeepLabV3+, arXiv 1802.02611):
- entry: conv 3x3/2 (32) -> conv 3x3 (64) -> block1 (128, s2)
         -> block2 (256, s2) -> block3 (728, s2 or dilated)
- middle: 16 residual blocks of 3x sep-conv(728)
- exit: block (728->1024, s2 or dilated) -> sep 1536 -> sep 1536 -> sep 2048
Low-level decoder tap: block1 output (128ch, stride 4).
"""

from __future__ import annotations

from flax import nnx

from .layers import BatchNorm, Conv2d, ConvBNReLU, SeparableConv2d


class SepConvBN(nnx.Module):
    """ReLU(optional, pre) -> sep conv (fixed padding) -> BN, Xception-style:
    BN after the depthwise and after the pointwise."""

    def __init__(self, in_ch, out_ch, *, stride=1, dilation=1, pre_relu=True,
                 post_relu=False, dtype=None, rngs: nnx.Rngs):
        self.sep = SeparableConv2d(in_ch, out_ch, 3, stride=stride,
                                   dilation=dilation, bn_between=True,
                                   fixed_pad=True, dtype=dtype, rngs=rngs)
        self.bn = BatchNorm(out_ch, dtype=dtype, rngs=rngs)
        self.pre_relu = pre_relu
        self.post_relu = post_relu

    def __call__(self, x):
        if self.pre_relu:
            x = nnx.relu(x)
        x = self.bn(self.sep(x))
        return nnx.relu(x) if self.post_relu else x


class XceptionBlock(nnx.Module):
    """Three separable convs + residual skip (1x1 conv if shape changes)."""

    def __init__(self, in_ch, channels: tuple[int, int, int], *, stride=1,
                 dilation=1, first_relu=True, dtype=None, rngs: nnx.Rngs):
        c1, c2, c3 = channels
        self.sep1 = SepConvBN(in_ch, c1, dilation=dilation, pre_relu=first_relu,
                              dtype=dtype, rngs=rngs)
        self.sep2 = SepConvBN(c1, c2, dilation=dilation, dtype=dtype, rngs=rngs)
        self.sep3 = SepConvBN(c2, c3, stride=stride, dilation=dilation,
                              dtype=dtype, rngs=rngs)
        if stride != 1 or in_ch != c3:
            self.skip_conv = Conv2d(in_ch, c3, 1, stride=stride, use_bias=False,
                                    dtype=dtype, rngs=rngs)
            self.skip_bn = BatchNorm(c3, dtype=dtype, rngs=rngs)
        else:
            self.skip_conv = None
            self.skip_bn = None

    def __call__(self, x):
        out = self.sep3(self.sep2(self.sep1(x)))
        skip = x if self.skip_conv is None else self.skip_bn(self.skip_conv(x))
        return out + skip


class Xception65(nnx.Module):
    """Returns {'low_level': 128ch stride-4, 'out': 2048ch stride-OS}."""

    def __init__(self, *, output_stride: int = 16, dtype=None, rngs: nnx.Rngs):
        if output_stride == 16:
            entry3_stride, exit_stride = 2, 1
            middle_dilation, exit_dilation = 1, 2
        elif output_stride == 8:
            entry3_stride, exit_stride = 1, 1
            middle_dilation, exit_dilation = 2, 4
        elif output_stride == 32:
            entry3_stride, exit_stride = 2, 2
            middle_dilation, exit_dilation = 1, 1
        else:
            raise ValueError(f"output_stride must be 8/16/32, got {output_stride}")

        self.conv1 = ConvBNReLU(3, 32, 3, stride=2, padding=1, dtype=dtype, rngs=rngs)
        self.conv2 = ConvBNReLU(32, 64, 3, padding=1, dtype=dtype, rngs=rngs)
        self.block1 = XceptionBlock(64, (128, 128, 128), stride=2,
                                    first_relu=False, dtype=dtype, rngs=rngs)
        self.block2 = XceptionBlock(128, (256, 256, 256), stride=2, dtype=dtype, rngs=rngs)
        self.block3 = XceptionBlock(256, (728, 728, 728), stride=entry3_stride,
                                    dtype=dtype, rngs=rngs)
        self.middle = nnx.List([
            XceptionBlock(728, (728, 728, 728), dilation=middle_dilation,
                          dtype=dtype, rngs=rngs)
            for _ in range(16)
        ])
        self.exit_block = XceptionBlock(728, (728, 1024, 1024), stride=exit_stride,
                                        dilation=exit_dilation, dtype=dtype, rngs=rngs)
        self.exit_sep1 = SepConvBN(1024, 1536, dilation=exit_dilation,
                                   pre_relu=False, post_relu=True, dtype=dtype, rngs=rngs)
        self.exit_sep2 = SepConvBN(1536, 1536, dilation=exit_dilation,
                                   pre_relu=False, post_relu=True, dtype=dtype, rngs=rngs)
        self.exit_sep3 = SepConvBN(1536, 2048, dilation=exit_dilation,
                                   pre_relu=False, post_relu=True, dtype=dtype, rngs=rngs)
        self.low_level_channels = 128
        self.out_channels = 2048

    def _fused_middle_mode(self) -> str | None:
        """None (stock) | 'eval' | 'train' — structural guard for the fused
        middle-flow chains (ops.pallas.xchain): uniform-dilation middle
        blocks (d=1 at OS16/32, d=2 at OS8), plain residuals, Xception sep
        structure intact."""
        from .. import config

        if not config.pallas_xmid_enabled():
            return None
        try:
            d = self.middle[0].sep1.sep.depthwise.dilation[0]
            for blk in self.middle:
                if blk.skip_conv is not None:
                    return None
                for s in (blk.sep1, blk.sep2, blk.sep3):
                    dw, pw = s.sep.depthwise, s.sep.pointwise
                    c = dw.in_channels
                    if (not s.pre_relu or s.post_relu
                            or s.sep.bn_dw is None
                            or dw.kernel_size != (3, 3)
                            or dw.stride != (1, 1)
                            or dw.dilation != (d, d)
                            or dw.groups != c
                            or pw.kernel[...].shape != (1, 1, c, c)
                            or dw.bias is not None or pw.bias is not None):
                        return None
            bn0 = self.middle[0].sep1.sep.bn_dw
            mode = "eval" if bn0.use_running_average else "train"
            return mode if config.pallas_xmid_part_enabled(
                "middle", mode) else None
        except (AttributeError, IndexError, TypeError):
            return None

    def _fused_entry_ok(self, blk) -> bool:
        """Train-mode structural guard for one fused entry block
        (ops.pallas.xchain.fused_x_entry_block_train): stride-2 sep3 +
        1x1/s2 skip, dilation-1 seps, channels multiples of 8."""
        from .. import config

        if not config.pallas_xmid_enabled():
            return False
        try:
            if (blk.skip_conv is None or blk.skip_conv.stride != (2, 2)
                    or blk.skip_conv.kernel_size != (1, 1)):
                return False
            for s, stride in ((blk.sep1, (1, 1)), (blk.sep2, (1, 1)),
                              (blk.sep3, (2, 2))):
                dw, pw = s.sep.depthwise, s.sep.pointwise
                if (s.sep.bn_dw is None or s.post_relu
                        or dw.kernel_size != (3, 3) or dw.stride != stride
                        or dw.dilation != (1, 1)
                        or dw.groups != dw.in_channels
                        or dw.in_channels % 8 != 0
                        or pw.kernel[...].shape[3] % 8 != 0
                        or dw.bias is not None or pw.bias is not None):
                    return False
            return True
        except (AttributeError, TypeError):
            return False

    def _call_fused_entry(self, x, blk, mesh=None):
        from .. import config
        from ..ops.pallas.xchain import (entry_block_params,
                                         fused_x_entry_block_train,
                                         fused_x_entry_block_train_sharded)

        p = entry_block_params(blk)
        act1 = "relu" if blk.sep1.pre_relu else False
        eps = float(blk.sep1.sep.bn_dw.epsilon)
        if mesh is not None:
            out, stats = fused_x_entry_block_train_sharded(
                x, p, mesh, act1, eps, config.pallas_interpret_mode())
        else:
            out, stats = fused_x_entry_block_train(
                x, p, act1, eps, config.pallas_interpret_mode())
        bns = []
        for s in (blk.sep1, blk.sep2, blk.sep3):
            bns += [s.sep.bn_dw, s.bn]
        bns.append(blk.skip_bn)
        for bn, (m, v) in zip(bns, stats):
            mom = bn.momentum
            bn.mean[...] = mom * bn.mean[...] + (1.0 - mom) * m
            bn.var[...] = mom * bn.var[...] + (1.0 - mom) * v
        return out

    def _call_fused_middle_train(self, x):
        import jax

        from .. import config
        from ..ops.pallas.xchain import (fused_x_middle_train,
                                         fused_x_middle_train_sharded,
                                         middle_train_params)

        p = middle_train_params(self.middle)
        eps = float(self.middle[0].sep1.sep.bn_dw.epsilon)
        d = int(self.middle[0].sep1.sep.depthwise.dilation[0])
        nblk = len(self.middle)
        mesh = config.active_mesh()
        if (mesh is not None and jax.device_count() > 1
                and x.shape[0] % mesh.devices.size == 0):
            out, flat = fused_x_middle_train_sharded(
                x, p, mesh, nblk, eps, config.pallas_interpret_mode(), d)
        else:
            out, flat = fused_x_middle_train(
                x, p, nblk, eps, config.pallas_interpret_mode(), d)
        it = iter(flat)
        for blk in self.middle:
            for s in (blk.sep1, blk.sep2, blk.sep3):
                for bn in (s.sep.bn_dw, s.bn):
                    m, v = next(it)
                    mom = bn.momentum
                    bn.mean[...] = mom * bn.mean[...] + (1.0 - mom) * m
                    bn.var[...] = mom * bn.var[...] + (1.0 - mom) * v
        return out

    def _fused_tail_mode(self) -> str | None:
        """Structural guard for the fused exit flow: reference channel plan
        (_TAIL_A/_TAIL_B), uniform dilation, stride-1 everywhere (OS16/8),
        1x1 skip, Xception relu placement."""
        from .. import config
        from ..ops.pallas.xchain import _TAIL_A, _TAIL_B

        if not config.pallas_xmid_enabled():
            return None
        try:
            eb, seps = self.exit_block, (self.exit_sep1, self.exit_sep2,
                                         self.exit_sep3)
            if eb.skip_conv is None or eb.skip_conv.stride != (1, 1):
                return None
            d = eb.sep1.sep.depthwise.dilation[0]
            if d < 2:          # OS32: exit runs stride-2 — fall back
                return None
            plan = list(zip(_TAIL_A, (eb.sep1, eb.sep2, eb.sep3),
                            (True, False), (False,) * 3))
            plan += list(zip(_TAIL_B, seps, (False,) * 3, (True,) * 3))
            for (ci, co, act), s, pre, post in [
                    (sp, m, m.pre_relu, m.post_relu)
                    for (sp, m, _, _) in plan]:
                dw, pw = s.sep.depthwise, s.sep.pointwise
                if (s.sep.bn_dw is None
                        or dw.kernel_size != (3, 3) or dw.stride != (1, 1)
                        or dw.dilation != (d, d) or dw.groups != ci
                        or pw.kernel[...].shape != (1, 1, ci, co)
                        or dw.bias is not None or pw.bias is not None):
                    return None
            if not (eb.sep1.pre_relu and eb.sep2.pre_relu and eb.sep3.pre_relu
                    and not any(s.post_relu for s in (eb.sep1, eb.sep2,
                                                      eb.sep3))
                    and all(not s.pre_relu and s.post_relu for s in seps)):
                return None
            bn0 = eb.sep1.sep.bn_dw
            mode = "eval" if bn0.use_running_average else "train"
            return mode if config.pallas_xmid_part_enabled(
                "tail", mode) else None
        except (AttributeError, IndexError, TypeError):
            return None

    def _call_fused_tail_train(self, x):
        import jax

        from .. import config
        from ..ops.pallas.xchain import (fused_x_tail_train,
                                         fused_x_tail_train_sharded,
                                         tail_train_params)

        eb = self.exit_block
        seps = (self.exit_sep1, self.exit_sep2, self.exit_sep3)
        p = tail_train_params(eb, seps)
        d = int(eb.sep1.sep.depthwise.dilation[0])
        eps = float(eb.sep1.sep.bn_dw.epsilon)
        mesh = config.active_mesh()
        if (mesh is not None and jax.device_count() > 1
                and x.shape[0] % mesh.devices.size == 0):
            out, flat = fused_x_tail_train_sharded(
                x, p, mesh, d, eps, config.pallas_interpret_mode())
        else:
            out, flat = fused_x_tail_train(
                x, p, d, eps, config.pallas_interpret_mode())
        it = iter(flat)
        bns = []
        for s in (eb.sep1, eb.sep2, eb.sep3):
            bns += [s.sep.bn_dw, s.bn]
        bns.append(eb.skip_bn)
        for s in seps:
            bns += [s.sep.bn_dw, s.bn]
        for bn in bns:
            m, v = next(it)
            mom = bn.momentum
            bn.mean[...] = mom * bn.mean[...] + (1.0 - mom) * m
            bn.var[...] = mom * bn.var[...] + (1.0 - mom) * v
        return out

    def _conv1_s2d_active(self) -> bool:
        from .. import config

        c = self.conv1.conv
        return (config.s2d_stem_enabled() and c.kernel_size == (3, 3)
                and c.stride == (2, 2) and c.padding == (1, 1)
                and c.dilation == (1, 1) and c.bias is None)

    def _run_entry_block(self, x, blk):
        import jax

        from .. import config

        if not self._fused_entry_ok(blk):
            return blk(x)
        if blk.sep1.sep.bn_dw.use_running_average:
            from ..ops.pallas.xchain import fused_x_entry_block_eval
            from .layers import maybe_shard_eval

            if not config.pallas_xmid_part_enabled("entry", "eval"):
                return blk(x)
            interp = config.pallas_interpret_mode()
            fn = maybe_shard_eval(
                lambda t: fused_x_entry_block_eval(t, blk, interp),
                x.shape[0])
            return blk(x) if fn is None else fn(x)
        if not config.pallas_xmid_part_enabled("entry", "train"):
            return blk(x)
        if jax.device_count() == 1:
            return self._call_fused_entry(x, blk)
        mesh = config.active_mesh()
        if mesh is not None and x.shape[0] % mesh.devices.size == 0:
            return self._call_fused_entry(x, blk, mesh)
        return blk(x)

    def __call__(self, x):
        from .. import config
        from ..ops.conv import s2d_packed_form

        form = (s2d_packed_form(x) if config.host_s2d_enabled() else None)
        if form is not None:
            # HOST-packed S2D input (ops.conv.s2d_pack): the 3x3/s2/pad1
            # entry conv reads the packed tensor via an exact 2x2-VALID
            # rewrite — kills the 769² input layout copy (~1.0 ms) and the
            # batch-group conv1 wgrad (~1.3 ms) XLA pays at config #3
            # (round-5 xplane). Weight transform is differentiable, so the
            # student's conv1 grads flow unchanged.
            from ..ops.conv import conv2d_s2d_packed

            c = self.conv1.conv
            w = c.kernel[...]
            if c.dtype is not None:
                x = x.astype(c.dtype)
                w = w.astype(c.dtype)
            dn = (("NHCW" if form == "nhcw" else "NHWC"), "HWIO", "NHWC")
            x = nnx.relu(self.conv1.bn(conv2d_s2d_packed(
                x, w, 1, dimension_numbers=dn)))
            x = self.conv2(x)
        elif self._conv1_s2d_active():
            # entry 3x3/s2 C_in=3 via the space-to-depth rewrite
            # (ops.conv.conv2d_s2d) — same small-channel-conv tax as the
            # ResNet stem; BN+relu stay on the module
            from ..ops.conv import conv2d_s2d

            c = self.conv1.conv
            w = c.kernel[...]
            if c.dtype is not None:
                x = x.astype(c.dtype)
                w = w.astype(c.dtype)
            x = nnx.relu(self.conv1.bn(conv2d_s2d(x, w, 1)))
            x = self.conv2(x)
        else:
            x = self.conv2(self.conv1(x))
        x = self._run_entry_block(x, self.block1)
        low_level = x
        x = self._run_entry_block(x, self.block2)
        x = self._run_entry_block(x, self.block3)
        from .layers import maybe_shard_eval

        interp = config.pallas_interpret_mode()
        mode = self._fused_middle_mode()
        if mode == "eval":
            from ..ops.pallas.xchain import fused_x_middle_eval

            _d = int(self.middle[0].sep1.sep.depthwise.dilation[0])
            fn = maybe_shard_eval(
                lambda t: fused_x_middle_eval(t, list(self.middle), interp,
                                              dil=_d),
                x.shape[0])
            if fn is not None:
                x = fn(x)
            else:                            # multi-device, no usable mesh
                for b in self.middle:
                    x = b(x)
        elif mode == "train":
            x = self._call_fused_middle_train(x)
        else:
            for b in self.middle:
                x = b(x)
        tmode = self._fused_tail_mode()
        if tmode == "eval":
            from ..ops.pallas.xchain import fused_x_tail_eval

            fn = maybe_shard_eval(
                lambda t: fused_x_tail_eval(
                    t, self.exit_block,
                    (self.exit_sep1, self.exit_sep2, self.exit_sep3),
                    int(self.exit_block.sep1.sep.depthwise.dilation[0]),
                    interp),
                x.shape[0])
            tmode = None if fn is None else tmode
            if fn is not None:
                x = fn(x)
        if tmode == "train":
            x = self._call_fused_tail_train(x)
        elif tmode != "eval":
            x = self.exit_block(x)
            x = self.exit_sep3(self.exit_sep2(self.exit_sep1(x)))
        return {"low_level": low_level, "out": x}


def xception65(*, output_stride=16, dtype=None, rngs: nnx.Rngs) -> Xception65:
    return Xception65(output_stride=output_stride, dtype=dtype, rngs=rngs)
