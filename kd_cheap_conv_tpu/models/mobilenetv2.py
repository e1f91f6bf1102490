"""MobileNetV2 backbone with output-stride control (DeepLab variant).

Reference capability (SURVEY.md §2.1): inverted-residual backbone where, once
the running stride reaches `output_stride`, later stage strides are converted
into dilation. Low-level tap = output of the first four feature blocks (24ch,
stride 4); high-level tap = final 320ch block (the 1x1 1280 head conv is
dropped for segmentation), matching the reference's
`features[0:4]` / `features[4:-1]` split.
"""

from __future__ import annotations

from flax import nnx

from .layers import BatchNorm, Conv2d, ConvBNReLU


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU6(nnx.Module):
    def __init__(self, in_ch, out_ch, kernel_size=3, *, stride=1, dilation=1,
                 groups=1, dtype=None, layout="NHWC", rngs: nnx.Rngs):
        pad = (kernel_size - 1) // 2 * dilation
        self.conv = Conv2d(in_ch, out_ch, kernel_size, stride=stride, padding=pad,
                           dilation=dilation, groups=groups, use_bias=False,
                           dtype=dtype, layout=layout, rngs=rngs)
        self.bn = BatchNorm(out_ch, dtype=dtype,
                            axis=1 if layout == "NCHW" else -1, rngs=rngs)

    def __call__(self, x):
        return nnx.relu6(self.bn(self.conv(x)))


class InvertedResidual(nnx.Module):
    def __init__(self, inp, oup, *, stride=1, dilation=1, expand_ratio=6,
                 dtype=None, layout="NHWC", rngs: nnx.Rngs):
        assert stride in (1, 2)
        hidden = int(round(inp * expand_ratio))
        self.use_res_connect = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU6(inp, hidden, 1, dtype=dtype,
                                      layout=layout, rngs=rngs))
        layers.append(ConvBNReLU6(hidden, hidden, 3, stride=stride,
                                  dilation=dilation, groups=hidden,
                                  dtype=dtype, layout=layout, rngs=rngs))
        self.pw_linear = Conv2d(hidden, oup, 1, use_bias=False, dtype=dtype,
                                layout=layout, rngs=rngs)
        self.pw_bn = BatchNorm(oup, dtype=dtype,
                               axis=1 if layout == "NCHW" else -1, rngs=rngs)
        self.body = nnx.List(layers)

    def __call__(self, x):
        out = x
        for m in self.body:
            out = m(out)
        out = self.pw_bn(self.pw_linear(out))
        return x + out if self.use_res_connect else out


# (expand_ratio t, channels c, repeats n, stride s)
_INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nnx.Module):
    """Returns {'low_level': 24ch stride-4, 'out': 320ch stride-OS}."""

    def __init__(self, *, output_stride: int = 16, width_mult: float = 1.0,
                 dtype=None, channel_major_until: int = 0, rngs: nnx.Rngs):
        input_channel = _make_divisible(32 * width_mult)
        cm = channel_major_until

        def _layout(idx):
            return "NCHW" if idx < cm else "NHWC"

        features = [ConvBNReLU6(3, input_channel, 3, stride=2, dtype=dtype,
                                layout=_layout(0), rngs=rngs)]
        current_stride = 2
        dilation = 1
        for t, c, n, s in _INVERTED_RESIDUAL_SETTING:
            previous_dilation = dilation
            if current_stride == output_stride:
                stride = 1
                dilation *= s
            else:
                stride = s
                current_stride *= s
            output_channel = _make_divisible(c * width_mult)
            for i in range(n):
                features.append(InvertedResidual(
                    input_channel, output_channel,
                    stride=stride if i == 0 else 1,
                    dilation=previous_dilation if i == 0 else dilation,
                    expand_ratio=t, dtype=dtype,
                    layout=_layout(len(features)), rngs=rngs,
                ))
                input_channel = output_channel
        self.features = nnx.List(features)
        self.low_level_channels = _make_divisible(24 * width_mult)
        self.out_channels = input_channel  # 320
        self.channel_major_until = cm

    def _apply_f0(self, x):
        """features[0] (ConvBNReLU6 3x3/s2/pad1). Consumes a host-packed
        S2D tensor (12 channels, ops.conv.s2d_pack — NHWC or the
        channel-sublane NHCW form) via the exact 2x2 VALID rewrite when
        KDCC_HOST_S2D is on (VERDICT r3 item 5)."""
        from .. import config
        from ..ops.conv import s2d_packed_form

        f0 = self.features[0]
        form = s2d_packed_form(x) if config.host_s2d_enabled() else None
        if form is None:
            return f0(x)
        from flax import nnx as _nnx

        from ..ops.conv import conv2d_s2d_packed

        if f0.conv.kernel_size != (3, 3) or f0.conv.stride != (2, 2) \
                or f0.conv.padding != (1, 1):
            raise ValueError("host-S2D input requires the standard "
                             "3x3/s2/pad1 MobileNetV2 entry conv")
        w = f0.conv.kernel[...]
        if f0.conv.dtype is not None:
            x = x.astype(f0.conv.dtype)
            w = w.astype(f0.conv.dtype)
        dn = (("NHCW" if form == "nhcw" else "NHWC"), "HWIO", "NHWC")
        return _nnx.relu6(f0.bn(conv2d_s2d_packed(x, w, 1,
                                                  dimension_numbers=dn)))

    def _fused_stem_active(self) -> bool:
        from .. import config

        if self.channel_major_until > 0 or not config.pallas_stem_enabled():
            return False
        # training-mode only: the fused passes compute batch BN stats;
        # eval uses the stock path (BN folds into convs under XLA there)
        if self.features[0].bn.use_running_average:
            return False
        # structural guard: cheap-conv surgery (kd.replace) may have swapped
        # modules inside features[1..2] — fall back to the stock path then
        try:
            f1, f2 = self.features[1], self.features[2]
            return (f1.body[0].conv.kernel[...].shape[2] == 1
                    and f1.pw_linear.kernel[...].shape[:2] == (1, 1)
                    and f2.body[0].conv.kernel[...].shape[:2] == (1, 1)
                    and f2.body[1].conv.kernel[...].shape[2] == 1
                    and f2.pw_linear.kernel[...].shape[:2] == (1, 1)
                    and not f1.use_res_connect and not f2.use_res_connect)
        except AttributeError:
            return False

    def _stem_inputs(self, x):
        """(a0 channel-sublane NHCW from features[0].conv, stem param dict,
        the six stem BNs) — shared by the NHWC and NW-handoff stem calls.

        With an NHCW-packed S2D input (KDCC_PALLAS_F0, s2d_pack
        channel_sublane form) the entry conv moves INSIDE the Pallas chain:
        a0 is then the packed input itself and the param dict gains the
        hcat-packed w0 (see ops.pallas.stem f0-in-chain)."""
        import jax.lax as lax
        import jax.numpy as jnp

        from .. import config
        from ..ops.conv import s2d_packed_form

        f0, f1, f2 = self.features[0], self.features[1], self.features[2]
        w0 = f0.conv.kernel[...]
        if f0.conv.dtype is not None:
            x = x.astype(f0.conv.dtype)
            w0 = w0.astype(f0.conv.dtype)
        form = s2d_packed_form(x) if config.host_s2d_enabled() else None
        extra = {}
        if form == "nhcw":
            # f0-in-chain: conv2d_s2d_packed's w2 transform, hcat-packed
            co = w0.shape[3]
            w2 = jnp.pad(w0, ((0, 1), (0, 1), (0, 0), (0, 0)))
            w2 = jnp.transpose(w2.reshape(2, 2, 2, 2, 3, co),
                               (0, 2, 1, 3, 4, 5)).reshape(4, 12, co)
            extra["w0"] = jnp.transpose(w2, (2, 0, 1)).reshape(co, 48)
            a0 = x
        elif form == "nhwc":
            # host-packed S2D input: 2x2 VALID rewrite, same NHCW emission
            from ..ops.conv import conv2d_s2d_packed

            a0 = conv2d_s2d_packed(
                x, w0, 1, dimension_numbers=("NHWC", "HWIO", "NHCW"))
        else:
            ph, pw_ = f0.conv.padding
            a0 = lax.conv_general_dilated(
                x, w0, window_strides=f0.conv.stride,
                padding=[(ph, ph), (pw_, pw_)],
                dimension_numbers=("NHWC", "HWIO", "NHCW"))
        dw = lambda kv: kv[:, :, 0, :].transpose(2, 0, 1).reshape(
            kv.shape[3], 9)
        pw = lambda kv: kv[0, 0].T
        p = {
            **extra,
            "k1": dw(f1.body[0].conv.kernel[...]),
            "w1": pw(f1.pw_linear.kernel[...]),
            "w2": pw(f2.body[0].conv.kernel[...]),
            "k2": dw(f2.body[1].conv.kernel[...]),
            "w3": pw(f2.pw_linear.kernel[...]),
        }
        bns = [f0.bn, f1.body[0].bn, f1.pw_bn, f2.body[0].bn,
               f2.body[1].bn, f2.pw_bn]
        for i, bn in enumerate(bns):
            p[f"g{i}"] = bn.scale[...]
            p[f"b{i}"] = bn.bias[...]
        return a0, p, bns

    def _ir_params(self):
        """(IR-chain param dict, its twelve BNs in stats order)."""
        dw = lambda kv: kv[:, :, 0, :].transpose(2, 0, 1).reshape(
            kv.shape[3], 9)
        pw = lambda kv: kv[0, 0].T
        p = {}
        bns = []
        for i in range(4):
            f = self.features[3 + i]
            p[f"we{i}"] = pw(f.body[0].conv.kernel[...])
            p[f"k{i}"] = dw(f.body[1].conv.kernel[...])
            p[f"wp{i}"] = pw(f.pw_linear.kernel[...])
            for tag, bn in (("e", f.body[0].bn), ("d", f.body[1].bn),
                            ("p", f.pw_bn)):
                p[f"g{tag}{i}"] = bn.scale[...]
                p[f"b{tag}{i}"] = bn.bias[...]
                bns.append(bn)
        return p, bns

    @staticmethod
    def _update_bn_stats(bns, stats):
        """Running-stat updates with each BN's own momentum, exactly like
        nnx.BatchNorm."""
        for bn, (m, v) in zip(bns, stats):
            mom = bn.momentum
            bn.mean[...] = mom * bn.mean[...] + (1.0 - mom) * m
            bn.var[...] = mom * bn.var[...] + (1.0 - mom) * v

    def _use_sharded(self, n):
        """SPMD: shard_map-wrapped passes with psum'd (global) BN moments.
        Non-divisible batches (e.g. a stale mesh left by an unrelated
        in-process run) fall back to the unsharded kernels."""
        import jax

        from .. import config

        mesh = config.active_mesh()
        if (mesh is not None and jax.device_count() > 1
                and n % mesh.devices.size == 0):
            return mesh
        return None

    def _call_fused_stem(self, x):
        """features[0].conv in XLA — emitting the channel-sublane (N,H,C,W)
        layout straight from the conv via dimension_numbers, so no transpose
        pass — then features[1..2] via the fused Pallas stem (ops.pallas.stem,
        see its docstring for the why)."""
        from .. import config
        from ..ops.pallas.stem import fused_stem_f1f2, fused_stem_f1f2_sharded

        a0, p, bns = self._stem_inputs(x)
        eps = float(self.features[0].bn.epsilon)
        mesh = self._use_sharded(a0.shape[0])
        if mesh is not None:
            out, stats = fused_stem_f1f2_sharded(
                a0, p, mesh, eps, config.pallas_interpret_mode())
        else:
            out, stats = fused_stem_f1f2(a0, p, eps,
                                         config.pallas_interpret_mode())
        self._update_bn_stats(bns, stats)
        return out

    def _call_fused_stem_ir(self, x):
        """features[0..6] with the f2 output handed from the fused stem to
        the fused IR chain DIRECTLY in the batch-folded NW layout
        (stem.fused_stem_f1f2_nw -> irchain.fused_ir_chain_nw) — the
        lane-padded NHWC boundary round trip between the two chains never
        materializes, forward or backward (VERDICT r3 item 2). Returns
        (f6 output NHWC, low_level = f3 output NHWC)."""
        from .. import config
        from ..ops.pallas.irchain import (fused_ir_chain_nw,
                                          fused_ir_chain_sharded_nw)
        from ..ops.pallas.stem import (fused_stem_f1f2_nw,
                                       fused_stem_f1f2_sharded_nw)

        a0, sp, sbns = self._stem_inputs(x)
        ip, ibns = self._ir_params()
        eps = float(self.features[0].bn.epsilon)
        interp = config.pallas_interpret_mode()
        n = a0.shape[0]
        if "w0" in sp:                  # f0-in-chain: a0 is the packed input
            H, W = a0.shape[1] - 3, a0.shape[3] - 3
        else:
            H, W = a0.shape[1], a0.shape[3]
        H2, W2 = (H + 1) // 2, (W + 1) // 2
        mesh = self._use_sharded(n)
        if mesh is not None:
            z, sstats = fused_stem_f1f2_sharded_nw(a0, sp, mesh, eps, interp)
            out, low, istats = fused_ir_chain_sharded_nw(
                z, ip, mesh, n // mesh.devices.size, H2, W2, eps, interp)
        else:
            z, sstats = fused_stem_f1f2_nw(a0, sp, eps, interp)
            out, low, istats = fused_ir_chain_nw(z, ip, n, H2, W2, eps,
                                                 interp)
        self._update_bn_stats(sbns, sstats)
        self._update_bn_stats(ibns, istats)
        return out, low

    def _fused_ir_active(self) -> bool:
        """Structural guard for the fused f3..f6 IR chain
        (ops.pallas.irchain._BLOCKS shapes, stride/dilation/residual flags,
        train mode, no cheap-conv surgery inside)."""
        from .. import config
        from ..ops.pallas.irchain import _BLOCKS

        if not config.pallas_ir_enabled():
            return False
        if self.features[0].bn.use_running_average:
            return False
        try:
            for i, (stride, cin, ce, cout, res) in enumerate(_BLOCKS):
                f = self.features[3 + i]
                if (f.use_res_connect != res
                        or len(f.body) != 2
                        or f.body[0].conv.kernel[...].shape != (1, 1, cin, ce)
                        or f.body[1].conv.kernel[...].shape != (3, 3, 1, ce)
                        or f.body[1].conv.stride != (stride, stride)
                        or f.body[1].conv.dilation != (1, 1)
                        or f.body[1].conv.groups != ce
                        or f.pw_linear.kernel[...].shape != (1, 1, ce, cout)):
                    return False
            return True
        except (AttributeError, IndexError, TypeError):
            return False

    def _call_fused_ir(self, x):
        """features[3..6] via ops.pallas.irchain (batch-folded NW layout),
        NHWC in/out (used when the fused stem is NOT active — e.g. surgery
        inside f1/f2). Returns (f6 output, low_level = f3 output)."""
        from .. import config
        from ..ops.pallas.irchain import fused_ir_chain, fused_ir_chain_sharded

        p, bns = self._ir_params()
        eps = float(self.features[3].body[0].bn.epsilon)
        mesh = self._use_sharded(x.shape[0])
        if mesh is not None:
            out, low, stats = fused_ir_chain_sharded(
                x, p, mesh, eps, config.pallas_interpret_mode())
        else:
            out, low, stats = fused_ir_chain(
                x, p, x.shape[0], eps, config.pallas_interpret_mode())
        self._update_bn_stats(bns, stats)
        return out, low

    def _eval_fused_active(self) -> bool:
        """Eval-mode folded-BN IR kernels (inference / TTA, config #5)."""
        from .. import config

        return (config.pallas_ir_enabled()
                and self.features[0].bn.use_running_average is True
                and self.channel_major_until == 0)

    def _call_eval_fused(self, x):
        """Group consecutive stride-1 InvertedResiduals into folded eval
        kernels (ops.pallas.irchain.fused_mnv2_blocks_eval); stride-2
        blocks and the entry conv run stock."""
        from .. import config
        from ..ops.pallas.irchain import (fused_ir_block_s2_eval,
                                          fused_mnv2_blocks_eval,
                                          ir_block_fusable,
                                          ir_block_s2_fusable)
        from .layers import maybe_shard_eval

        interp = config.pallas_interpret_mode()
        low_level = None
        run = []

        def flush(x):
            nonlocal run
            if run:
                blocks = tuple(run)
                run = []
                fn = maybe_shard_eval(
                    lambda t: fused_mnv2_blocks_eval(t, blocks, interp),
                    x.shape[0])
                if fn is None:               # multi-device, no usable mesh
                    for b in blocks:
                        x = b(x)
                else:
                    x = fn(x)
            return x

        for i, m in enumerate(self.features):
            if i > 0 and ir_block_fusable(m):
                run.append(m)
            elif i > 0 and ir_block_s2_fusable(m):
                x = flush(x)
                fn = maybe_shard_eval(
                    lambda t, f=m: fused_ir_block_s2_eval(t, f, interp),
                    x.shape[0])
                x = m(x) if fn is None else fn(x)
            else:
                x = flush(x)
                x = self._apply_f0(x) if i == 0 else m(x)
            if i == 3:
                x = flush(x)
                low_level = x
        x = flush(x)
        return {"low_level": low_level, "out": x}

    def __call__(self, x):
        import jax.numpy as jnp

        if self._eval_fused_active():
            return self._call_eval_fused(x)
        if self._fused_stem_active():
            low_level = None
            if self._fused_ir_active():
                # NW-layout handoff: the f2 output never leaves the padded
                # batch-folded layout between the two fused chains
                x, low_level = self._call_fused_stem_ir(x)
                start = 7
            else:
                x = self._call_fused_stem(x)
                start = 3
            for i, m in enumerate(self.features):
                if i < start:
                    continue
                x = m(x)
                if i == 3:
                    low_level = x
            return {"low_level": low_level, "out": x}

        cm = self.channel_major_until
        if cm > 0:
            from ..ops.conv import s2d_packed_form

            if x.shape[1] == 12 or s2d_packed_form(x) is not None:
                raise ValueError("host-S2D packed input is not supported "
                                 "with the NCHW channel-major stem")
            # low-channel high-res stem runs NCHW: W in lanes instead of a
            # 16/32-wide channel dim lane-padded to 128 (4-8x HBM traffic)
            x = jnp.transpose(x, (0, 3, 1, 2))
        low_level = None
        for i, m in enumerate(self.features):
            if i == cm and cm > 0:
                x = jnp.transpose(x, (0, 2, 3, 1))
            x = self._apply_f0(x) if i == 0 and cm == 0 else m(x)
            if i == 3:  # features[0:4] -> 24ch stride-4 tap
                low_level = (jnp.transpose(x, (0, 2, 3, 1)) if i < cm else x)
        if cm > len(self.features) - 1:
            x = jnp.transpose(x, (0, 2, 3, 1))
        return {"low_level": low_level, "out": x}


def mobilenet_v2(*, output_stride=16, width_mult=1.0, dtype=None,
                 channel_major_until: int | None = None,
                 rngs: nnx.Rngs) -> MobileNetV2:
    if channel_major_until is None:
        from .. import config

        channel_major_until = config.stem_channel_major_until()
    return MobileNetV2(output_stride=output_stride, width_mult=width_mult,
                       dtype=dtype, channel_major_until=channel_major_until,
                       rngs=rngs)
