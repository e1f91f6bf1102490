"""Fused MobileNetV2 stem (ops.pallas.stem) vs a pure-jnp reference chain:
forward values, BN batch stats, and gradients (input + every param), in
interpreter mode on CPU. The reference uses the already-torch-pinned conv
ops, so agreement here chains to reference parity."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from kd_cheap_conv_tpu.ops.conv import depthwise_conv2d, conv2d
from kd_cheap_conv_tpu.ops.pallas.stem import fused_stem_f1f2

RNG = np.random.RandomState(0)
EPS = 1e-5


def _params():
    p = {
        "k1": RNG.randn(32, 9).astype(np.float32) * 0.5,
        "w1": RNG.randn(16, 32).astype(np.float32) * 0.3,
        "w2": RNG.randn(96, 16).astype(np.float32) * 0.3,
        "k2": RNG.randn(96, 9).astype(np.float32) * 0.5,
        "w3": RNG.randn(24, 96).astype(np.float32) * 0.2,
    }
    for i, c in enumerate([32, 32, 16, 96, 96, 24]):
        p[f"g{i}"] = (1.0 + 0.3 * RNG.randn(c)).astype(np.float32)
        p[f"b{i}"] = (0.2 * RNG.randn(c)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _bn_train(x, g, b, relu):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(0, 1, 2))
    var = (xf * xf).mean(axis=(0, 1, 2)) - mu * mu
    u = (xf - mu) * jax.lax.rsqrt(var + EPS) * g + b
    return (jnp.clip(u, 0.0, 6.0) if relu else u), (mu, var)


def _dw_hwio(k):   # (C,9) -> (3,3,1,C)
    c = k.shape[0]
    return k.reshape(c, 3, 3).transpose(1, 2, 0)[:, :, None, :]


def _pw_hwio(w):   # (Co,Ci) -> (1,1,Ci,Co)
    return w.T[None, None]


def ref_stem(a0n, p):
    """Reference f1+f2 chain in NHWC with training-mode BN."""
    h0, st0 = _bn_train(a0n, p["g0"], p["b0"], True)
    a1 = depthwise_conv2d(h0, _dw_hwio(p["k1"]), padding=1)
    h1, st1 = _bn_train(a1, p["g1"], p["b1"], True)
    a2 = conv2d(h1, _pw_hwio(p["w1"]))
    h2, st2 = _bn_train(a2, p["g2"], p["b2"], False)
    a3 = conv2d(h2, _pw_hwio(p["w2"]))
    h3, st3 = _bn_train(a3, p["g3"], p["b3"], True)
    a4 = depthwise_conv2d(h3, _dw_hwio(p["k2"]), stride=2, padding=1)
    h4, st4 = _bn_train(a4, p["g4"], p["b4"], True)
    a5 = conv2d(h4, _pw_hwio(p["w3"]))
    z2, st5 = _bn_train(a5, p["g5"], p["b5"], False)
    return z2, (st0, st1, st2, st3, st4, st5)


def _nhcw(a0n):
    return jnp.transpose(a0n, (0, 1, 3, 2))


def test_fused_stem_forward_and_stats():
    p = _params()
    a0 = jnp.asarray(RNG.randn(2, 17, 17, 32), jnp.float32)
    out, stats = fused_stem_f1f2(_nhcw(a0), p, EPS, True)
    want, wstats = ref_stem(a0, p)
    assert out.shape == (2, 9, 9, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    for k, ((m, v), (wm, wv)) in enumerate(zip(stats, wstats)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(wm),
                                   rtol=1e-4, atol=1e-5, err_msg=f"mean{k}")
        np.testing.assert_allclose(np.asarray(v), np.asarray(wv),
                                   rtol=1e-4, atol=1e-5, err_msg=f"var{k}")


def test_fused_stem_grads():
    p = _params()
    a0 = jnp.asarray(RNG.randn(2, 17, 17, 32), jnp.float32)
    w = jnp.asarray(RNG.randn(2, 9, 9, 24), jnp.float32)

    def f_fused(a0, p):
        out, _ = fused_stem_f1f2(_nhcw(a0), p, EPS, True)
        return jnp.sum(out.astype(jnp.float32) * w)

    def f_ref(a0, p):
        out, _ = ref_stem(a0, p)
        return jnp.sum(out * w)

    v1 = f_fused(a0, p)
    v2 = f_ref(a0, p)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)

    g1 = jax.grad(f_fused, argnums=(0, 1))(a0, p)
    g2 = jax.grad(f_ref, argnums=(0, 1))(a0, p)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=2e-3, atol=2e-4, err_msg="d a0")
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(g1[1][key]),
                                   np.asarray(g2[1][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d {key}")


@pytest.mark.slow
def test_fused_stem_module_integration():
    """MobileNetV2 with the fused stem force-enabled (interpret mode on CPU)
    matches the stock module path: forward dict, grads, and BN running-stat
    updates."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.models.mobilenetv2 import MobileNetV2

    x = jnp.asarray(np.random.RandomState(42).randn(2, 33, 33, 3),
                    jnp.float32)
    ref = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))
    fused = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))

    old = config.use_pallas_stem
    config.use_pallas_stem = True
    try:
        assert fused._fused_stem_active()

        def loss(model, x):
            out = model(x)
            return (jnp.sum(out["out"].astype(jnp.float32) ** 2)
                    + jnp.sum(out["low_level"].astype(jnp.float32) ** 2))

        config.use_pallas_stem = False
        v_ref, g_ref = nnx.value_and_grad(loss)(ref, x)
        config.use_pallas_stem = True
        v_fused, g_fused = nnx.value_and_grad(loss)(fused, x)
    finally:
        config.use_pallas_stem = old

    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-4)
    flat_r = jax.tree.leaves(g_ref)
    flat_f = jax.tree.leaves(g_fused)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a), np.asarray(b)
        # Downstream-of-stem grads pass through many relu6 clips; a ~1e-6
        # difference in the stem output can flip a clip-boundary derivative
        # mask on isolated pixels (observed: 2/1296 elements on the 8-device
        # CPU build), which is a finite jump, not an error. Require all but
        # a sliver of elements tight, and bound the outliers.
        bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
        assert bad.mean() <= 5e-3, f"{bad.sum()}/{bad.size} grads off"
        assert np.abs(a - b).max() < 0.1
    # BN running stats updated identically (momentum rule)
    for path in (("features", 0, "bn"), ("features", 2, "pw_bn")):
        br, bf = ref, fused
        for seg in path:
            br = br[seg] if isinstance(seg, int) else getattr(br, seg)
            bf = bf[seg] if isinstance(seg, int) else getattr(bf, seg)
        np.testing.assert_allclose(np.asarray(bf.mean[...]),
                                   np.asarray(br.mean[...]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bf.var[...]),
                                   np.asarray(br.var[...]),
                                   rtol=1e-4, atol=1e-5)


def _w0_param(w):
    """(3,3,3,C0) raw entry kernel -> the (C0,48) hcat-packed f0 param
    (mirrors models.mobilenetv2._stem_inputs / ops.conv.conv2d_s2d_packed
    w2 transform)."""
    co = w.shape[3]
    w2 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w2 = jnp.transpose(w2.reshape(2, 2, 2, 2, 3, co),
                       (0, 2, 1, 3, 4, 5)).reshape(4, 12, co)
    return jnp.transpose(w2, (2, 0, 1)).reshape(co, 48)


def test_fused_stem_f0_in_chain_forward():
    """f0-in-chain mode (params carry w0; input is the channel-sublane
    packed S2D tensor) matches entry-conv + reference chain, including the
    bn0 batch moments now computed in-kernel."""
    from kd_cheap_conv_tpu.ops.conv import s2d_pack

    p = _params()
    w0 = jnp.asarray(RNG.randn(3, 3, 3, 32).astype(np.float32) * 0.3)
    x = jnp.asarray(RNG.randn(2, 17, 17, 3), jnp.float32)
    xpk = s2d_pack(x, channel_sublane=True)
    assert xpk.shape == (2, 12, 12, 12)
    pf = dict(p)
    pf["w0"] = _w0_param(w0)
    out, stats = fused_stem_f1f2(xpk, pf, EPS, True)
    a0n = conv2d(x, w0, stride=2, padding=1)
    want, wstats = ref_stem(a0n, p)
    assert out.shape == want.shape == (2, 5, 5, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    for k, ((m, v), (wm, wv)) in enumerate(zip(stats, wstats)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(wm),
                                   rtol=1e-4, atol=1e-5, err_msg=f"mean{k}")
        np.testing.assert_allclose(np.asarray(v), np.asarray(wv),
                                   rtol=1e-4, atol=1e-5, err_msg=f"var{k}")


def test_fused_stem_f0_in_chain_grads():
    """Gradients w.r.t. the packed input AND the raw 3x3 entry kernel (the
    w0 param transform is differentiable) match the reference chain driven
    from the same packed tensor via conv2d_s2d_packed."""
    from kd_cheap_conv_tpu.ops.conv import conv2d_s2d_packed, s2d_pack

    p = _params()
    w0 = jnp.asarray(RNG.randn(3, 3, 3, 32).astype(np.float32) * 0.3)
    x = jnp.asarray(RNG.randn(2, 17, 17, 3), jnp.float32)
    xpk = s2d_pack(x, channel_sublane=True)
    w = jnp.asarray(RNG.randn(2, 5, 5, 24), jnp.float32)

    def f_fused(xpk, w0, p):
        pf = dict(p)
        pf["w0"] = _w0_param(w0)
        out, _ = fused_stem_f1f2(xpk, pf, EPS, True)
        return jnp.sum(out.astype(jnp.float32) * w)

    def f_ref(xpk, w0, p):
        a0 = conv2d_s2d_packed(
            xpk, w0, 1, dimension_numbers=("NHCW", "HWIO", "NHWC"))
        out, _ = ref_stem(a0, p)
        return jnp.sum(out * w)

    np.testing.assert_allclose(float(f_fused(xpk, w0, p)),
                               float(f_ref(xpk, w0, p)), rtol=1e-4)
    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(xpk, w0, p)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(xpk, w0, p)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=2e-3, atol=2e-4, err_msg="d xpk")
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=2e-3, atol=2e-3, err_msg="d w0")
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(g1[2][key]),
                                   np.asarray(g2[2][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d {key}")


@pytest.mark.slow
def test_fused_stem_f0_module_integration():
    """MobileNetV2 fed the channel-sublane packed S2D input with
    f0-in-chain enabled matches the stock module on the raw images:
    forward dict, param grads, BN running stats (incl. bn0, whose moments
    now come from the Pallas entry pass)."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.models.mobilenetv2 import MobileNetV2
    from kd_cheap_conv_tpu.ops.conv import s2d_pack

    x = jnp.asarray(np.random.RandomState(7).randn(2, 33, 33, 3),
                    jnp.float32)
    xpk = s2d_pack(x, channel_sublane=True)
    ref = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))
    fused = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))

    old = (config.use_pallas_stem, config.use_pallas_f0, config.use_host_s2d)
    try:
        def loss(model, x):
            out = model(x)
            return (jnp.sum(out["out"].astype(jnp.float32) ** 2)
                    + jnp.sum(out["low_level"].astype(jnp.float32) ** 2))

        config.use_pallas_stem = False
        config.use_pallas_f0 = False
        config.use_host_s2d = False
        v_ref, g_ref = nnx.value_and_grad(loss)(ref, x)
        config.use_pallas_stem = True
        config.use_pallas_f0 = True
        config.use_host_s2d = True
        assert fused._fused_stem_active()
        v_fused, g_fused = nnx.value_and_grad(loss)(fused, xpk)
        # production path: f0-in-chain + NW-layout stem->IR handoff
        old_ir = config.use_pallas_ir
        config.use_pallas_ir = True
        try:
            fused_ir = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))
            assert fused_ir._fused_ir_active()
            v_fir, g_fir = nnx.value_and_grad(loss)(fused_ir, xpk)
        finally:
            config.use_pallas_ir = old_ir
    finally:
        (config.use_pallas_stem, config.use_pallas_f0,
         config.use_host_s2d) = old

    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(float(v_fir), float(v_ref), rtol=1e-4)
    flat_r = jax.tree.leaves(g_ref)
    for flat_f in (jax.tree.leaves(g_fused), jax.tree.leaves(g_fir)):
        assert len(flat_r) == len(flat_f)
        for a, b in zip(flat_f, flat_r):
            a, b = np.asarray(a), np.asarray(b)
            bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
            assert bad.mean() <= 5e-3, f"{bad.sum()}/{bad.size} grads off"
            assert np.abs(a - b).max() < 0.1
    for path in (("features", 0, "bn"), ("features", 2, "pw_bn")):
        br, bf = ref, fused
        for seg in path:
            br = br[seg] if isinstance(seg, int) else getattr(br, seg)
            bf = bf[seg] if isinstance(seg, int) else getattr(bf, seg)
        np.testing.assert_allclose(np.asarray(bf.mean[...]),
                                   np.asarray(br.mean[...]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bf.var[...]),
                                   np.asarray(br.var[...]),
                                   rtol=1e-4, atol=1e-5)


def test_fused_stem_even_height():
    # H even exercises the other stride-2 pairing parity
    p = _params()
    a0 = jnp.asarray(RNG.randn(1, 16, 16, 32), jnp.float32)
    out, _ = fused_stem_f1f2(_nhcw(a0), p, EPS, True)
    want, _ = ref_stem(a0, p)
    assert out.shape == want.shape == (1, 8, 8, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
