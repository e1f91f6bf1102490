"""Fused MobileNetV2 IR chain f3..f6 (ops.pallas.irchain) vs a pure-jnp
reference: forward values, low-level tap, BN batch stats, and gradients
(input + every param + the low-level cotangent path), interpret mode on CPU.
The reference uses the torch-pinned conv ops, so agreement chains to
reference parity."""

import numpy as np
import jax
import jax.numpy as jnp

from kd_cheap_conv_tpu.ops.conv import conv2d, depthwise_conv2d
from kd_cheap_conv_tpu.ops.pallas.irchain import _BLOCKS, fused_ir_chain

RNG = np.random.RandomState(7)
EPS = 1e-5


def _params():
    p = {}
    for i, (stride, cin, ce, cout, res) in enumerate(_BLOCKS):
        p[f"we{i}"] = RNG.randn(ce, cin).astype(np.float32) * 0.3
        p[f"k{i}"] = RNG.randn(ce, 9).astype(np.float32) * 0.5
        p[f"wp{i}"] = RNG.randn(cout, ce).astype(np.float32) * 0.2
        for tag, c in (("e", ce), ("d", ce), ("p", cout)):
            p[f"g{tag}{i}"] = (1.0 + 0.3 * RNG.randn(c)).astype(np.float32)
            p[f"b{tag}{i}"] = (0.2 * RNG.randn(c)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _bn_train(x, g, b, relu):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(0, 1, 2))
    var = (xf * xf).mean(axis=(0, 1, 2)) - mu * mu
    u = (xf - mu) * jax.lax.rsqrt(var + EPS) * g + b
    return (jnp.clip(u, 0.0, 6.0) if relu else u), (mu, var)


def _dw_hwio(k):
    c = k.shape[0]
    return k.reshape(c, 3, 3).transpose(1, 2, 0)[:, :, None, :]


def _pw_hwio(w):
    return w.T[None, None]


def ref_chain(x, p):
    """f3..f6 in NHWC with training-mode BN. Returns (out, low, stats)."""
    stats = []
    low = None
    for i, (stride, cin, ce, cout, res) in enumerate(_BLOCKS):
        aE = conv2d(x, _pw_hwio(p[f"we{i}"]))
        hE, stE = _bn_train(aE, p[f"ge{i}"], p[f"be{i}"], True)
        aD = depthwise_conv2d(hE, _dw_hwio(p[f"k{i}"]), stride=stride,
                              padding=1)
        hD, stD = _bn_train(aD, p[f"gd{i}"], p[f"bd{i}"], True)
        aP = conv2d(hD, _pw_hwio(p[f"wp{i}"]))
        hP, stP = _bn_train(aP, p[f"gp{i}"], p[f"bp{i}"], False)
        x = hP + x if res else hP
        stats.append((stE, stD, stP))
        if i == 0:
            low = x
    return x, low, stats


def test_ir_chain_forward_and_stats():
    p = _params()
    x = jnp.asarray(RNG.randn(2, 17, 17, 24), jnp.float32)
    out, low, stats = fused_ir_chain(x, p, 2, EPS, True)
    wout, wlow, wstats = ref_chain(x, p)
    assert out.shape == (2, 9, 9, 32)
    assert low.shape == (2, 17, 17, 24)
    np.testing.assert_allclose(np.asarray(low), np.asarray(wlow),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(wout),
                               rtol=1e-4, atol=1e-4)
    flat_w = [mv for blk in wstats for mv in blk]
    for k, ((m, v), (wm, wv)) in enumerate(zip(stats, flat_w)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(wm),
                                   rtol=1e-4, atol=1e-5, err_msg=f"mean{k}")
        np.testing.assert_allclose(np.asarray(v), np.asarray(wv),
                                   rtol=1e-4, atol=1e-5, err_msg=f"var{k}")


def test_ir_chain_grads():
    p = _params()
    x = jnp.asarray(RNG.randn(2, 17, 17, 24), jnp.float32)
    wo = jnp.asarray(RNG.randn(2, 9, 9, 32), jnp.float32)
    wl = jnp.asarray(RNG.randn(2, 17, 17, 24), jnp.float32)

    def f_fused(x, p):
        out, low, _ = fused_ir_chain(x, p, 2, EPS, True)
        return (jnp.sum(out.astype(jnp.float32) * wo)
                + jnp.sum(low.astype(jnp.float32) * wl))

    def f_ref(x, p):
        out, low, _ = ref_chain(x, p)
        return jnp.sum(out * wo) + jnp.sum(low * wl)

    np.testing.assert_allclose(float(f_fused(x, p)), float(f_ref(x, p)),
                               rtol=1e-4)
    g1 = jax.grad(f_fused, argnums=(0, 1))(x, p)
    g2 = jax.grad(f_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=2e-3, atol=2e-4, err_msg="d x")
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(g1[1][key]),
                                   np.asarray(g2[1][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d {key}")


def test_ir_chain_even_height():
    p = _params()
    x = jnp.asarray(RNG.randn(1, 16, 16, 24), jnp.float32)
    out, low, _ = fused_ir_chain(x, p, 1, EPS, True)
    wout, wlow, _ = ref_chain(x, p)
    assert out.shape == wout.shape == (1, 8, 8, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(wout),
                               rtol=1e-4, atol=1e-4)


def test_fused_ir_module_integration():
    """MobileNetV2 with fused stem + fused IR chain force-enabled (interpret
    mode on CPU) matches the stock module path: forward dict, grads, BN
    running-stat updates."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.models.mobilenetv2 import MobileNetV2

    x = jnp.asarray(np.random.RandomState(42).randn(2, 33, 33, 3),
                    jnp.float32)
    ref = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))
    fused = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))

    olds = (config.use_pallas_stem, config.use_pallas_ir)
    try:
        config.use_pallas_stem = True
        config.use_pallas_ir = True
        assert fused._fused_stem_active() and fused._fused_ir_active()

        def loss(model, x):
            out = model(x)
            return (jnp.sum(out["out"].astype(jnp.float32) ** 2)
                    + jnp.sum(out["low_level"].astype(jnp.float32) ** 2))

        config.use_pallas_stem = False
        config.use_pallas_ir = False
        v_ref, g_ref = nnx.value_and_grad(loss)(ref, x)
        config.use_pallas_stem = True
        config.use_pallas_ir = True
        v_fused, g_fused = nnx.value_and_grad(loss)(fused, x)
    finally:
        config.use_pallas_stem, config.use_pallas_ir = olds

    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-4)
    flat_r = jax.tree.leaves(g_ref)
    flat_f = jax.tree.leaves(g_fused)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a), np.asarray(b)
        # see test_pallas_stem: isolated relu6 clip-boundary flips allowed
        bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
        assert bad.mean() <= 5e-3, f"{bad.sum()}/{bad.size} grads off"
        assert np.abs(a - b).max() < 0.1
    # BN running stats updated identically through the chain's 12 BNs
    for fi in (3, 4, 5, 6):
        for get in (lambda f: f.body[0].bn, lambda f: f.body[1].bn,
                    lambda f: f.pw_bn):
            br, bf = get(ref.features[fi]), get(fused.features[fi])
            np.testing.assert_allclose(np.asarray(bf.mean[...]),
                                       np.asarray(br.mean[...]),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(bf.var[...]),
                                       np.asarray(br.var[...]),
                                       rtol=1e-4, atol=1e-5)


def test_mnv2_eval_fused_matches_stock():
    """Eval-mode folded-BN IR kernels (inference path, config #5): full
    MobileNetV2 forward with the knob on vs stock eval."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.models.mobilenetv2 import MobileNetV2

    def build():
        m = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))
        # randomize running stats so the BN folds are non-trivial
        rng = np.random.RandomState(21)
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, nnx.BatchNorm):
                c = mod.mean[...].shape[0]
                mod.mean[...] = jnp.asarray(
                    0.3 * rng.randn(c).astype(np.float32))
                mod.var[...] = jnp.asarray(
                    (1 + 0.5 * rng.rand(c)).astype(np.float32))
        m.eval()
        return m

    from jax.sharding import Mesh

    ref, fused = build(), build()
    # batch divisible by the 8-device conftest mesh + an active mesh, so
    # the shard-wrapped eval kernels actually engage (no mesh -> maybe_
    # shard_eval falls back to stock and the test would compare stock to
    # stock)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x = jnp.asarray(np.random.RandomState(4).randn(8, 65, 65, 3),
                    jnp.float32)
    old = config.use_pallas_ir
    try:
        config.use_pallas_ir = False
        assert not fused._eval_fused_active()
        want = ref(x)
        config.use_pallas_ir = True
        config.set_active_mesh(mesh)
        assert fused._eval_fused_active()
        got = fused(x)
    finally:
        config.use_pallas_ir = old
        config.set_active_mesh(None)
    for k in ("low_level", "out"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)
