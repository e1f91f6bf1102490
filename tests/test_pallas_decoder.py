"""Fused DeepLabV3+ decoder head (ops.pallas.decoder) vs a pure-jnp
reference chain, interpreter mode on CPU: forward, BN batch stats, and all
gradients; plus a module-level integration test on the real head."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kd_cheap_conv_tpu.ops.conv import conv2d, depthwise_conv2d
from kd_cheap_conv_tpu.ops.pallas.decoder import fused_decoder_head

RNG = np.random.RandomState(3)
EPS = 1e-5


def _params(ci, cm, nc):
    return {
        "k": jnp.asarray(RNG.randn(ci, 9).astype(np.float32) * 0.4),
        "pw": jnp.asarray(RNG.randn(cm, ci).astype(np.float32) * 0.2),
        "g": jnp.asarray((1 + 0.2 * RNG.randn(cm)).astype(np.float32)),
        "b": jnp.asarray(0.1 * RNG.randn(cm).astype(np.float32)),
        "wc": jnp.asarray(RNG.randn(nc, cm).astype(np.float32) * 0.3),
        "bc": jnp.asarray(0.1 * RNG.randn(nc).astype(np.float32)),
    }


def _ref_chain(x_nhwc, p):
    """dw3x3 -> pw -> train BN -> relu -> 1x1+bias, NHWC."""
    ci = x_nhwc.shape[-1]
    dw_hwio = p["k"].reshape(ci, 3, 3).transpose(1, 2, 0)[:, :, None, :]
    t = depthwise_conv2d(x_nhwc, dw_hwio, padding=1)
    a = conv2d(t, p["pw"].T[None, None])
    af = a.astype(jnp.float32)
    mu = af.mean(axis=(0, 1, 2))
    var = (af * af).mean(axis=(0, 1, 2)) - mu * mu
    z = jnp.maximum((af - mu) * jax.lax.rsqrt(var + EPS) * p["g"] + p["b"],
                    0.0)
    logits = conv2d(z, p["wc"].T[None, None], p["bc"])
    return logits, (mu, var)


@pytest.mark.parametrize("shape,nc", [((2, 17, 19, 16), 5),
                                      ((1, 16, 16, 8), 3)])
def test_fused_decoder_forward(shape, nc):
    ci = shape[-1]
    p = _params(ci, 2 * ci, nc)
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    xc = jnp.transpose(x, (0, 1, 3, 2))
    got, (m, v) = fused_decoder_head(xc, p, EPS, True)
    want, (wm, wv) = _ref_chain(x, p)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got, (0, 1, 3, 2))),
                               np.asarray(want), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), np.asarray(wm), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(wv), rtol=1e-4,
                               atol=1e-5)


def test_fused_decoder_grads():
    shape, nc = (2, 17, 19, 16), 5
    ci = shape[-1]
    p = _params(ci, 2 * ci, nc)
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    w = jnp.asarray(RNG.randn(shape[0], shape[1], shape[2], nc), jnp.float32)

    def f_fused(x, p):
        logits, _ = fused_decoder_head(jnp.transpose(x, (0, 1, 3, 2)), p,
                                       EPS, True)
        return jnp.sum(jnp.transpose(logits, (0, 1, 3, 2)) * w)

    def f_ref(x, p):
        logits, _ = _ref_chain(x, p)
        return jnp.sum(logits * w)

    np.testing.assert_allclose(float(f_fused(x, p)), float(f_ref(x, p)),
                               rtol=1e-4)
    gf = jax.grad(f_fused, argnums=(0, 1))(x, p)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-3, atol=2e-4, err_msg="dx")
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(gf[1][key]),
                                   np.asarray(gr[1][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d {key}")


def test_fused_decoder_module_integration():
    """Real DeepLabV3+ head after cheap-conv replacement: fused vs stock
    path — logits, grads, BN running stats."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.kd import replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 33, 33, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, (2, 33, 33)), jnp.int32)

    def build():
        m = build_model("deeplabv3plus_mobilenet", num_classes=6,
                        output_stride=16, rngs=nnx.Rngs(0))
        replace_cheap_convs(m, CheapConvSpec(kind="separable"),
                            scope="classifier")
        return m

    def loss(model, x):
        logits = model(x)
        return jnp.mean((logits.astype(jnp.float32)
                         - jax.nn.one_hot(labels, 6)) ** 2)

    ref, fused = build(), build()
    old = config.use_pallas_decoder
    try:
        config.use_pallas_decoder = False
        assert not fused.classifier._fused_head_active(False)
        v_ref, g_ref = nnx.value_and_grad(loss)(ref, x)
        config.use_pallas_decoder = True
        assert fused.classifier._fused_head_active(False)
        v_fused, g_fused = nnx.value_and_grad(loss)(fused, x)
    finally:
        config.use_pallas_decoder = old

    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        a, b = np.asarray(a), np.asarray(b)
        bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
        assert bad.mean() <= 5e-3, f"{bad.sum()}/{bad.size} grads off"
    bn = fused.classifier.fuse.bn
    bn_ref = ref.classifier.fuse.bn
    np.testing.assert_allclose(np.asarray(bn.mean[...]),
                               np.asarray(bn_ref.mean[...]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bn.var[...]),
                               np.asarray(bn_ref.var[...]),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# batch-folded (NW-on-lanes) variant
# ---------------------------------------------------------------------------

from kd_cheap_conv_tpu.ops.pallas.decoder import (  # noqa: E402
    fused_decoder_head_folded)


@pytest.mark.parametrize("shape,cl,nc", [((2, 17, 19, 24), 8, 5),
                                         ((3, 16, 16, 16), 8, 3)])
def test_folded_decoder_forward(shape, cl, nc):
    ci = shape[-1]
    p = _params(ci, 2 * ci, nc)
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    low, up = x[..., :cl], x[..., cl:]
    got, (m, v) = fused_decoder_head_folded(low, up, p, EPS, True)
    want, (wm, wv) = _ref_chain(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), np.asarray(wm), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(wv), rtol=1e-4,
                               atol=1e-5)


def test_folded_decoder_grads():
    shape, cl, nc = (2, 17, 19, 24), 8, 5
    ci = shape[-1]
    p = _params(ci, 2 * ci, nc)
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    w = jnp.asarray(RNG.randn(shape[0], shape[1], shape[2], nc), jnp.float32)

    def f_folded(x, p):
        logits, _ = fused_decoder_head_folded(x[..., :cl], x[..., cl:], p,
                                              EPS, True)
        return jnp.sum(logits * w)

    def f_ref(x, p):
        logits, _ = _ref_chain(x, p)
        return jnp.sum(logits * w)

    np.testing.assert_allclose(float(f_folded(x, p)), float(f_ref(x, p)),
                               rtol=1e-4)
    gf = jax.grad(f_folded, argnums=(0, 1))(x, p)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-3, atol=2e-4, err_msg="dx")
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(gf[1][key]),
                                   np.asarray(gr[1][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d {key}")


def test_folded_decoder_sharded_matches_unsharded():
    """8-device CPU mesh: batch-sharded folded decoder == unsharded, values
    and grads (sync-BN moments / psum'd weight grads)."""
    from jax.sharding import Mesh

    from kd_cheap_conv_tpu.ops.pallas.decoder import (
        fused_decoder_head_folded_sharded, sharded_decoder_trace_count)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    shape, cl, nc = (8, 9, 11, 16), 8, 4
    ci = shape[-1]
    p = _params(ci, 2 * ci, nc)
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    w = jnp.asarray(RNG.randn(shape[0], shape[1], shape[2], nc), jnp.float32)

    def f_sh(x, p):
        logits, _ = fused_decoder_head_folded_sharded(
            x[..., :cl], x[..., cl:], p, mesh, EPS, True)
        return jnp.sum(logits.astype(jnp.float32) * w)

    def f1(x, p):
        logits, _ = fused_decoder_head_folded(x[..., :cl], x[..., cl:], p,
                                              EPS, True)
        return jnp.sum(logits.astype(jnp.float32) * w)

    t0 = sharded_decoder_trace_count()
    np.testing.assert_allclose(float(f_sh(x, p)), float(f1(x, p)), rtol=1e-5)
    assert sharded_decoder_trace_count() > t0
    gs = jax.grad(f_sh, argnums=(0, 1))(x, p)
    g1 = jax.grad(f1, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(g1[0]),
                               rtol=1e-4, atol=1e-5, err_msg="dx")
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(gs[1][key]),
                                   np.asarray(g1[1][key]),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d {key}")


def test_folded_decoder_module_integration():
    """Real DeepLabV3+ head after cheap-conv replacement with the folded
    path force-enabled vs stock: logits, grads, BN running stats."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.kd import replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 33, 33, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, (2, 33, 33)), jnp.int32)

    def build():
        m = build_model("deeplabv3plus_mobilenet", num_classes=6,
                        output_stride=16, rngs=nnx.Rngs(0))
        replace_cheap_convs(m, CheapConvSpec(kind="separable"),
                            scope="classifier")
        return m

    def loss(model, x):
        logits = model(x)
        return jnp.mean((logits.astype(jnp.float32)
                         - jax.nn.one_hot(labels, 6)) ** 2)

    ref, fused = build(), build()
    old = config.use_pallas_decoder_nw
    try:
        config.use_pallas_decoder_nw = False
        assert not fused.classifier._fused_head_nw_active(False)
        v_ref, g_ref = nnx.value_and_grad(loss)(ref, x)
        config.use_pallas_decoder_nw = True
        assert fused.classifier._fused_head_nw_active(False)
        v_fused, g_fused = nnx.value_and_grad(loss)(fused, x)
    finally:
        config.use_pallas_decoder_nw = old

    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        a, b = np.asarray(a), np.asarray(b)
        bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
        assert bad.mean() <= 5e-3, f"{bad.sum()}/{bad.size} grads off"
    bn = fused.classifier.fuse.bn
    bn_ref = ref.classifier.fuse.bn
    np.testing.assert_allclose(np.asarray(bn.mean[...]),
                               np.asarray(bn_ref.mean[...]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bn.var[...]),
                               np.asarray(bn_ref.var[...]),
                               rtol=1e-4, atol=1e-5)
