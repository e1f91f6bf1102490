"""Fused eval stem+maxpool kernel (ops.pallas.tstem) vs the stock path:
conv7x7/s2/pad3 + eval BN + relu + maxpool3x3/s2/pad1, interpret mode on
CPU, over the host-packed NHCW S2D input."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from kd_cheap_conv_tpu import config
from kd_cheap_conv_tpu.models.resnet import resnet50
from kd_cheap_conv_tpu.ops.conv import s2d_pack

RNG = np.random.RandomState(17)


def _stock_stem_pool(m, x):
    from jax import lax

    y = m.stem(x)
    return lax.reduce_window(
        y, -float("inf"), lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def _randomize_bn(bn):
    c = bn.mean[...].shape[0]
    bn.mean[...] = jnp.asarray(0.3 * RNG.randn(c).astype(np.float32))
    bn.var[...] = jnp.asarray((1 + 0.5 * RNG.rand(c)).astype(np.float32))
    bn.scale[...] = jnp.asarray((1 + 0.2 * RNG.randn(c)).astype(np.float32))
    bn.bias[...] = jnp.asarray(0.2 * RNG.randn(c).astype(np.float32))


def test_tstem_parity():
    from kd_cheap_conv_tpu.ops.pallas.tstem import fused_stem_pool_eval_nhcw

    m = resnet50(output_stride=16, rngs=nnx.Rngs(0))
    _randomize_bn(m.stem.bn)
    m.eval()
    x = jnp.asarray(RNG.randn(8, 33, 29, 3), jnp.float32)
    want = _stock_stem_pool(m, x)
    xpk = s2d_pack(np.asarray(x), channel_sublane=True)
    got = fused_stem_pool_eval_nhcw(jnp.asarray(xpk), m.stem.conv.kernel,
                                    m.stem.bn, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tstem_parity_513_shape_geometry():
    """Odd-grid geometry at a 65² crop (Hp covers multiple BO blocks with a
    ragged tail)."""
    from kd_cheap_conv_tpu.ops.pallas.tstem import fused_stem_pool_eval_nhcw

    m = resnet50(output_stride=16, rngs=nnx.Rngs(1))
    _randomize_bn(m.stem.bn)
    m.eval()
    x = jnp.asarray(RNG.randn(8, 65, 65, 3), jnp.float32)
    want = _stock_stem_pool(m, x)
    xpk = s2d_pack(np.asarray(x), channel_sublane=True)
    got = fused_stem_pool_eval_nhcw(jnp.asarray(xpk), m.stem.conv.kernel,
                                    m.stem.bn, interpret=True, bo=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tstem_model_integration():
    """Full ResNet-50 eval forward: packed input + KDCC_TSTEM vs the raw
    image stock path — identical feature taps."""
    def build():
        m = resnet50(output_stride=16, rngs=nnx.Rngs(0))
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, nnx.BatchNorm):
                _randomize_bn(mod)
        m.eval()
        return m

    RNG.seed(19)
    ref = build()
    RNG.seed(19)
    fused = build()
    x = np.asarray(RNG.randn(8, 33, 33, 3), np.float32)
    want = ref(jnp.asarray(x))
    xpk = jnp.asarray(s2d_pack(x, channel_sublane=True))
    old = config.use_pallas_teacher_stem
    try:
        config.use_pallas_teacher_stem = True
        got = fused(xpk)
    finally:
        config.use_pallas_teacher_stem = old
    for k in ("low_level", "out"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)
