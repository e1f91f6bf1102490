"""Fused eval-mode ResNet bottleneck kernels (ops.pallas.rchain) vs the
stock NNX path, interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

from kd_cheap_conv_tpu import config
from kd_cheap_conv_tpu.models.resnet import resnet50

RNG = np.random.RandomState(13)


def _randomize_bns(model):
    for _, m in nnx.iter_modules(model):
        if isinstance(m, nnx.BatchNorm):
            c = m.mean[...].shape[0]
            m.mean[...] = jnp.asarray(0.3 * RNG.randn(c).astype(np.float32))
            m.var[...] = jnp.asarray((1 + 0.5 * RNG.rand(c)).astype(
                np.float32))
            m.scale[...] = jnp.asarray(
                (1 + 0.2 * RNG.randn(c)).astype(np.float32))
            m.bias[...] = jnp.asarray(0.2 * RNG.randn(c).astype(np.float32))


def test_rchain_blocks_eval_parity():
    from kd_cheap_conv_tpu.ops.pallas.rchain import (
        _bneck_fusable, fused_resnet_blocks_eval)

    m = resnet50(output_stride=16, rngs=nnx.Rngs(0))
    _randomize_bns(m)
    m.eval()
    blocks = list(m.layer1)
    assert all(_bneck_fusable(b) for b in blocks)
    assert blocks[0].downsample is not None          # in-kernel 1x1 skip
    # layer2's stride-2 first block must NOT be fusable
    assert not _bneck_fusable(m.layer2[0])
    assert all(_bneck_fusable(b) for b in list(m.layer2)[1:])

    x = jnp.asarray(RNG.randn(2, 9, 11, 64), jnp.float32)
    got = fused_resnet_blocks_eval(x, blocks, interpret=True)
    want = x
    for b in blocks:
        want = b(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_rchain_model_integration():
    """Full ResNet-50 forward in eval mode with the fused layers
    force-enabled vs stock: both feature taps."""
    def build():
        m = resnet50(output_stride=16, rngs=nnx.Rngs(0))
        _randomize_bns(m)
        m.eval()
        return m

    import jax
    from jax.sharding import Mesh

    RNG.seed(13)
    ref = build()
    RNG.seed(13)
    fused = build()
    # batch divisible by the conftest's 8-device mesh + an active mesh so
    # the shard-wrapped eval kernels engage instead of silently falling
    # back to stock (maybe_shard_eval returns None without a mesh)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x = jnp.asarray(np.random.RandomState(3).randn(8, 33, 33, 3),
                    jnp.float32)
    old = config.use_pallas_resnet_eval
    try:
        config.use_pallas_resnet_eval = False
        want = ref(x)
        config.use_pallas_resnet_eval = True
        config.set_active_mesh(mesh)
        got = fused(x)
    finally:
        config.use_pallas_resnet_eval = old
        config.set_active_mesh(None)
    for k in ("low_level", "out"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_rchain_hwnc_stage_parity():
    """Round-5 (H,W,N,C) stage kernel: one kernel per run, recompute-halo,
    vs the stock NNX chain."""
    from kd_cheap_conv_tpu.ops.pallas.rchain_hwnc import (
        bneck_hwnc_fusable, fused_resnet_stage_eval_hwnc)

    RNG.seed(29)
    m = resnet50(output_stride=16, rngs=nnx.Rngs(0))
    _randomize_bns(m)
    m.eval()
    blocks = list(m.layer1)
    assert all(bneck_hwnc_fusable(b) for b in blocks)
    assert not bneck_hwnc_fusable(m.layer2[0])       # stride-2
    assert not bneck_hwnc_fusable(m.layer3[1])       # mid 256 > 128 gate

    x = jnp.asarray(RNG.randn(8, 9, 11, 64), jnp.float32)
    got = fused_resnet_stage_eval_hwnc(x, blocks, interpret=True)
    want = x
    for b in blocks:
        want = b(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_rchain_hwnc_model_integration():
    """ResNet-50 eval forward with KDCC_RNET_HWNC force-enabled vs stock
    (sharded eval wrapper over the conftest mesh)."""
    def build():
        m = resnet50(output_stride=16, rngs=nnx.Rngs(0))
        _randomize_bns(m)
        m.eval()
        return m

    import jax
    from jax.sharding import Mesh

    RNG.seed(31)
    ref = build()
    RNG.seed(31)
    fused = build()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x = jnp.asarray(np.random.RandomState(5).randn(8, 33, 33, 3),
                    jnp.float32)
    old = config.use_resnet_eval_hwnc
    try:
        config.use_resnet_eval_hwnc = False
        want = ref(x)
        config.use_resnet_eval_hwnc = True
        config.set_active_mesh(mesh)
        got = fused(x)
    finally:
        config.use_resnet_eval_hwnc = old
        config.set_active_mesh(None)
    for k in ("low_level", "out"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)
