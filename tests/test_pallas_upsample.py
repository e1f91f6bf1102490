"""Pallas NHWC bilinear upsample (ops.pallas.upsample) vs ops.resize
(jax.image.resize half-pixel semantics, itself torch-parity-pinned by
test_ops_parity): forward values and the transposed-resize gradient,
interpret mode on CPU, at the decoder's real 33->129 geometry plus odd /
non-4x shapes that stress the window/margin math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_cheap_conv_tpu.ops.pallas.upsample import (pallas_upsample_ok,
                                                   resize_bilinear_up)
from kd_cheap_conv_tpu.ops.resize import resize_bilinear

RNG = np.random.RandomState(3)


@pytest.mark.parametrize("shape,size", [
    ((2, 33, 33, 128), (129, 129)),     # decoder geometry (C trimmed)
    ((1, 9, 5, 128), (17, 23)),         # odd, anisotropic scales
    ((1, 4, 4, 256), (7, 7)),           # sub-2x upsample
])
def test_upsample_forward_parity(shape, size):
    x = jnp.asarray(RNG.randn(*shape).astype(np.float32))
    ref = resize_bilinear(x, size)
    got = resize_bilinear_up(x, size, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_upsample_grad_is_transposed_resize():
    shape, size = (2, 9, 9, 128), (33, 33)
    x = jnp.asarray(RNG.randn(*shape).astype(np.float32))
    gy = jnp.asarray(RNG.randn(shape[0], size[0], size[1],
                               shape[3]).astype(np.float32))

    def loss_k(x):
        return jnp.vdot(resize_bilinear_up(x, size, interpret=True), gy)

    def loss_r(x):
        return jnp.vdot(resize_bilinear(x, size), gy)

    gk = jax.grad(loss_k)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_upsample_guard():
    assert pallas_upsample_ok((16, 33, 33, 256), (129, 129))
    assert not pallas_upsample_ok((16, 33, 33, 21), (129, 129))   # C%128
    assert not pallas_upsample_ok((16, 33, 33, 256), (33, 33))    # no-op
    assert not pallas_upsample_ok((16, 129, 129, 256), (33, 33))  # downsample


def test_decoder_engages_pallas_upsample(monkeypatch):
    """DeepLabHeadV3Plus routes its ASPP upsample through the kernel when
    the knob is on, and the head output matches the stock path."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.models import build_model

    model = build_model("deeplabv3plus_resnet50", num_classes=7,
                        output_stride=16, rngs=nnx.Rngs(0))
    model.eval()   # ASPP dropout makes train-mode calls non-deterministic
    x = jnp.asarray(RNG.randn(1, 65, 65, 3).astype(np.float32))
    ref = model(x)
    import kd_cheap_conv_tpu.ops.pallas.upsample as up

    calls = {"n": 0}
    orig = up.resize_bilinear_up

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(up, "resize_bilinear_up", counting)
    monkeypatch.setattr(config, "use_pallas_upsample", True)
    got = model(x)
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
