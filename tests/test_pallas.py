"""Pallas fused separable conv: interpreter-mode numerics vs the XLA
reference path, plus custom-VJP gradient checks vs jax autodiff of the
reference composition.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kd_cheap_conv_tpu.ops.conv import conv2d, depthwise_conv2d
from kd_cheap_conv_tpu.ops.pallas.separable import (
    fused_separable_conv,
    supports_fused_separable,
)

RNG = np.random.RandomState(0)


def _ref(x, dw, pw, dilation=1):
    p = dilation * (dw.shape[0] - 1) // 2
    return conv2d(depthwise_conv2d(x, dw, padding=p, dilation=dilation), pw)


@pytest.mark.parametrize("h,w,c,co,dil,tile", [
    (8, 8, 8, 16, 1, 4),
    (16, 12, 16, 8, 1, 8),
    (9, 9, 8, 8, 2, 4),     # atrous, odd size with tile padding
    (33, 33, 16, 16, 6, 8),  # ASPP-like rate
])
def test_fused_matches_xla(h, w, c, co, dil, tile):
    x = jnp.asarray(RNG.randn(2, h, w, c), jnp.float32)
    dw = jnp.asarray(RNG.randn(3, 3, 1, c) * 0.2, jnp.float32)
    pw = jnp.asarray(RNG.randn(1, 1, c, co) * 0.2, jnp.float32)
    got = fused_separable_conv(x, dw, pw, dil, tile, True)
    want = _ref(x, dw, pw, dil)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_grad_matches_autodiff():
    x = jnp.asarray(RNG.randn(1, 8, 8, 8), jnp.float32)
    dw = jnp.asarray(RNG.randn(3, 3, 1, 8) * 0.2, jnp.float32)
    pw = jnp.asarray(RNG.randn(1, 1, 8, 16) * 0.2, jnp.float32)

    def loss_fused(x, dw, pw):
        return (fused_separable_conv(x, dw, pw, 1, 4, True) ** 2).mean()

    def loss_ref(x, dw, pw):
        return (_ref(x, dw, pw) ** 2).mean()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, dw, pw)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, dw, pw)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_supports_predicate():
    assert supports_fused_separable(stride=1, padding=1, dilation=1, kernel_size=3)
    assert supports_fused_separable(stride=1, padding=6, dilation=6, kernel_size=3)
    assert not supports_fused_separable(stride=2, padding=1, dilation=1, kernel_size=3)
    assert not supports_fused_separable(stride=1, padding=0, dilation=1, kernel_size=3)
