"""NHWC Pallas depthwise conv (ops.pallas.dwconv) vs the torch-pinned
ops.conv.depthwise_conv2d: forward values and both gradients, interpreter
mode on CPU, over dilations, odd sizes, and non-divisible heights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kd_cheap_conv_tpu.ops.conv import depthwise_conv2d
from kd_cheap_conv_tpu.ops.pallas.dwconv import (
    depthwise_conv2d_pallas, dw_kernel_to_taps, supports_pallas_dw)

RNG = np.random.RandomState(7)


@pytest.mark.parametrize("shape,k,d", [
    ((2, 19, 17, 8), 3, 1),
    ((1, 33, 33, 16), 3, 2),
    ((2, 16, 16, 8), 3, 1),
    ((1, 21, 19, 8), 5, 1),
])
def test_dwconv_forward(shape, k, d):
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    kv = jnp.asarray(RNG.randn(k, k, 1, shape[-1]), jnp.float32)
    want = depthwise_conv2d(x, kv, padding=d * (k - 1) // 2, dilation=d)
    got = depthwise_conv2d_pallas(x, dw_kernel_to_taps(kv), k, d, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,k,d", [
    ((2, 19, 17, 8), 3, 1),
    ((1, 33, 33, 16), 3, 2),
])
def test_dwconv_grads(shape, k, d):
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    kv = jnp.asarray(RNG.randn(k, k, 1, shape[-1]), jnp.float32)
    w = jnp.asarray(RNG.randn(*shape), jnp.float32)

    def f_pallas(x, kv):
        y = depthwise_conv2d_pallas(x, dw_kernel_to_taps(kv), k, d, True)
        return jnp.sum(y * w)

    def f_ref(x, kv):
        y = depthwise_conv2d(x, kv, padding=d * (k - 1) // 2, dilation=d)
        return jnp.sum(y * w)

    np.testing.assert_allclose(float(f_pallas(x, kv)), float(f_ref(x, kv)),
                               rtol=1e-5)
    gp = jax.grad(f_pallas, argnums=(0, 1))(x, kv)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, kv)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-5, err_msg="dx")
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4, err_msg="dk")


def test_supports_predicate():
    assert supports_pallas_dw(stride=1, padding=1, dilation=1, kernel_size=3)
    assert supports_pallas_dw(stride=1, padding=2, dilation=2, kernel_size=3)
    assert not supports_pallas_dw(stride=2, padding=1, dilation=1,
                                  kernel_size=3)
    assert not supports_pallas_dw(stride=1, padding=0, dilation=1,
                                  kernel_size=3)
    assert not supports_pallas_dw(stride=1, padding=1, dilation=1,
                                  kernel_size=(3, 5))
