"""(H,W,N,C) bitcast-layout Pallas depthwise conv (ops.pallas.dwhwnc) vs
the torch-pinned ops.conv.depthwise_conv2d: forward values and both
gradients, interpreter mode on CPU, over dilations, 5x5 kernels, odd sizes
and non-divisible heights; plus the conv2d dispatch gate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kd_cheap_conv_tpu.ops.conv import conv2d, depthwise_conv2d
from kd_cheap_conv_tpu.ops.pallas.dwconv import dw_kernel_to_taps
from kd_cheap_conv_tpu.ops.pallas.dwhwnc import (
    depthwise_conv2d_hwnc, supports_dw_hwnc)

RNG = np.random.RandomState(11)


@pytest.mark.parametrize("shape,k,d", [
    ((8, 19, 17, 8), 3, 1),
    ((8, 33, 33, 16), 3, 2),
    ((16, 16, 16, 8), 3, 1),
    ((8, 21, 19, 8), 5, 1),
    ((8, 11, 13, 8), 3, 4),
])
def test_dw_hwnc_forward(shape, k, d):
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    kv = jnp.asarray(RNG.randn(k, k, 1, shape[-1]), jnp.float32)
    want = depthwise_conv2d(x, kv, padding=d * (k - 1) // 2, dilation=d)
    got = depthwise_conv2d_hwnc(x, dw_kernel_to_taps(kv), k, d, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,k,d", [
    ((8, 19, 17, 8), 3, 1),
    ((8, 17, 15, 16), 3, 2),
])
def test_dw_hwnc_grads(shape, k, d):
    x = jnp.asarray(RNG.randn(*shape), jnp.float32)
    kv = jnp.asarray(RNG.randn(k, k, 1, shape[-1]), jnp.float32)
    w = jnp.asarray(RNG.randn(*shape), jnp.float32)

    def f_pallas(x, kv):
        y = depthwise_conv2d_hwnc(x, dw_kernel_to_taps(kv), k, d, True)
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
    # gp[1] is kv-shaped: the tap-matrix grad flows back through
    # dw_kernel_to_taps' transpose/reshape
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4, err_msg="dk")


def test_supports_predicate():
    ok = dict(stride=1, padding=1, dilation=1, kernel_size=(3, 3), n=16,
              c=256)
    assert supports_dw_hwnc(**ok)
    assert not supports_dw_hwnc(**{**ok, "stride": 2})
    assert not supports_dw_hwnc(**{**ok, "n": 4})          # sublane gate
    assert not supports_dw_hwnc(**{**ok, "padding": 0})    # not 'same'
    assert supports_dw_hwnc(**{**ok, "dilation": 2, "padding": 2})


def test_conv2d_dispatch_matches_stock(monkeypatch):
    """conv2d routes groups==C convs through the HWNC kernel under the knob
    and the result matches the stock XLA path bit-for-tolerance."""
    n, h, w, c = 8, 15, 13, 8
    x = jnp.asarray(RNG.randn(n, h, w, c), jnp.float32)
    kv = jnp.asarray(RNG.randn(3, 3, 1, c), jnp.float32)
    b = jnp.asarray(RNG.randn(c), jnp.float32)
    stock = conv2d(x, kv, b, padding=1, groups=c)
    monkeypatch.setenv("KDCC_DW_HWNC", "1")
    got = conv2d(x, kv, b, padding=1, groups=c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(stock),
                               rtol=1e-5, atol=1e-5)
