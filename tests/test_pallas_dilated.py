"""Dilated (d=2) depthwise tap parity for the shared stem runners — the
foundation for Xception exit-flow / MobileNetV2 f14+ coverage. Runner-level:
_run_bn_dw forward and _run_dw_bwd backward vs the torch-pinned
depthwise_conv2d and its jax.grad, interpret mode on CPU, in the
batch-folded layout (wseg masking must hold at dilation offsets)."""

import numpy as np
import jax
import jax.numpy as jnp

from kd_cheap_conv_tpu.ops.conv import depthwise_conv2d
from kd_cheap_conv_tpu.ops.pallas.irchain import _identity_bn_eps
from kd_cheap_conv_tpu.ops.pallas.stem import (_bnbwd_identity, _run_bn_dw,
                                               _run_dw_bwd)
from kd_cheap_conv_tpu.ops.pallas.xchain import _fold, _geom, _unfold

RNG = np.random.RandomState(9)
EPS = 1e-5
C, BH = 8, 4


def _dw_hwio(k):
    return k.reshape(C, 3, 3).transpose(1, 2, 0)[:, :, None, :]


def test_dilated_dw_forward():
    n, H, w = 2, 13, 11
    x = jnp.asarray(RNG.randn(n, H, w, C), jnp.float32)
    k = jnp.asarray(RNG.randn(C, 9).astype(np.float32) * 0.5)
    want = depthwise_conv2d(x, _dw_hwio(k), padding=2, dilation=2)

    nh, R = _geom(H, BH)
    xf = _fold(x, R)
    y, m, v = _run_bn_dw(xf, _identity_bn_eps(C, EPS), k, H, n * w, False,
                         EPS, True, jnp.float32, wseg=w, bh=BH, dil=2)
    got = _unfold(y, n, H, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    wf = np.asarray(want, np.float64)
    np.testing.assert_allclose(np.asarray(m), wf.mean(axis=(0, 1, 2)),
                               rtol=1e-4, atol=1e-6)


def test_dilated_dw_backward():
    n, H, w = 2, 13, 11
    x = jnp.asarray(RNG.randn(n, H, w, C), jnp.float32)
    k = jnp.asarray(RNG.randn(C, 9).astype(np.float32) * 0.5)
    gw = jnp.asarray(RNG.randn(n, H, w, C), jnp.float32)

    def ref(x, k):
        return jnp.sum(depthwise_conv2d(x, _dw_hwio(k), padding=2,
                                        dilation=2) * gw)

    dx_ref, dk_ref = jax.grad(ref, argnums=(0, 1))(x, k)

    nh, R = _geom(H, BH)
    # identity entry BN, no activation, identity next-BN: gy = fold(gw)
    gy = _fold(gw, R)
    a_next = _fold(jnp.zeros_like(gw), R)          # unused under identity pn
    a_k = _fold(x, R)
    gx, sums, dk = _run_dw_bwd(gy, a_next, a_k, _bnbwd_identity(C),
                               _identity_bn_eps(C, EPS), k, H, n * w, EPS,
                               True, jnp.float32, wseg=w, bh=BH,
                               relu_k=False, dil=2)
    np.testing.assert_allclose(np.asarray(_unfold(gx, n, H, w)),
                               np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref.reshape(
        C, 9) if dk_ref.ndim != 2 else dk_ref), rtol=1e-4, atol=1e-4)
