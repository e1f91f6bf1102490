"""Fused CE+KL Pallas loss kernel vs the jnp reference: values + gradients
(interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from kd_cheap_conv_tpu.ops.losses import cross_entropy, kd_kl_loss
from kd_cheap_conv_tpu.ops.pallas.losses import fused_ce_kl_loss

RNG = np.random.RandomState(0)


def _data(n=2, c=21, h=19, w=23):  # h deliberately not a multiple of tile
    s = jnp.asarray(RNG.randn(n, c, h, w), jnp.float32)
    t = jnp.asarray(RNG.randn(n, c, h, w) * 3, jnp.float32)
    lbl = RNG.randint(0, c, (n, h, w)).astype(np.int32)
    lbl[0, :3, :5] = 255
    return s, t, jnp.asarray(lbl)


def _ref(s, t, lbl, T=4.0, alpha=0.5, beta=0.5):
    task = cross_entropy(s, lbl, channel_axis=1)
    kd = kd_kl_loss(s, t, temperature=T, channel_axis=1)
    return alpha * task + beta * kd, task, kd


def test_fused_loss_matches_reference_values():
    s, t, lbl = _data()
    total, task, kd = fused_ce_kl_loss(s, t, lbl, 4.0, 0.5, 0.5, 255, 3e4, True)
    rtotal, rtask, rkd = _ref(s, t, lbl)
    np.testing.assert_allclose(float(task), float(rtask), rtol=1e-5)
    np.testing.assert_allclose(float(kd), float(rkd), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(rtotal), rtol=1e-5)


def test_fused_loss_grad_matches_reference():
    s, t, lbl = _data()

    def f_fused(s):
        total, _, _ = fused_ce_kl_loss(s, t, lbl, 4.0, 0.5, 0.5, 255, 3e4, True)
        return total

    def f_ref(s):
        return _ref(s, t, lbl)[0]

    g1 = jax.grad(f_fused)(s)
    g2 = jax.grad(f_ref)(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_fused_loss_bf16_inputs():
    s, t, lbl = _data(h=16)
    sb, tb = s.astype(jnp.bfloat16), t.astype(jnp.bfloat16)
    total, task, kd = fused_ce_kl_loss(sb, tb, lbl, 4.0, 0.5, 0.5, 255, 3e4, True)
    rtotal, _, _ = _ref(sb.astype(jnp.float32), tb.astype(jnp.float32), lbl)
    np.testing.assert_allclose(float(total), float(rtotal), rtol=1e-3)
    g = jax.grad(lambda s: fused_ce_kl_loss(s, tb, lbl, 4.0, 0.5, 0.5,
                                            255, 3e4, True)[0])(sb)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_fused_loss_extreme_teacher_logits():
    s, t, lbl = _data(h=16)
    t_huge = t * 1.2e6
    total, task, kd = fused_ce_kl_loss(s, t_huge, lbl, 4.0, 0.5, 0.5,
                                       255, 3e4, True)
    assert np.isfinite(float(total))
    g = jax.grad(lambda s: fused_ce_kl_loss(s, t_huge, lbl, 4.0, 0.5, 0.5,
                                            255, 3e4, True)[0])(s)
    assert bool(jnp.isfinite(g).all())


def test_sharded_fused_loss_matches_reference():
    """shard_map-wrapped kernel on the 8-device CPU mesh: value + grad parity
    with the jnp path on batch-sharded logits (VERDICT round-1 item 4)."""
    from kd_cheap_conv_tpu.ops.pallas.losses import fused_ce_kl_loss_sharded
    from kd_cheap_conv_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    n = mesh.devices.size * 2
    s = jnp.asarray(RNG.randn(n, 21, 16, 23), jnp.float32)
    t = jnp.asarray(RNG.randn(n, 21, 16, 23) * 3, jnp.float32)
    lbl = RNG.randint(0, 21, (n, 16, 23)).astype(np.int32)
    lbl[0, :3, :5] = 255
    s, t, lbl = shard_batch((s, t, jnp.asarray(lbl)), mesh)

    @jax.jit
    def fused(s):
        total, task, kd = fused_ce_kl_loss_sharded(s, t, lbl, mesh,
                                                   4.0, 0.5, 0.5, 255, 3e4,
                                                   True)
        return total, (task, kd)

    (total, (task, kd)) = fused(s)
    rtotal, rtask, rkd = _ref(s, t, lbl)
    np.testing.assert_allclose(float(task), float(rtask), rtol=1e-5)
    np.testing.assert_allclose(float(kd), float(rkd), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(rtotal), rtol=1e-5)

    g1 = jax.jit(jax.grad(lambda s: fused(s)[0]))(s)
    g2 = jax.grad(lambda s: _ref(s, t, lbl)[0])(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def _data_small(n=2, c=21, h=9, w=9, H=33, W=33):
    s = jnp.asarray(RNG.randn(n, c, h, w), jnp.float32)
    t = jnp.asarray(RNG.randn(n, c, h, w) * 3, jnp.float32)
    lbl = RNG.randint(0, c, (n, H, W)).astype(np.int32)
    lbl[0, :4, :6] = 255
    return s, t, jnp.asarray(lbl)


def _ref_upsampled(s, t, lbl, H, W, T=4.0, alpha=0.5, beta=0.5):
    from kd_cheap_conv_tpu.ops.resize import resize_bilinear_nchw

    su = resize_bilinear_nchw(s, (H, W))
    tu = resize_bilinear_nchw(t, (H, W))
    task = cross_entropy(su, lbl, channel_axis=1)
    kd = kd_kl_loss(su, tu, temperature=T, channel_axis=1)
    return alpha * task + beta * kd, task, kd


def test_upsample_fused_matches_resize_then_loss():
    from kd_cheap_conv_tpu.ops.pallas.losses import fused_ce_kl_loss_upsampled

    s, t, lbl = _data_small()
    total, task, kd = fused_ce_kl_loss_upsampled(
        s, t, lbl, 33, 33, 4.0, 0.5, 0.5, 255, 3e4, True)
    rtotal, rtask, rkd = _ref_upsampled(s, t, lbl, 33, 33)
    np.testing.assert_allclose(float(task), float(rtask), rtol=1e-4)
    np.testing.assert_allclose(float(kd), float(rkd), rtol=1e-4)
    np.testing.assert_allclose(float(total), float(rtotal), rtol=1e-4)


def test_upsample_fused_grad_matches():
    from kd_cheap_conv_tpu.ops.pallas.losses import fused_ce_kl_loss_upsampled

    s, t, lbl = _data_small()

    def f_fused(s):
        return fused_ce_kl_loss_upsampled(s, t, lbl, 33, 33, 4.0, 0.5, 0.5,
                                          255, 3e4, True)[0]

    def f_ref(s):
        return _ref_upsampled(s, t, lbl, 33, 33)[0]

    g1 = jax.grad(f_fused)(s)
    g2 = jax.grad(f_ref)(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-5)


def test_fused_ce_only_upsampled_matches_reference():
    """beta=0 CE-only path (the plain supervised hot loop): value + grad."""
    from kd_cheap_conv_tpu.ops.pallas.losses import fused_ce_loss_upsampled

    s, _, lbl = _data_small()

    def f_fused(s):
        return fused_ce_loss_upsampled(s, lbl, 33, 33, 255, True)

    def f_ref(s):
        from kd_cheap_conv_tpu.ops.resize import resize_bilinear_nchw

        return cross_entropy(resize_bilinear_nchw(s, (33, 33)), lbl,
                             channel_axis=1)

    np.testing.assert_allclose(float(f_fused(s)), float(f_ref(s)), rtol=1e-4)
    g1 = jax.grad(f_fused)(s)
    g2 = jax.grad(f_ref)(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-5)


def test_upsample_fused_nondivisible_height():
    from kd_cheap_conv_tpu.ops.pallas.losses import fused_ce_kl_loss_upsampled

    # H=19 not a multiple of the row tile; also rectangular
    s, t, lbl = _data_small(h=5, w=7, H=19, W=23)
    total, task, kd = fused_ce_kl_loss_upsampled(
        s, t, lbl, 19, 23, 2.0, 0.7, 0.3, 255, 3e4, True)
    rtotal, _, _ = _ref_upsampled(s, t, lbl, 19, 23, T=2.0, alpha=0.7, beta=0.3)
    np.testing.assert_allclose(float(total), float(rtotal), rtol=1e-4)
