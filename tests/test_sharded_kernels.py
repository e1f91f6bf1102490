"""SPMD (shard_map-wrapped) Pallas fast paths vs their single-device
twins on the 8-device virtual CPU mesh: the multi-chip KD step must run the
SAME fused kernels it runs single-chip (VERDICT r2 missing #1), with psum'd
BN moments / loss partials making the math identical to the unsharded batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from kd_cheap_conv_tpu.parallel import make_mesh

RNG = np.random.RandomState(7)


def _sharded(mesh, *arrays):
    s = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, s) for a in arrays)


def test_upsampled_loss_sharded_matches_single():
    from kd_cheap_conv_tpu.ops.pallas.losses import (
        fused_ce_kl_loss_upsampled, fused_ce_kl_loss_upsampled_sharded)

    mesh = make_mesh()
    n, c, h, w = 8, 5, 9, 9
    H = W = 33
    s = jnp.asarray(RNG.randn(n, c, h, w), jnp.float32)
    t = jnp.asarray(RNG.randn(n, c, h, w), jnp.float32)
    lbl = RNG.randint(0, c, (n, H, W)).astype(np.int32)
    lbl[RNG.rand(n, H, W) < 0.2] = 255
    lbl = jnp.asarray(lbl)

    def tot_single(s, t):
        total, task, kd = fused_ce_kl_loss_upsampled(
            s, t, lbl, H, W, 4.0, 0.5, 0.5, 255, 3e4, True)
        return total, (task, kd)

    (tot1, (task1, kd1)), g1 = jax.value_and_grad(tot_single,
                                                  has_aux=True)(s, t)

    ss, ts, ls = _sharded(mesh, s, t, lbl)

    def tot_sh(s, t):
        total, task, kd = fused_ce_kl_loss_upsampled_sharded(
            s, t, ls, mesh, H, W, 4.0, 0.5, 0.5, 255, 3e4, True)
        return total, (task, kd)

    (tot2, (task2, kd2)), g2 = jax.jit(
        jax.value_and_grad(tot_sh, has_aux=True))(ss, ts)

    np.testing.assert_allclose(float(tot2), float(tot1), rtol=1e-5)
    np.testing.assert_allclose(float(task2), float(task1), rtol=1e-5)
    np.testing.assert_allclose(float(kd2), float(kd1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-6)


def test_upsampled_ce_only_sharded_matches_single():
    """beta=0 (plain supervised CE) through the sharded kernel — the
    make_train_step fused path on a mesh."""
    from kd_cheap_conv_tpu.ops.pallas.losses import fused_ce_loss_upsampled

    mesh = make_mesh()
    n, c, h, w = 8, 4, 5, 5
    H = W = 17
    s = jnp.asarray(RNG.randn(n, c, h, w), jnp.float32)
    lbl = jnp.asarray(RNG.randint(0, c, (n, H, W)), jnp.int32)

    v1, g1 = jax.value_and_grad(
        lambda s: fused_ce_loss_upsampled(s, lbl, H, W, 255, True))(s)
    ss, ls = _sharded(mesh, s, lbl)
    v2, g2 = jax.jit(jax.value_and_grad(
        lambda s: fused_ce_loss_upsampled(s, ls, H, W, 255, True,
                                          mesh=mesh)))(ss)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-6)


def test_fused_stem_sharded_matches_single():
    """Sharded stem: forward values, GLOBAL BN batch stats, and grads match
    the single-device kernel on the unsharded batch (sync-BN semantics)."""
    from test_pallas_stem import _params, _nhcw, EPS
    from kd_cheap_conv_tpu.ops.pallas.stem import (fused_stem_f1f2,
                                                   fused_stem_f1f2_sharded)

    mesh = make_mesh()
    p = _params()
    a0 = jnp.asarray(RNG.randn(8, 17, 17, 32), jnp.float32)
    w = jnp.asarray(RNG.randn(8, 9, 9, 24), jnp.float32)

    def f_single(a0, p):
        out, stats = fused_stem_f1f2(_nhcw(a0), p, EPS, True)
        return jnp.sum(out * w), stats

    (v1, st1), g1 = jax.value_and_grad(f_single, argnums=(0, 1),
                                       has_aux=True)(a0, p)

    (a0s,) = _sharded(mesh, _nhcw(a0))
    ws = _sharded(mesh, w)[0]

    def f_sh(a0s, p):
        out, stats = fused_stem_f1f2_sharded(a0s, p, mesh, EPS, True)
        return jnp.sum(out * ws), stats

    (v2, st2), g2 = jax.jit(jax.value_and_grad(f_sh, argnums=(0, 1),
                                               has_aux=True))(a0s, p)

    # per-shard partial sums + psum reorder the f32 accumulation vs the
    # monolithic batch sum — a few-ulp drift on the scalar is expected
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-4)
    for k, ((m2, vv2), (m1, vv1)) in enumerate(zip(st2, st1)):
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                                   rtol=1e-4, atol=1e-5, err_msg=f"mean{k}")
        np.testing.assert_allclose(np.asarray(vv2), np.asarray(vv1),
                                   rtol=1e-4, atol=1e-5, err_msg=f"var{k}")
    # d a0 arrives in the sharded NHCW layout; single path took NHWC input
    da0_sh = jnp.transpose(g2[0], (0, 1, 3, 2))
    np.testing.assert_allclose(np.asarray(da0_sh), np.asarray(g1[0]),
                               rtol=2e-3, atol=2e-4)
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(g2[1][key]),
                                   np.asarray(g1[1][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d {key}")


def test_fused_stem_f0_sharded_matches_single():
    """Sharded stem in f0-in-chain mode (packed NHCW input, w0 param): the
    entry-pass bn0 moments and dW0 are psum'd like every other stem stat."""
    from test_pallas_stem import _params, _w0_param, EPS
    from kd_cheap_conv_tpu.ops.conv import s2d_pack
    from kd_cheap_conv_tpu.ops.pallas.stem import (fused_stem_f1f2,
                                                   fused_stem_f1f2_sharded)

    mesh = make_mesh()
    p = _params()
    p["w0"] = _w0_param(
        jnp.asarray(RNG.randn(3, 3, 3, 32).astype(np.float32) * 0.3))
    x = jnp.asarray(RNG.randn(8, 17, 17, 3), jnp.float32)
    xpk = s2d_pack(x, channel_sublane=True)
    w = jnp.asarray(RNG.randn(8, 5, 5, 24), jnp.float32)

    def f_single(xpk, p):
        out, stats = fused_stem_f1f2(xpk, p, EPS, True)
        return jnp.sum(out * w), stats

    (v1, st1), g1 = jax.value_and_grad(f_single, argnums=(0, 1),
                                       has_aux=True)(xpk, p)

    xpks, ws = _sharded(mesh, xpk, w)

    def f_sh(xpks, p):
        out, stats = fused_stem_f1f2_sharded(xpks, p, mesh, EPS, True)
        return jnp.sum(out * ws), stats

    (v2, st2), g2 = jax.jit(jax.value_and_grad(f_sh, argnums=(0, 1),
                                               has_aux=True))(xpks, p)

    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-4)
    for k, ((m2, vv2), (m1, vv1)) in enumerate(zip(st2, st1)):
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                                   rtol=1e-4, atol=1e-5, err_msg=f"mean{k}")
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               rtol=2e-3, atol=2e-4, err_msg="d xpk")
    for key in sorted(p):
        np.testing.assert_allclose(np.asarray(g2[1][key]),
                                   np.asarray(g1[1][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d {key}")


@pytest.mark.slow
def test_kd_step_mesh_uses_fused_paths():
    """End-to-end: the jitted KD step on the mesh routes through BOTH
    shard_map-wrapped fast paths (trace counters advance) and its loss
    matches the stock jnp step on the unsharded batch."""
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.kd import KDConfig
    from kd_cheap_conv_tpu.models import build_model
    from kd_cheap_conv_tpu.ops.pallas import losses as pl_losses
    from kd_cheap_conv_tpu.ops.pallas import stem as pl_stem
    from kd_cheap_conv_tpu.parallel import replicate, shard_batch
    from kd_cheap_conv_tpu.train import make_kd_train_step, make_optimizer

    mesh = make_mesh()
    teacher = build_model("deeplabv3plus_mobilenet", num_classes=6,
                          output_stride=16, rngs=nnx.Rngs(0))
    student = build_model("deeplabv3plus_mobilenet", num_classes=6,
                          output_stride=16, rngs=nnx.Rngs(1))
    cfg = KDConfig(temperature=2.0, alpha=0.5, beta=0.5)

    rng = np.random.RandomState(3)
    images = rng.randn(8, 65, 65, 3).astype(np.float32)
    labels = rng.randint(0, 6, (8, 65, 65)).astype(np.int32)

    def build(with_mesh):
        _, params, _ = nnx.split(student, nnx.Param, ...)
        tx = make_optimizer({"student": params}, lr=0.01, max_iters=10,
                            label_fn=lambda d: "head")
        return make_kd_train_step(student, teacher, tx, cfg,
                                  mesh=mesh if with_mesh else None)

    config.set_active_mesh(mesh)
    config.use_pallas_separable = True
    config.use_pallas_stem = True
    n_loss0 = pl_losses.sharded_fused_trace_count()
    n_stem0 = pl_stem.sharded_stem_trace_count()
    try:
        init, step, t_state = build(True)
        state = replicate(init(), mesh)
        batch = shard_batch((jnp.asarray(images), jnp.asarray(labels)), mesh)
        _, metrics = step(state, batch, replicate(t_state, mesh))
        loss_mesh = float(metrics["loss"])
    finally:
        config.set_active_mesh(None)
        config.use_pallas_separable = None
        config.use_pallas_stem = None
    assert pl_losses.sharded_fused_trace_count() > n_loss0
    assert pl_stem.sharded_stem_trace_count() > n_stem0

    init2, step2, t_state2 = build(False)
    _, metrics2 = step2(init2(), (jnp.asarray(images), jnp.asarray(labels)),
                        t_state2)
    loss_ref = float(metrics2["loss"])
    np.testing.assert_allclose(loss_mesh, loss_ref, rtol=2e-3)


def test_sharded_eval_fast_paths():
    """Batch-sharded EVAL forward with the folded-BN fused kernels engaged
    (shard_map-wrapped via models.layers.maybe_shard_eval) == stock eval."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from kd_cheap_conv_tpu import config
    from kd_cheap_conv_tpu.models import build_model
    from kd_cheap_conv_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh()
    m = build_model("deeplabv3plus_resnet50", num_classes=7,
                    output_stride=16, rngs=nnx.Rngs(0))
    m.eval()
    graphdef, state = nnx.split(m)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 33, 33, 3),
                    jnp.float32)

    @jax.jit
    def f(state, x):
        return nnx.merge(graphdef, state)(x)

    old = config.use_pallas_resnet_eval
    try:
        config.use_pallas_resnet_eval = False
        want = np.asarray(f(state, x))
        config.use_pallas_resnet_eval = True
        config.set_active_mesh(mesh)
        got = np.asarray(f(replicate(state, mesh),
                           *shard_batch((x,), mesh)))
    finally:
        config.use_pallas_resnet_eval = old
        config.set_active_mesh(None)
    # logits are O(100); per-kernel f32 reassociation leaves a few
    # elements ~6e-4 absolute apart
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=2e-3)
