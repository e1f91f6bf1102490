"""Unit tests for the v2 traffic-complete roofline walker
(utils/flops.py full_step_roofline_seconds / _walk_v2).

The walker is the denominator of the contract metric (bench.py
vs_baseline), so its accounting is pinned here against hand-computed
numbers on tiny graphs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_cheap_conv_tpu.utils.flops import (_walk_v2, full_step_roofline_seconds)

PEAK = 197e12
BW = 819e9


def _acc():
    a = {k: 0.0 for k in ("conv_s", "conv_flops", "conv_bytes", "dot_s",
                          "dot_flops", "resid_s", "resid_bytes", "pool_s")}
    a.update({k: 0 for k in ("conv_n", "conv_bw_bound_n", "dot_n",
                             "resid_n", "pool_n")})
    return a


def _walk_fn(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _walk_v2(jaxpr.jaxpr, _acc(), peak_flops=PEAK, hbm_bw=BW)


def test_conv_accounting_exact():
    x = jnp.zeros((2, 32, 32, 16), jnp.bfloat16)
    w = jnp.zeros((3, 3, 16, 32), jnp.bfloat16)

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    acc = _walk_fn(f, x, w)
    assert acc["conv_n"] == 1
    # 2 * out_elems * k_spatial * cin: out (2,32,32,32)
    flops = 2.0 * (2 * 32 * 32 * 32) * 9 * 16
    assert acc["conv_flops"] == pytest.approx(flops)
    byt = (x.size + 2 * 32 * 32 * 32) * 2 + w.size * 2  # all bf16
    assert acc["conv_bytes"] == pytest.approx(byt)
    assert acc["conv_s"] == pytest.approx(max(flops / PEAK, byt / BW))


def test_backward_convs_counted_exactly():
    """grad-of-conv introduces dgrad+wgrad convs; the walker sees them as
    convs in the traced grad jaxpr (no 3x heuristic)."""
    x = jnp.zeros((1, 16, 16, 8), jnp.bfloat16)
    w = jnp.zeros((3, 3, 8, 8), jnp.bfloat16)

    def loss(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32))

    acc = _walk_fn(jax.grad(loss, argnums=(0, 1)), x, w)
    # fwd conv is dead-code-eliminated by grad tracing or kept; dgrad and
    # wgrad must both appear — at least 2 convs, at most 3.
    assert 2 <= acc["conv_n"] <= 3


def test_residual_add_stream():
    big = jnp.zeros((8, 64, 64, 64), jnp.bfloat16)  # 4 MiB exactly

    def f(a, b):
        return a + b

    acc = _walk_fn(f, big, big)
    assert acc["resid_n"] == 1
    assert acc["resid_bytes"] == pytest.approx(big.size * 2)
    # small adds are free (ideal fusion)
    small = jnp.zeros((8, 8), jnp.float32)
    acc2 = _walk_fn(f, small, small)
    assert acc2["resid_n"] == 0


def test_dot_general_accounting():
    a = jnp.zeros((64, 128), jnp.bfloat16)
    b = jnp.zeros((128, 256), jnp.bfloat16)
    acc = _walk_fn(lambda a, b: a @ b, a, b)
    assert acc["dot_n"] == 1
    assert acc["dot_flops"] == pytest.approx(2.0 * 64 * 256 * 128)


def test_recurses_into_pjit():
    x = jnp.zeros((2, 32, 32, 16), jnp.bfloat16)
    w = jnp.zeros((3, 3, 16, 16), jnp.bfloat16)

    @jax.jit
    def inner(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    acc = _walk_fn(lambda x, w: inner(x, w) + 0.0, x, w)
    assert acc["conv_n"] == 1


def test_full_step_bound_tiny():
    """End-to-end: the bound for a tiny KD step is positive, finite, and
    dominated by convs; returns the breakdown bench.py embeds."""
    from flax import nnx

    from kd_cheap_conv_tpu.kd import KDConfig, replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model
    from kd_cheap_conv_tpu.train import make_kd_train_step, make_optimizer

    teacher = build_model("deeplabv3plus_mobilenet", num_classes=5,
                          output_stride=16, rngs=nnx.Rngs(0))
    student = build_model("deeplabv3plus_mobilenet", num_classes=5,
                          output_stride=16, rngs=nnx.Rngs(1))
    replace_cheap_convs(student, CheapConvSpec(kind="separable"),
                        scope="classifier")
    cfg = KDConfig(temperature=2.0, alpha=0.5, beta=0.5)
    _, params, _ = nnx.split(student, nnx.Param, ...)
    tx = make_optimizer({"student": params}, lr=1e-3, max_iters=10,
                        label_fn=lambda d: "head")
    init_state, step_fn, t_state = make_kd_train_step(student, teacher, tx,
                                                      cfg)
    state = init_state()
    images = jnp.zeros((1, 65, 65, 3), jnp.float32)
    labels = jnp.zeros((1, 65, 65), jnp.int32)
    bound, acc = full_step_roofline_seconds(step_fn, state, (images, labels),
                                            t_state)
    assert np.isfinite(bound) and bound > 0
    assert acc["conv_n"] > 50  # teacher + student fwd + student bwd convs
    assert acc["conv_s"] > 0.5 * bound
