"""Stem->IR chain NW-layout handoff (VERDICT r3 item 2).

The fused MobileNetV2 stem can emit its f2 output directly in the IR
chain's batch-folded entry layout (stem.fused_stem_f1f2_nw ->
irchain.fused_ir_chain_nw), skipping the lane-padded NHWC round trip in
both directions. These tests pin the combined path — values, grads, and
BN running stats — against the stock nnx module path (interpret mode on
CPU), at both the kernel and model level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from kd_cheap_conv_tpu import config
from kd_cheap_conv_tpu.models.mobilenetv2 import MobileNetV2


def _loss(model, x):
    out = model(x)
    return (jnp.sum(out["out"].astype(jnp.float32) ** 2)
            + jnp.sum(out["low_level"].astype(jnp.float32) ** 2))


@pytest.mark.slow
def test_nw_handoff_model_parity():
    """MobileNetV2 with stem+IR fused (NW handoff engaged) matches the
    stock module path: loss, every grad, BN running stats."""
    x = jnp.asarray(np.random.RandomState(42).randn(2, 33, 33, 3),
                    jnp.float32)
    ref = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))
    fused = MobileNetV2(output_stride=16, rngs=nnx.Rngs(0))

    olds = (config.use_pallas_stem, config.use_pallas_ir)
    try:
        config.use_pallas_stem = False
        config.use_pallas_ir = False
        v_ref, g_ref = nnx.value_and_grad(_loss)(ref, x)
        config.use_pallas_stem = True
        config.use_pallas_ir = True
        assert fused._fused_stem_active() and fused._fused_ir_active()
        v_fused, g_fused = nnx.value_and_grad(_loss)(fused, x)
    finally:
        config.use_pallas_stem, config.use_pallas_ir = olds

    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-4)
    flat_r, flat_f = jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a), np.asarray(b)
        # relu6 clip-boundary mask flips on isolated pixels are finite
        # jumps, not errors (see test_pallas_stem for the same rule)
        bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
        assert bad.mean() <= 5e-3, f"{bad.sum()}/{bad.size} grads off"
        assert np.abs(a - b).max() < 0.1
    # BN running stats across BOTH chains (stem bn5 and an IR-chain bn)
    for path in (("features", 2, "pw_bn"), ("features", 5, "pw_bn")):
        br, bf = ref, fused
        for seg in path:
            br = br[seg] if isinstance(seg, int) else getattr(br, seg)
            bf = bf[seg] if isinstance(seg, int) else getattr(bf, seg)
        np.testing.assert_allclose(np.asarray(bf.mean[...]),
                                   np.asarray(br.mean[...]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bf.var[...]),
                                   np.asarray(br.var[...]),
                                   rtol=1e-4, atol=1e-5)


def test_nw_kernel_pair_matches_nhwc_pair():
    """fused_stem_f1f2_nw -> fused_ir_chain_nw == fused_stem_f1f2 ->
    fused_ir_chain (the NHWC round trip), values AND input grads."""
    from kd_cheap_conv_tpu.ops.pallas.irchain import (fused_ir_chain,
                                                      fused_ir_chain_nw)
    from kd_cheap_conv_tpu.ops.pallas.stem import (fused_stem_f1f2,
                                                   fused_stem_f1f2_nw)

    rng = np.random.RandomState(7)
    n, H = 2, 17
    a0 = jnp.asarray(rng.randn(n, H, 32, H), jnp.float32)

    sp = {
        "k1": jnp.asarray(rng.randn(32, 9) * 0.2, jnp.float32),
        "w1": jnp.asarray(rng.randn(16, 32) * 0.2, jnp.float32),
        "w2": jnp.asarray(rng.randn(96, 16) * 0.2, jnp.float32),
        "k2": jnp.asarray(rng.randn(96, 9) * 0.2, jnp.float32),
        "w3": jnp.asarray(rng.randn(24, 96) * 0.2, jnp.float32),
    }
    dims = [32, 32, 16, 96, 96, 24]
    for i, c in enumerate(dims):
        sp[f"g{i}"] = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
        sp[f"b{i}"] = jnp.asarray(0.1 * rng.randn(c), jnp.float32)

    ip = {}
    from kd_cheap_conv_tpu.ops.pallas.irchain import _BLOCKS
    for i, (stride, cin, ce, cout, res) in enumerate(_BLOCKS):
        ip[f"we{i}"] = jnp.asarray(rng.randn(ce, cin) * 0.2, jnp.float32)
        ip[f"k{i}"] = jnp.asarray(rng.randn(ce, 9) * 0.2, jnp.float32)
        ip[f"wp{i}"] = jnp.asarray(rng.randn(cout, ce) * 0.2, jnp.float32)
        for tag, c in (("e", ce), ("d", ce), ("p", cout)):
            ip[f"g{tag}{i}"] = jnp.asarray(1.0 + 0.1 * rng.randn(c),
                                           jnp.float32)
            ip[f"b{tag}{i}"] = jnp.asarray(0.1 * rng.randn(c), jnp.float32)

    H2 = (H + 1) // 2

    def via_nhwc(a0):
        z, _ = fused_stem_f1f2(a0, sp, 1e-5, True)
        out, low, _ = fused_ir_chain(z, ip, n, 1e-5, True)
        return (jnp.sum(out.astype(jnp.float32) ** 2)
                + jnp.sum(low.astype(jnp.float32) ** 2))

    def via_nw(a0):
        z, _ = fused_stem_f1f2_nw(a0, sp, 1e-5, True)
        out, low, _ = fused_ir_chain_nw(z, ip, n, H2, H2, 1e-5, True)
        return (jnp.sum(out.astype(jnp.float32) ** 2)
                + jnp.sum(low.astype(jnp.float32) ** 2))

    v1, g1 = jax.value_and_grad(via_nhwc)(a0)
    v2, g2 = jax.value_and_grad(via_nw)(a0)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)
