#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json:2): KD train images/sec/chip at 513² (teacher+student
fwd/bwd). Workload = config #2 shape: ResNet-101 DeepLabV3+ teacher →
MobileNetV2 cheap-conv student, bf16 compute, batch sized for one v5e chip.

vs_baseline = measured / target, where target = 90% of the analytic conv
roofline (BASELINE.md): roofline_img_s = achievable_TFLOPs / TFLOPs_per_img,
computed from the actual conv FLOPs of the built graphs at 513² (counted by
ops.flops) with a 50% conv-efficiency assumption on v5e (197 bf16 TFLOP/s).
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from kd_cheap_conv_tpu.kd import KDConfig, replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model
    from kd_cheap_conv_tpu.train import make_kd_train_step, make_optimizer

    import os
    batch = int(os.environ.get("KDCC_BENCH_BATCH", "16"))
    # Variant knobs (VERDICT round-1 item 10): KDCC_BENCH_SCOPE=
    # backbone.layer3,backbone.layer4,classifier with
    # KDCC_BENCH_STUDENT=deeplabv3plus_resnet50 measures a student whose
    # BACKBONE blocks are cheap-conv-replaced (the fork's thesis), with the
    # roofline recomputed for the cheaper graph automatically.
    student_name = os.environ.get("KDCC_BENCH_STUDENT",
                                  "deeplabv3plus_mobilenet")
    scope = tuple(os.environ.get("KDCC_BENCH_SCOPE", "classifier").split(","))
    hw = 513
    dtype = jnp.bfloat16

    teacher = build_model("deeplabv3plus_resnet101", num_classes=21,
                          output_stride=16, dtype=dtype, rngs=nnx.Rngs(0))
    student = build_model(student_name, num_classes=21,
                          output_stride=16, dtype=dtype, rngs=nnx.Rngs(1))
    replace_cheap_convs(student, CheapConvSpec(kind="separable"),
                        scope=scope if len(scope) > 1 else scope[0])

    cfg = KDConfig(temperature=4.0, alpha=0.5, beta=0.5)
    _, params, _ = nnx.split(student, nnx.Param, ...)
    tx = make_optimizer({"student": params}, lr=1e-3, max_iters=10_000,
                        label_fn=lambda d: (
                            "backbone" if d.startswith("student.backbone")
                            else "head"))
    init_state, step_fn, t_state = make_kd_train_step(student, teacher, tx, cfg)
    state = init_state()

    rng = np.random.RandomState(0)
    images_np = rng.randn(batch, hw, hw, 3).astype(np.float32)
    from kd_cheap_conv_tpu import config as kdcc_config
    from kd_cheap_conv_tpu.ops.conv import (s2d_pack,
                                            s2d_pack_channel_sublane,
                                            supports_host_s2d)
    if (kdcc_config.host_s2d_enabled() and supports_host_s2d(student)
            and supports_host_s2d(teacher)):
        # KDCC_HOST_S2D: the pipeline packs on the host (overlapped with
        # the step); here it happens once outside the timed loop, which
        # measures exactly the device-side saving
        images_np = s2d_pack(images_np, channel_sublane=(
            s2d_pack_channel_sublane(student, teacher)))
    images = jnp.asarray(images_np)
    labels = jnp.asarray(rng.randint(0, 21, (batch, hw, hw)), jnp.int32)

    # warmup / compile
    state, metrics = step_fn(state, (images, labels), t_state)
    jax.block_until_ready(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, (images, labels), t_state)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    img_per_s = batch * iters / dt

    # Memory-aware analytic roofline. v2 (round 3, tools/roofline_v2.py):
    # traffic-complete bound over the real step jaxpr — fwd + exact bwd
    # convs, loss/resize matmuls, residual-add streams, maxpool — each at
    # max(FLOPs/peak, bytes/HBM-bw) under ideal fusion. Round-4 fix
    # (VERDICT r3 item 1 / advisor high): the bound is computed from a
    # FRESH stock rebuild of the whole workload (kd_step_stock_bound), not
    # from the measured step_fn — construction-time Pallas decisions and
    # pjit's warmup-keyed jaxpr cache both leaked fast paths into the
    # "stock" trace, inflating BENCH_r03's target to an impossible 502
    # (v2 bound above the conv-only v1 bound). The walker now also rejects
    # any trace containing a pallas_call. Target = 90% of v2 (north_star).
    from kd_cheap_conv_tpu.utils.flops import kd_step_stock_bound

    roofline_v1, bound_s, _, tflops_per_img = kd_step_stock_bound(
        batch, hw, student_name=student_name,
        scope=scope if len(scope) > 1 else scope[0])
    roofline_img_s = batch / bound_s
    target = 0.9 * roofline_img_s

    print(json.dumps({
        "metric": "kd_train_images_per_sec_per_chip_513",
        "value": round(img_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / target, 4),
        "extra": {
            "batch": batch,
            "step_ms": round(1e3 * dt / iters, 2),
            "tflops_per_img": round(tflops_per_img, 4),
            "roofline_img_s_memaware": round(roofline_img_s, 2),
            "target_img_s": round(target, 2),
            "roofline_img_s_v1_convonly": round(roofline_v1, 2),
            "target_img_s_v1": round(0.9 * roofline_v1, 2),
            # invariant: a bound that only ADDS traffic terms can never be
            # faster than the conv-only bound (False = denominator bug;
            # pinned by tests/test_roofline_integrity.py)
            "v2_le_v1": bool(roofline_img_s <= roofline_v1 + 1e-6),
            "loss": float(metrics["loss"]),
        },
    }))


if __name__ == "__main__":
    main()
