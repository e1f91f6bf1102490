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
    images = jnp.asarray(rng.randn(batch, hw, hw, 3), jnp.float32)
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
    # traffic-complete bound over THIS step_fn's real jaxpr — fwd + exact
    # bwd convs, loss/resize matmuls, residual-add streams, maxpool — each
    # at max(FLOPs/peak, bytes/HBM-bw) under ideal fusion. The v1 conv-only
    # bound (fwd graphs, bwd ≈ 3x heuristic) is kept alongside for
    # continuity with rounds 1-2; v2's exact backward accounting confirms
    # v1's conv term (29.5 vs 29.2 ms at b16) and adds the mandatory
    # non-conv streams (+4.7 ms). Target = 90% of the v2 bound (north_star).
    from kd_cheap_conv_tpu.utils.flops import (
        full_step_roofline_seconds, kd_step_flops_per_image,
        kd_step_roofline_img_per_s)

    tflops_per_img = kd_step_flops_per_image(teacher, student, hw) / 1e12
    roofline_v1 = kd_step_roofline_img_per_s(teacher, student, hw,
                                             batch=batch)
    bound_s, _ = full_step_roofline_seconds(step_fn, state,
                                            (images, labels), t_state)
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
            "loss": float(metrics["loss"]),
        },
    }))


if __name__ == "__main__":
    main()
