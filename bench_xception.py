#!/usr/bin/env python
"""Config #3 bench (BASELINE.json:9): Xception-65 teacher -> depthwise-
separable student, Cityscapes-shaped 769² crops, 19 classes. Secondary
metric (the driver runs bench.py / config #2); prints one JSON line.

769 is prime: exercises the fused loss kernel's masked row tiles and the
class-major resize on non-divisible shapes on real hardware.
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

    batch, hw, ncls = 4, 769, 19
    dtype = jnp.bfloat16
    teacher = build_model("deeplabv3plus_xception", num_classes=ncls,
                          output_stride=16, dtype=dtype, rngs=nnx.Rngs(0))
    student = build_model("deeplabv3plus_xception", num_classes=ncls,
                          output_stride=16, dtype=dtype, rngs=nnx.Rngs(1))
    replace_cheap_convs(student, CheapConvSpec(kind="separable"),
                        scope="classifier")

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
    from kd_cheap_conv_tpu.ops.conv import s2d_pack, supports_host_s2d
    if (kdcc_config.host_s2d_enabled() and supports_host_s2d(student)
            and supports_host_s2d(teacher)):
        # KDCC_HOST_S2D (round 5: Xception entry conv now consumes the
        # packed form too): pipeline packs on the host, here once outside
        # the timed loop — measures exactly the device-side saving
        images_np = s2d_pack(images_np)
    images = jnp.asarray(images_np)
    labels = jnp.asarray(rng.randint(0, ncls, (batch, hw, hw)), jnp.int32)

    state, metrics = step_fn(state, (images, labels), t_state)
    jax.block_until_ready(metrics["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, (images, labels), t_state)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    img_per_s = batch * iters / dt

    # v2 traffic-complete roofline from a FRESH stock rebuild (round-4
    # integrity fix, same as bench.py: tracing the measured step_fn leaks
    # construction-time Pallas decisions + pjit's warmup-keyed jaxpr cache
    # into the "stock" trace); v1 conv-only kept alongside for continuity.
    from kd_cheap_conv_tpu.utils.flops import kd_step_stock_bound

    roofline_v1, bound_s, _, _ = kd_step_stock_bound(
        batch, hw, teacher_name="deeplabv3plus_xception",
        student_name="deeplabv3plus_xception", scope="classifier",
        num_classes=ncls)
    roofline = batch / bound_s
    print(json.dumps({
        "metric": "kd_train_images_per_sec_per_chip_769_xception",
        "value": round(img_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / (0.9 * roofline), 4),
        "extra": {
            "batch": batch,
            "step_ms": round(1e3 * dt / iters, 2),
            "roofline_img_s_memaware": round(roofline, 2),
            "roofline_img_s_v1_convonly": round(roofline_v1, 2),
            "target_img_s": round(0.9 * roofline, 2),
            "v2_le_v1": bool(roofline <= roofline_v1 + 1e-6),
            "loss": float(metrics["loss"]),
        },
    }))


if __name__ == "__main__":
    main()
