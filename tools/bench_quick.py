#!/usr/bin/env python
"""Quick A/B measurement loop: bench.py's exact workload and timing, minus
the stock-rebuild roofline (the denominator never changes across knob A/Bs,
so sweeps don't need to recompile it). Prints one JSON line with img/s and
step ms only — NOT the driver metric; use bench.py for recorded numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from kd_cheap_conv_tpu.kd import KDConfig, replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model
    from kd_cheap_conv_tpu.train import make_kd_train_step, make_optimizer

    batch = int(os.environ.get("KDCC_BENCH_BATCH", "16"))
    student_name = os.environ.get("KDCC_BENCH_STUDENT",
                                  "deeplabv3plus_mobilenet")
    scope = tuple(os.environ.get("KDCC_BENCH_SCOPE", "classifier").split(","))
    hw = int(os.environ.get("KDCC_BENCH_HW", "513"))
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
    init_state, step_fn, t_state = make_kd_train_step(student, teacher, tx,
                                                      cfg)
    state = init_state()

    rng = np.random.RandomState(0)
    images_np = rng.randn(batch, hw, hw, 3).astype(np.float32)
    from kd_cheap_conv_tpu import config as kdcc_config
    from kd_cheap_conv_tpu.ops.conv import (s2d_pack,
                                            s2d_pack_channel_sublane,
                                            supports_host_s2d)
    if (kdcc_config.host_s2d_enabled() and supports_host_s2d(student)
            and supports_host_s2d(teacher)):
        images_np = s2d_pack(images_np, channel_sublane=(
            s2d_pack_channel_sublane(student, teacher)))
    images = jnp.asarray(images_np)
    labels = jnp.asarray(rng.randint(0, 21, (batch, hw, hw)), jnp.int32)

    state, metrics = step_fn(state, (images, labels), t_state)
    jax.block_until_ready(metrics["loss"])

    iters = int(os.environ.get("KDCC_BENCH_ITERS", "20"))
    best = None
    for _ in range(int(os.environ.get("KDCC_BENCH_REPS", "2"))):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, (images, labels), t_state)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best

    print(json.dumps({
        "img_s": round(batch * iters / best, 2),
        "step_ms": round(1e3 * best / iters, 2),
        "loss": float(metrics["loss"]),
    }))


if __name__ == "__main__":
    main()
