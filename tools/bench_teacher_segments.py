"""Per-segment timing of the frozen (eval-mode) ResNet-101 DLv3+ teacher
forward at b16/513² bf16 — whole-program deltas only (single-op timings are
unreliable over the axon relay, NOTES.md). Drives the round-3 fused
33²-chain kernel targeting.

Programs (each jitted standalone, steady-state median of --iters):
  p0: stem + maxpool + layer1 + layer2          (513² -> 65², C512)
  p1: p0 + layer3                               (-> 33², C1024)
  p2: p1 + layer4                               (-> 33², C2048)
  p3: full teacher fwd, class-major head logits (ASPP + decoder + head)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from kd_cheap_conv_tpu.models import build_model

    B, S = 16, 513
    model = build_model("deeplabv3plus_resnet101", num_classes=21,
                        output_stride=16, dtype=jnp.bfloat16,
                        rngs=nnx.Rngs(0))
    model.eval()
    graphdef, state = nnx.split(model)
    bb = model.backbone

    def seg_p0(m, x):
        x = m.backbone.stem(x)
        x = m.backbone._maxpool(x)
        for b in m.backbone.layer1:
            x = b(x)
        for b in m.backbone.layer2:
            x = b(x)
        return x

    def seg_p1(m, x):
        x = seg_p0(m, x)
        for b in m.backbone.layer3:
            x = b(x)
        return x

    def seg_p2(m, x):
        x = seg_p1(m, x)
        for b in m.backbone.layer4:
            x = b(x)
        return x

    def seg_p3(m, x):
        return m(x, class_major=True, upsample=False)

    def seg_stem(m, x):
        x = m.backbone.stem(x)
        return m.backbone._maxpool(x)

    def seg_l1(m, x):
        x = seg_stem(m, x)
        for b in m.backbone.layer1:
            x = b(x)
        return x

    def seg_aspp(m, x):
        x = seg_p2(m, x)
        return m.classifier.aspp(x)

    segs = {"s_stem": seg_stem, "s_thru_l1": seg_l1,
            "p0_thru_l2": seg_p0, "p1_thru_l3": seg_p1,
            "p2_thru_l4": seg_p2, "pa_thru_aspp": seg_aspp,
            "p3_full": seg_p3}

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, S, 3), jnp.bfloat16)

    times = {}
    for name, fn in segs.items():
        # every call's input depends on the previous output (distinct values,
        # sequential dependency) — identical-input repeats time as ~1ms over
        # the axon relay regardless of the program (NOTES.md measurement
        # discipline)
        @jax.jit
        def prog(state, x, carry, fn=fn):
            m = nnx.merge(graphdef, state)
            out = fn(m, x + carry.astype(x.dtype))
            return out, jnp.mean(out.astype(jnp.float32)) * 1e-6

        # bench.py discipline: time a long CHAINED loop with one final block
        # — per-call block_until_ready over the relay acknowledges early, so
        # only end-to-end queue drain measures true device time
        carry = jnp.zeros((), jnp.float32)
        out, carry = prog(state, x, carry)
        out, carry = prog(state, x, carry)
        _ = float(carry)   # value fetch — block_until_ready alone returns
        iters = 20         # before device completion over the axon relay
        t0 = time.perf_counter()
        for _ in range(iters):
            out, carry = prog(state, x, carry)
        _ = float(carry)
        times[name] = float((time.perf_counter() - t0) / iters * 1000)
        print(f"{name}: {times[name]:.2f} ms", flush=True)

    d = {
        "stem+pool": times["s_stem"],
        "layer1": times["s_thru_l1"] - times["s_stem"],
        "layer2": times["p0_thru_l2"] - times["s_thru_l1"],
        "layer3": times["p1_thru_l3"] - times["p0_thru_l2"],
        "layer4": times["p2_thru_l4"] - times["p1_thru_l3"],
        "aspp": times["pa_thru_aspp"] - times["p2_thru_l4"],
        "decoder+cls": times["p3_full"] - times["pa_thru_aspp"],
    }
    print("deltas: " + "  ".join(f"{k}={v:.2f}" for k, v in d.items())
          + f"  total={times['p3_full']:.2f} ms (b{B}, {S}²)")


if __name__ == "__main__":
    main()
