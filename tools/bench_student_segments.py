"""Per-segment fwd+bwd timing of the MobileNetV2 cheap-conv student at
b16/513² bf16 (train mode) — whole-program deltas, chained-carry timing with
a value fetch (see bench_teacher_segments.py for why).

Each program: y = segment(x); loss = sum(y²); grads wrt params+x. Segment
boundaries follow the round-2 profile buckets:
  q0: features[0:3]   (the fused-Pallas stem region, 257² C16..96)
  q1: features[0:7]   (+ f3..f6: 129² C24/32)
  q2: features[0:14]  (+ f7..f13: 33² C64/96)
  q3: features[0:18]  (+ f14..f17: 33² C160/320)  [backbone w/o head]
  q4: full student fwd (head logits, class-major, no upsample)
KDCC_PALLAS_STEM=0/1 contrasts the stem kernel vs stock XLA in this harness.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from kd_cheap_conv_tpu.kd import replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model

    B, S = 16, 513
    model = build_model("deeplabv3plus_mobilenet", num_classes=21,
                        output_stride=16, dtype=jnp.bfloat16,
                        rngs=nnx.Rngs(1))
    replace_cheap_convs(model, CheapConvSpec(kind="separable"),
                        scope="classifier")
    model.train()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    def thru_features(m, x, upto):
        mb = m.backbone
        if upto >= 3 and mb._fused_stem_active():
            x = mb._call_fused_stem(x)
            start = 3
        else:
            start = 0
        for i in range(start, upto):
            x = mb.features[i](x)
        return x

    def seg(upto):
        def f(m, x):
            return thru_features(m, x, upto)
        return f

    def full(m, x):
        return m(x, class_major=True, upsample=False)

    segs = {"q0_f0_3": seg(3), "q1_f0_7": seg(7), "q2_f0_14": seg(14),
            "q3_backbone": seg(18), "q4_full": full}

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, S, 3), jnp.bfloat16)

    times = {}
    for name, fn in segs.items():
        @jax.jit
        def prog(params, rest, x, carry, fn=fn):
            m = nnx.merge(graphdef, params, rest)

            def loss_fn(m):
                y = fn(m, x + carry.astype(x.dtype))
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

            loss, grads = nnx.value_and_grad(loss_fn)(m)
            return loss * 1e-6

        carry = jnp.zeros((), jnp.float32)
        carry = prog(params, rest, x, carry)
        carry = prog(params, rest, x, carry)
        _ = float(carry)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = prog(params, rest, x, carry)
        _ = float(carry)
        times[name] = float((time.perf_counter() - t0) / iters * 1000)
        print(f"{name}: {times[name]:.2f} ms", flush=True)

    d = {
        "f0-2(stem)": times["q0_f0_3"],
        "f3-6(129²)": times["q1_f0_7"] - times["q0_f0_3"],
        "f7-13(33²)": times["q2_f0_14"] - times["q1_f0_7"],
        "f14-17": times["q3_backbone"] - times["q2_f0_14"],
        "head": times["q4_full"] - times["q3_backbone"],
    }
    print("fwd+bwd deltas: " + "  ".join(f"{k}={v:.2f}" for k, v in d.items())
          + f"  total={times['q4_full']:.2f} ms (b{B}, {S}²)")


if __name__ == "__main__":
    main()
