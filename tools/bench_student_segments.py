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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        if upto >= 7 and mb._fused_stem_active() and mb._fused_ir_active():
            # matches the real model path: NW-layout stem->IR handoff
            x, _ = mb._call_fused_stem_ir(x)
            start = 7
        elif upto >= 3 and mb._fused_stem_active():
            x = mb._call_fused_stem(x)
            start = 3
        else:
            start = 0
        for i in range(start, upto):
            x = mb._apply_f0(x) if i == 0 else mb.features[i](x)
        return x

    def seg(upto):
        def f(m, x):
            return thru_features(m, x, upto)
        return f

    def thru_aspp(m, x):
        feats = m.backbone(x)
        return m.classifier.aspp(feats["out"]), feats["low_level"]

    def full(m, x):
        return m(x, class_major=True, upsample=False)

    segs = {"q0_f0_3": seg(3), "q1_f0_7": seg(7), "q2_f0_14": seg(14),
            "q3_backbone": seg(18), "q3a_aspp": thru_aspp, "q4_full": full}

    rng = np.random.RandomState(0)
    x_np = rng.randn(B, S, S, 3).astype(np.float32)
    from kd_cheap_conv_tpu import config as kdcc_config
    from kd_cheap_conv_tpu.ops.conv import (s2d_pack,
                                            s2d_pack_channel_sublane,
                                            supports_host_s2d)
    if kdcc_config.host_s2d_enabled() and supports_host_s2d(model):
        x_np = s2d_pack(x_np,
                        channel_sublane=s2d_pack_channel_sublane(model))
    x = jnp.asarray(x_np, jnp.bfloat16)

    def _sq(y):
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    def _time(prog):
        carry = jnp.zeros((), jnp.float32)
        carry = prog(params, rest, x, carry)
        carry = prog(params, rest, x, carry)
        _ = float(carry)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = prog(params, rest, x, carry)
        _ = float(carry)
        return float((time.perf_counter() - t0) / iters * 1000)

    times, ftimes = {}, {}
    for name, fn in segs.items():
        @jax.jit
        def prog(params, rest, x, carry, fn=fn):
            m = nnx.merge(graphdef, params, rest)

            def loss_fn(m):
                y = fn(m, x + carry.astype(x.dtype))
                return (sum(_sq(t) for t in y) if isinstance(y, tuple)
                        else _sq(y))

            loss, grads = nnx.value_and_grad(loss_fn)(m)
            # fold EVERY grad leaf into the carry — an unused grad tree is
            # dead code and XLA deletes the whole backward
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return (loss + gsum) * 1e-9

        @jax.jit
        def prog_fwd(params, rest, x, carry, fn=fn):
            m = nnx.merge(graphdef, params, rest)
            y = fn(m, x + carry.astype(x.dtype))
            return (sum(_sq(t) for t in y) if isinstance(y, tuple)
                    else _sq(y)) * 1e-9

        times[name] = _time(prog)
        ftimes[name] = _time(prog_fwd)
        print(f"{name}: fwd+bwd {times[name]:.2f} ms   fwd {ftimes[name]:.2f} ms",
              flush=True)

    def report(ts, tag):
        d = {
            "f0-2(stem)": ts["q0_f0_3"],
            "f3-6(129²)": ts["q1_f0_7"] - ts["q0_f0_3"],
            "f7-13(33²)": ts["q2_f0_14"] - ts["q1_f0_7"],
            "f14-17": ts["q3_backbone"] - ts["q2_f0_14"],
            "aspp": ts["q3a_aspp"] - ts["q3_backbone"],
            "decoder": ts["q4_full"] - ts["q3a_aspp"],
        }
        print(f"{tag} deltas: "
              + "  ".join(f"{k}={v:.2f}" for k, v in d.items())
              + f"  total={ts['q4_full']:.2f} ms (b{B}, {S}²)")

    report(times, "fwd+bwd")
    report(ftimes, "fwd")


if __name__ == "__main__":
    main()
