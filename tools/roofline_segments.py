"""Per-segment memory-aware roofline bounds (v5e: 197 bf16 TFLOP/s, 819 GB/s)
for the KD-step clusters measured by bench_teacher_segments.py /
bench_student_segments.py — the denominator side of the measured-vs-bound
table in BASELINE.md.

Bounds are conv-only lower bounds: per conv max(FLOPs/peak, bytes/bw) summed
over the segment's traced jaxpr, with backward ~ 2x forward for the student
(same conv shapes, transposed). Elementwise/BN traffic is NOT counted, so the
true achievable time is strictly above these numbers.

Runs on CPU (trace only, no execution): JAX_PLATFORMS=cpu recommended.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from kd_cheap_conv_tpu.utils.flops import _conv_roofline_seconds, _count


def _seg_cost(graphdef, state, fn, x):
    def run(state, x):
        m = nnx.merge(graphdef, state)
        return fn(m, x)

    jaxpr = jax.make_jaxpr(run)(state, x)
    secs = _conv_roofline_seconds(jaxpr.jaxpr, peak_flops=197e12,
                                  hbm_bw=819e9, itemsize=2)
    fl = _count(jaxpr.jaxpr)
    return secs, fl


def main():
    from kd_cheap_conv_tpu.kd import replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model

    B, S = 16, 513
    x = jnp.zeros((B, S, S, 3), jnp.bfloat16)

    # ---- teacher (eval mode, fwd only) ----
    t = build_model("deeplabv3plus_resnet101", num_classes=21,
                    output_stride=16, dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    t.eval()
    tg, ts = nnx.split(t)

    def t_stem(m, x):
        return m.backbone._maxpool(m.backbone.stem(x))

    def t_layer(name):
        def f(m, x):
            for b in getattr(m.backbone, name):
                x = b(x)
            return x
        return f

    def t_aspp(m, x):
        return m.classifier.aspp(x)

    def t_decoder(m, low, hi):
        import jax.numpy as jnp

        from kd_cheap_conv_tpu.ops.resize import resize_bilinear
        lowp = m.classifier.project(low)
        hi = resize_bilinear(hi, lowp.shape[1:3])
        xc = jnp.concatenate([lowp, hi], axis=-1)
        return m.classifier.classifier(m.classifier.fuse(xc))

    print("== teacher fwd (b16/513², conv-only bounds, ms) ==")
    cur = x
    total = 0.0
    segs = [("stem+pool", t_stem), ("layer1", t_layer("layer1")),
            ("layer2", t_layer("layer2")), ("layer3", t_layer("layer3")),
            ("layer4", t_layer("layer4")), ("aspp", t_aspp)]
    outs = {}
    for name, fn in segs:
        secs, fl = _seg_cost(tg, ts, fn, cur)
        cur = jax.eval_shape(
            lambda s, xx, fn=fn: fn(nnx.merge(tg, s), xx), ts, cur)
        cur = jnp.zeros(cur.shape, cur.dtype)
        outs[name] = cur
        total += secs
        print(f"  {name:12s} {secs*1e3:7.2f}  ({fl/1e9:8.1f} GFLOP)")
    # decoder needs two inputs
    low = jnp.zeros((B, 129, 129, 256), jnp.bfloat16)
    secs, fl = _seg_cost(tg, ts, lambda m, xx: t_decoder(m, low, xx),
                         outs["aspp"])
    total += secs
    print(f"  {'decoder+cls':12s} {secs*1e3:7.2f}  ({fl/1e9:8.1f} GFLOP)")
    print(f"  {'TOTAL':12s} {total*1e3:7.2f}")

    # ---- student (train mode; fwd bound, x3 for fwd+bwd) ----
    s = build_model("deeplabv3plus_mobilenet", num_classes=21,
                    output_stride=16, dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    replace_cheap_convs(s, CheapConvSpec(kind="separable"),
                        scope="classifier")
    s.eval()  # trace eval-mode graph (same conv shapes, no BN-stat noise)
    sg, ss = nnx.split(s)

    def s_feats(lo, hi):
        def f(m, x):
            for i in range(lo, hi):
                x = m.backbone.features[i](x)
            return x
        return f

    def s_aspp(m, x):
        return m.classifier.aspp(x)

    def s_decoder(m, low, hi):
        import jax.numpy as jnp

        from kd_cheap_conv_tpu.ops.resize import resize_bilinear
        lowp = m.classifier.project(low)
        hi = resize_bilinear(hi, lowp.shape[1:3])
        xc = jnp.concatenate([lowp, hi], axis=-1)
        return m.classifier.classifier(m.classifier.fuse(xc))

    print("== student fwd (b16/513² conv-only bounds, ms; fwd+bwd ≈ 3x) ==")
    cur = x
    total = 0.0
    for name, (lo, hi) in [("f0-2(stem)", (0, 3)), ("f3-6", (3, 7)),
                           ("f7-13", (7, 14)), ("f14-17", (14, 18))]:
        fn = s_feats(lo, hi)
        secs, fl = _seg_cost(sg, ss, fn, cur)
        cur = jax.eval_shape(
            lambda s_, xx, fn=fn: fn(nnx.merge(sg, s_), xx), ss, cur)
        cur = jnp.zeros(cur.shape, cur.dtype)
        total += secs
        print(f"  {name:12s} fwd {secs*1e3:6.2f}  3x {secs*3e3:6.2f}"
              f"  ({fl/1e9:8.1f} GFLOP)")
    secs, fl = _seg_cost(sg, ss, s_aspp, cur)
    total += secs
    print(f"  {'aspp':12s} fwd {secs*1e3:6.2f}  3x {secs*3e3:6.2f}"
          f"  ({fl/1e9:8.1f} GFLOP)")
    low = jnp.zeros((B, 129, 129, 24), jnp.bfloat16)
    hi = jnp.zeros((B, 33, 33, 256), jnp.bfloat16)
    secs, fl = _seg_cost(sg, ss, lambda m, xx: s_decoder(m, low, xx), hi)
    total += secs
    print(f"  {'decoder':12s} fwd {secs*1e3:6.2f}  3x {secs*3e3:6.2f}"
          f"  ({fl/1e9:8.1f} GFLOP)")
    print(f"  {'TOTAL':12s} fwd {total*1e3:6.2f}  3x {total*3e3:6.2f}")


if __name__ == "__main__":
    main()
