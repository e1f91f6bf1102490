#!/usr/bin/env python
"""Profile the KD train step on the real TPU and print a per-op time table.

The image's tensorboard-plugin-profile is broken (protobuf mismatch), so this
parses the xplane protobuf directly (SURVEY.md §5.1 tracing; VERDICT round-1
item 2 'get a real profile first').

Usage:
  python tools/profile_kd.py [--teacher deeplabv3plus_resnet101]
      [--student deeplabv3plus_mobilenet] [--batch 16] [--hw 513]
      [--scope classifier] [--top 40] [--what kd|teacher|student]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(profile_dir: str, top: int = 40):
    """Aggregate XLA-op durations from the newest xplane.pb under dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        profile_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert paths, f"no xplane.pb under {profile_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    rows = []  # (total_ps, count, name, category)
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        stats_meta = plane.stat_metadata
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            agg = collections.defaultdict(lambda: [0, 0])
            for ev in line.events:
                m = meta[ev.metadata_id]
                agg[m.name][0] += ev.duration_ps
                agg[m.name][1] += 1
            for name, (ps, n) in agg.items():
                rows.append((ps, n, name))
    if not rows:
        # CPU fallback / different plane naming: take the busiest plane
        for plane in space.planes:
            for line in plane.lines:
                agg = collections.defaultdict(lambda: [0, 0])
                for ev in line.events:
                    m = plane.event_metadata[ev.metadata_id]
                    agg[m.name][0] += ev.duration_ps
                    agg[m.name][1] += 1
                for name, (ps, n) in agg.items():
                    rows.append((ps, n, f"{plane.name}::{line.name}::{name}"))
    rows.sort(reverse=True)
    return rows


_KIND_RX = re.compile(r"=\s.*?\s([a-z][a-z0-9\-]+)\(")


def categorize(name: str) -> str:
    """Extract the HLO op kind (the identifier right before the operand list;
    operand refs carry a % prefix so they never match)."""
    m = _KIND_RX.search(name)
    return m.group(1) if m else "unknown"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", default="deeplabv3plus_resnet101")
    ap.add_argument("--student", default="deeplabv3plus_mobilenet")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=513)
    ap.add_argument("--scope", default="classifier")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--what", default="kd",
                    choices=["kd", "teacher", "student", "student_step",
                             "head"])
    ap.add_argument("--dir", default=None, help="keep the trace here")
    opts = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from kd_cheap_conv_tpu.kd import KDConfig, replace_cheap_convs
    from kd_cheap_conv_tpu.kd.replace import CheapConvSpec
    from kd_cheap_conv_tpu.models import build_model
    from kd_cheap_conv_tpu.train import make_kd_train_step, make_optimizer

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    images_np = rng.randn(opts.batch, opts.hw, opts.hw, 3).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, 21, (opts.batch, opts.hw, opts.hw)),
                         jnp.int32)

    if opts.what in ("teacher", "student"):
        name = opts.teacher if opts.what == "teacher" else opts.student
        model = build_model(name, num_classes=21, output_stride=16,
                            dtype=dtype, rngs=nnx.Rngs(0))
        if opts.what != "teacher":
            replace_cheap_convs(model, CheapConvSpec(kind="separable"),
                                scope=opts.scope)
        model.eval()
        graphdef, mstate = nnx.split(model)

        @jax.jit
        def fwd(mstate, images):
            m = nnx.merge(graphdef, mstate)
            return m(images, class_major=True)

        def run_once():
            nonlocal mstate
            out = fwd(mstate, images)
            jax.block_until_ready(out)
    elif opts.what == "head":
        # ASPP + decoder + classifier fwd+bwd only (train mode), driven from
        # precomputed backbone features — isolates the 11 ms aspp+decoder
        # cluster (VERDICT r3 item 3) without backbone noise
        model = build_model(opts.student, num_classes=21, output_stride=16,
                            dtype=dtype, rngs=nnx.Rngs(0))
        replace_cheap_convs(model, CheapConvSpec(kind="separable"),
                            scope=opts.scope)
        model.train()
        graphdef, params, rest = nnx.split(model, nnx.Param, ...)
        # merge a fresh backbone INSIDE the jit: train-mode fused chains
        # mutate BatchStat, which raises TraceContextError on a module
        # captured from outside the trace
        bgd, bstate = nnx.split(model.backbone)
        feats = jax.jit(lambda s: nnx.merge(bgd, s)(
            jnp.asarray(images_np, dtype)))(bstate)
        feats = jax.tree.map(jax.lax.stop_gradient, feats)
        carry0 = jnp.zeros((), jnp.float32)

        @jax.jit
        def prog(params, rest, carry):
            m = nnx.merge(graphdef, params, rest)

            def loss_fn(m):
                f = {k: v + carry.astype(v.dtype) for k, v in feats.items()}
                y = m.classifier(f)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

            loss, grads = nnx.value_and_grad(loss_fn)(m)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return (loss + gsum) * 1e-9

        state_c = [carry0]

        def run_once():
            state_c[0] = prog(params, rest, state_c[0])
            jax.block_until_ready(state_c[0])
    elif opts.what == "student_step":
        # student fwd+bwd+SGD only (plain CE step) — isolates the student
        # side of the KD budget
        from kd_cheap_conv_tpu.train import make_train_step

        model = build_model(opts.student, num_classes=21, output_stride=16,
                            dtype=dtype, rngs=nnx.Rngs(0))
        replace_cheap_convs(model, CheapConvSpec(kind="separable"),
                            scope=opts.scope)
        _, params, _ = nnx.split(model, nnx.Param, ...)
        tx = make_optimizer(params, lr=1e-3, max_iters=10_000)
        init_state, sstep = make_train_step(model, tx)
        state = init_state()

        def run_once():
            nonlocal state
            state, metrics = sstep(state, (images, labels))
            jax.block_until_ready(metrics["loss"])
    else:
        teacher = build_model(opts.teacher, num_classes=21, output_stride=16,
                              dtype=dtype, rngs=nnx.Rngs(0))
        student = build_model(opts.student, num_classes=21, output_stride=16,
                              dtype=dtype, rngs=nnx.Rngs(1))
        replace_cheap_convs(student, CheapConvSpec(kind="separable"),
                            scope=opts.scope)
        cfg = KDConfig(temperature=4.0, alpha=0.5, beta=0.5)
        _, params, _ = nnx.split(student, nnx.Param, ...)
        tx = make_optimizer({"student": params}, lr=1e-3, max_iters=10_000,
                            label_fn=lambda d: (
                                "backbone" if d.startswith("student.backbone")
                                else "head"))
        init_state, step_fn, t_state = make_kd_train_step(
            student, teacher, tx, cfg)
        state = init_state()

        def run_once():
            nonlocal state
            state, metrics = step_fn(state, (images, labels), t_state)
            jax.block_until_ready(metrics["loss"])

    # host-S2D packing, same condition as bench.py — the slow-path combo
    # (NW handoff x packed input) is invisible without it
    from kd_cheap_conv_tpu import config as kdcc_config
    from kd_cheap_conv_tpu.ops.conv import (s2d_pack,
                                            s2d_pack_channel_sublane,
                                            supports_host_s2d)

    consumers = ([teacher, student] if opts.what == "kd" else [model])
    if (kdcc_config.host_s2d_enabled()
            and all(supports_host_s2d(m) for m in consumers)):
        images_np = s2d_pack(images_np, channel_sublane=(
            s2d_pack_channel_sublane(*consumers)))
    images = jnp.asarray(images_np)

    run_once()  # compile
    run_once()

    prof_dir = opts.dir or tempfile.mkdtemp(prefix="kdprof_")
    jax.profiler.start_trace(prof_dir)
    for _ in range(opts.steps):
        run_once()
    jax.profiler.stop_trace()

    rows = parse_xplane(prof_dir, top=opts.top)
    total_ps = sum(r[0] for r in rows)
    print(f"\n=== {opts.what} @ b{opts.batch}/{opts.hw}² — {opts.steps} steps, "
          f"device busy total {total_ps / 1e9 / opts.steps:.2f} ms/step ===")
    by_cat = collections.defaultdict(int)
    for ps, n, name in rows:
        by_cat[categorize(name)] += ps
    for cat, ps in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:>10}: {ps / 1e9 / opts.steps:8.2f} ms/step "
              f"({100 * ps / total_ps:.1f}%)")
    print(f"\n top {opts.top} ops (ms/step over {opts.steps} steps):")
    for ps, n, name in rows[:opts.top]:
        print(f"  {ps / 1e9 / opts.steps:8.3f}  x{n:<4} {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
