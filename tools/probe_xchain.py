"""Localize config #3's TPU abort: drive every fused xchain unit (entry /
middle / tail, train AND eval) individually at the 769²/b4 shapes, printing
a line before each — the last line printed before a crash names the unit.

bench_xception.py with KDCC_PALLAS_XMID=1 died with a bare "ABORTED: TPU
backend error" (r4f, after the VMEM block-height fixes), which the full-step
program can't attribute. Run with KDCC_PALLAS_XMID=1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("KDCC_PALLAS_XMID", "1")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import kd_cheap_conv_tpu.ops.pallas.xchain as xc
    from kd_cheap_conv_tpu.models import build_model

    only = sys.argv[1] if len(sys.argv) > 1 else ""
    model = build_model("deeplabv3plus_xception", num_classes=19,
                        output_stride=16, dtype=jnp.bfloat16,
                        rngs=nnx.Rngs(0))
    b = model.backbone
    rng = np.random.RandomState(0)

    def x_of(h, c):
        return jnp.asarray(rng.randn(4, h, h, c) * 0.5, jnp.bfloat16)

    def run(name, fn, *args):
        if only and only not in name:
            return
        print(f"--- {name} start", flush=True)
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        for _ in range(3):
            out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t1) / 3
        leaf = jax.tree.leaves(out)[0]
        print(f"    {name} ok  compile+1 {t1 - t0:.1f}s  run {dt * 1e3:.1f}ms"
              f"  sum {float(jnp.sum(leaf.astype(jnp.float32))):.3e}",
              flush=True)

    def sq(y):
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    # --- train-mode units (student side) ---
    model.train()
    eps = 1e-3

    for name, blk, h, c in (("entry_b1_train", b.block1, 385, 64),
                            ("entry_b2_train", b.block2, 193, 128),
                            ("entry_b3_train", b.block3, 97, 256)):
        p = xc.entry_block_params(blk)
        act1 = "relu" if blk.sep1.pre_relu else False
        x = x_of(h, c)

        def f(x, p, act1=act1):
            out, _ = xc.fused_x_entry_block_train(x, p, act1, eps, False)
            return sq(out)

        run(name, lambda x, p, f=f: jax.value_and_grad(f, argnums=(0, 1))(x, p),
            x, p)

    pm = xc.middle_train_params(b.middle)
    xm = x_of(49, 728)

    def f_mid(x, p):
        out, _ = xc.fused_x_middle_train(x, p, len(b.middle), eps, False, 1)
        return sq(out)

    run("middle_train", lambda x, p: jax.value_and_grad(
        f_mid, argnums=(0, 1))(x, p), xm, pm)

    pt = xc.tail_train_params(b.exit_block,
                              (b.exit_sep1, b.exit_sep2, b.exit_sep3))

    def f_tail(x, p):
        out, _ = xc.fused_x_tail_train(x, p, 2, eps, False)
        return sq(out)

    run("tail_train", lambda x, p: jax.value_and_grad(
        f_tail, argnums=(0, 1))(x, p), xm, pt)

    # --- eval-mode units (teacher side) ---
    model.eval()
    for name, blk, h, c in (("entry_b1_eval", b.block1, 385, 64),
                            ("entry_b2_eval", b.block2, 193, 128),
                            ("entry_b3_eval", b.block3, 97, 256)):
        run(name, lambda x, blk=blk: xc.fused_x_entry_block_eval(
            x, blk, False), x_of(h, c))
    run("middle_eval", lambda x: xc.fused_x_middle_eval(
        x, tuple(b.middle), False), xm)
    run("tail_eval", lambda x: xc.fused_x_tail_eval(
        x, b.exit_block, (b.exit_sep1, b.exit_sep2, b.exit_sep3), 2, False),
        xm)
    print("ALL UNITS OK", flush=True)


if __name__ == "__main__":
    main()
