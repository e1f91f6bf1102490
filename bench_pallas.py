#!/usr/bin/env python
"""Microbenchmark: fused Pallas separable conv vs the XLA depthwise+pointwise
pair on the real chip, over the student's hot shapes. Dev tool; the driver
metric lives in bench.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from kd_cheap_conv_tpu.ops.conv import conv2d, depthwise_conv2d
from kd_cheap_conv_tpu.ops.pallas.separable import fused_separable_conv

SHAPES = [
    # (N, H, W, C, Cout, dilation)  — student hot blocks
    (8, 33, 33, 256, 256, 1),    # decoder fuse 3x3 (separable-replaced)
    (8, 33, 33, 256, 256, 6),    # ASPP rate-6 separable
    (8, 33, 33, 304, 256, 1),    # V3+ fuse conv
    (8, 129, 129, 64, 64, 1),    # early feature
    (8, 33, 33, 728, 728, 1),    # Xception middle block size
]


def timeit(fn, *args, iters=30):
    fn(*args).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    for (n, h, w, c, co, dil) in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        dw = jnp.asarray(rng.randn(3, 3, 1, c) * 0.1, jnp.bfloat16)
        pw = jnp.asarray(rng.randn(1, 1, c, co) * 0.1, jnp.bfloat16)
        p = dil

        @jax.jit
        def xla(x, dw, pw):
            return conv2d(depthwise_conv2d(x, dw, padding=p, dilation=dil), pw)

        @jax.jit
        def fused(x, dw, pw):
            return fused_separable_conv(x, dw, pw, dil)

        # parity check first
        a = np.asarray(xla(x, dw, pw), np.float32)
        b = np.asarray(fused(x, dw, pw), np.float32)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        t_xla = timeit(xla, x, dw, pw)
        t_fused = timeit(fused, x, dw, pw)
        flops = 2.0 * n * h * w * c * (9 + co)
        print(f"N{n} {h}x{w}x{c}->{co} d{dil}: "
              f"xla {t_xla*1e3:.3f}ms  fused {t_fused*1e3:.3f}ms  "
              f"speedup {t_xla/t_fused:.2f}x  rel_err {err:.2e}  "
              f"fused {flops/t_fused/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
