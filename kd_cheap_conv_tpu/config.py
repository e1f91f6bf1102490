"""Global runtime knobs.

`use_pallas_separable`: None = auto (on when the default JAX backend is TPU),
True/False = force. The fused kernel only engages for shape-preserving
stride-1 separable pairs; everything else uses the XLA conv path regardless.
Env override: KDCC_PALLAS=0/1.
"""

from __future__ import annotations

import os

use_pallas_separable: bool | None = None

# Fused kernel engages only for dilation >= this. Measured on v5e: the fused
# kernel is 1.6x faster than XLA for dilated (ASPP atrous) separable pairs
# but 0.85x for dilation-1, where XLA's own fusion is already good.
pallas_min_dilation: int = 2


def pallas_separable_enabled() -> bool:
    env = os.environ.get("KDCC_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    if use_pallas_separable is not None:
        return use_pallas_separable
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
