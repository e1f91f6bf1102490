"""Analytic conv-FLOP counting for the roofline denominator (BASELINE.md).

Counts 2*MAC FLOPs for every `conv_general_dilated` in the jaxpr of a
model's forward (and scales fwd+bwd by the standard 3x for the student).
Traced with jax.make_jaxpr — counts the真graph, not a hand model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def conv_fwd_flops(model: nnx.Module, hw: int, *, batch: int = 1) -> float:
    """Total conv FLOPs (2*MACs) of one forward at (batch, hw, hw, 3)."""
    model_was = _set_eval(model)
    graphdef, state = nnx.split(model)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    jaxpr = jax.make_jaxpr(fwd)(state, x)
    total = _count(jaxpr.jaxpr)
    _restore(model, model_was)
    return total


def _count(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            rhs = eqn.invars[1].aval
            out = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            rs = dn.rhs_spec
            cin_per_group = rhs.shape[rs[1]]
            kernel_spatial = float(np.prod([rhs.shape[i] for i in rs[2:]]))
            out_elems = float(np.prod(out.shape))  # N*H*W*Cout
            total += 2.0 * out_elems * kernel_spatial * cin_per_group
        # recurse into sub-jaxprs (pjit/custom_vjp/scan bodies)
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", None)
            if sub is not None:
                total += _count(sub)
            if isinstance(v, (list, tuple)):
                for vv in v:
                    sub = getattr(vv, "jaxpr", None)
                    if sub is not None:
                        total += _count(sub)
    return total


def _set_eval(model) -> bool:
    training = any(not m.use_running_average
                   for _, m in nnx.iter_modules(model)
                   if isinstance(m, nnx.BatchNorm))
    model.eval()
    return training


def _restore(model, training: bool) -> None:
    if training:
        model.train()


def kd_step_flops_per_image(teacher: nnx.Module, student: nnx.Module,
                            hw: int) -> float:
    """Teacher fwd + student fwd/bwd (≈3x fwd) conv FLOPs per image
    (BASELINE.md worksheet)."""
    t = conv_fwd_flops(teacher, hw)
    s = conv_fwd_flops(student, hw)
    return t + 3.0 * s
