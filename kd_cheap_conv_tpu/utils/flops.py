"""Analytic conv-FLOP counting for the roofline denominator (BASELINE.md).

Counts 2*MAC FLOPs for every `conv_general_dilated` in the jaxpr of a
model's forward (and scales fwd+bwd by the standard 3x for the student).
Traced with jax.make_jaxpr — counts the traced graph, not a hand model.
Tracing runs under config.stock_graph() so the denominator is the STOCK
conv graph regardless of which Pallas fast paths are enabled (fused chains
hide their convs inside pallas_call and would shrink the count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import config


def conv_fwd_flops(model: nnx.Module, hw: int, *, batch: int = 1) -> float:
    """Total conv FLOPs (2*MACs) of one forward at (batch, hw, hw, 3)."""
    model_was = _set_eval(model)
    graphdef, state = nnx.split(model)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    with config.stock_graph():
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


# ---------------------------------------------------------------------------
# memory-aware roofline (BASELINE.md: "replace this table with ... the exact
# analytic roofline computed from the real conv shapes")
# ---------------------------------------------------------------------------

def _conv_roofline_seconds(jaxpr, *, peak_flops: float, hbm_bw: float,
                           itemsize: int) -> float:
    """Sum over convs of max(compute-time, memory-time): each conv reads its
    input + kernel and writes its output at least once; depthwise/grouped
    convs have low arithmetic intensity and are bandwidth-bound on TPU."""
    total = 0.0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            rs = dn.rhs_spec
            cin_per_group = rhs.shape[rs[1]]
            k_spatial = float(np.prod([rhs.shape[i] for i in rs[2:]]))
            flops = 2.0 * float(np.prod(out.shape)) * k_spatial * cin_per_group
            bytes_ = (float(np.prod(lhs.shape)) + float(np.prod(out.shape))
                      ) * itemsize + float(np.prod(rhs.shape)) * 4
            total += max(flops / peak_flops, bytes_ / hbm_bw)
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", None)
            if sub is not None:
                total += _conv_roofline_seconds(
                    sub, peak_flops=peak_flops, hbm_bw=hbm_bw,
                    itemsize=itemsize)
            if isinstance(v, (list, tuple)):
                for vv in v:
                    sub = getattr(vv, "jaxpr", None)
                    if sub is not None:
                        total += _conv_roofline_seconds(
                            sub, peak_flops=peak_flops, hbm_bw=hbm_bw,
                            itemsize=itemsize)
    return total


def conv_roofline_seconds(model: nnx.Module, hw: int, *, batch: int = 1,
                          peak_flops: float = 197e12, hbm_bw: float = 819e9,
                          itemsize: int = 2) -> float:
    """Lower-bound wall time of one forward at (batch, hw, hw, 3):
    per-conv max(FLOPs/peak, bytes/bandwidth), v5e defaults (197 bf16
    TFLOP/s, 819 GB/s HBM)."""
    model_was = _set_eval(model)
    graphdef, state = nnx.split(model)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    with config.stock_graph():
        jaxpr = jax.make_jaxpr(fwd)(state, x)
    secs = _conv_roofline_seconds(jaxpr.jaxpr, peak_flops=peak_flops,
                                  hbm_bw=hbm_bw, itemsize=itemsize)
    _restore(model, model_was)
    return secs


def kd_step_roofline_img_per_s(teacher: nnx.Module, student: nnx.Module,
                               hw: int, *, batch: int = 8) -> float:
    """Analytic images/sec upper bound for the KD step on one v5e chip:
    teacher fwd + 3x student fwd (bwd ~ 2x fwd in both FLOPs and bytes),
    memory-aware per conv. Ignores BN/loss/optimizer — a true upper bound."""
    t = conv_roofline_seconds(teacher, hw, batch=batch)
    s = conv_roofline_seconds(student, hw, batch=batch)
    return batch / (t + 3.0 * s)


# ---------------------------------------------------------------------------
# roofline v2: traffic-complete bound over the REAL train-step jaxpr
# (round-3 revision; breakdown CLI in tools/roofline_v2.py)
# ---------------------------------------------------------------------------

_LARGE_ADD_BYTES = 4 * 1024 * 1024


def _aval_bytes(aval) -> float:
    return float(np.prod(aval.shape)) * aval.dtype.itemsize


def _walk_v2(jaxpr, acc, *, peak_flops: float, hbm_bw: float):
    """Accumulate per-category lower-bound seconds over a jaxpr (recursing
    into pjit/custom_vjp/scan bodies). Cost model — see tools/roofline_v2.py
    docstring: convs/dots at max(FLOPs/peak, bytes/bw); residual-style
    large+large adds at one extra read of the smaller operand; maxpool
    fwd/bwd at bytes in+out; everything else free (ideal fusion), keeping
    this a LOWER bound rather than a model of XLA's achieved fusion."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "pallas_call":
            # A fast-path kernel hides convs/dots inside its body; counting
            # the body once at block shapes (no grid multiplier) would be
            # silently wrong, and a pallas_call in a supposedly-stock trace
            # means a construction-time decision leaked past stock_graph()
            # (round-3 BENCH bug: v2 bound 557.9 > v1 547.2 img/s, which is
            # impossible for a bound that only adds traffic). Count it so
            # full_step_roofline_seconds can reject the trace; never recurse.
            acc["pallas_n"] = acc.get("pallas_n", 0) + 1
            continue
        if name in ("scan", "while"):
            # Cost the body ONCE per trip: scan scales by its static length;
            # while has no static trip count, so count one iteration and
            # flag the undercount.
            body = eqn.params.get("jaxpr") or eqn.params.get("body_jaxpr")
            if body is not None:
                sub_acc = {k: (0.0 if isinstance(v, float) else 0)
                           for k, v in acc.items()}
                _walk_v2(body.jaxpr, sub_acc, peak_flops=peak_flops,
                         hbm_bw=hbm_bw)
                trips = eqn.params.get("length", 1) if name == "scan" else 1
                for k, v in sub_acc.items():
                    acc[k] = acc.get(k, type(v)(0)) + v * trips
                if name == "while":
                    acc["while_n"] = acc.get("while_n", 0) + 1
            continue
        if name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            rs = eqn.params["dimension_numbers"].rhs_spec
            cin_per_group = rhs.shape[rs[1]]
            k_spatial = float(np.prod([rhs.shape[i] for i in rs[2:]]))
            flops = (2.0 * float(np.prod(out.shape)) * k_spatial
                     * cin_per_group)
            byt = _aval_bytes(lhs) + _aval_bytes(out) + _aval_bytes(rhs)
            acc["conv_s"] += max(flops / peak_flops, byt / hbm_bw)
            acc["conv_flops"] += flops
            acc["conv_bytes"] += byt
            acc["conv_n"] += 1
            acc["conv_bw_bound_n"] += int(byt / hbm_bw > flops / peak_flops)
        elif name == "dot_general":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            ((lc, _), __) = eqn.params["dimension_numbers"]
            k = float(np.prod([lhs.shape[i] for i in lc]))
            flops = 2.0 * float(np.prod(out.shape)) * k
            byt = _aval_bytes(lhs) + _aval_bytes(rhs) + _aval_bytes(out)
            acc["dot_s"] += max(flops / peak_flops, byt / hbm_bw)
            acc["dot_flops"] += flops
            acc["dot_n"] += 1
        elif name in ("add", "sub"):
            avals = [v.aval for v in eqn.invars if hasattr(v, "aval")]
            if (len(avals) == 2
                    and all(_aval_bytes(a) >= _LARGE_ADD_BYTES
                            for a in avals)):
                byt = min(_aval_bytes(a) for a in avals)
                acc["resid_s"] += byt / hbm_bw
                acc["resid_bytes"] += byt
                acc["resid_n"] += 1
        elif name in ("reduce_window_max", "reduce_window",
                      "select_and_scatter_add"):
            byt = sum(_aval_bytes(v.aval) for v in eqn.invars
                      if hasattr(v, "aval"))
            byt += sum(_aval_bytes(v.aval) for v in eqn.outvars)
            acc["pool_s"] += byt / hbm_bw
            acc["pool_n"] += 1
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", None)
            if sub is not None:
                _walk_v2(sub, acc, peak_flops=peak_flops, hbm_bw=hbm_bw)
            if isinstance(v, (list, tuple)):
                for vv in v:
                    sub = getattr(vv, "jaxpr", None)
                    if sub is not None:
                        _walk_v2(sub, acc, peak_flops=peak_flops,
                                 hbm_bw=hbm_bw)
    return acc


def full_step_roofline_seconds(step_fn, *args, peak_flops: float = 197e12,
                               hbm_bw: float = 819e9):
    """Traffic-complete lower-bound seconds for ONE call of the real train
    step (traced under config.stock_graph() so Pallas fast paths don't hide
    their convs). Returns (bound_seconds, breakdown_dict). The backward is
    counted EXACTLY (its dgrad/wgrad convs appear in the grad jaxpr) —
    no 3x-forward heuristic."""
    with config.stock_graph():
        jaxpr = jax.make_jaxpr(step_fn)(*args)
    acc = {k: 0.0 for k in ("conv_s", "conv_flops", "conv_bytes", "dot_s",
                            "dot_flops", "resid_s", "resid_bytes", "pool_s")}
    acc.update({k: 0 for k in ("conv_n", "conv_bw_bound_n", "dot_n",
                               "resid_n", "pool_n", "pallas_n")})
    _walk_v2(jaxpr.jaxpr, acc, peak_flops=peak_flops, hbm_bw=hbm_bw)
    if acc["pallas_n"]:
        raise RuntimeError(
            f"stock-trace invariant violated: {acc['pallas_n']} pallas_call "
            "eqn(s) in the roofline trace — a construction-time fast-path "
            "decision leaked past config.stock_graph() (rebuild the "
            "teacher/student/step inside stock_graph(); see "
            "kd_step_stock_bound)")
    bound = acc["conv_s"] + acc["dot_s"] + acc["resid_s"] + acc["pool_s"]
    return bound, acc


def kd_step_stock_bound(batch: int, hw: int, *,
                        teacher_name: str = "deeplabv3plus_resnet101",
                        student_name: str = "deeplabv3plus_mobilenet",
                        scope="classifier", num_classes: int = 21,
                        peak_flops: float = 197e12, hbm_bw: float = 819e9):
    """Traffic-complete v2 bound for the bench.py KD workload, computed from
    a FRESH stock rebuild (round-3 verdict item 1 / advisor high finding).

    Two leaks made tracing the *measured* step untrustworthy:
      - construction-time decisions (AtrousSeparableConvolution fusability,
        make_kd_train_step's fused-loss closure) are made when the model/step
        is BUILT, so wrapping only the trace in stock_graph() leaves Pallas
        calls in the graph, hiding their convs from the walker;
      - pjit's jaxpr cache is keyed on (fn, avals), not the _force_stock
        global, so re-tracing an already-warmed jitted step returns the
        warmup-time (fast-path) trace.
    Rebuilding teacher/student/optimizer/step inside stock_graph() and
    tracing the fresh closure with abstract args removes both. The walker
    additionally rejects any trace still containing a pallas_call.

    Returns (v1_img_s, v2_bound_seconds, v2_breakdown, tflops_per_img).
    """
    import jax.numpy as jnp
    from flax import nnx

    from ..kd import KDConfig, replace_cheap_convs
    from ..kd.replace import CheapConvSpec
    from ..models import build_model
    from ..train import make_kd_train_step, make_optimizer

    with config.stock_graph():
        teacher = build_model(teacher_name, num_classes=num_classes,
                              output_stride=16, dtype=jnp.bfloat16,
                              rngs=nnx.Rngs(0))
        student = build_model(student_name, num_classes=num_classes,
                              output_stride=16, dtype=jnp.bfloat16,
                              rngs=nnx.Rngs(1))
        replace_cheap_convs(student, CheapConvSpec(kind="separable"),
                            scope=scope)
        cfg = KDConfig(temperature=4.0, alpha=0.5, beta=0.5)
        _, params, _ = nnx.split(student, nnx.Param, ...)
        tx = make_optimizer({"student": params}, lr=1e-3, max_iters=10_000,
                            label_fn=lambda d: (
                                "backbone" if d.startswith("student.backbone")
                                else "head"))
        init_state, step_fn, t_state = make_kd_train_step(student, teacher,
                                                          tx, cfg)
        state = jax.eval_shape(init_state)
        t_state_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t_state)
        images = jax.ShapeDtypeStruct((batch, hw, hw, 3), jnp.float32)
        labels = jax.ShapeDtypeStruct((batch, hw, hw), jnp.int32)
        bound_s, acc = full_step_roofline_seconds(
            step_fn, state, (images, labels), t_state_abs,
            peak_flops=peak_flops, hbm_bw=hbm_bw)
        v1_img_s = kd_step_roofline_img_per_s(teacher, student, hw,
                                              batch=batch)
        tflops_per_img = kd_step_flops_per_image(teacher, student, hw) / 1e12
    return v1_img_s, bound_s, acc, tflops_per_img
