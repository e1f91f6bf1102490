"""Checkpoint / resume — Orbax, mirroring the reference layout
(SURVEY.md §2.4/§5.4, BASELINE.json:5 "checkpoint layout").

Reference saves `{cur_itrs, model_state, optimizer_state, scheduler_state,
best_score}` to `checkpoints/latest_<model>_<dataset>_os<os>.pth` and
`best_...pth`, resumed via `--ckpt [--continue_training]`. Here the same
logical keys live in Orbax directories `latest_.../` and `best_.../`;
`scheduler_state` is the PolyLR step (the schedule is a pure function of it).

Also provides `import_torch_state_dict`: loads a reference-format `.pth`
(torch CPU) and maps it onto an NNX model for teacher init / parity tests
(SURVEY.md §7 "torch-checkpoint import path").
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import nnx


def _ckpt_name(prefix: str, model: str, dataset: str, output_stride: int) -> str:
    return f"{prefix}_{model}_{dataset}_os{output_stride}"


def checkpoint_path(root: str, prefix: str, model: str, dataset: str,
                    output_stride: int) -> str:
    return os.path.join(os.path.abspath(root),
                        _ckpt_name(prefix, model, dataset, output_stride))


def _pure_model_state(tree):
    """nnx.State -> pure dict, recursing through plain-dict wrappers (the KD
    TrainState holds params as {'student': State[, 'adapters': State]})."""
    if isinstance(tree, nnx.State):
        return nnx.to_pure_dict(tree)
    if isinstance(tree, dict):
        return {k: _pure_model_state(v) for k, v in tree.items()}
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(path: str, *, cur_itrs: int, params, rest, opt_state,
                    best_score: float) -> None:
    """Atomic Orbax save of the reference's five keys."""
    tree = {
        "cur_itrs": np.asarray(cur_itrs, np.int32),
        "model_state": {
            "params": _pure_model_state(params),
            "rest": _pure_model_state(rest),
        },
        "optimizer_state": jax.tree.map(np.asarray, opt_state),
        "scheduler_state": {"step": np.asarray(cur_itrs, np.int32)},
        "best_score": np.asarray(best_score, np.float32),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target=None) -> dict:
    """Restore; with `target` (a matching abstract/concrete pytree) shapes and
    dtypes are validated, else raw arrays come back."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def _fill_from_pure(current, pure):
    """Write pure-dict checkpoint values back into live state (States mutated
    in place via replace_by_pure_dict; plain leaves replaced)."""
    import jax.numpy as jnp

    if isinstance(current, nnx.State):
        nnx.replace_by_pure_dict(current, pure)
        return current
    if isinstance(current, dict):
        return {k: _fill_from_pure(v, pure[k]) for k, v in current.items()}
    return jax.tree.map(jnp.asarray, pure)


def restore_train_state(path: str, state):
    """Full --continue_training restore: params + BN stats + optimizer state
    (momentum AND the schedule count, so poly LR continues instead of
    restarting) + step + best_score (reference resume semantics,
    SURVEY.md §2.4 checkpoint row).

    `state` is the freshly init'd TrainState whose structure the checkpoint
    must match (same model/KD config). Returns (new_state, best_score).
    """
    import jax.numpy as jnp

    target = {
        "cur_itrs": np.zeros((), np.int32),
        "model_state": {
            "params": _pure_model_state(state.params),
            "rest": _pure_model_state(state.rest),
        },
        "optimizer_state": jax.tree.map(np.asarray, state.opt_state),
        "scheduler_state": {"step": np.zeros((), np.int32)},
        "best_score": np.zeros((), np.float32),
    }
    restored = load_checkpoint(path, target=target)
    # Snapshot leaf shardings BEFORE _fill_from_pure: it mutates the live
    # States in place, so reading placement from `state` afterwards would see
    # the restored (host/device-0) arrays, not the init'd placement.
    init_shardings = jax.tree.map(lambda leaf: getattr(leaf, "sharding", None),
                                  state)
    new_params = _fill_from_pure(state.params, restored["model_state"]["params"])
    new_rest = _fill_from_pure(state.rest, restored["model_state"]["rest"])
    new_opt = jax.tree.map(jnp.asarray, restored["optimizer_state"])
    new_state = state.replace(
        params=new_params, rest=new_rest, opt_state=new_opt,
        step=jnp.asarray(restored["cur_itrs"], jnp.int32))

    def _placed_like(sharding, new):
        """Match the init'd state's placement. Orbax restores COMMITTED
        device-0 arrays; feeding those to a jitted step whose batch is
        sharded over the mesh fails with incompatible-devices. If the fresh
        state leaf carried a mesh (Named) sharding, place there explicitly;
        otherwise hand back host numpy — uncommitted, so jit replicates it
        exactly like the freshly-initialized state."""
        from jax.sharding import NamedSharding

        if isinstance(sharding, NamedSharding):
            return jax.device_put(jnp.asarray(new), sharding)
        try:
            return np.asarray(new)
        except TypeError:
            # typed PRNG-key leaves: rebuild uncommitted from the key data
            data = jnp.asarray(np.asarray(jax.random.key_data(new)))
            return jax.random.wrap_key_data(data,
                                            impl=jax.random.key_impl(new))

    # is_leaf: sharding-snapshot leaves may be None (non-array leaves), which
    # pytree flattening would otherwise treat as an empty subtree
    new_state = jax.tree.map(_placed_like, init_shardings, new_state,
                             is_leaf=lambda x: x is None)
    return new_state, float(restored["best_score"])


# ---------------------------------------------------------------------------
# torch .pth import (teacher weights / parity oracle)
# ---------------------------------------------------------------------------

def _torch_key_to_path(key: str) -> list:
    """'backbone.layer1.0.conv1.weight' -> path segments with int indices."""
    return [int(p) if p.isdigit() else p for p in key.split(".")]


def import_torch_state_dict(model: nnx.Module, state_dict: dict, *,
                            strict: bool = False) -> tuple[int, list[str]]:
    """Map a torch state_dict (OIHW convs, NCHW stats) onto an NNX model.

    Handles: conv weight OIHW->HWIO (grouped included), linear weight
    transpose, BN weight/bias/running_mean/running_var -> scale/bias/mean/var.
    Returns (num_loaded, missing_keys). Key layout must structurally match —
    this is for checkpoints produced by reference-shaped torch models.
    """
    import jax.numpy as jnp

    loaded, missing = 0, []
    by_path = dict(_iter_params(model))
    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                         else tensor)
        path = tuple(_torch_key_to_path(key))
        leaf, kind = _resolve(by_path, path)
        if leaf is None:
            missing.append(key)
            continue
        if kind == "conv_kernel":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif kind == "linear_kernel":
            arr = arr.T
        if leaf[...].shape != arr.shape:
            missing.append(f"{key} (shape {arr.shape} vs {leaf[...].shape})")
            continue
        leaf[...] = jnp.asarray(arr)
        loaded += 1
    if strict and missing:
        raise ValueError(f"unmapped torch keys: {missing[:10]}...")
    return loaded, missing


_TORCH_TO_NNX_LEAF = {
    # torch name -> (nnx attr on module, kind)
    "weight": None,  # context-dependent, resolved below
    "bias": ("bias", "bias"),
    "running_mean": ("mean", "stat"),
    "running_var": ("var", "stat"),
}


def _iter_params(model: nnx.Module):
    """Yield ((path..., leafname), (variable, kind)) for mappable leaves."""
    from ..models.layers import Conv2d

    for path, mod in nnx.iter_modules(model):
        if isinstance(mod, Conv2d):
            yield (*path, "weight"), (mod.kernel, "conv_kernel")
            if mod.bias is not None:
                yield (*path, "bias"), (mod.bias, "bias")
        elif isinstance(mod, nnx.BatchNorm):
            yield (*path, "weight"), (mod.scale, "bn_scale")
            yield (*path, "bias"), (mod.bias, "bias")
            yield (*path, "running_mean"), (mod.mean, "stat")
            yield (*path, "running_var"), (mod.var, "stat")
        elif isinstance(mod, nnx.Linear):
            yield (*path, "weight"), (mod.kernel, "linear_kernel")
            if mod.bias is not None:
                yield (*path, "bias"), (mod.bias, "bias")


def _resolve(by_path: dict, path: tuple):
    hit = by_path.get(path)
    if hit is None:
        return None, None
    return hit
