"""Segmentation + knowledge-distillation losses, fused-friendly.

Capability contract (BASELINE.json:5): "the KD objectives (pixelwise
softened-KL on logits, intermediate feature/hint L2) run fused with the loss
reduction in a single jitted train step". These are plain jnp functions so XLA
fuses them into the train step; softmax/log-softmax run in f32 even when
logits arrive in bf16 (SURVEY.md §7 "per-pixel KL at 513²x21 in bf16").

Layout: logits are NHWC (N, H, W, num_classes); labels are (N, H, W) int32
with `ignore_index` (255) marking void pixels — the reference's
CrossEntropyLoss(ignore_index=255) semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = 255


def _valid_mask(labels: jax.Array, ignore_index: int) -> jax.Array:
    return (labels != ignore_index).astype(jnp.float32)


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Mean CE over non-ignored pixels. Matches torch CrossEntropyLoss
    (reduction='mean', ignore_index=255)."""
    mask = _valid_mask(labels, ignore_index)
    safe = jnp.where(labels == ignore_index, 0, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / denom


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    alpha: float = 1.0,
    gamma: float = 2.0,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Focal loss, matching the reference's FocalLoss option (SURVEY.md §2.4):
    FL = alpha * (1 - p_t)^gamma * CE, mean over valid pixels."""
    mask = _valid_mask(labels, ignore_index)
    safe = jnp.where(labels == ignore_index, 0, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logpt = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    fl = -alpha * (1.0 - pt) ** gamma * logpt
    denom = jnp.maximum(mask.sum(), 1.0)
    return (fl * mask).sum() / denom


def kd_kl_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    *,
    temperature: float = 1.0,
    labels: jax.Array | None = None,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Pixelwise softened KL: T^2 * KL(softmax(z_t/T) || softmax(z_s/T)).

    Mean over pixels (all pixels, or only non-ignored if `labels` given).
    Matches torch KLDivLoss(reduction='batchmean'-per-pixel) * T^2 applied to
    per-pixel class distributions (SURVEY.md §2.2, BASELINE.json:5).
    """
    t = float(temperature)
    sl = student_logits.astype(jnp.float32) / t
    tl = teacher_logits.astype(jnp.float32) / t
    log_p_s = jax.nn.log_softmax(sl, axis=-1)
    log_p_t = jax.nn.log_softmax(tl, axis=-1)
    p_t = jnp.exp(log_p_t)
    kl = jnp.sum(p_t * (log_p_t - log_p_s), axis=-1)  # (N, H, W)
    if labels is not None:
        mask = _valid_mask(labels, ignore_index)
        denom = jnp.maximum(mask.sum(), 1.0)
        return (t * t) * (kl * mask).sum() / denom
    return (t * t) * kl.mean()


def hint_l2_loss(student_feat: jax.Array, teacher_feat: jax.Array) -> jax.Array:
    """FitNets-style hint: mean squared error between matched feature taps
    (after any channel adapter). BASELINE.json:5 "intermediate feature/hint L2"."""
    diff = student_feat.astype(jnp.float32) - teacher_feat.astype(jnp.float32)
    return jnp.mean(diff * diff)
