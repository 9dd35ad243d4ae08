"""Training losses.

- ``cross_entropy``: torch ``nn.CrossEntropyLoss(label_smoothing, ignore_index
  =-100)`` semantics (reference train.py:412, applied train.py:201) — mean
  over non-ignored frames, smoothing mass spread uniformly over classes.
- ``offset_loss``: the sub-frame boundary L1 (reference train.py:226-251),
  vectorized to frame space: boundary targets are precomputed host-side as
  (frame, channel, fraction) triples and gathered on device — no per-sample
  Python loop (fixes quirk Q6's host hot loop).
- ``segmental_loss_value``: the reference's segmental loss (train.py:150-186),
  which is *detached* in the reference (quirk Q1) and therefore contributes
  no gradient — replicated as a host-side metric that only shifts the logged
  loss value. NumPy-vectorized over the greedy candidate search.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Segment = Tuple[float, float, str]


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  label_smoothing: float = 0.0,
                  ignore_index: int = -100) -> jnp.ndarray:
    """logits [N, C] (or [B, T, C]), labels [N] int — mean over labels !=
    ignore_index, with uniform label smoothing (torch semantics)."""
    if logits.ndim == 3:
        logits = logits.reshape(-1, logits.shape[-1])
        labels = labels.reshape(-1)
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(log_probs, axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        loss = nll
    loss = jnp.where(valid, loss, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(loss) / count


def offset_targets_from_segments(
        segments: Sequence[Segment], frame_duration: float,
        label_len: int, max_targets: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: one sample's GT segments → padded boundary-target arrays.

    Returns (frames [max_targets], channels [max_targets],
    fracs [max_targets], valid [max_targets]) where channel 0 = segment
    start, 1 = segment end, and frac is the sub-frame residual
    ``t/Δ - floor(t/Δ)`` (reference train.py:232-245). Targets whose frame
    falls at/after ``label_len`` are dropped, as the reference's bound check
    does.
    """
    frames, channels, fracs = [], [], []
    for seg in segments:
        if not isinstance(seg, (list, tuple)) or len(seg) != 3:
            continue  # malformed-segment skip (train.py:229-230)
        gt_start, gt_end = float(seg[0]), float(seg[1])
        for channel, t in ((0, gt_start), (1, gt_end)):
            frame = int(t / frame_duration)
            if frame < label_len:
                frames.append(frame)
                channels.append(channel)
                fracs.append(t / frame_duration - frame)
    n = min(len(frames), max_targets)
    out_f = np.zeros(max_targets, np.int32)
    out_c = np.zeros(max_targets, np.int32)
    out_x = np.zeros(max_targets, np.float32)
    out_v = np.zeros(max_targets, bool)
    out_f[:n] = frames[:n]
    out_c[:n] = channels[:n]
    out_x[:n] = fracs[:n]
    out_v[:n] = True
    return out_f, out_c, out_x, out_v


def offset_loss(offsets: jnp.ndarray, frames: jnp.ndarray,
                channels: jnp.ndarray, fracs: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """Vectorized sub-frame offset L1.

    offsets [B, T, 2]; frames/channels/fracs/valid [B, K]. Per sample:
    mean |offsets[frame, channel] - frac| over valid targets; then the batch
    mean of per-sample means — matching the reference's
    ``total_offset_loss / batch_size`` with per-sample ``/ offset_count``
    (train.py:247-251).
    """
    b, t, _ = offsets.shape
    pred = offsets[
        jnp.arange(b)[:, None], jnp.clip(frames, 0, t - 1), channels]
    err = jnp.abs(pred.astype(jnp.float32) - fracs) * valid
    count = jnp.sum(valid, axis=1)
    per_sample = jnp.where(count > 0, jnp.sum(err, axis=1)
                           / jnp.maximum(count, 1), 0.0)
    return jnp.mean(per_sample)


def soft_iou_segmental_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                            ignore_index: int = -100) -> jnp.ndarray:
    """Differentiable segmental surrogate: soft Jaccard over tag posteriors.

    The reference's segmental loss is gradient-dead (quirk Q1 — returned as
    a detached tensor, train.py:184-186), so it only shifts the logged
    value. This optional term makes its IoU component *trainable*: per
    (sample, tag) the soft intersection/union between the frame posteriors
    and the GT indicator,

        iou(b,c) = Σ_t p·g / Σ_t (p + g − p·g),

    averaged over tags present in the GT; loss = 1 − mean iou. Frame-space
    and static-shaped — no segment decode, no host loop (the reference's
    per-step Python decode is quirk Q6). The |Δstart|/|Δend| boundary terms
    of the reference's objective are carried by the sub-frame offset loss.
    Enabled via ``model.differentiable_segmental_weight`` (default 0 = the
    reference's behavior).
    """
    b, t, c = logits.shape
    valid = (labels != ignore_index)[..., None].astype(jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid
    g = jax.nn.one_hot(jnp.where(labels == ignore_index, 0, labels), c,
                       dtype=jnp.float32) * valid
    inter = jnp.sum(probs * g, axis=1)                       # [B, C]
    union = jnp.sum(probs + g - probs * g, axis=1)
    present = jnp.sum(g, axis=1) > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1e-6), 0.0)
    n = jnp.maximum(jnp.sum(present), 1)
    return 1.0 - jnp.sum(iou) / n


def segmental_loss_value(segments_pred: List[Segment],
                         segments_gt: List[Segment],
                         loss_weights=(1.0, 1.0, 2.0)) -> float:
    """Reference train.py:150-186 — greedy best-match score per GT segment,
    averaged over matched GT segments. Value-only (quirk Q1: the reference
    returns it as a detached tensor, so it never contributes gradient).
    NumPy-vectorized over prediction candidates."""
    w_start, w_end, w_iou = loss_weights
    if not segments_pred:
        return 0.0
    p_start = np.array([s[0] for s in segments_pred])
    p_end = np.array([s[1] for s in segments_pred])
    p_ph = np.array([s[2] for s in segments_pred])

    total = 0.0
    matched = 0
    for seg in segments_gt:
        if not isinstance(seg, (list, tuple)) or len(seg) != 3:
            continue
        gt_start, gt_end, gt_ph = seg
        mask = p_ph == gt_ph
        if not mask.any():
            continue
        ps, pe = p_start[mask], p_end[mask]
        inter = np.maximum(0.0, np.minimum(gt_end, pe) - np.maximum(gt_start, ps))
        union = np.maximum(gt_end, pe) - np.minimum(gt_start, ps)
        iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
        score = (w_start * np.abs(gt_start - ps) + w_end * np.abs(gt_end - pe)
                 + w_iou * (1.0 - iou))
        total += float(score.min())
        matched += 1
    return total / matched if matched else 0.0
