"""Evaluation metrics: frame accuracy, phoneme error rate, timing error rate.

Host-side NumPy; contracts cited to reference train.py:98-148.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .labels import clean_lab

Segment = Tuple[float, float, str]


def framewise_accuracy(pred_ids: np.ndarray, label_ids: np.ndarray) -> float:
    """Fraction of frames where argmax prediction equals the label
    (reference train.py:98-102; no ignore-index masking there either)."""
    pred_ids = np.asarray(pred_ids)
    label_ids = np.asarray(label_ids)
    total = label_ids.size
    if total == 0:
        return 0.0
    return float((pred_ids == label_ids).sum()) / total


def phoneme_error_rate(pred_segments: Sequence[Segment],
                       gt_segments: Sequence[Segment]) -> float:
    """Levenshtein distance between phoneme sequences divided by len(GT)
    (reference train.py:104-125). Vectorized row-DP instead of the O(mn)
    Python loop."""
    gt_seq = [ph for _, _, ph in gt_segments]
    pred_seq = [ph for _, _, ph in pred_segments]
    m, n = len(gt_seq), len(pred_seq)
    if m == 0:
        return float(n)  # matches dp[0][n] / max(0, 1)
    if n == 0:
        return float(m) / m

    # Map symbols to ints once for fast row comparisons.
    vocab = {ph: i for i, ph in enumerate(dict.fromkeys(gt_seq + pred_seq))}
    gt = np.array([vocab[p] for p in gt_seq])
    pred = np.array([vocab[p] for p in pred_seq])

    prev = np.arange(n + 1)
    offs = np.arange(n + 1)
    for i in range(1, m + 1):
        sub = prev[:-1] + (pred != gt[i - 1])
        dele = prev[1:] + 1
        best = np.minimum(sub, dele)
        # insertion is a left-to-right running min:
        #   cur[j] = min_{k<=j}(best_k + (j-k))  with best_0 = i
        #          = j + cummin(best_k - k)
        b = np.concatenate(([i], best)) - offs
        prev = np.minimum.accumulate(b) + offs
    return float(prev[n]) / m


def timing_error_rate(pred_segments: Sequence[Segment],
                      gt_segments: Sequence[Segment]) -> float:
    """Mean matched boundary error over mean GT duration
    (reference train.py:127-148): for each GT segment, the *first* prediction
    with the same cleaned phoneme is matched; errors averaged as
    mean(start_err + end_err) / 2, normalized by mean matched GT duration;
    0.0 when nothing matches."""
    # First prediction per cleaned phoneme, precomputed once: the inner
    # scan always matches the FIRST same-phoneme prediction regardless of
    # the GT segment's position (reference train.py:134-141), so the
    # quadratic segment×segment loop collapses to one dict build + lookups.
    first_pred = {}
    for pred_start, pred_end, pred_ph in pred_segments:
        first_pred.setdefault(clean_lab(pred_ph), (pred_start, pred_end))
    matched_errors: List[float] = []
    gt_durations: List[float] = []
    for gt_start, gt_end, gt_ph in gt_segments:
        hit = first_pred.get(clean_lab(gt_ph))
        if hit is not None:
            matched_errors.append(abs(gt_start - hit[0])
                                  + abs(gt_end - hit[1]))
            gt_durations.append(gt_end - gt_start)
    if not matched_errors:
        return 0.0
    avg_timing_error = float(np.mean(matched_errors)) / 2
    avg_duration = float(np.mean(gt_durations))
    return avg_timing_error / avg_duration if avg_duration > 0 else 0.0
