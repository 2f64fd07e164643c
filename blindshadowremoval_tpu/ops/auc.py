"""ROC-AUC on device (rank-sum / Mann-Whitney U).

The reference flattens masks to pixels and calls sklearn's
`roc_auc_score` on the host (train_test_GSC.py:820-832), prepending two
sentinel pixels (one positive scored 1, one negative scored 0) so both
classes are always present.  The rank-sum identity
  AUC = (sum of positive ranks - P(P+1)/2) / (P * N)
with midranks for ties matches sklearn's trapezoidal ROC integration
exactly, and is a single argsort on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def roc_auc(labels: jax.Array, scores: jax.Array) -> jax.Array:
    """Pixel-level AUC.  labels: (N,) {0,1}; scores: (N,) floats."""
    labels = labels.reshape(-1).astype(jnp.float32)
    scores = scores.reshape(-1).astype(jnp.float32)
    n = scores.shape[0]

    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    sorted_labels = labels[order]

    # midranks for tied scores: average the 1-based ranks within a tie group
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    # group boundaries: start of each tie run
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_scores[1:] != sorted_scores[:-1]])
    group_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    group_sum = jax.ops.segment_sum(ranks, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(ranks), group_id,
                                    num_segments=n)
    midrank = group_sum[group_id] / jnp.maximum(group_cnt[group_id], 1.0)

    pos = jnp.sum(sorted_labels)
    neg = n - pos
    rank_sum_pos = jnp.sum(midrank * sorted_labels)
    auc = (rank_sum_pos - pos * (pos + 1) / 2.0) / jnp.maximum(pos * neg, 1.0)
    return auc


def roc_auc_with_sentinels(mask: jax.Array, pred: jax.Array) -> jax.Array:
    """The reference's exact recipe (train_test_GSC.py:824-832): flatten,
    prepend sentinel pixels (label 1 score 1, label 0 score 0)."""
    labels = jnp.concatenate(
        [jnp.asarray([1.0, 0.0]), mask.reshape(-1).astype(jnp.float32)])
    scores = jnp.concatenate(
        [jnp.asarray([1.0, 0.0]), pred.reshape(-1).astype(jnp.float32)])
    return roc_auc(labels, scores)
