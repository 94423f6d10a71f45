"""Device top-k over dense score vectors with exact tie-breaking.

Result order parity with the reference requires sorting by
(score desc, id desc) — `sort_by_score_and_id`, src/search.rs:122-130.
Strategy: `lax.top_k` over scores with a +256 overfetch, then an exact
host-side tie-break sort of the candidate set; if equal scores straddle the
overfetch boundary (pathologically many ties), fall back to a full exact
lexsort. Misses (score 0) are excluded.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import numpy as np

__all__ = ["top_k_scores", "dense_to_hits"]

_OVERFETCH = 256


@partial(jax.jit, static_argnames=("k",))
def _topk_kernel(dense: jax.Array, k: int):
    scores, ids = jax.lax.top_k(dense, k)
    return scores, ids


def top_k_scores(dense, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k hits (ids, scores) ordered by (score desc, id desc)."""
    n = int(dense.shape[0])
    kk = min(n, k + _OVERFETCH)
    scores, ids = _topk_kernel(dense, kk)
    scores = np.asarray(scores)
    ids = np.asarray(ids)
    mask = scores > 0
    scores, ids = scores[mask], ids[mask]
    if (
        k > 0
        and kk < n
        and len(scores) == kk
        and len(scores) > k
        and scores[-1] == scores[k - 1]
    ):
        # equal scores straddle the overfetch boundary -> exact full path
        return dense_to_hits(dense, k)
    order = np.lexsort((-ids.astype(np.int64), -scores.astype(np.float64)))
    order = order[:k] if k is not None else order
    return ids[order], scores[order]


def dense_to_hits(dense, k: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Exact: all hits ordered by (score desc, id desc)."""
    scores = np.asarray(dense)
    ids = np.flatnonzero(scores > 0)
    s = scores[ids]
    order = np.lexsort((-ids.astype(np.int64), -s.astype(np.float64)))
    if k is not None:
        order = order[:k]
    return ids[order].astype(np.uint32), s[order]
