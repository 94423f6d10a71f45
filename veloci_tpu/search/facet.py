"""Facet counting over column indices.

Reference: src/facet.rs. The TPU-native formulation: the (source -> target)
relation is a fixed pair list, so counting targets over a hit set is one
masked segment-sum / bincount over the whole relation — no per-id pointer
chasing (`count_values_for_ids` / `AggregationCollector`).

The fast path uses `.anchor_to_text_id` (1:n facet fields) or the root
field's `.parent_to_value_id`; the slow path composes the
`parent_to_value_id` join chain (facet.rs:31-93).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..create import ANCHOR_TO_TEXT_ID, PARENT_TO_VALUE_ID, TEXTINDEX
from ..indices import Csr, Direct, EMPTY
from ..utils import get_steps_to_anchor

__all__ = ["get_facet"]


def _pairs_of(store) -> Tuple[np.ndarray, np.ndarray]:
    """(sources, targets) pair arrays of a relation column."""
    if isinstance(store, Direct):
        src = np.flatnonzero(store.values != EMPTY)
        return src.astype(np.int64), store.values[src].astype(np.int64)
    counts = np.diff(store.offsets).astype(np.int64)
    src = np.repeat(np.arange(store.num_keys, dtype=np.int64), counts)
    return src, store.values.astype(np.int64)


def get_facet(persistence, facet_req, hit_mask: np.ndarray) -> List[Tuple[str, int]]:
    """Count facet values for the hit set; returns [(text, count)] top-n."""
    steps = get_steps_to_anchor(facet_req.field)
    top = facet_req.top

    fast_anchor_path = steps[-1] + ANCHOR_TO_TEXT_ID
    if len(steps) == 1 or persistence.has_index(fast_anchor_path):
        path = (
            steps[0] + PARENT_TO_VALUE_ID if len(steps) == 1 else fast_anchor_path
        )
        store = persistence.key_value_stores.get(path)
        if store is None:
            return []
        sources, targets = _pairs_of(store)
        keep = sources < len(hit_mask)
        sources, targets = sources[keep], targets[keep]
        w = hit_mask[sources]
        counts = np.bincount(targets[w])
    else:
        # slow path: join anchor -> ... -> leaf values (facet.rs:75-93)
        ids = np.flatnonzero(hit_mask).astype(np.int64)
        for step in steps:
            store = persistence.key_value_stores.get(step + PARENT_TO_VALUE_ID)
            if store is None:
                return []
            ids = store.get_values_multi(ids).astype(np.int64)
        counts = np.bincount(ids) if len(ids) else np.zeros(0, np.int64)

    value_ids = np.flatnonzero(counts)
    if len(value_ids) == 0:
        return []
    vals = counts[value_ids]
    order = np.argsort(-vals, kind="stable")
    if top is not None:
        order = order[:top]
    dictionary = persistence.get_dictionary(steps[-1])
    return [
        (dictionary.ord_to_term(int(value_ids[i])), int(vals[i])) for i in order
    ]
