"""Why-found: per-hit explanation of which field/terms matched.

Reference: src/search/why_found.rs — join each hit anchor down to the leaf
value ids of every hit field, then highlight each value from its token ids.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..create import PARENT_TO_VALUE_ID
from ..utils import extract_field_name, get_steps_to_anchor
from .highlight import highlight_document

__all__ = ["get_why_found"]


def get_why_found(
    persistence,
    anchor_ids: List[int],
    term_id_hits_in_field: Dict[str, Dict[str, List[int]]],
) -> Dict[int, Dict[str, List[str]]]:
    anchor_highlights: Dict[int, Dict[str, List[str]]] = {}
    for path, term_with_ids in term_id_hits_in_field.items():
        field_name = extract_field_name(path)
        paths = get_steps_to_anchor(field_name)
        all_term_ids: List[int] = []
        for _term, hits in term_with_ids.items():
            all_term_ids.extend(hits)
        if not all_term_ids:
            continue
        for anchor_id in anchor_ids:
            ids = np.array([anchor_id], dtype=np.int64)
            for step in paths:
                store = persistence.key_value_stores.get(step + PARENT_TO_VALUE_ID)
                if store is None:
                    ids = np.empty(0, dtype=np.int64)
                    break
                ids = store.get_values_multi(ids).astype(np.int64)
            for value_id in ids:
                highlighted = highlight_document(
                    persistence, paths[-1], int(value_id), all_term_ids
                )
                if highlighted is not None:
                    anchor_highlights.setdefault(int(anchor_id), {}).setdefault(
                        field_name, []
                    ).append(highlighted)
    return anchor_highlights
