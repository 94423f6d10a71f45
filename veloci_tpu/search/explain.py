"""Score explanation: per-hit provenance of every scoring step.

Reference: src/search/result/explain.rs (`Explain` enum) threaded through
search_field.rs:334-344 (LevenshteinScore), :429-441 (TermToAnchor),
set_op.rs union/intersect merges, and boost.rs:283-379 (Boost entries).

The dense executor computes explains LAZILY: after the top-k hits are known,
the evaluation tree is replayed for just those anchors — faithful to the
reference's merge order:

* leaf   -> [TermToAnchor(term, scores), LevenshteinScore(term)] per posting
* Or     -> last-contributing child's entries (the reference's HashMap
            `extend` overwrites by key), then OrSumOverDistinctTerms, then
            every child's entries appended again (set_op.rs:187-200)
* And    -> every child's entries concatenated (set_op.rs:428-440)
* boosts -> Boost entries appended per application
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["ExplainNode", "collect_explain"]

_F32 = np.float32


class ExplainNode:
    """Mirror of the evaluation tree, kept when request.explain is set."""

    def __init__(self, kind: str, part=None, children=None, denses=None, terms=None):
        self.kind = kind  # "leaf" | "or" | "and"
        self.part = part
        self.children = children or []
        self.denses = denses  # per-child dense vectors (or/and)
        self.terms = terms  # per-child repr terms (or)
        self.boost_entries: List[Tuple[int, Any]] = []  # (anchor->entry) appended later

    def leaf_entries(self, ctx, anchor: int) -> List[dict]:
        fsr = ctx.result_for(self.part)
        field = fsr.path[: -len(".textindex")]
        store = ctx.persistence.anchor_scores.get(
            fsr.path + ".to_anchor_id_score"
        )
        entries: List[dict] = []
        if store is None:
            return entries
        dictionary = ctx.persistence.get_dictionary(field)
        for tid, tscore in zip(fsr.term_ids, fsr.term_scores):
            anchors, scores = store.get_postings(int(tid))
            pos = np.searchsorted(anchors, anchor)
            if pos < len(anchors) and anchors[pos] == anchor:
                anchor_score = float(_F32(scores[pos]) / _F32(100.0))
                final = float(_F32(tscore) * _F32(anchor_score))
                entries.append(
                    {
                        "TermToAnchor": {
                            "term_id": int(tid),
                            "term_score": float(tscore),
                            "anchor_score": anchor_score,
                            "final_score": final,
                        }
                    }
                )
                text = (
                    dictionary.ord_to_term(int(tid))
                    if int(tid) < len(dictionary)
                    else f"<long text {int(tid)}>"
                )
                entries.append(
                    {
                        "LevenshteinScore": {
                            "score": float(tscore),
                            "text_or_token_id": text,
                            "term_id": int(tid),
                        }
                    }
                )
        return entries

    def collect(self, ctx, anchor: int) -> List[dict]:
        if self.kind == "leaf":
            return self.leaf_entries(ctx, anchor)

        child_entries = [c.collect(ctx, anchor) for c in self.children]
        if self.kind == "and":
            out: List[dict] = []
            for e in child_entries:
                out.extend(e)
            return out

        # or: last contributing child's entries first (HashMap overwrite),
        # then the union summary, then all children appended
        out = []
        contributing = [e for e in child_entries if e]
        if contributing:
            out.extend(contributing[-1])
        if self.denses is not None and self.terms is not None:
            per_term: Dict[str, float] = {}
            for dense, term in zip(self.denses, self.terms):
                v = float(dense[anchor]) if anchor < len(dense) else 0.0
                per_term[term] = max(per_term.get(term, 0.0), v)
            total = 0.0
            for t in sorted(per_term):
                total = float(_F32(total) + _F32(per_term[t]))
            out.append({"OrSumOverDistinctTerms": total})
        for e in contributing:
            out.extend(e)
        return out


def collect_explain(
    ctx,
    root: Optional[ExplainNode],
    anchors: List[int],
    boost_log: List[Tuple[np.ndarray, np.ndarray]],
) -> Dict[int, List[dict]]:
    """Explain entries for the given hit anchors.

    ``boost_log`` holds (applied_mask, [entry_values...]) pairs recorded by
    the executor for each boost application, appended after the tree entries
    (two value arrays for Log10: factor then final score).
    """
    out: Dict[int, List[dict]] = {}
    if root is None:
        return out
    for anchor in anchors:
        entries = root.collect(ctx, int(anchor))
        for mask, values_list in boost_log:
            a = int(anchor)
            if a < len(mask) and mask[a]:
                # one Boost entry per recorded value (Log10 records the
                # factor AND the final score, boost.rs:292-309 + :371-374)
                for values in values_list:
                    entries.append({"Boost": float(values[a])})
        out[int(anchor)] = entries
    return out
