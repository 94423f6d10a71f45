"""True batched serving: many requests -> one device dispatch.

`search_batch` partitions a request batch into (a) fast-path-eligible exact
requests, executed as ONE vmapped XLA program (`batched_search_topk`), and
(b) everything else, executed individually. This is the API behind the
server's ``/search_batch`` route — the TPU-native replacement for the
reference's per-request thread pool.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..create import TEXTINDEX
from ..query.request import Request, SearchRequest
from .executor import SMALL_DOCS, search
from .result import Hit, SearchResult

__all__ = ["search_batch"]


def _eligible(request: Request, persistence) -> Optional[Tuple[str, list]]:
    """Single-field exact fast-path eligibility -> (field, leaves) or None."""
    if persistence.num_docs < SMALL_DOCS:
        return None
    if any(
        (
            request.filter,
            request.boost,
            request.boost_term,
            request.phrase_boosts,
            request.facets,
            request.why_found,
            request.text_locality,
            request.explain,
            request.suggest,
        )
    ):
        return None
    node = request.search_req
    if node is None:
        return None
    if node.kind == SearchRequest.SEARCH:
        leaves = [node.part]
    elif node.kind == SearchRequest.OR and all(
        q.kind == SearchRequest.SEARCH for q in node.queries
    ):
        leaves = [q.part for q in node.queries]
    else:
        return None
    fields = set()
    for part in leaves:
        if (
            (part.levenshtein_distance or 0) != 0
            or part.starts_with
            or part.is_regex
            or part.token_value is not None
            or part.snippet
            or part.top is not None
            or part.skip is not None
            or (part.options or None)
            or part.ignore_case is False
        ):
            return None
        f = part.path
        if f.endswith(TEXTINDEX):
            f = f[: -len(TEXTINDEX)]
        fields.add(f)
    if len(fields) != 1:
        return None
    field = next(iter(fields))
    if persistence.device_field(field).offsets is None:
        return None
    return field, leaves


def search_batch(requests: List[Request], persistence) -> List[SearchResult]:
    """Answer a batch of requests; fast-path-eligible ones share one dispatch."""
    import time

    import jax.numpy as jnp

    from ..ops.postings import bucket_size
    from ..ops.search_step import batched_search_topk

    start = time.time_ns()
    results: List[Optional[SearchResult]] = [None] * len(requests)

    # group eligible requests per field
    groups: dict = {}
    for qi, req in enumerate(requests):
        el = _eligible(req, persistence)
        if el is None:
            results[qi] = search(req, persistence)
        else:
            field, leaves = el
            groups.setdefault(field, []).append((qi, req, leaves))

    for field, entries in groups.items():
        dev = persistence.device_field(field)
        dictionary = persistence.get_dictionary(field)
        ho = dev.host_offsets
        num_docs = persistence.num_docs

        per_query_tids = []
        max_terms = 1
        max_total = 1
        max_k = 1
        for qi, req, leaves in entries:
            tids = []
            for part in leaves:
                for tid in dictionary.get_ignore_case(part.terms[0]):
                    if tid < dev.num_score_keys:
                        boost = part.boost if part.boost is not None else 1.0
                        tids.append((tid, np.float32(10.0) * np.float32(boost)))
            per_query_tids.append(tids)
            max_terms = max(max_terms, len(tids))
            max_total = max(
                max_total, sum(int(ho[t + 1] - ho[t]) for t, _s in tids)
            )
            top = req.top if req.top is not None else 10
            max_k = max(max_k, top + (req.skip or 0))

        t_pad = bucket_size(max_terms, 8)
        capacity = bucket_size(max_total)
        k_eff = min(num_docs, max_k + 64)
        q = len(entries)
        tid_arr = np.full((q, t_pad), -1, dtype=np.int32)
        ts_arr = np.zeros((q, t_pad), dtype=np.float32)
        for row, tids in enumerate(per_query_tids):
            for j, (tid, sc) in enumerate(tids[:t_pad]):
                tid_arr[row, j] = tid
                ts_arr[row, j] = sc
        ids_b, scores_b, hits_b = batched_search_topk(
            dev.offsets,
            dev.anchors,
            dev.scores01,
            jnp.asarray(tid_arr),
            jnp.asarray(ts_arr),
            capacity=capacity,
            num_docs=num_docs,
            k=k_eff,
        )
        ids_b = np.asarray(ids_b)
        scores_b = np.asarray(scores_b)
        hits_b = np.asarray(hits_b)

        for row, (qi, req, leaves) in enumerate(entries):
            # NB the batched kernel scores every query as a union with ONE
            # term slot per matched dictionary term; for multi-distinct-term
            # ORs fall back per request (rare in batch serving)
            if len({p.terms[0] for p in leaves}) > 1:
                results[qi] = search(req, persistence)
                continue
            ids = ids_b[row]
            scores = scores_b[row]
            mask = scores > 0
            ids, scores = ids[mask], scores[mask]
            order = np.lexsort((-ids.astype(np.int64), -scores.astype(np.float64)))
            ids, scores = ids[order], scores[order]
            top = req.top if req.top is not None else 10
            skip = req.skip or 0
            res = SearchResult()
            res.num_hits = int(hits_b[row])
            window = list(zip(ids, scores))[skip : skip + top]
            res.data = [Hit(int(i), float(s)) for i, s in window]
            res.execution_time_ns = time.time_ns() - start
            results[qi] = res

    return results  # type: ignore[return-value]
