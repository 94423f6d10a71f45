"""Fused device search steps: matched terms -> top-k documents in ONE XLA
program.

This is the TPU-native lowering of the reference's hot query path
(`ResolveTokenIdToAnchor` -> `Union` -> `top_n_sort`;
src/search/search_field.rs:400-504, set_op.rs:87-220, sort.rs:5-34): a ragged
CSR gather over the anchor-score postings, per-(term-slot, anchor) max via
segment reductions on a dense score plane, the distinct-terms^2 union boost,
and `lax.top_k` — all fused by XLA, no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "exact_search_topk",
    "union_search_topk",
    "batched_search_topk",
    "batched_union_search_topk",
    "intersect_search_topk",
]


@partial(jax.jit, static_argnames=("capacity", "num_docs", "k"))
def exact_search_topk(
    offsets: jax.Array,  # [num_keys + 2] int32
    anchors: jax.Array,  # [nnz_pad] int32 (pad -> num_docs)
    scores01: jax.Array,  # [nnz_pad] f32
    term_ids: jax.Array,  # [T_pad] int32 (pad -1)
    term_scores: jax.Array,  # [T_pad] f32
    capacity: int,
    num_docs: int,
    k: int,
):
    """Single-query search: resolve postings, dedup-max per anchor, top-k."""
    t_pad = term_ids.shape[0]
    valid = term_ids >= 0
    safe = jnp.where(valid, term_ids, 0)
    starts = offsets[safe]
    counts = jnp.where(valid, offsets[safe + 1] - starts, 0)
    out_starts = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    total = out_starts[t_pad]
    idx = jnp.arange(capacity, dtype=jnp.int32)
    seg = jnp.minimum(
        jnp.searchsorted(out_starts[1:], idx, side="right").astype(jnp.int32),
        t_pad - 1,
    )
    in_range = idx < total
    src = jnp.where(in_range, starts[seg] + (idx - out_starts[seg]), 0)
    a = jnp.where(in_range, anchors[src], num_docs)
    s = jnp.where(in_range, scores01[src] * term_scores[seg], -jnp.inf)
    dense = jax.ops.segment_max(s, a, num_segments=num_docs + 1)[:num_docs]
    dense = jnp.where(jnp.isfinite(dense), dense, 0.0)
    scores, ids = jax.lax.top_k(dense, k)
    num_hits = jnp.sum(dense > 0, dtype=jnp.int32)
    return ids, scores, num_hits


@partial(jax.jit, static_argnames=("capacity", "num_docs", "k"))
def batched_search_topk(
    offsets: jax.Array,
    anchors: jax.Array,
    scores01: jax.Array,
    term_ids: jax.Array,  # [Q, T_pad] int32 (pad -1)
    term_scores: jax.Array,  # [Q, T_pad] f32
    capacity: int,
    num_docs: int,
    k: int,
):
    """Throughput mode: a batch of queries in ONE device dispatch.

    The serving-side analogue of the reference's per-request thread pool —
    on TPU, queries batch into one `vmap`'d XLA program so HBM bandwidth,
    not dispatch latency, sets the throughput ceiling.
    """

    def one(tids, tscores):
        return exact_search_topk(
            offsets, anchors, scores01, tids, tscores,
            capacity=capacity, num_docs=num_docs, k=k,
        )

    return jax.vmap(one)(term_ids, term_scores)


@partial(jax.jit, static_argnames=("capacity", "num_docs", "k", "num_slots"))
def union_search_topk(
    offsets: jax.Array,
    anchors: jax.Array,
    scores01: jax.Array,
    term_ids: jax.Array,  # [T_pad] int32
    term_scores: jax.Array,  # [T_pad] f32
    term_slots: jax.Array,  # [T_pad] int32 — distinct query-term index
    capacity: int,
    num_docs: int,
    k: int,
    num_slots: int,
):
    """Multi-term OR: per-slot max, sum over slots * distinct^2, top-k.

    Mirrors union_hits_score (set_op.rs:87-220) with the per-term dense max
    expressed as ONE segment_max over a (slot, anchor) plane.
    """
    t_pad = term_ids.shape[0]
    valid = term_ids >= 0
    safe = jnp.where(valid, term_ids, 0)
    starts = offsets[safe]
    counts = jnp.where(valid, offsets[safe + 1] - starts, 0)
    out_starts = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    total = out_starts[t_pad]
    idx = jnp.arange(capacity, dtype=jnp.int32)
    seg = jnp.minimum(
        jnp.searchsorted(out_starts[1:], idx, side="right").astype(jnp.int32),
        t_pad - 1,
    )
    in_range = idx < total
    src = jnp.where(in_range, starts[seg] + (idx - out_starts[seg]), 0)
    a = jnp.where(in_range, anchors[src], num_docs)
    s = jnp.where(in_range, scores01[src] * term_scores[seg], -jnp.inf)
    slot = term_slots[seg]
    # plane key = slot * (num_docs+1) + anchor
    plane = slot * (num_docs + 1) + a
    per_slot = jax.ops.segment_max(
        s, plane, num_segments=num_slots * (num_docs + 1)
    ).reshape(num_slots, num_docs + 1)[:, :num_docs]
    per_slot = jnp.where(jnp.isfinite(per_slot), per_slot, 0.0)
    distinct = jnp.sum(per_slot >= 1e-5, axis=0).astype(jnp.float32)
    dense = jnp.sum(per_slot, axis=0) * distinct * distinct
    scores, ids = jax.lax.top_k(dense, k)
    num_hits = jnp.sum(dense > 0, dtype=jnp.int32)
    return ids, scores, num_hits


@partial(jax.jit, static_argnames=("capacity", "num_docs", "k", "num_slots"))
def batched_union_search_topk(
    offsets: jax.Array,
    anchors: jax.Array,
    scores01: jax.Array,
    term_ids: jax.Array,  # [Q, T_pad] int32 (pad -1)
    term_scores: jax.Array,  # [Q, T_pad] f32
    term_slots: jax.Array,  # [Q, T_pad] int32
    capacity: int,
    num_docs: int,
    k: int,
    num_slots: int,
):
    """Batched multi-term OR: the full union semantics (per-distinct-term max,
    distinct^2 boost) vmapped over a query batch — the serving kernel behind
    `search_batch` for generator-style queries that OR one term across many
    fields (term ids are then GLOBAL ids into the combined-field CSR)."""

    def one(tids, tscores, tslots):
        return union_search_topk(
            offsets, anchors, scores01, tids, tscores, tslots,
            capacity=capacity, num_docs=num_docs, k=k, num_slots=num_slots,
        )

    return jax.vmap(one)(term_ids, term_scores, term_slots)


@partial(jax.jit, static_argnames=("capacity", "num_docs", "k", "num_slots"))
def intersect_search_topk(
    offsets: jax.Array,
    anchors: jax.Array,
    scores01: jax.Array,
    term_ids: jax.Array,  # [T_pad] int32 (pad -1); may be GLOBAL combined ids
    term_scores: jax.Array,  # [T_pad] f32
    term_slots: jax.Array,  # [T_pad] int32 — one slot per AND leaf
    capacity: int,
    num_docs: int,
    k: int,
    num_slots: int,
):
    """Multi-leaf AND: per-leaf max, keep anchors hit by EVERY leaf, score =
    sum over leaves — intersect_hits_score (set_op.rs:368-448) as one fused
    program."""
    t_pad = term_ids.shape[0]
    valid = term_ids >= 0
    safe = jnp.where(valid, term_ids, 0)
    starts = offsets[safe]
    counts = jnp.where(valid, offsets[safe + 1] - starts, 0)
    out_starts = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    total = out_starts[t_pad]
    idx = jnp.arange(capacity, dtype=jnp.int32)
    seg = jnp.minimum(
        jnp.searchsorted(out_starts[1:], idx, side="right").astype(jnp.int32),
        t_pad - 1,
    )
    in_range = idx < total
    src = jnp.where(in_range, starts[seg] + (idx - out_starts[seg]), 0)
    a = jnp.where(in_range, anchors[src], num_docs)
    s = jnp.where(in_range, scores01[src] * term_scores[seg], -jnp.inf)
    slot = term_slots[seg]
    plane = slot * (num_docs + 1) + a
    per_slot = jax.ops.segment_max(
        s, plane, num_segments=num_slots * (num_docs + 1)
    ).reshape(num_slots, num_docs + 1)[:, :num_docs]
    per_slot = jnp.where(jnp.isfinite(per_slot), per_slot, 0.0)
    all_hit = jnp.all(per_slot > 0, axis=0)
    dense = jnp.where(all_hit, jnp.sum(per_slot, axis=0), 0.0)
    scores, ids = jax.lax.top_k(dense, k)
    num_hits = jnp.sum(dense > 0, dtype=jnp.int32)
    return ids, scores, num_hits
