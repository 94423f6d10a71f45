"""Unit tests for the exact two-stage top-k selection (ops/topk.py) and the
scatter-free single-term fused kernel (ops/search_step.py).

The selection must reproduce the reference's result order exactly —
(score desc, id desc), `sort_by_score_and_id` src/search.rs:122-130 —
including adversarial tie patterns that straddle block boundaries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veloci_tpu.ops.topk import dense_to_hits, topk_dense_exact, topk_positions


def oracle_topk(dense, k):
    """Numpy oracle: (score desc, id desc)."""
    ids = np.arange(len(dense))
    order = np.lexsort((-ids.astype(np.int64), -dense.astype(np.float64)))
    return ids[order][:k], dense[order][:k]


def test_topk_stability_contract():
    # the two-stage selection proof requires lax.top_k to prefer lower
    # indices on ties — pin that contract
    _, i = jax.lax.top_k(jnp.zeros(1000), 5)
    assert list(np.asarray(i)) == [0, 1, 2, 3, 4]


@pytest.mark.parametrize("n", [1, 7, 127, 128, 129, 1000, 4096, 100_000])
@pytest.mark.parametrize("k", [1, 10, 74])
def test_topk_dense_random(n, k):
    rng = np.random.default_rng(n * 1000 + k)
    dense = rng.random(n).astype(np.float32)
    ids, scores = topk_dense_exact(jnp.asarray(dense), min(k, n))
    oid, osc = oracle_topk(dense, min(k, n))
    np.testing.assert_array_equal(np.asarray(ids), oid)
    np.testing.assert_array_equal(np.asarray(scores), osc)


@pytest.mark.parametrize(
    "pattern",
    ["all_equal", "two_levels", "block_straddle", "quantized", "sparse"],
)
def test_topk_dense_ties(pattern):
    n, k = 10_000, 12
    rng = np.random.default_rng(42)
    if pattern == "all_equal":
        dense = np.full(n, 3.25, dtype=np.float32)
    elif pattern == "two_levels":
        dense = np.where(rng.random(n) < 0.5, 1.0, 2.0).astype(np.float32)
    elif pattern == "block_straddle":
        # identical maxima in many 128-blocks: forces tie-break across the
        # block-selection stage
        dense = rng.random(n).astype(np.float32) * 0.5
        dense[::128] = 0.75
    elif pattern == "quantized":
        # u16-score-like planes: few distinct values, massive tie groups
        dense = (rng.integers(0, 5, size=n) * 2.5).astype(np.float32)
    else:  # sparse
        dense = np.zeros(n, dtype=np.float32)
        dense[rng.choice(n, size=5, replace=False)] = 1.5
    ids, scores = topk_dense_exact(jnp.asarray(dense), k)
    ids, scores = np.asarray(ids), np.asarray(scores)
    mask = scores > 0
    oid, osc = dense_to_hits(dense, k)
    np.testing.assert_array_equal(ids[mask][: len(oid)], oid)
    np.testing.assert_array_equal(scores[mask][: len(osc)], osc)


def test_topk_positions_prefers_low_position():
    vals = np.zeros(1024, dtype=np.float32)
    vals[100] = vals[700] = vals[701] = 5.0
    pos, v = topk_positions(jnp.asarray(vals), 3)
    assert list(np.asarray(pos)) == [100, 700, 701]
    assert list(np.asarray(v)) == [5.0, 5.0, 5.0]


def test_topk_k_exceeds_hits():
    dense = np.zeros(500, dtype=np.float32)
    dense[3] = 2.0
    ids, scores = topk_dense_exact(jnp.asarray(dense), 10)
    ids, scores = np.asarray(ids), np.asarray(scores)
    assert ids[0] == 3 and scores[0] == 2.0
    assert (scores[1:] <= 0).all()  # misses / padding


def test_single_term_kernel_matches_plane_kernel():
    from veloci_tpu.ops.search_step import (
        batched_single_term_topk,
        exact_search_topk,
        single_term_search_topk,
    )

    rng = np.random.default_rng(7)
    nkeys, num_docs = 50, 2000
    counts = rng.integers(1, 300, size=nkeys)
    nnz = int(counts.sum())
    offsets = np.zeros(nkeys + 2, dtype=np.int32)
    np.cumsum(counts, out=offsets[1 : nkeys + 1])
    offsets[nkeys + 1] = offsets[nkeys]
    # per-term anchor runs: sorted unique anchors (the CSR invariant)
    anchors = np.empty(nnz, dtype=np.int32)
    scores01 = (rng.integers(4, 20, size=nnz) * 0.25).astype(np.float32)
    for t in range(nkeys):
        s, e = offsets[t], offsets[t + 1]
        anchors[s:e] = np.sort(
            rng.choice(num_docs, size=e - s, replace=False)
        ).astype(np.int32)
    # single-term kernel contract: >= capacity tail padding on the arrays
    anchors_p = np.concatenate([anchors, np.full(512, num_docs, np.int32)])
    scores_p = np.concatenate([scores01, np.zeros(512, np.float32)])
    offs, anc, sc = jnp.asarray(offsets), jnp.asarray(anchors_p), jnp.asarray(scores_p)

    for t in [0, 3, 17, nkeys - 1]:
        cap = 512
        ids1, sc1, nh1 = single_term_search_topk(
            offs, anc, sc, jnp.int32(t), jnp.float32(10.0), capacity=cap, k=10
        )
        tid = np.full(8, -1, dtype=np.int32)
        tid[0] = t
        tsc = np.zeros(8, dtype=np.float32)
        tsc[0] = 10.0
        ids2, sc2, nh2 = exact_search_topk(
            offs, anc, sc, jnp.asarray(tid), jnp.asarray(tsc),
            capacity=cap, num_docs=num_docs, k=10,
        )
        m1 = np.asarray(sc1) > 0
        m2 = np.asarray(sc2) > 0
        np.testing.assert_array_equal(np.asarray(ids1)[m1], np.asarray(ids2)[m2])
        np.testing.assert_allclose(np.asarray(sc1)[m1], np.asarray(sc2)[m2], rtol=1e-6)
        assert int(nh1) == int(nh2) == counts[t]

    # batched variant agrees with per-query calls
    tids = np.array([0, 3, 17], dtype=np.int32)
    tscs = np.full(3, 10.0, dtype=np.float32)
    bids, bscs, bnh = batched_single_term_topk(
        offs, anc, sc, jnp.asarray(tids), jnp.asarray(tscs), capacity=512, k=10
    )
    for row, t in enumerate(tids):
        ids1, sc1, nh1 = single_term_search_topk(
            offs, anc, sc, jnp.int32(int(t)), jnp.float32(10.0), capacity=512, k=10
        )
        np.testing.assert_array_equal(np.asarray(bids)[row], np.asarray(ids1))
        assert int(bnh[row]) == int(nh1)


def test_single_term_tie_prefers_high_anchor():
    from veloci_tpu.ops.search_step import single_term_search_topk

    # one term, equal scores on every posting -> ids must come back DESC
    offsets = np.array([0, 6, 6], dtype=np.int32)
    anchors = np.concatenate(
        [np.array([2, 5, 9, 11, 40, 77], dtype=np.int32), np.zeros(64, np.int32)]
    )
    scores01 = np.concatenate(
        [np.full(6, 4.0, dtype=np.float32), np.zeros(64, np.float32)]
    )
    ids, scores, nh = single_term_search_topk(
        jnp.asarray(offsets), jnp.asarray(anchors), jnp.asarray(scores01),
        jnp.int32(0), jnp.float32(10.0), capacity=64, k=4,
    )
    assert list(np.asarray(ids)) == [77, 40, 11, 9]
    assert int(nh) == 6


def test_slice_packing_matches_gather_path():
    """win= (dynamic_slice packing) must agree bit-for-bit with the
    searchsorted gather path across exact/union/intersect kernels."""
    from veloci_tpu.ops.search_step import (
        exact_search_topk,
        intersect_search_topk,
        union_search_topk,
    )

    rng = np.random.default_rng(11)
    nkeys, num_docs = 40, 3000
    counts = rng.integers(0, 200, size=nkeys)
    nnz = int(counts.sum())
    offsets = np.zeros(nkeys + 2, dtype=np.int32)
    np.cumsum(counts, out=offsets[1 : nkeys + 1])
    offsets[nkeys + 1] = offsets[nkeys]
    anchors = np.empty(nnz, dtype=np.int32)
    scores01 = (rng.integers(4, 20, size=nnz) * 0.25).astype(np.float32)
    for t in range(nkeys):
        s, e = offsets[t], offsets[t + 1]
        if e > s:
            anchors[s:e] = np.sort(
                rng.choice(num_docs, size=e - s, replace=False)
            ).astype(np.int32)
    win = 256
    anchors_p = np.concatenate([anchors, np.full(win * 2, num_docs, np.int32)])
    scores_p = np.concatenate([scores01, np.zeros(win * 2, np.float32)])
    offs = jnp.asarray(offsets)
    anc, sc = jnp.asarray(anchors_p), jnp.asarray(scores_p)

    for trial in range(5):
        t_pad = 8
        nsel = rng.integers(1, 6)
        tids = np.full(t_pad, -1, dtype=np.int32)
        tids[:nsel] = rng.choice(nkeys, size=nsel, replace=False)
        tsc = np.zeros(t_pad, dtype=np.float32)
        tsc[:nsel] = rng.integers(1, 4, size=nsel).astype(np.float32) * 10
        slots = np.zeros(t_pad, dtype=np.int32)
        slots[:nsel] = rng.integers(0, 3, size=nsel)
        cap = 2048
        j_tids, j_tsc, j_slots = (
            jnp.asarray(tids), jnp.asarray(tsc), jnp.asarray(slots)
        )
        for fn, kw in (
            (exact_search_topk, {}),
            (union_search_topk, {"num_slots": 3}),
            (intersect_search_topk, {"num_slots": 3}),
        ):
            args = (offs, anc, sc, j_tids, j_tsc)
            if kw:
                args = args + (j_slots,)
            a = fn(*args, capacity=cap, num_docs=num_docs, k=12, **kw)
            b = fn(*args, capacity=cap, num_docs=num_docs, k=12, win=win, **kw)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
