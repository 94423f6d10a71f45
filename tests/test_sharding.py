"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that document-sharded search returns the same top-k as the
single-device dense path, and that facet psum matches host counts.
"""

import json

import numpy as np
import pytest

import jax

from veloci_tpu import Persistence
from veloci_tpu.create import TEXTINDEX, TO_ANCHOR_ID_SCORE
from veloci_tpu.parallel.sharding import (
    ShardedPostings,
    build_mesh,
    sharded_search_topk,
)


@pytest.fixture(scope="module")
def pers():
    rng = np.random.default_rng(42)
    words = [f"w{i:03d}" for i in range(50)]
    docs = []
    for i in range(64):
        docs.append(
            {
                "title": " ".join(rng.choice(words, size=5)),
                "id": str(i),
            }
        )
    nd = "\n".join(json.dumps(d) for d in docs)
    return Persistence.create_from_str(nd, "{}")


def _postings(pers, mesh):
    store = pers.anchor_scores["title" + TEXTINDEX + TO_ANCHOR_ID_SCORE]
    return ShardedPostings(
        offsets=np.asarray(store.offsets, dtype=np.int64),
        anchors=store.anchors,
        scores01=store.scores.astype(np.float32) / np.float32(100.0),
        num_docs=pers.num_docs,
        mesh=mesh,
    )


@pytest.mark.parametrize("shape", [(4, 2), (8, 1), (2, 2)])
def test_sharded_matches_dense(pers, shape):
    d_shards, q_shards = shape
    if d_shards * q_shards > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = build_mesh(d_shards, q_shards)
    postings = _postings(pers, mesh)
    dictionary = pers.get_dictionary("title")

    queries = ["w001", "w017", "w042", "w007"]
    t_pad = 8
    term_ids = np.full((len(queries), t_pad), -1, dtype=np.int32)
    term_scores = np.zeros((len(queries), t_pad), dtype=np.float32)
    for qi, q in enumerate(queries):
        ids = dictionary.get_ignore_case(q)
        for j, tid in enumerate(ids[:t_pad]):
            term_ids[qi, j] = tid
            term_scores[qi, j] = 10.0

    ids, scores, _ = sharded_search_topk(postings, term_ids, term_scores, 512, k=8)
    ids, scores = np.asarray(ids), np.asarray(scores)

    # dense single-device reference
    from veloci_tpu.ops.postings import resolve_to_anchor_dense
    from veloci_tpu.ops.topk import dense_to_hits

    dev = pers.device_field("title")
    for qi in range(len(queries)):
        tid = term_ids[qi][term_ids[qi] >= 0]
        tsc = term_scores[qi][term_ids[qi] >= 0]
        dense = resolve_to_anchor_dense(dev, tid, tsc, pers.num_docs)
        ref_ids, ref_scores = dense_to_hits(np.asarray(dense), k=8)
        got_ids = ids[qi][scores[qi] > 0]
        got_scores = scores[qi][scores[qi] > 0]
        assert len(got_ids) == len(ref_ids)
        # same hit set and scores (tie order may differ across shard merge)
        assert set(got_ids.tolist()) == set(int(i) for i in ref_ids)
        np.testing.assert_allclose(np.sort(got_scores), np.sort(ref_scores), rtol=1e-6)


def test_search_batch_device_path(pers, monkeypatch):
    """Batched serving path matches individual searches (device kernels)."""
    import importlib

    batch_mod = importlib.import_module("veloci_tpu.search.batch")
    ex = importlib.import_module("veloci_tpu.search.executor")
    monkeypatch.setattr(batch_mod, "SMALL_DOCS", 1)
    monkeypatch.setattr(ex, "SMALL_DOCS", 1)

    from veloci_tpu import Request

    search_batch = batch_mod.search_batch
    search = ex.search

    reqs = [
        Request.from_dict(
            {"search_req": {"search": {"terms": [f"w{i:03d}"], "path": "title"}}}
        )
        for i in [1, 7, 17, 42]
    ]
    batched = search_batch(reqs, pers)
    for req, res in zip(reqs, batched):
        single = search(req, pers)
        assert res.num_hits == single.num_hits
        assert [(h.id, round(h.score, 4)) for h in res.data] == [
            (h.id, round(h.score, 4)) for h in single.data
        ]


def test_sharded_fuzzy_match(pers):
    """Dictionary-sharded fuzzy match finds the same terms as the host."""
    import jax

    from veloci_tpu.ops.levenshtein import encode_query, levenshtein_distance_host
    from veloci_tpu.parallel.sharding import ShardedDictionary, build_mesh, sharded_fuzzy_match

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = build_mesh(4, 1)
    dictionary = pers.get_dictionary("title")
    chars, lengths = dictionary.char_matrix()
    sd = ShardedDictionary(chars, lengths, mesh)

    query = "w01"
    q, qlen = encode_query(query)
    ids, dists, prefixes, total = sharded_fuzzy_match(sd, q, qlen, distance=1)
    got = {int(i) for i in ids if 0 <= i < len(dictionary)}
    expected = {
        i
        for i, t in enumerate(dictionary.terms)
        if levenshtein_distance_host(query, t.lower()) <= 1
    }
    assert got == expected


@pytest.fixture(scope="module")
def pers2f():
    """Two searchable fields sharing vocabulary (generator-style expansion)."""
    rng = np.random.default_rng(7)
    words = [f"w{i:03d}" for i in range(40)]
    docs = []
    for i in range(64):
        docs.append(
            {
                "title": " ".join(rng.choice(words, size=4)),
                "body": " ".join(rng.choice(words, size=6)),
            }
        )
    nd = "\n".join(json.dumps(d) for d in docs)
    return Persistence.create_from_str(nd, "{}")


def test_multi_field_fused_fast_path(pers2f, monkeypatch):
    """Multi-field OR through the combined-postings fused path must match
    the generic tree evaluation (same hits, same scores, same order)."""
    import importlib

    ex = importlib.import_module("veloci_tpu.search.executor")
    from veloci_tpu import Request

    def req_for(term):
        return Request.from_dict(
            {
                "search_req": {
                    "or": {
                        "queries": [
                            {"search": {"terms": [term], "path": "title"}},
                            {"search": {"terms": [term], "path": "body"}},
                        ]
                    }
                },
                "top": 10,
            }
        )

    for term in ["w001", "w013", "w030", "zzz"]:
        monkeypatch.setattr(ex, "SMALL_DOCS", 1 << 30)
        slow = ex.search(req_for(term), pers2f)
        monkeypatch.setattr(ex, "SMALL_DOCS", 1)
        fast = ex._try_fast_path(req_for(term), pers2f, 10)
        if term == "zzz":
            assert fast is None or fast.num_hits == 0
            continue
        assert fast is not None
        assert fast.num_hits == slow.num_hits
        assert [(h.id, round(h.score, 4)) for h in fast.data] == [
            (h.id, round(h.score, 4)) for h in slow.data
        ]


def test_multi_field_fused_distinct_terms(pers2f, monkeypatch):
    """OR over two DIFFERENT terms across two fields — exercises slot
    assignment (distinct^2 union boost) in the combined path."""
    import importlib

    ex = importlib.import_module("veloci_tpu.search.executor")
    from veloci_tpu import Request

    req_dict = {
        "search_req": {
            "or": {
                "queries": [
                    {"search": {"terms": ["w001"], "path": "title"}},
                    {"search": {"terms": ["w002"], "path": "title"}},
                    {"search": {"terms": ["w001"], "path": "body"}},
                    {"search": {"terms": ["w002"], "path": "body"}},
                ]
            }
        },
        "top": 20,
    }
    monkeypatch.setattr(ex, "SMALL_DOCS", 1 << 30)
    slow = ex.search(Request.from_dict(req_dict), pers2f)
    monkeypatch.setattr(ex, "SMALL_DOCS", 1)
    fast = ex._try_fast_path(Request.from_dict(req_dict), pers2f, 20)
    assert fast is not None
    assert fast.num_hits == slow.num_hits
    assert [(h.id, round(h.score, 4)) for h in fast.data] == [
        (h.id, round(h.score, 4)) for h in slow.data
    ]


def test_search_batch_multi_field_and_multi_term(pers2f, monkeypatch):
    """Batched path handles multi-field and multi-distinct-term ORs in the
    fused dispatch and still matches individual searches."""
    import importlib

    batch_mod = importlib.import_module("veloci_tpu.search.batch")
    ex = importlib.import_module("veloci_tpu.search.executor")
    monkeypatch.setattr(batch_mod, "SMALL_DOCS", 1)
    monkeypatch.setattr(ex, "SMALL_DOCS", 1)

    from veloci_tpu import Request

    reqs = [
        # single-field single-term
        Request.from_dict(
            {"search_req": {"search": {"terms": ["w001"], "path": "title"}}}
        ),
        # multi-field single-term (generator expansion)
        Request.from_dict(
            {
                "search_req": {
                    "or": {
                        "queries": [
                            {"search": {"terms": ["w013"], "path": "title"}},
                            {"search": {"terms": ["w013"], "path": "body"}},
                        ]
                    }
                }
            }
        ),
        # multi-field multi-term (distinct^2 union across fields)
        Request.from_dict(
            {
                "search_req": {
                    "or": {
                        "queries": [
                            {"search": {"terms": ["w001"], "path": "title"}},
                            {"search": {"terms": ["w002"], "path": "body"}},
                        ]
                    }
                },
                "top": 20,
            }
        ),
        # miss
        Request.from_dict(
            {"search_req": {"search": {"terms": ["zzz"], "path": "title"}}}
        ),
    ]
    batched = batch_mod.search_batch(reqs, pers2f)
    for req, res in zip(reqs, batched):
        single = ex.search(req, pers2f)
        assert res.num_hits == single.num_hits
        assert [(h.id, round(h.score, 4)) for h in res.data] == [
            (h.id, round(h.score, 4)) for h in single.data
        ]


def test_and_fused_fast_path(pers2f, monkeypatch):
    """Flat AND (single- and multi-field) through the fused intersect kernel
    matches the generic tree evaluation."""
    import importlib

    ex = importlib.import_module("veloci_tpu.search.executor")
    from veloci_tpu import Request

    cases = [
        # single-field AND of two terms
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["w001"], "path": "title"}},
                        {"search": {"terms": ["w002"], "path": "title"}},
                    ]
                }
            },
            "top": 20,
        },
        # cross-field AND (same term must appear in both fields)
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["w005"], "path": "title"}},
                        {"search": {"terms": ["w005"], "path": "body"}},
                    ]
                }
            },
            "top": 20,
        },
        # AND with a missing term -> no hits
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["w001"], "path": "title"}},
                        {"search": {"terms": ["zzz"], "path": "title"}},
                    ]
                }
            },
        },
    ]
    for case in cases:
        monkeypatch.setattr(ex, "SMALL_DOCS", 1 << 30)
        slow = ex.search(Request.from_dict(case), pers2f)
        monkeypatch.setattr(ex, "SMALL_DOCS", 1)
        fast = ex._try_fast_path(Request.from_dict(case), pers2f, case.get("top", 10))
        assert fast is not None
        assert fast.num_hits == slow.num_hits
        assert [(h.id, round(h.score, 4)) for h in fast.data] == [
            (h.id, round(h.score, 4)) for h in slow.data
        ]


def test_fuzzy_fused_fast_path(pers2f, monkeypatch):
    """Single-leaf fuzzy through the fully-fused device program matches the
    generic path (same hits, scores, order, num_hits)."""
    import importlib

    ex = importlib.import_module("veloci_tpu.search.executor")
    from veloci_tpu import Request

    def req_for(term, distance=2):
        return Request.from_dict(
            {
                "search_req": {
                    "search": {
                        "terms": [term],
                        "path": "title",
                        "levenshtein_distance": distance,
                    }
                },
                "top": 20,
            }
        )

    for term, d in [("w001", 1), ("w0x1", 2), ("wxx", 2), ("nomatchzz", 1)]:
        monkeypatch.setattr(ex, "SMALL_DOCS", 1 << 30)
        slow = ex.search(req_for(term, d), pers2f)
        monkeypatch.setattr(ex, "SMALL_DOCS", 1)
        fast = ex._try_fuzzy_fast_path(req_for(term, d), pers2f, 20)
        if fast is None:
            # fell back (e.g. >256 matches) — acceptable, generic handles it
            continue
        assert fast.num_hits == slow.num_hits, term
        assert [(h.id, round(h.score, 4)) for h in fast.data] == [
            (h.id, round(h.score, 4)) for h in slow.data
        ], term


def test_fuzzy_fast_path_overflow_falls_back(pers2f, monkeypatch):
    """When more terms match than the selection window, the fused path must
    decline rather than truncate."""
    import importlib

    ex = importlib.import_module("veloci_tpu.search.executor")
    from veloci_tpu import Request

    monkeypatch.setattr(ex, "SMALL_DOCS", 1)
    # distance 2 against "w01" matches a large chunk of the w### vocabulary;
    # with a tiny window the kernel reports overflow -> None
    import veloci_tpu.ops.fuzzy_step as fs

    req = Request.from_dict(
        {
            "search_req": {
                "search": {
                    "terms": ["w01"],
                    "path": "title",
                    "levenshtein_distance": 2,
                }
            }
        }
    )
    res = ex._try_fuzzy_fast_path(req, pers2f, 10)
    # whole-vocab match count is 40 (w0xx distance<=2 of "w01") — window is
    # 256 so this may or may not overflow; just assert correctness of the
    # decision: if not None it matches the generic result
    if res is not None:
        monkeypatch.setattr(ex, "SMALL_DOCS", 1 << 30)
        slow = ex.search(req, pers2f)
        assert res.num_hits == slow.num_hits


def test_search_batch_fuzzy_group(pers2f, monkeypatch):
    """Fuzzy requests in a batch run through the vmapped fused program and
    match individual searches."""
    import importlib

    batch_mod = importlib.import_module("veloci_tpu.search.batch")
    ex = importlib.import_module("veloci_tpu.search.executor")
    monkeypatch.setattr(batch_mod, "SMALL_DOCS", 1)
    monkeypatch.setattr(ex, "SMALL_DOCS", 1)

    from veloci_tpu import Request

    def fz(term, d=1, path="title"):
        return Request.from_dict(
            {
                "search_req": {
                    "search": {
                        "terms": [term],
                        "path": path,
                        "levenshtein_distance": d,
                    }
                },
                "top": 15,
            }
        )

    reqs = [
        fz("w001", 1),
        fz("w0x7", 2),
        fz("w013", 1, path="body"),
        # exact rides alongside in the same batch
        Request.from_dict(
            {"search_req": {"search": {"terms": ["w002"], "path": "title"}}}
        ),
    ]
    batched = batch_mod.search_batch(reqs, pers2f)
    for req, res in zip(reqs, batched):
        single = ex.search(req, pers2f)
        assert res.num_hits == single.num_hits
        assert [(h.id, round(h.score, 4)) for h in res.data] == [
            (h.id, round(h.score, 4)) for h in single.data
        ]


def test_sharded_fuzzy_match_length_window(monkeypatch):
    """The windowed sharded sweep ([qlen-d, qlen+d] slice of each shard's
    locally length-sorted layout) must find exactly the host's match set.
    LW_SHARD_BLOCK is forced tiny so the window branch engages on a small
    synthetic dictionary; widths pad per-shard and remap carries global
    ids, so parity covers the slice/remap/all_gather plumbing."""
    import jax

    import veloci_tpu.parallel.sharding as sh_mod
    from veloci_tpu.ops.levenshtein import (
        encode_query,
        levenshtein_distance_host,
    )
    from veloci_tpu.parallel.sharding import (
        ShardedDictionary,
        build_mesh,
        sharded_fuzzy_match,
    )

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    monkeypatch.setattr(sh_mod, "LW_SHARD_BLOCK", 16)
    mesh = build_mesh(8, 1)

    # varied lengths so windows genuinely slice; diverse prefixes
    terms = sorted(
        {f"{'abcdwxyz'[i % 8]}{'m' * (i % 9)}{i % 53:02d}" for i in range(3000)}
    )
    max_l = 32
    chars = np.zeros((len(terms), max_l), dtype=np.uint16)
    lengths = np.zeros(len(terms), dtype=np.int32)
    for i, t in enumerate(terms):
        enc = [ord(c) for c in t]
        chars[i, : len(enc)] = enc
        lengths[i] = len(enc)
    sd = ShardedDictionary(chars, lengths, mesh)

    # the first probe's window must be real (not the full-matrix fallback)
    _c, _l, _r, cum = sd.length_sorted()
    lo = (cum[:, 4] // 16) * 16
    need = int(max(cum[:, 7] - lo))
    w = 16
    while w < need:
        w *= 2
    assert w < 0.75 * sd.terms_per_shard, "window branch not engaged"

    for query, d in (("amm07", 1), ("bmmmm21", 2), ("c04", 1), ("zmmmmmmmm52", 2)):
        q, qlen = encode_query(query)
        ids, dists, _p, total = sharded_fuzzy_match(
            sd, q, qlen, distance=d,
            min_len=len(query) - d, max_len=len(query) + d,
        )
        got = {int(i) for i in ids if 0 <= i < len(terms)}
        expected = {
            i
            for i, t in enumerate(terms)
            if levenshtein_distance_host(query, t) <= d
        }
        assert got == expected, (query, d)
        # distances align with ids
        by_id = {int(i): int(dd) for i, dd in zip(ids, dists) if i >= 0}
        for i in got:
            assert by_id[i] == levenshtein_distance_host(query, terms[i])
