"""Sharded persistence: fan-out search merges match a single-index build."""

import json

import numpy as np
import pytest

from veloci_tpu import Persistence, Request, search
from veloci_tpu.parallel.shards import ShardedPersistence, build_sharded


@pytest.fixture(scope="module")
def corpora():
    rng = np.random.default_rng(11)
    words = [f"w{i:02d}" for i in range(40)]
    docs = []
    for i in range(60):
        docs.append(
            {
                "title": " ".join(rng.choice(words, size=4)),
                "tags": [str(rng.integers(0, 5))],
                "nr": str(i),
            }
        )
    lines = [json.dumps(d) for d in docs]
    cfg = '{"*GLOBAL*": {"features": ["All"]}, "tags[]": {"facet": true}}'
    single = Persistence.create_from_str("\n".join(lines), cfg)
    sharded = build_sharded(lines, cfg, shard_size=17)
    return single, sharded


def test_shard_structure(corpora):
    single, sharded = corpora
    assert len(sharded.shards) == 4
    assert sharded.num_docs == single.num_docs


@pytest.mark.parametrize("term", ["w05", "w17", "w39", "missing"])
def test_sharded_search_matches_single(corpora, term):
    single, sharded = corpora
    req = {"search_req": {"search": {"terms": [term], "path": "title"}}, "top": 10}
    res_single = search(Request.from_dict(req), single)
    res_sharded = sharded.search(Request.from_dict(req))
    assert res_sharded.num_hits == res_single.num_hits
    assert [(h.id, round(h.score, 4)) for h in res_sharded.data] == [
        (h.id, round(h.score, 4)) for h in res_single.data
    ]


def test_sharded_facets(corpora):
    single, sharded = corpora
    req = {
        "search_req": {"search": {"terms": ["w05"], "path": "title"}},
        "facets": [{"field": "tags[]"}],
        "top": 100,
    }
    res_single = search(Request.from_dict(req), single)
    res_sharded = sharded.search(Request.from_dict(req))
    assert dict(res_sharded.facets["tags[]"]) == dict(res_single.facets["tags[]"])


def test_sharded_doc_fetch(corpora):
    single, sharded = corpora
    for gid in [0, 16, 17, 42, 59]:
        assert sharded.get_doc(gid) == single.doc_loader.get_doc(gid)


def test_sharded_save_load(corpora, tmp_path):
    _single, _ = corpora
    rng = np.random.default_rng(3)
    lines = [json.dumps({"t": f"x{i % 7}"}) for i in range(20)]
    sp = build_sharded(lines, "{}", shard_size=6, target_dir=str(tmp_path))
    sp2 = ShardedPersistence.load(str(tmp_path))
    assert sp2.num_docs == 20
    res = sp2.search(
        Request.from_dict({"search_req": {"search": {"terms": ["x3"], "path": "t"}}})
    )
    assert res.num_hits == 3
