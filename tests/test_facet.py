"""Facet tests — port of reference tests/all/tests_facet.rs."""

import json

import numpy as np
import pytest

from veloci_tpu import FacetRequest, Persistence, Request, search, search_to_result_with_doc
from veloci_tpu.query.generator import SearchQueryGeneratorParameters, search_query
from veloci_tpu.search.facet import get_facet

CONFIG = """
["*GLOBAL*"]
features = ['All']

["tags[]"]
facet = true
features = ['Facets']

[commonness]
facet = true
"""

DATA = [
    {
        "commonness": 20,
        "tags": ["nice", "cool"],
        "meanings": {
            "eng": ["karlo", "dignity", "majestic appearance", "will testo"],
            "ger": [
                "majestätischer Anblick (m)",
                "majestätisches Aussehen (n)",
                "Majestät (f)",
            ],
        },
    },
    {
        "commonness": 20,
        "tags": ["nice"],
        "meanings": {
            "eng": ["will", "urge", "having a long torso"],
            "ger": ["Wollen (n)", "Wille (m)", "Begeisterung (f)", "begeistern"],
        },
    },
    {"commonness": 123456, "tags": ["nice", "cool"]},
    {"meanings": {"eng": ["test1"], "ger": ["der test", "das ist ein guter Treffer"]}},
    {"commonness": 20, "tags": ["Eis", "cool"]},
]


@pytest.fixture(scope="module")
def pers():
    nd = "\n".join(json.dumps(d, ensure_ascii=False) for d in DATA)
    return Persistence.create_from_str(nd, CONFIG)


def run(pers, req_json):
    req = Request.from_dict(req_json)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def test_search_and_get_facet_with_facet_index(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["will"], "path": "meanings.eng[]"}},
            "facets": [{"field": "tags[]"}, {"field": "commonness"}],
        },
    )
    assert len(res.data) == 2
    assert res.facets["tags[]"] == [("nice", 2), ("cool", 1)]
    assert res.facets["commonness"] == [("20", 2)]


def test_search_query_params_and_get_facet(pers):
    params = SearchQueryGeneratorParameters(
        search_term="will", facets=["tags[]", "commonness"], fields=["meanings.eng[]"]
    )
    req = search_query(pers, params)
    res = search(req, pers)
    assert len(res.data) == 2
    assert res.facets["tags[]"] == [("nice", 2), ("cool", 1)]
    assert res.facets["commonness"] == [("20", 2)]


def test_search_and_get_facet_without_facet_index(pers):
    # meanings.eng[] has no facet index and is a 1:n facet -> slow join path
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["test"], "path": "meanings.ger[]"}},
            "facets": [{"field": "meanings.eng[]"}],
        },
    )
    assert len(res.data) == 1
    assert res.facets["meanings.eng[]"] == [("test1", 1)]


def test_facets_direct(pers):
    mask = np.zeros(pers.num_docs, dtype=bool)
    mask[:] = True  # all docs hit (reference passes ids 0..10)
    got = get_facet(pers, FacetRequest(field="tags[]", top=10), mask)
    got = sorted(got, key=lambda el: (f"{el[1]!r}{el[0]!r}"), reverse=True)
    assert got == [("nice", 3), ("cool", 3), ("Eis", 1)]
