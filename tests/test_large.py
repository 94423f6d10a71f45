"""Large corpus / long-text tests — port of reference tests/all/tests_large.rs."""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc, to_line_delimited
from veloci_tpu.query.generator import SearchQueryGeneratorParameters, search_query

CONFIG = """
["*GLOBAL*"]
features = [
    'All',
]

["tags[]"]
facet = true
"""

LONG_TEXT = (
    "a long text with more than 64 characters so that the option "
    "do_not_store_text_longer_than is active. then the whole text won't be "
    "store in the fst, only its tokens"
)


@pytest.fixture(scope="module")
def pers():
    base = (
        '{"category": "superb", "tags": ["nice", "cool"]}\n'
        '{"category": "awesomo", "tags": ["is", "cool"]}\n'
    ) * 300
    base += json.dumps({"text": LONG_TEXT}) + "\n"
    return Persistence.create_from_str(base, CONFIG)


def run(pers, req_json):
    req = Request.from_dict(req_json)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def run_qp(pers, params):
    req = search_query(pers, params)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def test_simple_search(pers):
    res = run(pers, {"search_req": {"search": {"terms": ["superb"], "path": "category"}}})
    assert res.num_hits == 300


def test_select_on_large_text(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["long"], "path": "text"}},
            "select": ["text"],
        },
    )
    assert len(res.data) == 1
    assert res.data[0].doc["text"] == LONG_TEXT
    assert "category" not in res.data[0].doc


def test_and_search(pers):
    res = run_qp(pers, SearchQueryGeneratorParameters(search_term="superb AND cool"))
    assert res.num_hits == 300


def test_or_search(pers):
    res = run_qp(pers, SearchQueryGeneratorParameters(search_term="superb OR awesome"))
    assert res.num_hits == 600


def test_search_and_filter(pers):
    res = run_qp(
        pers,
        SearchQueryGeneratorParameters(
            search_term="superb", filter="nice AND superb"
        ),
    )
    assert res.num_hits == 300


def test_search_and_get_facet_with_facet_index(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["superb"], "path": "category"}},
            "facets": [{"field": "tags[]"}],
        },
    )
    got = sorted(res.facets["tags[]"], key=lambda el: (f"{el[1]!r}{el[0]!r}"), reverse=True)
    assert got == [("nice", 300), ("cool", 300)]
