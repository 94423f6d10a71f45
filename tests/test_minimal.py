"""Minimal end-to-end tests (port of reference tests/all/tests_minimal.rs)."""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc


@pytest.fixture(scope="module")
def pers():
    data = json.dumps({"field": "test", "field2": "test2"})
    return Persistence.create_from_str(data, "{}")


def run(pers, req_json):
    req = Request.from_dict(req_json)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def test_minimal(pers):
    hits = run(pers, {"search_req": {"search": {"terms": ["test"], "path": "field"}}}).data
    assert len(hits) == 1
    assert hits[0].doc["field"] == "test"


def test_minimal_with_filter_identity_column(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["test"], "path": "field"}},
            "filter": {"search": {"terms": ["test"], "path": "field"}},
        },
    )
    assert len(res.data) == 1
    assert pers.columns["field"]["is_anchor_identity_column"]
    assert res.data[0].doc["field"] == "test"


def test_minimal_or(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["test"], "path": "field"}},
                        {"search": {"terms": ["test2"], "path": "field"}},
                    ]
                }
            }
        },
    )
    assert len(res.data) == 1
    assert res.data[0].doc["field"] == "test"


def test_minimal_and(pers):
    res = run(
        pers,
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["test"], "path": "field"}},
                        {"search": {"terms": ["test2"], "path": "field2"}},
                    ]
                }
            }
        },
    )
    assert len(res.data) == 1


def test_minimal_no_hit(pers):
    res = run(
        pers, {"search_req": {"search": {"terms": ["nothing"], "path": "field"}}}
    )
    assert len(res.data) == 0
