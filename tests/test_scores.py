"""Score/boost semantics tests — port of reference tests/all/test_scores.rs."""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc
from veloci_tpu.query.generator import SearchQueryGeneratorParameters, search_query

CONFIG = """
[title.fulltext]
tokenize = true
["meanings.ger[].boost".boost]
boost_type = 'f32'
["meanings.ger[].text".fulltext]
tokenize = true
[commonness.boost]
boost_type = 'f32'
[order.boost]
boost_type = 'f32'
"""

DATA = [
    {"id": 1, "order": 500, "title": "greg tagebuch 05"},
    {
        "id": 2,
        "order": 20,
        "title": "and some some text 05 this is not relevant let tagebuch greg",
    },
    {"id": 3, "order": 1000, "title": "greg tagebuch"},
    {
        "id": 4,
        "commonness": 41,
        "meanings": {"ger": [{"text": "Fernsehen-Schauen (n)", "boost": 20}]},
    },
    {"id": 5, "commonness": 551, "meanings": {"ger": ["welch"]}},
    {"id": 6, "commonness": 2, "meanings": {"ger": ["weich"]}},
]


@pytest.fixture(scope="module")
def pers():
    nd = "\n".join(json.dumps(d, ensure_ascii=False) for d in DATA)
    return Persistence.create_from_str(nd, CONFIG)


def run(pers, req_json):
    req = Request.from_dict(req_json)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def run_qp(pers, params):
    req = search_query(pers, params)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def test_boost_simple():
    data = [
        {"commonness": 10, "name": "product"},
        {"commonness": 99, "name": "product"},
        {"commonness": 33, "name": "product"},
    ]
    cfg = """
[name]
tokenize = true
[commonness.boost]
boost_type = 'f32'
"""
    p = Persistence.create_from_str(
        "\n".join(json.dumps(d) for d in data), cfg
    )
    res = run(
        p,
        {
            "search_req": {
                "search": {
                    "terms": ["product"],
                    "path": "name",
                    "levenshtein_distance": 0,
                }
            },
            "boost": [{"path": "commonness", "boost_fun": "Log10", "param": 1}],
        },
    )
    assert res.data[0].doc["commonness"] == 99
    assert res.data[1].doc["commonness"] == 33
    assert res.data[2].doc["commonness"] == 10


def test_check_score_regarding_to_length(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["greg"], "path": "title"}},
                        {"search": {"terms": ["tagebuch"], "path": "title"}},
                        {"search": {"terms": ["05"], "path": "title"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["greg"], "path": "title"},
                    "search2": {"terms": ["tagebuch"], "path": "title"},
                }
            ],
        },
    )
    assert res.data[0].doc["title"] == "greg tagebuch 05"
    assert res.data[1].doc["title"] == "greg tagebuch"
    assert (
        res.data[2].doc["title"]
        == "and some some text 05 this is not relevant let tagebuch greg"
    )


def test_check_score_boost_relative_field(pers):
    params = SearchQueryGeneratorParameters.from_dict(
        {
            "search_term": "schauen",
            "fields": ["meanings.ger[].text"],
            "top": 3,
            "skip": 0,
            "why_found": True,
            "boost_queries": [
                {"path": "meanings.ger[].boost", "boost_fun": "Log10", "param": 10}
            ],
            "boost_fields": {"meanings.ger[].text": 2.0},
        }
    )
    res = run_qp(pers, params)
    assert res.data[0].hit.score > 40.0


def test_check_score_boost_add_value_from_field(pers):
    boosted = run_qp(
        pers,
        SearchQueryGeneratorParameters.from_dict(
            {
                "search_term": "weich",
                "fields": ["meanings.ger[]"],
                "levenshtein": 0,
                "boost_queries": [{"path": "commonness", "boost_fun": "Add"}],
            }
        ),
    ).data
    unboosted = run_qp(
        pers,
        SearchQueryGeneratorParameters.from_dict(
            {"search_term": "weich", "levenshtein": 0, "fields": ["meanings.ger[]"]}
        ),
    ).data
    assert unboosted[0].hit.score + 2.0 == pytest.approx(boosted[0].hit.score)


def test_check_score_boost_multiply_value_from_field(pers):
    boosted = run_qp(
        pers,
        SearchQueryGeneratorParameters.from_dict(
            {
                "search_term": "weich",
                "fields": ["meanings.ger[]"],
                "levenshtein": 0,
                "boost_queries": [{"path": "commonness", "boost_fun": "Multiply"}],
            }
        ),
    ).data
    unboosted = run_qp(
        pers,
        SearchQueryGeneratorParameters.from_dict(
            {"search_term": "weich", "levenshtein": 0, "fields": ["meanings.ger[]"]}
        ),
    ).data
    assert unboosted[0].hit.score * 2.0 == pytest.approx(boosted[0].hit.score)


def test_should_rank_exact_matches_pretty_good(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["weich"],
                    "path": "meanings.ger[]",
                    "levenshtein_distance": 1,
                }
            },
            "boost": [{"path": "commonness", "boost_fun": "Log2", "param": 2}],
        },
    )
    assert res.data[0].doc["meanings"]["ger"][0] == "weich"


def test_order_by_field_via_replace_boost(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {"terms": [".*"], "path": "title", "is_regex": True}
            },
            "boost": [{"path": "order", "boost_fun": "Replace"}],
        },
    )
    assert res.data[0].doc["id"] == 3
    assert res.data[1].doc["id"] == 1
    assert res.data[2].doc["id"] == 2
