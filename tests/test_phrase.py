"""Phrase boost tests — port of reference tests/all/test_phrase.rs."""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc
from veloci_tpu.query.generator import SearchQueryGeneratorParameters, search_query

CONFIG = json.dumps(
    {
        "title": {
            "features": ["Search", "PhraseBoost", "BoostTextLocality"],
            "fulltext": {"tokenize": True},
        },
        "tags[]": {
            "features": ["Search", "PhraseBoost", "BoostTextLocality"],
            "fulltext": {"tokenize": True},
        },
    }
)

DATA = [
    {"title": "die erbin"},
    {"title": "erbin", "tags": ["die", "erbin"]},
    {"tags": ["greg tagebuch 05"]},
    {"tags": ["greg tagebuch", "05"]},
    {"title": "greg tagebuch", "tags": ["greg tagebuch", "05"]},
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


def test_should_boost_phrase(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["erbin"], "path": "title"}},
            "phrase_boosts": [
                {
                    "search1": {"terms": ["die"], "path": "title"},
                    "search2": {"terms": ["erbin"], "path": "title"},
                }
            ],
        },
    )
    assert res.data[0].doc["title"] == "die erbin"


def test_should_boost_phrase_search_multifield(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["die"], "path": "title"}},
                        {"search": {"terms": ["erbin"], "path": "title"}},
                        {"search": {"terms": ["die"], "path": "tags[]"}},
                        {"search": {"terms": ["erbin"], "path": "tags[]"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["die"], "path": "title"},
                    "search2": {"terms": ["erbin"], "path": "title"},
                },
                {
                    "search1": {"terms": ["die"], "path": "tags[]"},
                    "search2": {"terms": ["erbin"], "path": "tags[]"},
                },
            ],
        },
    )
    assert res.data[0].doc["title"] == "die erbin"


def test_should_and_boost_phrase_search(pers):
    res = run(
        pers,
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["die"], "path": "title"}},
                        {"search": {"terms": ["erbin"], "path": "title"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["die"], "path": "title"},
                    "search2": {"terms": ["erbin"], "path": "title"},
                }
            ],
        },
    )
    assert res.data[0].doc["title"] == "die erbin"


def test_phrase_via_query_generator_and(pers):
    res = run_qp(
        pers,
        SearchQueryGeneratorParameters(search_term="die AND erbin", phrase_pairs=True),
    )
    assert res.data[0].doc["title"] == "die erbin"


def test_phrase_via_query_generator_or(pers):
    res = run_qp(
        pers, SearchQueryGeneratorParameters(search_term="die erbin", phrase_pairs=True)
    )
    assert res.data[0].doc["title"] == "die erbin"


def test_should_double_boost_from_multiphrases(pers):
    single = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["greg"], "path": "tags[]"}},
                        {"search": {"terms": ["tagebuch"], "path": "tags[]"}},
                        {"search": {"terms": ["05"], "path": "tags[]"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["greg"], "path": "tags[]"},
                    "search2": {"terms": ["tagebuch"], "path": "tags[]"},
                }
            ],
        },
    )
    assert single.data[0].doc["tags"][0] == "greg tagebuch"
    assert single.data[0].doc["tags"][1] == "05"

    multi = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["greg"], "path": "tags[]"}},
                        {"search": {"terms": ["tagebuch"], "path": "tags[]"}},
                        {"search": {"terms": ["05"], "path": "tags[]"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["greg"], "path": "tags[]"},
                    "search2": {"terms": ["tagebuch"], "path": "tags[]"},
                },
                {
                    "search1": {"terms": ["tagebuch"], "path": "tags[]"},
                    "search2": {"terms": ["05"], "path": "tags[]"},
                },
            ],
        },
    )
    assert multi.data[0].doc["tags"][0] == "greg tagebuch 05"


def test_should_double_boost_from_multiphrases_and(pers):
    single = run(
        pers,
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["greg"], "path": "tags[]"}},
                        {"search": {"terms": ["tagebuch"], "path": "tags[]"}},
                        {"search": {"terms": ["05"], "path": "tags[]"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["greg"], "path": "tags[]"},
                    "search2": {"terms": ["tagebuch"], "path": "tags[]"},
                }
            ],
        },
    )
    assert single.data[0].doc["tags"][0] == "greg tagebuch"

    multi = run(
        pers,
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["greg"], "path": "tags[]"}},
                        {"search": {"terms": ["tagebuch"], "path": "tags[]"}},
                        {"search": {"terms": ["05"], "path": "tags[]"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["greg"], "path": "tags[]"},
                    "search2": {"terms": ["tagebuch"], "path": "tags[]"},
                },
                {
                    "search1": {"terms": ["tagebuch"], "path": "tags[]"},
                    "search2": {"terms": ["05"], "path": "tags[]"},
                },
            ],
        },
    )
    assert multi.data[0].doc["tags"][0] == "greg tagebuch 05"


def test_should_prefer_different_phrases(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["greg"], "path": "tags[]"}},
                        {"search": {"terms": ["tagebuch"], "path": "tags[]"}},
                        {"search": {"terms": ["05"], "path": "tags[]"}},
                        {"search": {"terms": ["greg"], "path": "title"}},
                        {"search": {"terms": ["tagebuch"], "path": "title"}},
                        {"search": {"terms": ["05"], "path": "title"}},
                    ]
                }
            },
            "phrase_boosts": [
                {
                    "search1": {"terms": ["greg"], "path": "tags[]"},
                    "search2": {"terms": ["tagebuch"], "path": "tags[]"},
                },
                {
                    "search1": {"terms": ["greg"], "path": "title"},
                    "search2": {"terms": ["tagebuch"], "path": "title"},
                },
                {
                    "search1": {"terms": ["tagebuch"], "path": "tags[]"},
                    "search2": {"terms": ["05"], "path": "tags[]"},
                },
                {
                    "search1": {"terms": ["tagebuch"], "path": "title"},
                    "search2": {"terms": ["05"], "path": "title"},
                },
            ],
        },
    )
    assert res.data[0].doc["tags"][0] == "greg tagebuch 05"
