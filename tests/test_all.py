"""Main integration tests — port of reference tests/all/tests.rs."""

import json

import pytest

from corpus import TEST_CONFIG, TOKEN_VALUES, data_ndjson
from veloci_tpu import (
    Persistence,
    Request,
    add_token_values_to_tokens,
    search,
    search_to_result_with_doc,
)
from veloci_tpu.search.executor import suggest
from veloci_tpu.search.read_document import read_data


import os

# Same suite against both storage backends — the reference CI's env matrix
# (`PersistenceType=Transient|Persistent`, tests/all/common/mod.rs:40-77).
_BACKENDS = [os.environ["PersistenceType"]] if os.environ.get("PersistenceType") else [
    "Transient",
    "Persistent",
]


@pytest.fixture(scope="module", params=_BACKENDS)
def pers(request, tmp_path_factory):
    p = Persistence.create_from_str(data_ndjson(), TEST_CONFIG)
    add_token_values_to_tokens(p, TOKEN_VALUES[0], TOKEN_VALUES[1])
    if request.param == "Persistent":
        d = str(tmp_path_factory.mktemp("dbs") / "test_all")
        p.save(d)
        p = Persistence.load(d)
    return p


def run(pers, req_json):
    req = Request.from_dict(req_json)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def search_req(pers, inner):
    return run(pers, {"search_req": inner})


# ---------------------------------------------------------------- basics


def test_simple_search(pers):
    hits = search_req(pers, {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587690"
    assert hits[0].doc["commonness"] == 20
    assert hits[0].doc["tags"] == ["nice"]


def test_return_execution_time(pers):
    res = search_req(pers, {"search": {"terms": ["urge"], "path": "meanings.eng[]"}})
    assert res.execution_time_ns > 1


def test_simple_search_skip_far(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
            "skip": 1000,
        },
    )
    assert len(res.data) == 0


def test_simple_search_case_sensitive(pers):
    hits = search_req(
        pers,
        {"search": {"ignore_case": True, "terms": ["Urge"], "path": "meanings.eng[]"}},
    ).data
    assert len(hits) == 1
    hits = search_req(
        pers,
        {"search": {"ignore_case": False, "terms": ["Urge"], "path": "meanings.eng[]"}},
    ).data
    assert len(hits) == 0


def test_float(pers):
    hits = search_req(pers, {"search": {"terms": ["5.123"], "path": "float_value"}}).data
    assert len(hits) == 1
    assert hits[0].doc["float_value"] == 5.123


def test_bool(pers):
    hits = search_req(pers, {"search": {"terms": ["true"], "path": "my_bool"}}).data
    assert len(hits) == 1
    assert hits[0].doc["my_bool"] is True


def test_invalid_field_error(pers):
    from veloci_tpu.error import FstNotFoundError

    with pytest.raises(FstNotFoundError):
        search(
            Request.from_dict(
                {"search_req": {"search": {"terms": ["test"], "path": "notexisting"}}}
            ),
            pers,
        )


# ---------------------------------------------------------------- select


def test_select_fields(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
            "select": ["ent_seq", "tags[]"],
        },
    )
    hits = res.data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587690"
    assert "commonness" not in hits[0].doc
    assert hits[0].doc["tags"] == ["nice"]


# ---------------------------------------------------------------- fuzzy


def test_two_tokens_hit_the_same_anchor(pers):
    hits = search_req(
        pers,
        {
            "search": {
                "terms": ["majestätischer"],
                "path": "meanings.ger[]",
                "levenshtein_distance": 1,
            }
        },
    ).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587680"


def test_deep_structured_objects(pers):
    hits = search_req(
        pers,
        {
            "search": {
                "terms": ["brook"],
                "path": "address[].line[]",
                "levenshtein_distance": 1,
            }
        },
    ).data
    assert len(hits) == 1
    assert hits[0].doc["id"] == 123456


def test_search_without_first_char_exact_match(pers):
    hits = search_req(
        pers,
        {
            "search": {
                "terms": ["najestätischer"],
                "path": "meanings.ger[]",
                "levenshtein_distance": 1,
            }
        },
    ).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587680"


def test_should_prefer_exact_matches_to_tokenmatches(pers):
    hits = search_req(
        pers,
        {
            "search": {
                "terms": ["will"],
                "path": "meanings.eng[]",
                "levenshtein_distance": 1,
            }
        },
    ).data
    assert hits[0].doc["meanings"]["eng"][0] == "will"


def test_should_prefer_exact_tokenmatches_to_fuzzy_text_hits(pers):
    hits = search_req(
        pers,
        {
            "search": {
                "terms": ["karl"],
                "path": "meanings.eng[]",
                "levenshtein_distance": 1,
            }
        },
    ).data
    assert hits[0].doc["meanings"]["eng"][0] == "karl der große"


# ---------------------------------------------------------------- tokenize config


def test_search_word_non_tokenized(pers):
    hits = search_req(pers, {"search": {"terms": ["偉容"], "path": "kanji[].text"}}).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587680"


def test_disabled_tokenization(pers):
    hits = search_req(pers, {"search": {"terms": ["tokens"], "path": "nofulltext"}}).data
    assert len(hits) == 0


def test_search_on_non_subobject(pers):
    hits = search_req(pers, {"search": {"terms": ["1587690"], "path": "ent_seq"}}).data
    assert len(hits) == 1


# ---------------------------------------------------------------- and / or


def test_and_connect_hits_same_field(pers):
    hits = search_req(
        pers,
        {
            "and": {
                "queries": [
                    {"search": {"terms": ["aussehen"], "path": "meanings.ger[]"}},
                    {"search": {"terms": ["majestätisches"], "path": "meanings.ger[]"}},
                ]
            }
        },
    ).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587680"


def test_and_connect_hits_different_fields(pers):
    hits = search_req(
        pers,
        {
            "and": {
                "queries": [
                    {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                    {"search": {"terms": ["majestic"], "path": "meanings.eng[]"}},
                ]
            }
        },
    ).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587680"


def test_and_no_hit(pers):
    hits = search_req(
        pers,
        {
            "and": {
                "queries": [
                    {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                    {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                ]
            }
        },
    ).data
    assert len(hits) == 0


def test_and_same_text_in_different_docs(pers):
    hits = search_req(
        pers,
        {
            "and": {
                "queries": [
                    {"search": {"terms": ["words"], "path": "meanings.ger[]"}},
                    {"search": {"terms": ["1000"], "path": "ent_seq"}},
                ]
            }
        },
    ).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1000"


def test_or_connect_hits_with_top(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                        {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                    ]
                }
            },
            "top": 1,
        },
    )
    assert len(res.data) == 1
    assert res.data[0].doc["ent_seq"] == "1587690"


def test_or_connect_hits(pers):
    hits = search_req(
        pers,
        {
            "or": {
                "queries": [
                    {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                    {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                ]
            }
        },
    ).data
    assert len(hits) == 2
    assert hits[0].doc["ent_seq"] == "1587690"


def test_or_connect_same_search(pers):
    hits = search_req(
        pers,
        {
            "or": {
                "queries": [
                    {"search": {"terms": ["awesome"], "path": "field1[].text"}},
                    {"search": {"terms": ["awesome"], "path": "field1[].text"}},
                ]
            }
        },
    ).data
    assert len(hits) == 2
    assert hits[0].doc["commonness"] == 551


def test_or_connect_but_boost_one_term(pers):
    hits = search_req(
        pers,
        {
            "or": {
                "queries": [
                    {
                        "search": {
                            "terms": ["majestät (f)"],
                            "path": "meanings.ger[]",
                            "boost": 2,
                        }
                    },
                    {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                ]
            }
        },
    ).data
    assert len(hits) == 2
    assert hits[0].doc["meanings"]["ger"][0] == "majestätischer Anblick (m)"


# ---------------------------------------------------------------- filters


def test_search_with_filter(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
            "filter": {"search": {"terms": ["1587690"], "path": "ent_seq"}},
        },
    )
    assert len(res.data) == 1


def test_or_with_filter(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                        {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                    ]
                }
            },
            "filter": {"search": {"terms": ["1587690"], "path": "ent_seq"}},
        },
    )
    assert len(res.data) == 1


def test_or_with_filter_reuse_query(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                        {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                    ]
                }
            },
            "filter": {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
        },
    )
    assert len(res.data) == 1


# ---------------------------------------------------------------- boosts


def test_should_find_2_values_from_token(pers):
    res = search_req(pers, {"search": {"terms": ["意慾"], "path": "kanji[].text"}})
    assert len(res.data) == 2


def test_search_and_boosto(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["意慾"], "path": "kanji[].text"}},
            "boost": [
                {"path": "kanji[].commonness", "boost_fun": "Log10", "param": 1}
            ],
        },
    )
    assert len(res.data) == 2


def test_search_and_double_boost(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["awesome"], "path": "field1[].text"}},
            "boost": [
                {"path": "commonness", "boost_fun": "Log10", "param": 1},
                {
                    "path": "field1[].rank",
                    "expression": "10 / $SCORE",
                    "skip_when_score": [0],
                },
            ],
        },
    )
    assert len(res.data) == 2


def test_search_and_boost_anchor(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["意慾"], "path": "kanji[].text"}},
            "boost": [{"path": "commonness", "boost_fun": "Log10", "param": 1}],
        },
    )
    assert res.data[0].doc["commonness"] == 500


def test_rank_boost_on_anchor_higher_search_on_anchor(pers):
    boosted = run(
        pers,
        {
            "search_req": {"search": {"terms": ["COllectif"], "path": "title"}},
            "boost": [{"path": "commonness", "boost_fun": "Log2", "param": 2}],
        },
    ).data
    unboosted = search_req(
        pers, {"search": {"terms": ["COllectif"], "path": "title"}}
    ).data
    assert boosted[0].hit.score > unboosted[0].hit.score


def test_rank_boost_on_anchor_higher_search_on_1_n(pers):
    boosted = run(
        pers,
        {
            "search_req": {"search": {"terms": ["boostemich"], "path": "meanings.ger[]"}},
            "boost": [{"path": "commonness", "boost_fun": "Log2", "param": 2}],
        },
    ).data
    unboosted = search_req(
        pers, {"search": {"terms": ["boostemich"], "path": "meanings.ger[]"}}
    ).data
    assert boosted[0].hit.score > unboosted[0].hit.score


def test_boost_terms(pers):
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
            "boost_term": [{"terms": ["9555"], "path": "ent_seq", "boost": 5.0}],
        },
    )
    assert res.data[0].doc["meanings"]["ger"][0] == "(1) 2 3 super nice weich"


def test_boost_text_locality(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["text"], "path": "meanings.ger[]"}},
                        {"search": {"terms": ["localität"], "path": "meanings.ger[]"}},
                    ]
                }
            },
            "text_locality": True,
        },
    )
    assert res.data[0].doc["meanings"]["ger"][0] == "text localität"


# ---------------------------------------------------------------- why found


def test_should_add_why_found_terms(pers):
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
            "why_found": True,
        },
    )
    assert res.data[0].doc["meanings"]["ger"][0] == "(1) weich"


# ---------------------------------------------------------------- suggest


def test_real_suggest_with_score(pers):
    req = Request.from_dict(
        {
            "suggest": [
                {
                    "terms": ["majes"],
                    "path": "meanings.ger[]",
                    "levenshtein_distance": 0,
                    "starts_with": True,
                }
            ],
            "top": 10,
            "skip": 0,
        }
    )
    results = suggest(pers, req)
    assert [el[0] for el in results] == [
        "majestät",
        "majestät (f)",
        "majestätisches",
        "majestätischer",
        "majestätischer anblick (m)",
        "majestätisches aussehen (n)",
    ]


def test_multi_real_suggest_with_score(pers):
    req = Request.from_dict(
        {
            "suggest": [
                {
                    "terms": ["will"],
                    "path": "meanings.ger[]",
                    "levenshtein_distance": 0,
                    "starts_with": True,
                },
                {
                    "terms": ["will"],
                    "path": "meanings.eng[]",
                    "levenshtein_distance": 0,
                    "starts_with": True,
                },
            ],
            "top": 10,
            "skip": 0,
        }
    )
    results = suggest(pers, req)
    assert [el[0] for el in results] == ["will", "wille", "wille (m)", "will testo"]


def test_suggest_with_token_value_boost(pers):
    req = Request.from_dict(
        {
            "suggest": [
                {
                    "terms": ["begeist"],
                    "path": "meanings.ger[]",
                    "levenshtein_distance": 0,
                    "starts_with": True,
                    "token_value": {
                        "path": "meanings.ger[]",
                        "boost_fun": "Log10",
                        "param": 1,
                    },
                }
            ],
            "top": 10,
            "skip": 0,
        }
    )
    results = suggest(pers, req)
    assert [el[0] for el in results] == [
        "begeisterung",
        "begeistern",
        "begeisterung (f)",
    ]


# ---------------------------------------------------------------- select / read


def test_should_select_on_long_text(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["story"], "path": "mylongtext"}},
            "select": ["mylongtext"],
        },
    )
    assert len(res.data) == 1
    assert (
        res.data[0].doc["mylongtext"]
        == "Prolog:\nthis is a story of a guy who went out to rule the world, but then died. the end"
    )


def test_read_object_only_partly(pers):
    yay = read_data(
        pers,
        4,
        [
            "commonness",
            "ent_seq",
            "meanings.ger[]",
            "kana[].text",
            "kana[].commonness",
            "kana[].romaji",
            "address[].line[]",
        ],
    )
    assert yay == {
        "address": [{"line": ["nuts strees"]}, {"line": ["asdf"]}],
        "commonness": "500",
        "ent_seq": "1587700",
        "meanings": {"ger": ["der test", "das ist ein guter Treffer"]},
        "kana": [{"text": "いよく"}],
    }


def test_read_skip_missing_fields(pers):
    yay = read_data(pers, 3, ["mylongtext"])
    assert yay == {}


def test_read_recreate_complete_object(pers):
    all_props = pers.get_all_fields()
    yay = read_data(pers, 4, all_props)
    assert yay == {
        "id": "1234566",
        "gender": "male",
        "tags": ["awesome", "cool"],
        "sinlge_value_multi": ["wert"],
        "birthDate": "1960-08-19",
        "address": [{"line": ["nuts strees"]}, {"line": ["asdf"]}],
        "commonness": "500",
        "kanji": [{"text": "意慾", "commonness": "20"}],
        "field1": [{"text": "awesome", "rank": "1"}],
        "kana": [{"text": "いよく"}],
        "meanings": {"eng": ["test1"], "ger": ["der test", "das ist ein guter Treffer"]},
        "ent_seq": "1587700",
    }


def test_get_bytes_indexed(pers):
    assert pers.bytes_indexed > 2685


# ---------------------------------------------------------------- highlight api


def test_should_highlight_on_field(pers):
    from veloci_tpu.query.request import RequestSearchPart
    from veloci_tpu.search.field_search import highlight_field

    req = RequestSearchPart(
        terms=["story"],
        path="mylongtext",
        levenshtein_distance=0,
        starts_with=True,
        snippet=True,
        top=10,
        skip=0,
    )
    results = highlight_field(pers, req)
    assert [el[0] for el in results] == [
        "Prolog:\nthis is a <b>story</b> of a guy who went ... "
    ]


def test_should_highlight_on_1_n_field(pers):
    from veloci_tpu.query.request import RequestSearchPart
    from veloci_tpu.search.field_search import highlight_field

    req = RequestSearchPart(
        terms=["story"],
        path="tags[]",
        levenshtein_distance=0,
        starts_with=True,
        snippet=True,
        top=10,
        skip=0,
    )
    results = highlight_field(pers, req)
    assert [el[0] for el in results] == [
        "Prolog:\nthis is a <b>story</b> of a guy who went ... "
    ]


def test_should_highlight_on_sub_level_field(pers):
    from veloci_tpu.query.request import RequestSearchPart
    from veloci_tpu.search.field_search import highlight_field

    req = RequestSearchPart(
        terms=["story"],
        path="sub_level[].text",
        levenshtein_distance=0,
        starts_with=True,
        snippet=True,
        top=10,
        skip=0,
    )
    results = highlight_field(pers, req)
    assert [el[0] for el in results] == [
        "Prolog:\nthis is <b>story</b> of a guy who went ... "
    ]


# ---------------------------------------------------------------- explain


def test_simple_search_explained(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["urge"],
                    "path": "meanings.eng[]",
                    "options": {"explain": True},
                }
            }
        },
    )
    hits = res.data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587690"
    assert len(hits[0].explain) == 2


def test_or_query_explained(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                        {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                    ]
                }
            },
            "explain": True,
        },
    )
    hits = res.data
    assert len(hits) == 2
    assert hits[0].doc["ent_seq"] == "1587690"
    assert len(hits[0].explain) == 5


def test_explain_plan_contents(pers):
    from veloci_tpu import explain_plan

    req = Request.from_dict(
        {
            "search_req": {
                "search": {
                    "terms": ["weich"],
                    "path": "meanings.ger[]",
                    "levenshtein_distance": 1,
                }
            },
            "boost": [{"path": "commonness", "boost_fun": "Log2", "param": 2}],
        }
    )
    explain = explain_plan(req, pers).lower()
    assert "weich" in explain
    assert "meanings.ger[]" in explain
    assert "boost" in explain


def test_should_or_connect_search_and_boost_anchor(pers):
    hits = search_req(
        pers,
        {
            "or": {
                "queries": [
                    {
                        "search": {
                            "terms": ["awesome"],
                            "path": "field1[].text",
                            "options": {
                                "boost": [
                                    {
                                        "path": "field1[].rank",
                                        "boost_fun": "Log10",
                                        "param": 1,
                                    }
                                ]
                            },
                        }
                    },
                    {
                        "search": {
                            "terms": ["urge"],
                            "path": "meanings.eng[]",
                            "options": {
                                "boost": [
                                    {
                                        "path": "commonness",
                                        "boost_fun": "Log10",
                                        "param": 1,
                                    }
                                ]
                            },
                        }
                    },
                ]
            }
        },
    ).data
    assert hits[0].doc["commonness"] == 20


def test_log10_boost_explained_dual_entries(pers):
    """Log10 boosts emit TWO Boost explain entries: the log10 factor, then
    the final post-boost score (reference apply_boost,
    boost.rs:292-309 + :371-374)."""
    import math

    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["意慾"], "path": "kanji[].text"}},
            "boost": [{"path": "commonness", "boost_fun": "Log10", "param": 1}],
            "explain": True,
        },
    )
    hit = res.data[0]
    assert hit.doc["commonness"] == 500
    boosts = [e["Boost"] for e in hit.explain if "Boost" in e]
    assert len(boosts) == 2
    factor, final = boosts
    assert abs(factor - math.log10(501)) < 1e-4
    assert abs(final - hit.hit.score) < 1e-5


# ------------------------------------------- remaining reference test ports


def test_and_connect_hits_different_fields_no_hit(pers):
    res = run(
        pers,
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
                        {"search": {"terms": ["urge"], "path": "meanings.eng[]"}},
                    ]
                }
            }
        },
    )
    assert len(res.data) == 0


def test_and_connect_different_fields_same_text(pers):
    """tests.rs and_connect_hits_different_fields_same_text_alle_meine_words…"""
    res = run(
        pers,
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["words"], "path": "meanings.ger[]"}},
                        {"search": {"terms": ["1000"], "path": "ent_seq"}},
                    ]
                }
            }
        },
    )
    assert len(res.data) == 1
    assert res.data[0].doc["ent_seq"] == "1000"


def test_two_tokens_to_the_same_anchor(pers):
    """tests.rs two_tokens_h_test_fn_the_same_anchor: both tokens of
    'majestätischer Anblick' resolve to ONE anchor hit."""
    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["majestätischer"],
                    "path": "meanings.ger[]",
                    "levenshtein_distance": 1,
                }
            }
        },
    )
    assert len(res.data) == 1


def test_boost_terms_and_from_cache(pers):
    """tests.rs should_boost_terms_and_from_cache: repeated queries hit the
    term-boost cache and stay deterministic."""
    req = {
        "search_req": {
            "search": {
                "terms": ["weich"],
                "path": "meanings.ger[]",
                "levenshtein_distance": 1,
            }
        },
        "boost_term": [{"terms": ["9555"], "path": "ent_seq", "boost": 5.0}],
    }
    for _ in range(3):
        res = run(pers, req)
        assert res.data[0].doc["meanings"]["ger"][0] == "(1) 2 3 super nice weich"


def test_prefer_short_results(pers):
    """tests.rs should_prefer_short_results: with phrase pairs, the shorter
    exact title ranks first."""
    from veloci_tpu.query.generator import (
        SearchQueryGeneratorParameters,
        search_query,
    )
    from veloci_tpu import search as vsearch, search_to_result_with_doc

    params = SearchQueryGeneratorParameters(
        search_term="die erbin taschenbuch", phrase_pairs=True, explain=True
    )
    req = search_query(pers, params)
    res = search_to_result_with_doc(pers, vsearch(req, pers), req.select)
    assert res.data[0].doc["title"] == "Die Erbin"


def test_field_search_return_terms(pers):
    """tests.rs should_use_search_on_field_for_suggest_without_sorting_etc:
    raw field search returns the matched term texts."""
    from veloci_tpu.query.request import RequestSearchPart
    from veloci_tpu.search.field_search import get_term_ids_in_field

    part = RequestSearchPart.from_dict(
        {
            "terms": ["majes"],
            "path": "meanings.ger[]",
            "levenshtein_distance": 0,
            "starts_with": True,
        }
    )
    res = get_term_ids_in_field(pers, part, return_term=True)
    assert sorted(res.terms.values()) == [
        "Majestät",
        "Majestät (f)",
        "majestätischer",
        "majestätischer Anblick (m)",
        "majestätisches",
        "majestätisches Aussehen (n)",
    ]


def test_exact_match_with_boost():
    """tests.rs test_exact_match_with_boost: an exact match outranks many
    partial hits even against a stronger boost column."""
    data = "\n".join(
        [
            json.dumps(
                {
                    "definition": ["home", "family"],
                    "traditional": "家",
                    "commonness": 5.5318,
                }
            ),
            json.dumps(
                {
                    "definition": [
                        "place to return to",
                        "home",
                        "final destination",
                        "ending",
                    ],
                    "traditional": "歸宿",
                    "commonness": 3.1294,
                }
            ),
        ]
    )
    config = '["commonness".boost]\nboost_type = "f32"\n'
    p = Persistence.create_im(data, config)
    res = run(
        p,
        {
            "search_req": {
                "search": {
                    "terms": ["home"],
                    "path": "definition[]",
                    "levenshtein_distance": 0,
                }
            },
            "boost": [{"path": "commonness", "boost_fun": "Log10", "param": 1}],
        },
    )
    assert res.data[0].doc["traditional"] == "家"
    assert res.data[1].doc["traditional"] == "歸宿"


def test_prefer_exact_match_over_multi_hit():
    """tests.rs test_prefer_exact_match_over_multi_hit."""
    data = "\n".join(
        [
            json.dumps({"definition": ["home"], "traditional": "家"}),
            json.dumps(
                {
                    "definition": [
                        "to live at home",
                        "to stay at home",
                        "home (schooling etc)",
                        "le home",
                        "ok home",
                        "so much home",
                    ],
                    "traditional": "居家",
                }
            ),
        ]
    )
    p = Persistence.create_im(data, "{}")
    res = run(
        p,
        {
            "search_req": {
                "search": {
                    "terms": ["home"],
                    "path": "definition[]",
                    "levenshtein_distance": 0,
                }
            }
        },
    )
    assert res.data[0].doc["traditional"] == "家"
    assert res.data[1].doc["traditional"] == "居家"


def test_create_index_from_file(tmp_path):
    """tests.rs test_create_index_from_file."""
    from tests.corpus import TEST_CONFIG, data_ndjson

    f = tmp_path / "data.json"
    f.write_text(data_ndjson())
    p = Persistence.create_from_file(str(f), TEST_CONFIG)
    res = run(
        p,
        {"search_req": {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}},
    )
    assert len(res.data) == 1
