"""Regex / code search tests — port of reference tests/all/test_code_search.rs."""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc
from veloci_tpu.query.generator import SearchQueryGeneratorParameters, search_query
from veloci_tpu.query.parser import Options

CONFIG = """
["*GLOBAL*"]
    features = ["All"]
["filepath".fulltext]
    tokenize = true
    tokenize_on_chars = ['/', '\\\\']
["filename".fulltext]
    tokenize = true
["line".fulltext]
    tokenize = true
["line_number".boost]
    boost_type = "f32"
"""

DATA = [
    {
        "line_number": 1,
        "line": "function myfun(param1: Type1)",
        "filename": "cool.ts",
        "filepath": "all/the/path",
    }
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


def test_regex_search_request_api(pers):
    hits = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": [".*myfun.*type1.*"],
                    "path": "line",
                    "is_regex": True,
                    "ignore_case": True,
                }
            }
        },
    ).data
    assert len(hits) == 1
    assert hits[0].doc["line"] == "function myfun(param1: Type1)"


def test_regex_search_request_api_case_sensitive(pers):
    hits = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": [".*myfun.*type1.*"],
                    "path": "line",
                    "is_regex": True,
                    "ignore_case": False,
                }
            }
        },
    ).data
    assert len(hits) == 0


def test_pattern_code_search_query_generator(pers):
    hits = run_qp(
        pers, SearchQueryGeneratorParameters(search_term="*myfun*Type1*")
    ).data
    assert len(hits) == 1
    assert hits[0].doc["line"] == "function myfun(param1: Type1)"


def test_pattern_code_search_ignore_case(pers):
    hits = run_qp(
        pers, SearchQueryGeneratorParameters(search_term="*myfun*type1*")
    ).data
    assert len(hits) == 1


def test_pattern_code_search_case_sensitive(pers):
    hits = run_qp(
        pers,
        SearchQueryGeneratorParameters(search_term="*myfun*type1*", ignore_case=False),
    ).data
    assert len(hits) == 0


def test_pattern_code_search_no_fuzzy(pers):
    hits = run_qp(
        pers, SearchQueryGeneratorParameters(search_term="*myfun*type2*")
    ).data
    assert len(hits) == 0


def test_token_code_search(pers):
    hits = run_qp(pers, SearchQueryGeneratorParameters(search_term="myfun")).data
    assert len(hits) == 1


def test_token_code_search_disable_parser(pers):
    hits = run_qp(
        pers,
        SearchQueryGeneratorParameters(
            search_term="*myfun(param1: Type1)*",
            parser_options=Options(
                no_parentheses=True, no_attributes=True, no_levensthein=True
            ),
        ),
    ).data
    assert len(hits) == 1


def test_token_code_phrase_pattern(pers):
    hits = run_qp(
        pers, SearchQueryGeneratorParameters(search_term='"*myfun(param1: Type1)*"')
    ).data
    assert len(hits) == 1
