"""Why-found / highlighting tests — port of reference tests/all/test_why_found.rs."""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc

CONFIG = """
["*GLOBAL*"]
features = ['All']
[richtig.fulltext]
tokenize = true

[not_tokenized.fulltext]
tokenize = false

["not_tokenized_1_n[]".fulltext]
tokenize = false

[custom_tokenized.fulltext]
    tokenize = true
    tokenize_on_chars = ['§', '<']
[url.fulltext]
    tokenize = true
    tokenize_on_chars = ['/', ':', '.']
"""

DATA = [
    {
        "url": "https://github.com/PSeitz/veloci",
        "richtig": "schön super",
        "viele": ["nette", "leute"],
    },
    {
        "not_tokenized": "ID1000",
        "not_tokenized_1_n": ["ID1000"],
        "custom_tokenized": "test§_ cool _",
        "richtig": "hajoe genau",
    },
    {
        "not_tokenized": "ID2000",
        "not_tokenized_1_n": ["ID2000"],
        "richtig": "shön",
        "custom_tokenized": "<<cool>>",
        "viele": [
            "treffers",
            "und so",
            "super treffers",
            "ein längerer Text, um zu checken, dass da nicht umsortiert wird",
        ],
    },
    {"buch": "Taschenbuch (kartoniert)", "viele": ["super treffers"]},
]


@pytest.fixture(scope="module")
def pers():
    nd = "\n".join(json.dumps(d, ensure_ascii=False) for d in DATA)
    return Persistence.create_from_str(nd, CONFIG)


def run(pers, req_json):
    req = Request.from_dict(req_json)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def test_get_number_of_docs(pers):
    assert pers.num_docs == 4


def test_should_tokenize_url(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["veloci"], "path": "url"}},
            "why_found": True,
        },
    )
    assert len(res.data) == 1
    assert res.data[0].why_found["url"] == ["https://github.com/PSeitz/<b>veloci</b>"]

    res = run(pers, {"search_req": {"search": {"terms": ["pseitz"], "path": "url"}}})
    assert len(res.data) == 1


def test_highlight_custom_tokenized(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["test"], "path": "custom_tokenized"}},
            "why_found": True,
        },
    )
    assert res.data[0].why_found["custom_tokenized"] == ["<b>test</b>§_ cool _"]

    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["§"], "path": "custom_tokenized"}},
            "why_found": True,
        },
    )
    assert res.data[0].why_found["custom_tokenized"] == ["test<b>§</b>_ cool _"]

    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["_ cool _"], "path": "custom_tokenized"}},
            "why_found": True,
        },
    )
    assert res.data[0].why_found["custom_tokenized"] == ["test§<b>_ cool _</b>"]

    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["<<"], "path": "custom_tokenized"}},
            "why_found": True,
        },
    )
    assert res.data[0].why_found["custom_tokenized"] == ["<b><<</b>cool>>"]


def test_highlight_complete_text_hit(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["<<cool>>"], "path": "custom_tokenized"}},
            "why_found": True,
        },
    )
    assert res.data[0].why_found["custom_tokenized"] == ["<b><<cool>></b>"]


def test_highlight_untokenized(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["ID1000"], "path": "not_tokenized"}},
            "why_found": True,
        },
    )
    assert res.data[0].why_found["not_tokenized"] == ["<b>ID1000</b>"]


def test_highlight_untokenized_with_select(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["ID1000"], "path": "not_tokenized"}},
            "select": ["not_tokenized"],
            "why_found": True,
        },
    )
    assert res.data[0].why_found["not_tokenized"] == ["<b>ID1000</b>"]


def test_highlight_untokenized_1_n(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {"terms": ["ID1000"], "path": "not_tokenized_1_n[]"}
            },
            "why_found": True,
        },
    )
    assert res.data[0].why_found["not_tokenized_1_n[]"] == ["<b>ID1000</b>"]


def test_highlight_untokenized_1_n_with_select(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {"terms": ["ID1000"], "path": "not_tokenized_1_n[]"}
            },
            "select": ["not_tokenized_1_n[]"],
            "why_found": True,
        },
    )
    assert res.data[0].why_found["not_tokenized_1_n[]"] == ["<b>ID1000</b>"]


def test_no_hit_custom_tokenizer_space_not_separator(pers):
    res = run(
        pers,
        {
            "search_req": {"search": {"terms": ["cool"], "path": "custom_tokenized"}},
            "why_found": True,
        },
    )
    assert len(res.data) == 0


def test_why_found_tokens_and_text_ids(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["schön"],
                    "path": "richtig",
                    "levenshtein_distance": 1,
                }
            },
            "why_found": True,
        },
    )
    assert res.data[0].why_found["richtig"] == ["<b>schön</b> super"]
    assert res.data[1].why_found["richtig"] == ["<b>shön</b>"]


def test_why_found_1_n(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["treffers"],
                    "path": "viele[]",
                    "levenshtein_distance": 1,
                }
            },
            "why_found": True,
        },
    )
    assert res.data[0].why_found["viele[]"] == [
        "<b>treffers</b>",
        "super <b>treffers</b>",
    ]


def test_why_found_with_select_long_snippet(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["umsortiert"],
                    "path": "viele[]",
                    "levenshtein_distance": 0,
                }
            },
            "why_found": True,
            "select": ["richtig"],
        },
    )
    assert res.data[0].doc["richtig"] == "shön"
    assert res.data[0].why_found["viele[]"] == [
        " ... zu checken, dass da nicht <b>umsortiert</b> wird"
    ]

    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["umsortiert"],
                    "path": "viele[]",
                    "levenshtein_distance": 0,
                }
            },
            "why_found": True,
        },
    )
    assert res.data[0].doc["richtig"] == "shön"
    assert res.data[0].why_found["viele[]"] == [
        " ... zu checken, dass da nicht <b>umsortiert</b> wird"
    ]


def test_highlight_taschenbuch(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {
                    "terms": ["Taschenbuch"],
                    "path": "buch",
                    "levenshtein_distance": 1,
                }
            },
            "why_found": True,
        },
    )
    assert res.data[0].why_found["buch"] == ["<b>Taschenbuch</b> (kartoniert)"]


def test_highlight_multi_terms(pers):
    res = run(
        pers,
        {
            "search_req": {
                "or": {
                    "queries": [
                        {
                            "search": {
                                "terms": ["Taschenbuch"],
                                "path": "buch",
                                "levenshtein_distance": 1,
                            }
                        },
                        {
                            "search": {
                                "terms": ["kartoniert"],
                                "path": "buch",
                                "levenshtein_distance": 1,
                            }
                        },
                    ]
                }
            },
            "why_found": True,
        },
    )
    assert res.data[0].why_found["buch"] == ["<b>Taschenbuch</b> (<b>kartoniert</b>)"]


def test_regex_why_found(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {"terms": [".*github.com.*"], "path": "url", "is_regex": True}
            },
            "why_found": True,
        },
    )
    assert res.data[0].why_found["url"] == ["<b>https://github.com/PSeitz/veloci</b>"]


def test_regex_why_found_token(pers):
    res = run(
        pers,
        {
            "search_req": {
                "search": {"terms": [".*PSeitz.*"], "path": "url", "is_regex": True}
            },
            "why_found": True,
        },
    )
    assert res.data[0].why_found["url"] == ["https://github.com/<b>PSeitz</b>/veloci"]
