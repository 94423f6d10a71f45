"""Gutenberg-style corpus flow (reference create_test_index.rs gutenberg path):
paragraph documents, phrase boosts, snippets and highlight over longer prose.
"""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc
from veloci_tpu.query.generator import SearchQueryGeneratorParameters, search_query

PARAGRAPHS = [
    "It was the best of times, it was the worst of times, it was the age of wisdom",
    "it was the age of foolishness, it was the epoch of belief",
    "it was the epoch of incredulity, it was the season of Light",
    "it was the season of Darkness, it was the spring of hope",
    "it was the winter of despair, we had everything before us",
    "we had nothing before us, we were all going direct to Heaven",
    "we were all going direct the other way - in short, the period was so far",
    "like the present period, that some of its noisiest authorities insisted",
    "on its being received, for good or for evil, in the superlative degree",
    "of comparison only. There were a king with a large jaw and a queen with",
    "a plain face, on the throne of England; there were a king with a large",
    "jaw and a queen with a fair face, on the throne of France.",
]


@pytest.fixture(scope="module")
def pers():
    docs = [json.dumps({"line": p, "nr": str(i)}) for i, p in enumerate(PARAGRAPHS)]
    config = '{"line": {"fulltext": {"tokenize": true}}}'
    return Persistence.create_from_str("\n".join(docs), config)


def test_phrase_ranks_adjacent_terms_first(pers):
    req = search_query(
        pers,
        SearchQueryGeneratorParameters(search_term="large jaw", phrase_pairs=True),
    )
    res = search_to_result_with_doc(pers, search(req, pers), req.select)
    assert res.num_hits >= 2
    assert "large jaw" in res.data[0].doc["line"]


def test_snippet_highlight_over_prose(pers):
    res = search_to_result_with_doc(
        pers,
        search(
            Request.from_dict(
                {
                    "search_req": {
                        "search": {"terms": ["wisdom"], "path": "line"}
                    },
                    "why_found": True,
                }
            ),
            pers,
        ),
        None,
    )
    assert res.num_hits == 1
    why = res.data[0].why_found
    assert any("<b>wisdom</b>" in v for vals in why.values() for v in vals)


def test_fuzzy_over_prose(pers):
    res = search(
        Request.from_dict(
            {
                "search_req": {
                    "search": {
                        "terms": ["wisdum"],
                        "path": "line",
                        "levenshtein_distance": 1,
                    }
                }
            }
        ),
        pers,
    )
    assert res.num_hits == 1


def test_suggest_over_prose(pers):
    from veloci_tpu import suggest

    req = Request.from_dict(
        {
            "suggest": [
                {"terms": ["incred"], "path": "line", "starts_with": True}
            ],
            "top": 5,
        }
    )
    results = suggest(pers, req)
    assert any(el[0].startswith("incredulity") for el in results)
