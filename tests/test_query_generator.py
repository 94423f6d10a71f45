"""Query generator tests — port of reference tests/all/test_query_generator.rs."""

import pytest

from veloci_tpu import Persistence, search, search_to_result_with_doc
from veloci_tpu.error import AllFieldsFilteredError, FieldNotFoundError
from veloci_tpu.query.generator import (
    SearchQueryGeneratorParameters,
    search_query,
)
from veloci_tpu.query.parser import Options

import json

CONFIG = """
["*GLOBAL*"]
    features = ["All"]
["commonness"]
    facet = true
["commonness".boost]
    boost_type = "f32"
["ent_seq".fulltext]
    tokenize = true
["nofulltext".fulltext]
    tokenize = false
["tags[]"]
    facet = true
["field1[].rank".boost]
    boost_type = "f32"
["field1[].text"]
    tokenize = true
["kanji[].text"]
    tokenize = true
["meanings.ger[]"]
    stopwords = ["stopword"]
    fulltext.tokenize = true
["meanings.eng[]".fulltext]
    tokenize = true
["kanji[].commonness".boost]
    boost_type = "f32"
["kana[].commonness".boost]
    boost_type = "f32"
"""

DATA = [
    {"commonness": 123456, "ent_seq": "99999", "tags": ["nice", "cool"]},
    {
        "ent_seq": "1337",
        "commonness": 20,
        "tags": ["nice", "cool", "ent_seq:99999"],
        "kanji": [{"text": "偉容", "commonness": 0}, {"text": "威容", "commonness": 5}],
        "kana": [{"text": "いよう", "romaji": "Iyou", "commonness": 5}],
        "meanings": {
            "eng": ["will testo"],
            "ger": [
                "majestätischer Anblick (m)",
                "majestätisches Aussehen (n)",
                "Majestät (f)",
            ],
        },
    },
    {
        "ent_seq": "1587690",
        "commonness": 20,
        "tags": ["nice"],
        "kanji": [{"text": "意欲", "commonness": 40}, {"text": "意慾", "commonness": 0}],
        "kana": [{"text": "いよく", "romaji": "Iyoku", "commonness": 40}],
        "meanings": {
            "eng": ["will", "urge", "having a long torso"],
            "ger": ["Wollen (n)", "Wille (m)", "Begeisterung (f)", "begeistern"],
        },
    },
    {
        "id": 1234566,
        "tags": ["awesome", "cool"],
        "commonness": 500,
        "kanji": [{"text": "意慾", "commonness": 20}],
        "kana": [{"text": "いよく"}],
        "ent_seq": "1587700",
    },
    {"commonness": 515151, "ent_seq": "25", "tags": ["nice", "cool"]},
    {"commonness": 30, "title": "COllectif", "meanings": {"ger": ["boostemich"]}},
    {"commonness": 30, "float_value": 5.123, "ent_seq": "26", "tags": ["nice", "coolo"]},
    {"commonness": 20, "ent_seq": "27", "my_bool": True, "tags": ["Eis", "cool"]},
    {"commonness": 20, "ent_seq": "28", "tags": ["nice", "cool"]},
]


@pytest.fixture(scope="module")
def pers():
    nd = "\n".join(json.dumps(d, ensure_ascii=False) for d in DATA)
    return Persistence.create_from_str(nd, CONFIG)


def run_qp(pers, params):
    req = search_query(pers, params)
    res = search(req, pers)
    return search_to_result_with_doc(pers, res, req.select)


def P(**kw):
    return SearchQueryGeneratorParameters(**kw)


def test_simple_search_querygenerator(pers):
    hits = run_qp(pers, P(search_term="urge")).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587690"
    assert hits[0].doc["commonness"] == 20
    assert hits[0].doc["tags"] == ["nice"]


def test_attributed_search(pers):
    hits = run_qp(pers, P(search_term="ent_seq:99999")).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "99999"


def test_disabled_attributed_search(pers):
    hits = run_qp(
        pers,
        P(search_term="ent_seq:99999", parser_options=Options(no_attributes=True)),
    ).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1337"


def test_or_connect(pers):
    hits = run_qp(pers, P(search_term="urge OR いよく")).data
    assert len(hits) == 3
    assert hits[0].doc["ent_seq"] == "1587690"


def test_and_connect(pers):
    hits = run_qp(pers, P(search_term="urge AND いよく")).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587690"


def test_and_empty_stopword_list(pers):
    hits = run_qp(pers, P(search_term="urge AND いよく", stopword_lists=[])).data
    assert len(hits) == 1


def test_and_stopword_list(pers):
    hits = run_qp(pers, P(search_term="urge AND いよく", stopword_lists=["en"])).data
    assert len(hits) == 1
    assert hits[0].doc["ent_seq"] == "1587690"


def test_complex_from_json(pers):
    params = SearchQueryGeneratorParameters.from_dict(
        {
            "search_term": "will",
            "top": 10,
            "facets": ["commonness", "kanji[].commonness"],
            "levenshtein": 0,
            "boost_fields": {"meanings.eng[]": 1.5},
        }
    )
    hits = run_qp(pers, params).data
    assert len(hits) == 2
    assert hits[0].doc["meanings"]["eng"][0] == "will"

    params = SearchQueryGeneratorParameters.from_dict(
        {
            "search_term": "will",
            "top": 10,
            "facets": ["commonness", "kanji[].commonness"],
            "levenshtein": 0,
            "boost_fields": {"meanings.eng[]": 1.5},
            "boost_terms": {"meanings.ger[]:majestätisches Aussehen (n)": 20.0},
        }
    )
    hits = run_qp(pers, params).data
    assert len(hits) == 2
    assert hits[0].doc["meanings"]["eng"][0] == "will testo"


def test_and_no_hit(pers):
    hits = run_qp(pers, P(search_term="urge AND いよく AND awesome")).data
    assert len(hits) == 0


def test_wildcard_starts_with(pers):
    hits = run_qp(pers, P(search_term="awes*")).data
    assert len(hits) == 1
    hits = run_qp(pers, P(search_term="いよ*")).data
    assert len(hits) == 3


def test_wildcard_starts_with_with_levenshtein(pers):
    hits = run_qp(pers, P(search_term="awesam*")).data
    assert len(hits) == 1


def test_contains_search_with_regex_starts_with(pers):
    hits = run_qp(pers, P(search_term="*wesom*", fields=["tags[]"])).data
    assert len(hits) == 1


def test_contains_search_with_regex(pers):
    hits = run_qp(pers, P(search_term="*we*some", fields=["tags[]"])).data
    assert len(hits) == 1


def test_contains_search_has_no_levenshtein(pers):
    hits = run_qp(pers, P(search_term="tags[]:*wesam*")).data
    assert len(hits) == 0


def test_no_matching_fields_from_field_list(pers):
    with pytest.raises(AllFieldsFilteredError):
        search_query(pers, P(search_term="awes*", fields=["notexistingfield"]))


def test_no_matching_fields_from_query(pers):
    with pytest.raises(FieldNotFoundError):
        search_query(pers, P(search_term="notexistingfield:awes*"))
