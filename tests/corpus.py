"""Shared test corpus — port of the reference integration-test data
(reference tests/all/tests.rs:10-235 `get_test_data` + index config)."""

import json

TEST_CONFIG = """
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

TEST_DATA = [
    {
        "ignore_field": "",
        "commonness": 123456,
        "ent_seq": "99999",
        "tags": ["nice", "cool"],
    },
    {
        "nofulltext": "my tokens",
        "commonness": 20,
        "tags": ["nice", "cool"],
        "kanji": [
            {"text": "偉容", "commonness": 0},
            {"text": "威容", "commonness": 5},
        ],
        "kana": [{"text": "いよう", "romaji": "Iyou", "commonness": 5}],
        "meanings": {
            "eng": ["karlo", "dignity", "majestic appearance", "will testo"],
            "ger": [
                "majestätischer Anblick (m)",
                "majestätisches Aussehen (n)",
                "Majestät (f)",
            ],
        },
        "ent_seq": "1587680",
    },
    {
        "commonness": 20,
        "tags": ["nice"],
        "kanji": [
            {"text": "意欲", "commonness": 40},
            {"text": "意慾", "commonness": 0},
        ],
        "kana": [{"text": "いよく", "romaji": "Iyoku", "commonness": 40}],
        "meanings": {
            "eng": ["will", "urge", "having a long torso"],
            "ger": ["Wollen (n)", "Wille (m)", "Begeisterung (f)", "begeistern"],
        },
        "ent_seq": "1587690",
    },
    {
        "meanings": {"eng": ["karl der große"]},
    },
    {
        "id": 1234566,
        "gender": "male",
        "tags": ["awesome", "cool"],
        "sinlge_value_multi": ["wert"],
        "birthDate": "1960-08-19",
        "address": [{"line": ["nuts strees"]}, {"line": ["asdf"]}],
        "commonness": 500,
        "kanji": [{"text": "意慾", "commonness": 20}],
        "field1": [{"text": "awesome", "rank": 1}],
        "kana": [{"text": "いよく"}],
        "meanings": {
            "eng": ["test1"],
            "ger": ["der test", "das ist ein guter Treffer"],
        },
        "ent_seq": "1587700",
    },
    {
        "id": 123456,
        "tags": ["nice", "cool"],
        "gender": "female",
        "birthDate": "1950-08-19",
        "address": [{"line": ["71955 Ilene Brook"]}],
        "commonness": 551,
        "kanji": [{"text": "何の", "commonness": 526}],
        "field1": [{"text": "awesome"}, {"text": "nixhit"}],
        "kana": [{"text": "どの", "romaji": "Dono", "commonness": 25}],
        "meanings": {
            "ger": [
                "welch",
                "guter nicht Treffer",
                "alle meine Words",
                "text",
                "localität",
            ]
        },
        "ent_seq": "1920240",
        "mylongtext": "Prolog:\nthis is a story of a guy who went out to rule the world, but then died. the end",
    },
    {
        "pos": ["adj-i"],
        "commonness": 1,
        "misc": [],
        "tags": [
            "nice",
            "cool",
            "Prolog:\nthis is a story of a guy who went out to rule the world, but then died. the end",
        ],
        "kanji": [{"text": "柔らかい", "commonness": 57}],
        "kana": [{"text": "やわらかい", "romaji": "Yawarakai", "commonness": 30}],
        "meanings": {"ger": ["(1) weich", "stopword"]},
        "ent_seq": "1605630",
    },
    {
        "meanings": {"ger": ["(1) 2 3 super nice weich"]},
        "ent_seq": "9555",
    },
    {
        "meanings": {"ger": ["text localität", "alle meine Words"]},
        "ent_seq": "1000",
    },
    {
        "sub_level": [
            {
                "text": "Prolog:\nthis is story of a guy who went out to rule the world, but then died. the end"
            }
        ],
        "commonness": 515151,
        "ent_seq": "25",
        "tags": ["nice", "cool"],
    },
    {"title": "Die Erbin die Sünde", "type": "taschenbuch"},
    {"title": "Die Erbin", "type": "taschenbuch"},
    {"commonness": 30, "title": "COllectif", "meanings": {"ger": ["boostemich"]}},
    {
        "commonness": 30,
        "float_value": 5.123,
        "ent_seq": "26",
        "tags": ["nice", "coolo"],
    },
    {"commonness": 20, "ent_seq": "27", "my_bool": True, "tags": ["Eis", "cool"]},
    {"commonness": 20, "ent_seq": "28", "tags": ["nice", "cool"]},
]

TOKEN_VALUES = (
    json.dumps([{"text": "Begeisterung", "value": 20}]),
    json.dumps({"path": "meanings.ger[]"}),
)


def data_ndjson() -> str:
    return "\n".join(
        json.dumps(d, ensure_ascii=False, separators=(",", ":")) for d in TEST_DATA
    )
