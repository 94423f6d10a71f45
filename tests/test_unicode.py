"""Unicode end-to-end: CJK, emoji (surrogate pairs in \\u escapes), combining
marks and umlauts through the native parser, tokenizer, dictionary and search.
"""

import json

import pytest

from veloci_tpu import Persistence, Request, search, search_to_result_with_doc

DOCS = [
    {"title": "日本語の辞書", "tag": "jp"},  # 日本語の辞書
    {"title": "café au lait", "tag": "fr"},
    {"title": "straße und gässe", "tag": "de"},
    # astral-plane emoji written as a surrogate pair escape
    {"title": json.loads('"\\ud83d\\ude00 grinning face"'), "tag": "emoji"},
    {"title": "naïve résumé", "tag": "acc"},
]


@pytest.fixture(scope="module", params=["native", "python"])
def pers(request, monkeypatch_module=None):
    import os

    nd = "\n".join(json.dumps(d, ensure_ascii=False) for d in DOCS)
    if request.param == "python":
        os.environ["VELOCI_TPU_NO_NATIVE"] = "1"
        import veloci_tpu.native as native_mod

        # reset the module-level cache so the env takes effect
        native_mod._LIB = None
        native_mod._LIB_TRIED = False
        try:
            p = Persistence.create_from_str(nd, "{}")
        finally:
            del os.environ["VELOCI_TPU_NO_NATIVE"]
            native_mod._LIB = None
            native_mod._LIB_TRIED = False
        return p
    return Persistence.create_from_str(nd, "{}")


def _hits(pers, term, **kw):
    req = {"search_req": {"search": {"terms": [term], "path": "title", **kw}}}
    res = search(Request.from_dict(req), pers)
    return search_to_result_with_doc(pers, res, None)


def test_cjk_exact(pers):
    res = _hits(pers, "日本語の辞書")
    assert res.num_hits == 1
    assert res.data[0].doc["tag"] == "jp"


def test_accented_exact_and_case(pers):
    assert _hits(pers, "café").num_hits == 1
    assert _hits(pers, "CAFÉ").num_hits == 1  # ignore-case over non-ASCII
    assert _hits(pers, "straße").num_hits == 1


def test_emoji_title_roundtrip(pers):
    res = _hits(pers, "grinning")
    assert res.num_hits == 1
    assert "\U0001f600" in res.data[0].doc["title"]


def test_accent_fuzzy(pers):
    # "naive" vs "naïve" is distance 1
    res = _hits(pers, "naive", levenshtein_distance=1)
    assert res.num_hits >= 1
    assert any(h.doc["tag"] == "acc" for h in res.data)
