"""The vectorised suggest fast path must be indistinguishable from the
reference-faithful path — including case-fold duplicate handling (smallest
id wins), cross-field merge ties (earlier part wins equal scores), skip
windows, part boosts, and unicode prefixes."""

import json

import numpy as np
import pytest

import importlib

ex_mod = importlib.import_module("veloci_tpu.search.executor")
from veloci_tpu import Persistence, Request

suggest = ex_mod.suggest


@pytest.fixture(scope="module")
def pers():
    rng = np.random.default_rng(3)
    words = (
        ["Apple", "apple", "APPLEs", "applet", "appletree", "apfel"]
        + ["Ärger", "ärgerlich", "ärger"]
        + [f"app{i}" for i in range(30)]
        + [f"ap{'p' * (i % 6)}le{i}" for i in range(40)]
        + ["zz"]
    )
    docs = []
    for i in range(400):
        t1 = " ".join(rng.choice(words, size=3))
        t2 = " ".join(rng.choice(words, size=2))
        docs.append(json.dumps({"title": t1, "sub": t2, "nr": str(i)}))
    return Persistence.create_from_str("\n".join(docs), "{}")


def _slow(persistence, request, monkeypatch):
    monkeypatch.setattr(ex_mod, "_suggest_fast", lambda *_a: None)
    try:
        return suggest(persistence, request)
    finally:
        monkeypatch.undo()


CASES = [
    {"suggest": [{"terms": ["app"], "path": "title", "starts_with": True}], "top": 5},
    {"suggest": [{"terms": ["Appl"], "path": "title", "starts_with": True}], "top": 10},
    {"suggest": [{"terms": ["ap"], "path": "title", "starts_with": True}], "top": 7, "skip": 3},
    {"suggest": [{"terms": ["är"], "path": "title", "starts_with": True}], "top": 10},
    {  # two fields, equal-score cross-part ties -> earlier part wins
        "suggest": [
            {"terms": ["app"], "path": "title", "starts_with": True},
            {"terms": ["app"], "path": "sub", "starts_with": True},
        ],
        "top": 12,
    },
    {  # part boost scales scores before the merge
        "suggest": [
            {"terms": ["app"], "path": "title", "starts_with": True, "boost": 0.5},
            {"terms": ["app"], "path": "sub", "starts_with": True},
        ],
        "top": 10,
    },
    {"suggest": [{"terms": ["zz"], "path": "title", "starts_with": True}], "top": 3},
    {"suggest": [{"terms": ["nohit"], "path": "title", "starts_with": True}], "top": 3},
    {"suggest": [{"terms": [""], "path": "title", "starts_with": True}], "top": 9},
]


@pytest.mark.parametrize("case", CASES)
def test_fast_path_parity(pers, case, monkeypatch):
    req = Request.from_dict(case)
    fast = ex_mod._suggest_fast(pers, req)
    assert fast is not None, "fast path must engage for this shape"
    want = _slow(pers, Request.from_dict(case), monkeypatch)
    assert fast == want


def test_fast_path_randomized(pers, monkeypatch):
    rng = np.random.default_rng(11)
    prefixes = ["a", "ap", "app", "appl", "apple", "applet", "är", "z", "q"]
    for _ in range(60):
        p = str(rng.choice(prefixes))
        case = {
            "suggest": [{"terms": [p], "path": "title", "starts_with": True}],
            "top": int(rng.integers(1, 15)),
        }
        if rng.random() < 0.4:
            case["skip"] = int(rng.integers(0, 5))
        req = Request.from_dict(case)
        fast = ex_mod._suggest_fast(pers, req)
        assert fast is not None
        want = _slow(pers, Request.from_dict(case), monkeypatch)
        assert fast == want, case


def test_fast_path_declines_unsupported(pers):
    # fuzzy suggest (lev > 0 after cap) must fall back
    req = Request.from_dict(
        {
            "suggest": [
                {
                    "terms": ["appl"],
                    "path": "title",
                    "starts_with": True,
                    "levenshtein_distance": 1,
                }
            ],
            "top": 5,
        }
    )
    assert ex_mod._suggest_fast(pers, req) is None
    assert suggest(pers, req)  # full path still answers


def test_suggest_batch_matches_sequential(pers):
    reqs = [
        Request.from_dict(
            {
                "suggest": [
                    {"terms": [p], "path": "title", "starts_with": True}
                ],
                "top": 6,
            }
        )
        for p in ["a", "ap", "app", "är", "zz", "nohit"]
    ]
    batch = ex_mod.suggest_batch(pers, reqs)
    assert batch == [suggest(pers, r) for r in reqs]
