"""Generate the frozen parity goldens (tests/goldens.json).

The north-star acceptance is top-10 parity with the Rust reference on
jmdict (BASELINE.json) — but the reference toolchain is not present in this
image and jmdict.json is a git-LFS stub (documented in BASELINE.md), so the
goldens pin THIS engine's results for the ported reference test corpus and
a deterministic synthetic corpus: any silent ranking/scoring drift fails CI.

Regenerate deliberately with: python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_battery():
    from corpus import TEST_CONFIG, TOKEN_VALUES, data_ndjson
    from test_device_path import REQUESTS
    from veloci_tpu import Persistence, Request, add_token_values_to_tokens, search
    from veloci_tpu.query.generator import (
        SearchQueryGeneratorParameters,
        search_query,
    )

    pers = Persistence.create_from_str(data_ndjson(), TEST_CONFIG)
    add_token_values_to_tokens(pers, TOKEN_VALUES[0], TOKEN_VALUES[1])

    goldens = {"corpus": "tests/corpus.py", "entries": []}

    for i, req_json in enumerate(REQUESTS):
        res = search(Request.from_dict(dict(req_json)), pers)
        goldens["entries"].append(
            {
                "kind": "request",
                "request": req_json,
                "num_hits": res.num_hits,
                "top": [[h.id, round(float(h.score), 4)] for h in res.data[:10]],
                "facets": res.facets,
            }
        )

    # query-language goldens (generator -> search)
    for q in [
        "urge",
        "urge OR majestät",
        "majestat~1",
        'meanings.ger[]:majestät',
        '"die majestät"',
        "haus",
    ]:
        req = search_query(pers, SearchQueryGeneratorParameters(search_term=q))
        res = search(req, pers)
        goldens["entries"].append(
            {
                "kind": "query",
                "query": q,
                "num_hits": res.num_hits,
                "top": [[h.id, round(float(h.score), 4)] for h in res.data[:10]],
            }
        )

    # deterministic synthetic corpus (the bench shape at small scale)
    from bench import build_corpus

    corpus, vocab = build_corpus(5000)
    p2 = Persistence.create_from_str(corpus, "{}")
    for term in [str(vocab[3]), str(vocab[50]), str(vocab[700])]:
        res = search(
            Request.from_dict(
                {"search_req": {"search": {"terms": [term], "path": "title"}}}
            ),
            p2,
        )
        goldens["entries"].append(
            {
                "kind": "synthetic",
                "term": term,
                "num_hits": res.num_hits,
                "top": [[h.id, round(float(h.score), 4)] for h in res.data[:10]],
            }
        )
    return goldens


if __name__ == "__main__":
    out = build_battery()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "goldens.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    print(f"wrote {path}: {len(out['entries'])} entries")
