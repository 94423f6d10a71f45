"""Device-path verification: run a query battery on a >=64k-doc index and
compare the device executor path against the host path (VELOCI_DEVICE_MIN_DOCS
forced high). Run on the TPU terminal:  python < tools/tpu_verify.py
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    print("backend:", jax.default_backend(), flush=True)
    import sys

    sys.path.insert(0, ".")
    from bench import BENCH_CONFIG, build_corpus

    from veloci_tpu import Persistence, Request, search
    import importlib

    ex = importlib.import_module("veloci_tpu.search.executor")

    corpus, vocab = build_corpus(80000)
    pers = Persistence.create_from_str(corpus, BENCH_CONFIG)
    print("built", pers.num_docs, flush=True)

    queries = [
        {"search_req": {"search": {"terms": ["w1bb"], "path": "title"}}},
        {"search_req": {"search": {"terms": ["w2cc"], "path": "title",
                                   "levenshtein_distance": 1}}},
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["w1bb"], "path": "title"}},
                        {"search": {"terms": ["w3dd"], "path": "title"}},
                    ]
                }
            },
            "top": 20,
        },
        {
            "search_req": {
                "and": {
                    "queries": [
                        {"search": {"terms": ["w1bb"], "path": "title"}},
                        {"search": {"terms": ["w0aa"], "path": "title"}},
                    ]
                }
            }
        },
        {
            "search_req": {"search": {"terms": ["w1bb"], "path": "title"}},
            "filter": {"search": {"terms": ["w0aa"], "path": "title"}},
        },
        {
            "search_req": {"search": {"terms": ["w5ff"], "path": "title",
                                      "starts_with": True,
                                      "levenshtein_distance": 1}},
        },
        # fuzzy-generic: fuzzy leaf + boost + facet fused
        {
            "search_req": {"search": {"terms": ["w2cc"], "path": "title",
                                      "levenshtein_distance": 1}},
            "boost": [{"path": "pop", "boost_fun": "Log10", "param": 1}],
            "facets": [{"field": "cat"}],
            "filter": {"search": {"terms": ["c5"], "path": "cat"}},
        },
        # batched generic path: filter + column boost + facet in one program
        {
            "search_req": {"search": {"terms": ["w1bb"], "path": "title"}},
            "filter": {"search": {"terms": ["c3"], "path": "cat"}},
            "boost": [{"path": "pop", "boost_fun": "Log10", "param": 1}],
            "facets": [{"field": "cat"}],
        },
        {
            "search_req": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["w1bb"], "path": "title"}},
                        {"search": {"terms": ["w3dd"], "path": "title"}},
                    ]
                }
            },
            "boost": [{"path": "pop", "boost_fun": "Multiply", "param": 2}],
            "facets": [{"field": "cat", "top": 3}],
            "filter": {
                "or": {
                    "queries": [
                        {"search": {"terms": ["c1"], "path": "cat"}},
                        {"search": {"terms": ["c2"], "path": "cat"}},
                    ]
                }
            },
        },
    ]

    failures = 0
    for qi, q in enumerate(queries):
        # device path (num_docs >= threshold -> device)
        ex.SMALL_DOCS = 1
        r_dev = search(Request.from_dict(q), pers)
        # host path
        ex.SMALL_DOCS = 10**9
        r_host = search(Request.from_dict(q), pers)
        ex.SMALL_DOCS = 65536
        ok_hits = r_dev.num_hits == r_host.num_hits
        ok_data = [(h.id, round(h.score, 3)) for h in r_dev.data] == [
            (h.id, round(h.score, 3)) for h in r_host.data
        ]
        status = "OK" if (ok_hits and ok_data) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"  dev : {r_dev.num_hits} {[(h.id, h.score) for h in r_dev.data[:5]]}")
            print(f"  host: {r_host.num_hits} {[(h.id, h.score) for h in r_host.data[:5]]}")
        print(f"query {qi}: {status} ({r_dev.num_hits} hits)", flush=True)

    # batched serving path vs individual searches (device)
    batch_mod = importlib.import_module("veloci_tpu.search.batch")
    search_batch = batch_mod.search_batch

    ex.SMALL_DOCS = 1
    batch_mod.SMALL_DOCS = 1
    reqs = [Request.from_dict(q) for q in queries]
    t0 = time.time()
    batched = search_batch(reqs, pers)
    print(f"search_batch: {len(reqs)} requests in {(time.time()-t0)*1e3:.1f} ms", flush=True)
    for qi, (req, res) in enumerate(zip(reqs, batched)):
        single = search(Request.from_dict(queries[qi]), pers)
        ok = (
            res.num_hits == single.num_hits
            and [(h.id, round(h.score, 3)) for h in res.data]
            == [(h.id, round(h.score, 3)) for h in single.data]
            and (res.facets or None) == (single.facets or None)
        )
        if not ok:
            failures += 1
        print(f"batch {qi}: {'OK' if ok else 'MISMATCH'}", flush=True)
    ex.SMALL_DOCS = 65536
    batch_mod.SMALL_DOCS = 65536

    print("FAILURES:", failures, flush=True)
    assert failures == 0


if __name__ == "__main__":
    main()
