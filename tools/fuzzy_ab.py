"""A/B the plain single-leaf fuzzy serving routes on the live backend.

Routes (both through the public `search_batch`):
  fused : VELOCI_FUZZY_VIA_TREE=0 — the fully-fused sweep+resolve kernel
          with the optimistic capacity ladder (`_run_fuzzy_group`).
  tree  : VELOCI_FUZZY_VIA_TREE=1 — ONE windowed prefetch sweep per batch,
          then the sorted tree kernel at each query's KNOWN posting-total
          bucket (the generator-shape machinery).

Each route warms until its adaptive hints / compile shapes stabilise
(bounded), then reports the median of 3 timed passes, so the comparison is
steady-state serving — the number a long-running server sees.

Usage: python tools/fuzzy_ab.py [n_queries] [n_docs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (corpus + query helpers; no side effects on import)
from veloci_tpu import Persistence  # noqa: E402
from veloci_tpu.query.request import Request  # noqa: E402
from veloci_tpu.search.batch import search_batch  # noqa: E402


def main() -> None:
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    corpus, vocab = bench.build_corpus(n_docs)
    pers = Persistence.create_from_str(corpus, bench.BENCH_CONFIG)
    fuzzy_terms, _q, _l = bench.fuzzy_query_arrays(vocab, nq)
    reqs = [
        Request.from_dict(
            {
                "search_req": {
                    "search": {
                        "terms": [t],
                        "path": "title",
                        "levenshtein_distance": 2,
                    }
                },
                "top": 10,
            }
        )
        for t in fuzzy_terms
    ]

    baseline_hits = None
    for mode, flag in (("fused", "0"), ("tree", "1")):
        os.environ["VELOCI_FUZZY_VIA_TREE"] = flag
        # warm to the hint/compile fixed point: stop when a pass is within
        # 20% of the previous one (or after 6 passes)
        prev = None
        for i in range(6):
            t0 = time.perf_counter()
            res = search_batch(reqs, pers)
            dt = time.perf_counter() - t0
            print(f"  [{mode}] warm pass {i}: {dt * 1e3:.1f} ms", flush=True)
            if prev is not None and dt < prev * 1.2 and i >= 1:
                break
            prev = dt
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = search_batch(reqs, pers)
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        sig = [(r.num_hits, tuple(h.id for h in r.data)) for r in res]
        if baseline_hits is None:
            baseline_hits = sig
            parity = "ref"
        else:
            parity = "OK" if sig == baseline_hits else "MISMATCH"
        print(
            f"[{mode}] {nq / med:.0f} QPS serving e2e "
            f"({med * 1e3:.1f} ms/batch, passes {[f'{t * 1e3:.0f}' for t in times]}) "
            f"parity={parity}",
            flush=True,
        )


if __name__ == "__main__":
    main()
