"""Benchmark harness — jmdict-class workload on the TPU.

Measures the BASELINE.md headline metric: exact-term (lev=0) top-10 search
throughput, plus fuzzy d=2, on a synthetic jmdict-scale corpus (the real
jmdict file is an LFS stub in the reference checkout; the corpus here
reproduces its shape: ~100k docs, zipfian vocabulary, multi-token titles).

MEASUREMENT METHODOLOGY (round-2 rewrite; the round-1 harness over-reported
by 2000x because `block_until_ready()` is a no-op through this device
plugin and a scalar D2H sync costs 30ms-7s):

* **Engine time** is measured by running the fused kernel inside an
  on-device ``lax.scan`` at two depths (n1, n2) and differencing the walls:
  ``engine_per_iter = (wall(n2) - wall(n1)) / (n2 - n1)``. The single D2H
  sync cost cancels exactly.
* **Hoist-proofing**: the scan carry perturbs the TERM IDS (an int offset
  that is zero at runtime but opaque to the compiler), so the posting
  slices — the expensive part — cannot be hoisted out of the loop. A
  score-only perturbation is NOT enough (XLA hoists the loop-invariant
  gather; observed).
* **Link time** is reported separately (`link_round_trip_ms`): sequential
  per-request dispatch on this tunnel is link-bound at ~1/30ms regardless
  of engine speed, so the sequential metric characterises the link, not
  the engine.

The reference publishes no numbers (BASELINE.md) and its Rust toolchain is
not present in this image, so ``vs_baseline`` is reported against a measured
single-host CPU proxy: the SAME kernels executed on the host CPU backend
with the SAME scan-differencing methodology. BASELINE.json's acceptance is
>=10x single-core veloci QPS; the CPU proxy stands in for that baseline
until the reference can be run.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))
N_EXACT_QUERIES = int(os.environ.get("BENCH_EXACT_QUERIES", "200"))
N_FUZZY_QUERIES = int(os.environ.get("BENCH_FUZZY_QUERIES", "64"))
TOP_K = 10


def log(*args):
    print(*args, file=sys.stderr, flush=True)


BENCH_CONFIG = """
["*GLOBAL*"]
features = ["All"]
["cat"]
facet = true
["pop".boost]
boost_type = "f32"
"""


def build_corpus(n_docs: int):
    """Deterministic jmdict-shaped corpus: zipfian vocab, 3-9 token titles,
    plus a 16-value facet column ("cat") and an f32 boost column ("pop")
    for the configs-3-5 workload (BASELINE.json)."""
    rng = np.random.default_rng(1234)
    vocab_size = 40_000
    vocab = np.array(
        [f"w{i:x}{'abcdefgh'[i % 8] * (1 + i % 7)}" for i in range(vocab_size)]
    )
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    lengths = rng.integers(3, 10, size=n_docs)
    total_words = int(lengths.sum())
    words = rng.choice(vocab, size=total_words, p=probs)
    pops = rng.integers(1, 1000, size=n_docs)
    out = []
    pos = 0
    for i in range(n_docs):
        ln = lengths[i]
        title = " ".join(words[pos : pos + ln])
        pos += ln
        out.append(
            '{"title": "%s", "ent_seq": "%d", "cat": "c%d", "pop": %d}'
            % (title, i, i % 16, pops[i])
        )
    return "\n".join(out), vocab


def percentile(values, p):
    return float(np.percentile(np.asarray(values), p))


def measure_scan(make_body, n1: int, n2: int, retries: int = 2):
    """Engine ms/iter by differencing two on-device scan depths.

    ``make_body(carry) -> carry`` must thread the carry through a
    hoist-proof data dependency (term ids). Returns (per_iter_s, w1, w2).
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(n):
        def body(carry, _):
            return make_body(carry), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    float(run(n1))  # compile + warm sync
    float(run(n2))
    best = None
    for _ in range(retries):
        t0 = time.perf_counter()
        float(run(n1))
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(n2))
        w2 = time.perf_counter() - t0
        per = (w2 - w1) / (n2 - n1)
        if per > 0 and (best is None or per < best[0]):
            best = (per, w1, w2)
    if best is None:  # degenerate timing (degraded link mid-measure)
        best = (max(w2, 1e-9) / n2, w1, w2)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from veloci_tpu import Persistence

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # host-link health diagnostic. The tunnel intermittently degrades to
    # multi-second round-trips and recovers on its own; wait (bounded) for a
    # healthy link before measuring. The scan-differencing methodology is
    # robust to a slow link (the sync cost cancels), but a degraded window
    # still adds noise — and the first sync after client start can cost
    # 60-100s regardless.
    link_rt_ms = 0.0
    if backend != "cpu":
        probe = jnp.zeros(8)
        probe.block_until_ready()
        t0 = time.perf_counter()
        float(jnp.sum(probe))  # first sync: pays the tunnel warm-up
        log(f"first sync: {time.perf_counter() - t0:.1f}s")

        def _probe_link() -> float:
            t_probe = time.perf_counter()
            for _ in range(5):
                float(jnp.sum(probe))
            return (time.perf_counter() - t_probe) / 5 * 1e3

        wait_budget = float(os.environ.get("BENCH_LINK_WAIT_S", "180"))
        healthy_ms = float(os.environ.get("BENCH_LINK_HEALTHY_MS", "50"))
        deadline = time.time() + wait_budget
        link_rt_ms = _probe_link()
        while link_rt_ms > healthy_ms and time.time() < deadline:
            log(f"link degraded ({link_rt_ms:.2f} ms round-trip); waiting...")
            time.sleep(20)
            link_rt_ms = _probe_link()
        log(f"link round-trip: {link_rt_ms:.2f} ms")

    t0 = time.time()
    corpus, vocab = build_corpus(N_DOCS)
    log(f"corpus generated in {time.time() - t0:.1f}s ({N_DOCS} docs)")

    # warm build first: this VM's first-touch page faults cost ~57us/page,
    # so a cold-process build measures the memory backend, not the indexer;
    # the numpy allocator reuses the pool, making run 2 the steady state
    Persistence.create_from_str(corpus, BENCH_CONFIG)
    t0 = time.time()
    pers = Persistence.create_from_str(corpus, BENCH_CONFIG)
    build_s = time.time() - t0
    log(
        f"index built in {build_s:.1f}s "
        f"({pers.bytes_indexed / build_s / 1e6:.1f} MB/s indexed)"
    )

    dictionary = pers.get_dictionary("title")
    dev = pers.device_field("title")
    num_docs = pers.num_docs
    host_offsets = dev.host_offsets

    # ---- query sets ------------------------------------------------------
    rng = np.random.default_rng(99)
    exact_terms = [str(t) for t in rng.choice(vocab[:5000], size=N_EXACT_QUERIES)]
    fuzzy_terms = []
    for t in rng.choice(vocab[:2000], size=N_FUZZY_QUERIES):
        t = str(t)
        if len(t) > 4:
            t = t[:2] + "x" + t[3:]
        fuzzy_terms.append(t)

    # term ids exactly as the serving path resolves them (search_batch prep)
    tid_list = []
    for term in exact_terms:
        ids = dictionary.get_ignore_case(term)
        tid_list.append(int(ids[0]) if ids else 0)
    tid_host = np.asarray(tid_list, dtype=np.int32)
    counts = host_offsets[tid_host + 1] - host_offsets[tid_host]
    max_count = int(counts.max())
    capacity = 1 << max(6, (max_count - 1).bit_length())
    log(f"exact capacity bucket: {capacity} (max postings {max_count})")

    from veloci_tpu.ops.search_step import batched_single_term_topk

    tids = jnp.asarray(tid_host)
    tscs = jnp.full(len(tid_list), 10.0, jnp.float32)
    # materialise the device arrays OUTSIDE any trace
    offs_d, anc_d, sc_d = dev.offsets, dev.anchors, dev.scores01

    # ---- engine-only batched exact throughput (the headline) -------------
    def exact_body(carry):
        # carry -> int offset (zero at runtime, opaque at compile time)
        # perturbs the term ids so the posting slices cannot be hoisted
        off = (carry * jnp.float32(1e-20)).astype(jnp.int32)
        _ids, scores, _nh = batched_single_term_topk(
            offs_d, anc_d, sc_d, tids + off, tscs,
            capacity=capacity, k=TOP_K,
        )
        return scores[0, 0] * jnp.float32(1e-12)

    n1, n2 = (3, 13) if backend == "cpu" else (5, 45)
    per_iter, w1, w2 = measure_scan(exact_body, n1, n2)
    engine_ms_per_batch = per_iter * 1e3
    qps_batched = len(exact_terms) / per_iter
    log(
        f"[{backend}] exact batched ({len(exact_terms)}/batch): "
        f"{qps_batched:.0f} QPS engine-only, {engine_ms_per_batch:.3f} ms/batch "
        f"(walls {w1*1e3:.0f}/{w2*1e3:.0f} ms)"
    )

    # ---- end-to-end serving (search_batch API: host prep + dispatch + D2H)
    from veloci_tpu import Request
    from veloci_tpu.search.batch import search_batch

    reqs = [
        Request.from_dict(
            {"search_req": {"search": {"terms": [t], "path": "title"}}, "top": TOP_K}
        )
        for t in exact_terms
    ]
    search_batch(reqs, pers)  # warm/compile
    t0 = time.perf_counter()
    res_batch = search_batch(reqs, pers)
    serving_wall = time.perf_counter() - t0
    qps_serving = len(reqs) / serving_wall
    assert res_batch[0].data, "serving path returned no hits"
    log(
        f"[{backend}] serving e2e (search_batch, {len(reqs)} reqs): "
        f"{qps_serving:.0f} QPS ({serving_wall*1e3:.1f} ms incl. host prep + link)"
    )

    # ---- sequential dispatch (link-bound on this tunnel; diagnostic) -----
    from veloci_tpu import search as search_one

    lat = []
    n_seq = min(30, len(reqs))
    search_one(reqs[0], pers)
    for req in reqs[:n_seq]:
        q0 = time.perf_counter()
        r = search_one(req, pers)
        lat.append(time.perf_counter() - q0)
    qps_seq = n_seq / sum(lat)
    log(
        f"[{backend}] exact sequential: {qps_seq:.1f} QPS, "
        f"p50 {percentile(lat,50)*1e3:.2f} ms, p99 {percentile(lat,99)*1e3:.2f} ms "
        f"(link-bound: {link_rt_ms:.1f} ms/round-trip)"
    )

    # ---- fuzzy d=2, batched ----------------------------------------------
    # TPU: the batched banded Pallas sweep (dictionary read once per batch)
    # at the capacity the serving path settles on; CPU: the XLA sweep.
    from veloci_tpu.ops.fuzzy_step import (
        batched_fuzzy_search_topk,
        batched_fuzzy_search_topk_banded,
    )
    from veloci_tpu.ops.levenshtein import encode_query
    from veloci_tpu.search.executor import fuzzy_start_capacity

    fq = min(64 if backend != "cpu" else 8, len(fuzzy_terms))
    fqueries = np.zeros((fq, 32), dtype=np.uint16)
    fqlens = np.zeros(fq, dtype=np.int32)
    for row, term in enumerate(fuzzy_terms[:fq]):
        qq, ql = encode_query(term.lower())
        fqueries[row] = qq
        fqlens[row] = ql
    fdists = jnp.asarray(np.full(fq, 2, dtype=np.int32))
    fqj, flj = jnp.asarray(fqueries), jnp.asarray(fqlens)
    qps_fuzzy_batched = 0.0
    fuzzy_ms_per_batch = 0.0
    try:
        # settle the serving path's sticky capacity hint with one real batch
        freqs = [
            Request.from_dict(
                {
                    "search_req": {
                        "search": {
                            "terms": [t],
                            "path": "title",
                            "levenshtein_distance": 2,
                        }
                    },
                    "top": TOP_K,
                }
            )
            for t in fuzzy_terms[:fq]
        ]
        fres = search_batch(freqs, pers)
        assert any(r.data for r in fres), "fuzzy serving returned no hits"
        fuzz_capacity = min(
            dev.fuzzy_capacity(256), fuzzy_start_capacity(pers, "title")
        )
        log(f"fuzzy resolve capacity (serving-settled): {fuzz_capacity}")
        chars_d, chars_t_d, lens_d = dev.chars, dev.chars_t, dev.lengths

        use_banded = backend == "tpu"

        def fuzzy_body(carry):
            off = (carry * jnp.float32(1e-20)).astype(jnp.uint16)
            if use_banded:
                _ids, scores, _nh, _tm, _tp = batched_fuzzy_search_topk_banded(
                    chars_t_d + off[None, None], lens_d, fqj, flj, fdists,
                    offs_d, anc_d, sc_d,
                    max_terms=256, capacity=fuzz_capacity,
                    num_docs=num_docs, k=TOP_K,
                )
            else:
                _ids, scores, _nh, _tm, _tp = batched_fuzzy_search_topk(
                    chars_d + off[None, None], lens_d, fqj, flj, fdists,
                    offs_d, anc_d, sc_d,
                    max_terms=256, capacity=fuzz_capacity,
                    num_docs=num_docs, k=TOP_K,
                )
            return scores[0, 0] * jnp.float32(1e-12)

        fn1, fn2 = (2, 6) if backend == "cpu" else (2, 10)
        per_f, _, _ = measure_scan(fuzzy_body, fn1, fn2, retries=1)
        fuzzy_ms_per_batch = per_f * 1e3
        qps_fuzzy_batched = fq / per_f
        log(
            f"[{backend}] fuzzy d=2 batched ({fq}/batch): "
            f"{qps_fuzzy_batched:.0f} QPS engine-only, {fuzzy_ms_per_batch:.2f} ms/batch"
        )
    except Exception as exc:
        log(f"fuzzy batched failed: {type(exc).__name__}: {exc}")

    # ---- generic batched: filter + Log10 boost + facet in ONE program ----
    # BASELINE.json configs 3-5 (multi-term trees, facets+filters,
    # boost-by-indexed-data): the batched generic kernel fuses the whole
    # filtered+boosted+faceted batch into one dispatch (search/batch.py).
    qps_generic = 0.0
    generic_ms = 0.0
    generic_serving_qps = 0.0
    try:
        from veloci_tpu.create import BOOST_VALID_TO_VALUE
        from veloci_tpu.ops.generic_step import batched_generic_topk
        from veloci_tpu.ops.postings import bucket_size
        from veloci_tpu.search.facet import facet_matrix

        comb = pers.device_combined()
        base_t, _nk = comb.key_base["title"]
        cat_dict = pers.get_dictionary("cat")
        cat_store = pers.anchor_scores["cat.textindex.to_anchor_id_score"]
        cat_ho = np.asarray(cat_store.offsets)

        gq = len(tid_host)
        g_tids = (tid_host + base_t).astype(np.int32)[:, None]  # [Q, 1]
        g_tscs = np.full((gq, 1), 10.0, np.float32)
        g_slots = np.zeros((gq, 1), np.int32)
        # per-query filter: rotate over the 16 "cat" values. The 16 distinct
        # masks build once (device-resident cache semantics of the serving
        # path); per query only a mask index ships.
        masks = []
        for i in range(16):
            cid = int(cat_dict.get_ignore_case(f"c{i}")[0])
            s, e = int(cat_ho[cid]), int(cat_ho[cid + 1])
            fa = np.asarray(cat_store.anchors[s:e], dtype=np.int32)
            m = np.zeros(num_docs, dtype=bool)
            m[fa] = True
            masks.append(m)
        fmask_stack = jnp.asarray(np.stack(masks))
        fi_arr = (np.arange(gq) % 16).astype(np.int32)
        bv_j, pres_j = pers.device_boost("pop" + BOOST_VALID_TO_VALUE)
        fmat, _g = facet_matrix(pers, "cat")
        g_tids_j = jnp.asarray(g_tids)
        g_tscs_j, g_slots_j, fi_j = (
            jnp.asarray(g_tscs), jnp.asarray(g_slots), jnp.asarray(fi_arr)
        )

        def generic_body(carry):
            off = (carry * jnp.float32(1e-20)).astype(jnp.int32)
            _ids, scores, _nh, _fc = batched_generic_topk(
                offs_d_comb, anc_d_comb, sc_d_comb,
                g_tids_j + off, g_tscs_j, g_slots_j, fmask_stack, fi_j, None,
                ((bv_j, pres_j, None),),
                (fmat,),
                capacity=capacity,
                num_docs=num_docs,
                k=TOP_K,
                num_slots=1,
                is_and=False,
                boost_specs=(("Log10", 1.0, ()),),
            )
            return scores[0, 0] * jnp.float32(1e-12)

        offs_d_comb, anc_d_comb, sc_d_comb = comb.offsets, comb.anchors, comb.scores01
        gn1, gn2 = (2, 6) if backend == "cpu" else (3, 13)
        per_g, _, _ = measure_scan(generic_body, gn1, gn2, retries=1)
        generic_ms = per_g * 1e3
        qps_generic = gq / per_g
        log(
            f"[{backend}] generic batched (filter+Log10 boost+facet, {gq}/batch): "
            f"{qps_generic:.0f} QPS engine-only, {generic_ms:.2f} ms/batch"
        )

        # serving e2e through search_batch (host prep incl. filter resolve)
        greqs = [
            Request.from_dict(
                {
                    "search_req": {
                        "search": {"terms": [t], "path": "title"}
                    },
                    "filter": {
                        "search": {"terms": [f"c{i % 16}"], "path": "cat"}
                    },
                    "boost": [
                        {"path": "pop", "boost_fun": "Log10", "param": 1}
                    ],
                    "facets": [{"field": "cat"}],
                    "top": TOP_K,
                }
            )
            for i, t in enumerate(exact_terms)
        ]
        gres = search_batch(greqs, pers)  # warm/compile
        assert any(r.facets for r in gres), "generic serving returned no facets"
        t0 = time.perf_counter()
        gres = search_batch(greqs, pers)
        generic_serving_qps = len(greqs) / (time.perf_counter() - t0)
        log(
            f"[{backend}] generic serving e2e (search_batch): "
            f"{generic_serving_qps:.0f} QPS"
        )
    except Exception as exc:
        log(f"generic batched failed: {type(exc).__name__}: {exc}")

    # ---- suggest (reference suggest_multi, search_field.rs:194-219) ------
    suggest_qps = 0.0
    try:
        from veloci_tpu.search.executor import suggest as suggest_fn

        sreqs = [
            Request.from_dict(
                {
                    "suggest": [
                        {
                            "terms": [str(t)[:4]],
                            "path": "title",
                            "starts_with": True,
                            "levenshtein_distance": 0,
                        }
                    ],
                    "top": 10,
                }
            )
            for t in rng.choice(vocab[:2000], size=32)
        ]
        suggest_fn(pers, sreqs[0])  # warm
        t0 = time.perf_counter()
        for sr in sreqs:
            out_s = suggest_fn(pers, sr)
        suggest_qps = len(sreqs) / (time.perf_counter() - t0)
        log(f"[{backend}] suggest (prefix, host-parallel fan-out): {suggest_qps:.0f} QPS")
    except Exception as exc:
        log(f"suggest bench failed: {type(exc).__name__}: {exc}")

    # ---- gutenberg-style highlight (reference bench_jmdict.rs:41-45) -----
    hl_qps = 0.0
    try:
        from veloci_tpu import search, search_to_result_with_doc

        rng2 = np.random.default_rng(7)
        filler = [f"word{i}" for i in range(500)]
        paras = []
        for i in range(2000):
            words = list(rng2.choice(filler, size=40))
            if i % 7 == 0:
                words[rng2.integers(0, 40)] = "pride"
            paras.append(json.dumps({"content": " ".join(words), "nr": str(i)}))
        book = Persistence.create_from_str("\n".join(paras), "{}")
        req = Request.from_dict(
            {
                "search_req": {"search": {"terms": ["pride"], "path": "content"}},
                "why_found": True,
                "top": 10,
            }
        )
        res = search(req, book)
        search_to_result_with_doc(book, res, None)  # warm
        reps_hl = 20
        t0 = time.perf_counter()
        for _ in range(reps_hl):
            res = search(req, book)
            out = search_to_result_with_doc(book, res, None)
        hl_qps = reps_hl / (time.perf_counter() - t0)
        assert out.data and out.data[0].why_found["content"]
        log(f"[{backend}] highlight (search+why_found+doc fetch): {hl_qps:.1f} QPS")
    except Exception as e:
        log(f"highlight bench failed: {e!r}")

    # ---- CPU proxy baseline (same kernels + methodology on host CPU) -----
    vs_baseline = 1.0
    cpu_qps = None
    if not os.environ.get("BENCH_SKIP_CPU_PROXY"):
        import subprocess

        try:
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["BENCH_DOCS"] = str(N_DOCS)
            env["BENCH_EXACT_QUERIES"] = str(N_EXACT_QUERIES)
            env["BENCH_FUZZY_QUERIES"] = "4"
            env["BENCH_SKIP_CPU_PROXY"] = "1"
            proc = subprocess.run(
                ["python", "-c",
                 "import jax; jax.config.update('jax_platforms','cpu');"
                 "import bench; bench.main()"],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            )
            cpu_json = json.loads(proc.stdout.strip().splitlines()[-1])
            cpu_qps = cpu_json["value"]
            log(f"cpu proxy: {cpu_qps} QPS batched engine-only")
            vs_baseline = qps_batched / cpu_qps
        except Exception as e:
            log(f"cpu proxy failed: {e!r}")

    result = {
        "metric": "jmdict_like_exact_top10_batched_engine_qps",
        "value": round(qps_batched, 1),
        "unit": "qps",
        "vs_baseline": round(vs_baseline, 2),
        "detail": {
            "backend": backend,
            "num_docs": num_docs,
            "methodology": "on-device scan depth differencing (hoist-proof term-id perturbation); link cost cancels",
            "engine_ms_per_batch": round(engine_ms_per_batch, 4),
            "batch_size": len(exact_terms),
            "serving_e2e_qps": round(qps_serving, 1),
            "exact_sequential_qps": round(qps_seq, 1),
            "exact_seq_p50_ms": round(percentile(lat, 50) * 1e3, 3),
            "exact_seq_p99_ms": round(percentile(lat, 99) * 1e3, 3),
            "fuzzy_d2_batched_qps": round(qps_fuzzy_batched, 1),
            "fuzzy_ms_per_batch": round(fuzzy_ms_per_batch, 3),
            "generic_batched_qps": round(qps_generic, 1),
            "generic_ms_per_batch": round(generic_ms, 3),
            "generic_serving_e2e_qps": round(generic_serving_qps, 1),
            "suggest_qps": round(suggest_qps, 1),
            "highlight_qps": round(hl_qps, 1),
            "index_build_mb_per_s": round(pers.bytes_indexed / build_s / 1e6, 2),
            "link_round_trip_ms": round(link_rt_ms, 3),
            "cpu_proxy_batched_qps": cpu_qps,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
