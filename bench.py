"""Benchmark harness — jmdict-class workload on the TPU.

Measures the BASELINE.md headline metric: exact-term (lev=0) top-10 search
throughput, plus fuzzy d=2, the generic (filter+boost+facet) path, the
canonical query-generator shape, and 1M/6M-doc scale sections, on a
synthetic jmdict-scale corpus (the real jmdict file is an LFS stub in the
reference checkout; the corpus here reproduces its shape: zipfian
vocabulary, multi-token titles).

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

BASELINES (round 3): ``vs_baseline`` compares against the strictest of
(a) the measured XLA-CPU proxy (same kernels on host CPU) and (b) the
native single-core C++ baseline — the reference's resolve_token_to_anchor
+ top_n_sort hot path over the same arrays, including a storage-faithful
delta+varint variant (native/baseline.cpp). The Rust reference itself is
not runnable in this image (no cargo; jmdict is an LFS stub). The headline
ratio is taken at the 1M-doc scale row when it runs — the real jmdict is
~600k entries, and at 100k docs the whole index is CPU-cache-resident,
which flatters the single-core baseline (that ratio is still reported as
``detail.vs_baseline_100k``).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import threading
import time
from functools import partial

import numpy as np

N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))
N_EXACT_QUERIES = int(os.environ.get("BENCH_EXACT_QUERIES", "200"))
# 128 = the banded sweep's chunk width; a bigger fuzzy batch amortises the
# ~30 ms link round-trips exactly like exact's 200-query batches do
N_FUZZY_QUERIES = int(os.environ.get("BENCH_FUZZY_QUERIES", "128"))
TOP_K = 10
_START = time.time()
# the TRUE process origin: survives the CPU-fallback re-exec (execve passes
# BENCH_START_TS through) so the hard deadline counts driver wall time, not
# time-since-last-exec
_ORIGIN = float(os.environ.get("BENCH_START_TS", _START))
# hard wall ceiling for the WHOLE run (driver timeout minus margin): at this
# point the provisional result line is emitted and the process exits 0 —
# a partial JSON line beats rc=124 with nothing parsed (round-3 lesson)
HARD_S = float(os.environ.get("BENCH_HARD_S", "1980"))


def log(*args):
    # elapsed-since-origin prefix: the round-3/4 captures starved before the
    # scale rows with no way to tell which section ate the wall clock
    print(f"[+{time.time() - _ORIGIN:.0f}s]", *args, file=sys.stderr, flush=True)


def budget_left() -> float:
    soft = float(os.environ.get("BENCH_BUDGET_S", "2400")) - (time.time() - _START)
    hard = (_ORIGIN + HARD_S) - time.time()
    return min(soft, hard)


# ---- indestructible result emission -----------------------------------------
# One JSON line on stdout in EVERY exit path: normal completion, uncaught
# exception (atexit), SIGTERM/SIGINT from the driver's timeout, or the hard
# deadline (a daemon thread that fires even while the main thread is blocked
# inside a C call on a dead tunnel — the case signal handlers cannot cover).
#
# Round-5 hardening (VERDICT r4 #1): every snapshot is ALSO written to a
# repo-root file (BENCH_LIVE.json) so a dead session/tunnel cannot lose the
# evidence, and a heartbeat thread logs the CURRENT PHASE every 60s so a
# stall can never again be a silent 2000s black hole.
_RESULT = {
    "metric": "jmdict_like_exact_top10_batched_engine_qps",
    "value": 0.0,
    "unit": "qps",
    "vs_baseline": 0.0,
    "detail": {"partial": True, "completed_sections": []},
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False
_LIVE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_LIVE.json"
)
_PHASE = ["startup"]
_PHASE_TS = [time.time()]


def set_phase(name: str) -> None:
    """Mark the current phase for the heartbeat + the live snapshot."""
    _PHASE[0] = name
    _PHASE_TS[0] = time.time()
    _RESULT["detail"]["phase"] = name


def _write_live() -> None:
    """Durable incremental snapshot: atomic write-and-rename into the repo
    root. The r3/r4 captures both lost their JSON because stdout died with
    the session; this file survives anything short of disk loss."""
    try:
        tmp = _LIVE_PATH + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(_RESULT) + "\n")
        os.replace(tmp, _LIVE_PATH)
    except OSError:
        pass


_LAST_MARK = [time.time()]


def update_result(section=None, value=None, vs_baseline=None, **detail):
    """Fold a completed section into the provisional result snapshot."""
    d = _RESULT["detail"]
    d.update(detail)
    if section and section not in d["completed_sections"]:
        d["completed_sections"].append(section)
        now = time.time()
        d.setdefault("section_times", {})[section] = round(now - _LAST_MARK[0], 1)
        _LAST_MARK[0] = now
    if value is not None:
        _RESULT["value"] = round(float(value), 1)
    if vs_baseline is not None:
        _RESULT["vs_baseline"] = round(float(vs_baseline), 2)
    _write_live()


def emit_result(final: bool = False) -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _RESULT["detail"]["partial"] = not final
        sys.stdout.write(json.dumps(_RESULT) + "\n")
        sys.stdout.flush()
        _write_live()
        _EMITTED = True


def _arm_guards() -> None:
    def _on_signal(signum, _frame):
        log(f"signal {signum} — emitting provisional result")
        emit_result()
        os._exit(0)

    for s in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(s, _on_signal)
        except (ValueError, OSError):
            pass  # non-main thread / restricted env
    atexit.register(emit_result)

    def _deadline():
        rem = (_ORIGIN + HARD_S) - time.time()
        if rem > 0:
            time.sleep(rem)
        if _EMITTED:
            return
        log(f"hard deadline ({HARD_S:.0f}s from origin) — emitting partial result")
        emit_result()
        os._exit(0)

    threading.Thread(target=_deadline, daemon=True).start()

    def _heartbeat():
        # one line every 60s, whatever the main thread is doing (even blocked
        # in a C call): the r4 capture's 2371s silent stall is impossible to
        # reproduce silently with this running
        while not _EMITTED:
            time.sleep(60)
            if _EMITTED:
                return
            log(
                f"heartbeat: phase={_PHASE[0]} "
                f"(in phase {time.time() - _PHASE_TS[0]:.0f}s, "
                f"budget left {budget_left():.0f}s)"
            )
            _RESULT["detail"]["last_heartbeat_phase"] = (
                f"{_PHASE[0]}+{time.time() - _PHASE_TS[0]:.0f}s"
            )
            _write_live()

    threading.Thread(target=_heartbeat, daemon=True).start()


class PhaseTimeout(Exception):
    pass


import contextlib


@contextlib.contextmanager
def phase_deadline(seconds: float, what: str):
    """Bound a best-effort phase with SIGALRM (main thread only). The r5
    rehearsal showed scale1M:generator_serving stalling 636s+ in a compile/
    run storm on giant capacity buckets; an alarm delivered between C calls
    aborts the phase at the Python boundary instead of eating the 6M row's
    budget. Not airtight (one long C call can overrun), but every observed
    stall was a sequence of per-group compiles with Python between them."""
    if threading.current_thread() is not threading.main_thread() or seconds <= 0:
        yield
        return

    def _on_alarm(signum, frame):
        raise PhaseTimeout(what)

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


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


def measure_scan(make_body, n1: int, n2: int, retries: int = 3, operands=()):
    """Engine ms/iter by differencing two on-device scan depths.

    ``make_body(carry, ops) -> carry`` must thread the carry through a
    hoist-proof data dependency (term ids). Returns (per_iter_s, w1, w2).

    ``operands`` is an arbitrary pytree of device arrays threaded through
    the jit boundary as ARGUMENTS. Anything large (filter-mask stacks, boost
    columns, posting tables) must ride here, NOT be closed over: a
    closed-over concrete array becomes a program constant, and XLA then
    constant-folds gathers against it at compile time — round 3's driver
    capture died burning >1 s per fold on a pred[194,1,100000] gather
    (BENCH_r03.json tail).

    The per-iter estimate is the MEDIAN of the positive samples — taking
    the minimum (round 2) over-claims when the wall difference collapses
    into link noise (observed: a degraded window turned a 0.3 ms/batch
    kernel into a "10 us/batch" sample). Samples whose difference is below
    twice the observed wall jitter are discarded as unmeasurable.
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(n, ops):
        def body(carry, _):
            return make_body(carry, ops), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    float(run(n1, operands))  # compile + warm sync
    float(run(n2, operands))
    samples = []
    w1s, w2s = [], []
    for _ in range(retries):
        t0 = time.perf_counter()
        float(run(n1, operands))
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(n2, operands))
        w2 = time.perf_counter() - t0
        w1s.append(w1)
        w2s.append(w2)
        if w2 > w1:
            samples.append((w2 - w1) / (n2 - n1))
    jitter = max(
        (max(ws) - min(ws) for ws in (w1s, w2s) if len(ws) > 1), default=0.0
    )
    good = [p for p in samples if p * (n2 - n1) > 2.0 * jitter]
    pool = good or samples
    if pool:
        per = float(np.median(pool))
    else:  # degenerate timing (degraded link mid-measure)
        per = max(w2s[-1], 1e-9) / n2
    return per, w1s[-1], w2s[-1]


def exact_query_ids(pers, vocab, nq, seed=99):
    """Resolve nq zipfian exact query terms to (terms, tid_host) exactly as
    the serving path would."""
    rng = np.random.default_rng(seed)
    dictionary = pers.get_dictionary("title")
    terms = [str(t) for t in rng.choice(vocab[:5000], size=nq)]
    tid_list = []
    for term in terms:
        ids = dictionary.get_ignore_case(term)
        tid_list.append(int(ids[0]) if ids else 0)
    return terms, np.asarray(tid_list, dtype=np.int32)


def engine_exact(pers, tid_host, backend, scan_depths=None, retries=3):
    """Engine-only batched exact throughput with the SERVING path's
    per-query capacity sub-bucketing: the scan body chains one
    batched_single_term_topk dispatch per capacity bucket (zipfian: most
    queries ride small buckets), exactly like search_batch does.

    ``scan_depths`` overrides the (n1, n2) scan lengths — the 6M-posting
    capacity bucket streams ~64 MB/query, so the at-scale caller keeps the
    loop short."""
    import jax.numpy as jnp

    from veloci_tpu.ops.postings import bucket_size
    from veloci_tpu.ops.search_step import batched_single_term_topk

    dev = pers.device_field("title")
    ho = dev.host_offsets
    counts = ho[tid_host + 1] - ho[tid_host]
    sub = {}
    for i, c in enumerate(counts):
        sub.setdefault(bucket_size(max(int(c), 1)), []).append(i)
    caps = []
    bucket_args = []
    for cap, idxs in sorted(sub.items()):
        caps.append(cap)
        bucket_args.append(
            (
                jnp.asarray(tid_host[idxs]),
                jnp.full(len(idxs), 10.0, jnp.float32),
            )
        )
    log(
        "exact capacity buckets: "
        + ", ".join(f"{cap}x{int(t.shape[0])}" for cap, (t, _s) in zip(caps, bucket_args))
    )

    def body(carry, ops):
        offs_d, packed_d, bucks = ops
        off = (carry * jnp.float32(1e-20)).astype(jnp.int32)
        acc = jnp.float32(0.0)
        for cap, (tids, tscs) in zip(caps, bucks):
            _ids, scores, _nh = batched_single_term_topk(
                offs_d, None, None, tids + off, tscs,
                capacity=cap, k=min(TOP_K, cap), packed=packed_d,
            )
            acc = acc + scores[0, 0]
        return acc * jnp.float32(1e-12)

    n1, n2 = scan_depths or ((3, 13) if backend == "cpu" else (5, 45))
    # posting arrays ride as jit ARGUMENTS (serving memory layout: packed
    # rows only, anchors/scores01 never upload) — see measure_scan docstring
    per_iter, w1, w2 = measure_scan(
        body, n1, n2, retries=retries,
        operands=(dev.offsets, dev.packed, tuple(bucket_args)),
    )
    return per_iter, w1, w2


def _fuzzy_tree_engine(pers, terms, backend, num_docs):
    """Engine-only cost of the DEFAULT plain-fuzzy serving route
    (VELOCI_FUZZY_VIA_TREE=1): one windowed prefetch sweep per batch plus
    the sorted tree kernel at each query's KNOWN posting-total bucket. The
    two device phases are scan-differenced separately and summed (the host
    match assembly between them is serving overhead, not engine cost).
    Returns (per_batch_s, plan_str)."""
    import jax
    import jax.numpy as jnp

    from veloci_tpu import Request
    from veloci_tpu.ops.levenshtein import encode_query, select_matches
    from veloci_tpu.ops.postings import MAX_SORT_CAPACITY, bucket_size
    from veloci_tpu.ops.tree_step import batched_tree_topk
    from veloci_tpu.search import batch as batch_mod
    from veloci_tpu.search.field_search import prefetch_fuzzy_matches

    dev = pers.device_field("title")
    comb = pers.device_combined()
    use_banded = backend == "tpu"

    # ---- sweep phase: prefetch_fuzzy_matches' dispatch plan -------------
    by_var: dict = {}
    for t in terms:
        lt = t.lower()
        d = min(2, max(len(lt) - 1, 0))
        v = dev.length_window_variant(len(lt) - d, len(lt) + d)
        by_var.setdefault(id(v), (v, []))[1].append((lt, d))
    sweep_static = []  # [(rows_n, mm)]
    sweep_ops = []
    for v, items in by_var.values():
        mm = min(256, v._chars_host.shape[0])
        chunk_q = 64 if use_banded else max(len(items), 1)
        for cbase in range(0, len(items), chunk_q):
            citems = items[cbase : cbase + chunk_q]
            rows_n = 8
            while rows_n < len(citems):
                rows_n *= 2
            queries = np.zeros((rows_n, 32), np.uint16)
            qlens = np.zeros(rows_n, np.int32)
            dists = np.full(rows_n, -1, np.int32)
            for row, (lt, d) in enumerate(citems):
                q, ql = encode_query(lt)
                queries[row] = q
                qlens[row] = ql
                dists[row] = d
            sweep_static.append((rows_n, mm))
            sweep_ops.append(
                (
                    v.chars_t if use_banded else v.chars,
                    v.lengths,
                    v.sweep_ids,
                    jnp.asarray(queries),
                    jnp.asarray(qlens),
                    jnp.asarray(dists),
                )
            )
    sweep_ops = tuple(sweep_ops)

    def sweep_body(carry, ops):
        off = (carry * jnp.float32(1e-20)).astype(jnp.uint16)
        acc = jnp.float32(0)
        for (_rows_n, mm), (chars, lens, sweep_ids, q, ql, dd) in zip(
            sweep_static, ops
        ):
            if use_banded:
                from veloci_tpu.ops.pallas_levenshtein import (
                    levenshtein_sweep_pallas_banded_batch,
                )

                dist_b, _pd, pref_b = levenshtein_sweep_pallas_banded_batch(
                    chars + off[None, None], lens, q, ql, band=2
                )
            else:
                from veloci_tpu.ops.levenshtein import levenshtein_sweep

                dist_b, _pd, pref_b = jax.vmap(
                    lambda qq, qql: levenshtein_sweep(
                        chars + off[None, None], lens, qq, qql
                    )
                )(q, ql)
            _ids, _d, _p, tot_b = jax.vmap(
                lambda dv, pv, ddv: select_matches(
                    dv, pv, dv, ddv, max_matches=mm, remap=sweep_ids
                )
            )(dist_b, pref_b, dd)
            acc = acc + tot_b[0].astype(jnp.float32)
        return acc * jnp.float32(1e-12)

    # ---- resolve phase: the serving bucketing over the primed memo ------
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
        for t in terms
    ]
    prefetch_fuzzy_matches(
        pers, {("title", t.lower(), min(2, max(len(t) - 1, 0)), False) for t in terms}
    )
    ho = comb.host_offsets
    sub: dict = {}
    fallbacks = 0
    for req in freqs:
        tree = batch_mod._plain_eligible(req, pers, comb)
        if tree is None or tree[0] == "deep":
            fallbacks += 1
            continue
        gtids, ng = tree
        # mirror the serving plan EXACTLY via the shared planner
        # (_resolve_plan_key): terms reorder by run length desc; single_slot
        # only when the query is eligible the way serving checks it
        # (num_groups == 1 and uniform slots — ADVICE r4 #5)
        runs = sorted(
            ((int(ho[e[0] + 1] - ho[e[0]]), e) for e in gtids),
            key=lambda t: -t[0],
        )
        tot = sum(r for r, _e in runs)
        if not runs or tot > MAX_SORT_CAPACITY:
            fallbacks += 1
            continue
        sslot = ng == 1 and len({e[2] for e in gtids}) == 1
        key = batch_mod._resolve_plan_key([r for r, _e in runs], tot, sslot)
        if key[0] == "x":
            fallbacks += 1
            continue
        sub.setdefault(key, []).append([e for _r, e in runs])
    resolve_static = []  # (widths_or_None, capacity, single_slot)
    resolve_ops = []
    plan_bits = []
    for key, all_rows in sorted(sub.items()):
        if key[0] == "s":
            _t, cap_big, cap_rest, sslot = key
            capacity = 0
            plan_bits.append(f"{cap_big}+{cap_rest}x{len(all_rows)}")
        elif key[0] == "m":
            _t, capacity, _tp, sslot = key
            plan_bits.append(f"m{capacity}t{_tp}x{len(all_rows)}")
        else:
            _t, capacity, sslot = key
            plan_bits.append(f"c{capacity}x{len(all_rows)}")
        chunk_n = batch_mod._COMPACT_Q if key[0] == "m" else len(all_rows)
        for base in range(0, len(all_rows), chunk_n):
            rows = all_rows[base : base + chunk_n]
            if key[0] == "m":
                t_pad = key[2]
                # mirror serving's q tiers: pow2 8..64 for single-slot,
                # two shapes (8/64) for multi-slot (compile cost)
                q_pad = (
                    min(bucket_size(len(rows), 8), batch_mod._COMPACT_Q)
                    if key[3]
                    else (8 if len(rows) <= 8 else batch_mod._COMPACT_Q)
                )
                widths = ()
            else:
                t_pad = bucket_size(max(len(g) for g in rows), 8)
                q_pad = bucket_size(len(rows), 8)
                widths = (
                    batch_mod._slice_widths(cap_big, cap_rest, t_pad)
                    if key[0] == "s"
                    else ()
                )
            tid = np.full((q_pad, t_pad), -1, np.int32)
            ts = np.zeros((q_pad, t_pad), np.float32)
            sl = np.zeros((q_pad, t_pad), np.int32)
            for r, g in enumerate(rows):
                for j, e in enumerate(g[:t_pad]):
                    tid[r, j], ts[r, j], sl[r, j] = e[0], e[1], e[2]
            resolve_static.append((widths, capacity, sslot))
            resolve_ops.append(
                (
                    jnp.asarray(tid),
                    jnp.asarray(ts),
                    jnp.asarray(sl),
                    jnp.asarray(np.ones(q_pad, np.int32)),
                )
            )
    plan = ", ".join(plan_bits) + (
        f" (+{fallbacks} fallback)" if fallbacks else ""
    )

    def resolve_body(carry, ops):
        offs_d, packed_d, groups = ops
        off = (carry * jnp.float32(1e-20)).astype(jnp.int32)
        acc = jnp.float32(0)
        for (widths, capacity, sslot), (tid, ts, sl, ng) in zip(
            resolve_static, groups
        ):
            _ids, scores, _nh, _fc = batched_tree_topk(
                offs_d, None, None, tid + off, ts, sl, ng,
                None, None, None, (), (),
                capacity=capacity, num_docs=num_docs, k=TOP_K,
                boost_specs=(), has_phrase=False, packed=packed_d,
                slice_widths=widths, single_slot=sslot,
            )
            acc = acc + scores[0, 0]
        return acc * jnp.float32(1e-12)

    n1, n2 = (2, 6) if backend == "cpu" else (2, 10)
    per_sweep, _, _ = measure_scan(
        sweep_body, n1, n2, retries=1, operands=sweep_ops
    )
    per_res = 0.0
    if resolve_ops:
        per_res, _, _ = measure_scan(
            resolve_body, n1, n2, retries=1,
            operands=(comb.offsets, comb.packed, tuple(resolve_ops)),
        )
    log(
        f"fuzzy tree plan: sweep {per_sweep * 1e3:.2f} ms "
        f"({len(sweep_ops)} dispatches) + resolve {per_res * 1e3:.2f} ms "
        f"({plan})"
    )
    return per_sweep + per_res


def _fuzzy_fused_engine(pers, dev, fuzzy_terms, fq, fqueries, fqlens, backend, num_docs):
    """Engine-only cost of the LEGACY fused plain-fuzzy route
    (VELOCI_FUZZY_VIA_TREE=0): mirrors `_run_fuzzy_group`'s dispatch
    ladder (pass-1 at the sticky hint + per-row capacity retries).
    Returns per_batch_s."""
    import jax.numpy as jnp

    from veloci_tpu.ops.fuzzy_step import (
        batched_fuzzy_search_topk,
        batched_fuzzy_search_topk_banded,
    )
    from veloci_tpu.search.executor import fuzzy_start_capacity

    # mirror the SERVING dispatch plan exactly (_run_fuzzy_group):
    # pass 1 = whole batch at the sticky capacity hint with the small
    # selection window; pass 2 = only the rows the kernel would report
    # as overflowing, at their own bucket / wide window. The host knows
    # the classification from the prefetched matches.
    from veloci_tpu.ops.postings import bucket_size
    from veloci_tpu.search.field_search import (
        _fuzzy_match_cache,
        prefetch_fuzzy_matches,
    )

    worst = dev.fuzzy_capacity(256)
    c0 = min(worst, fuzzy_start_capacity(pers, "title"))
    mt0 = getattr(pers, "_fuzzy_mt_hint", {}).get("title", 64)
    prefetch_fuzzy_matches(
        pers, {("title", t.lower(), 2, False) for t in fuzzy_terms[:fq]}
    )
    memo = _fuzzy_match_cache(pers)
    ho_f = dev.host_offsets
    use_banded = backend == "tpu"
    step_fn = (
        batched_fuzzy_search_topk_banded if use_banded else batched_fuzzy_search_topk
    )

    # mirror serving's per-row length-window grouping
    # (_run_fuzzy_group.row_variant): rows group by their window variant
    # [qlen-d, qlen+d] of the length-sorted matrix; each group pays one
    # pass-1 dispatch at the sticky capacity, overflowing rows re-pay
    # alone at their own bucket — exactly the serving dispatch ladder
    by_var: dict = {}
    for row, t in enumerate(fuzzy_terms[:fq]):
        v = dev.length_window_variant(len(t) - 2, len(t) + 2)
        by_var.setdefault(id(v), (v, []))[1].append(row)
    group_plan = []  # (variant, rows, retry {(cap, mt): rows})
    for v, rows in by_var.values():
        retry: dict = {}
        for row in rows:
            t = fuzzy_terms[row]
            m, _d, _p = memo[("title", t.lower(), 2, False)]
            tot = int((ho_f[m + 1] - ho_f[m]).sum()) if len(m) else 0
            if len(m) > mt0:
                retry.setdefault(
                    (min(worst, bucket_size(max(tot, c0))), 256), []
                ).append(row)
            elif tot > c0:
                retry.setdefault(
                    (min(worst, bucket_size(tot)), mt0), []
                ).append(row)
        group_plan.append((v, rows, retry))
    log(
        "fuzzy serving plan: "
        + " | ".join(
            f"{v._chars_host.shape[0]}rows: pass1 {len(rows)}@({c0},mt{mt0})"
            + "".join(
                f" +{len(r)}@({c},mt{m})" for (c, m), r in sorted(rt.items())
            )
            for v, rows, rt in group_plan
        )
    )
    anc_d = sc_d = None  # packed-only postings

    # static dispatch schedule + per-group device operands
    group_static = []  # [(n_retries, [(cap, mt), ...])]
    group_ops = []
    for v, rows, rt in group_plan:
        retry_static = sorted(rt)
        group_static.append(retry_static)
        retries_o = tuple(
            (
                jnp.asarray(fqueries[r]),
                jnp.asarray(fqlens[r]),
                jnp.asarray(np.full(len(r), 2, np.int32)),
            )
            for (_c, _m), r in sorted(rt.items())
        )
        group_ops.append(
            (
                v.chars_t if use_banded else v.chars,
                v.lengths,
                v.sweep_ids,
                v.offsets,
                v.packed,
                jnp.asarray(fqueries[rows]),
                jnp.asarray(fqlens[rows]),
                jnp.asarray(np.full(len(rows), 2, np.int32)),
                retries_o,
            )
        )
    group_ops = tuple(group_ops)

    def fuzzy_body(carry, ops):
        off = (carry * jnp.float32(1e-20)).astype(jnp.uint16)
        acc = jnp.float32(0)
        for retry_static, g_ops in zip(group_static, ops):
            chars_o, lens_o, sweep_o, offs_o, packed_o, fqj_o, flj_o, fdists_o, retries_o = g_ops
            _ids, scores, _nh, _tm, _tp = step_fn(
                chars_o + off[None, None], lens_o, fqj_o, flj_o, fdists_o,
                offs_o, anc_d, sc_d,
                max_terms=64, capacity=c0, num_docs=num_docs, k=TOP_K,
                packed=packed_o, sweep_ids=sweep_o,
                **({"band": 2} if use_banded else {}),
            )
            acc = acc + scores[0, 0]
            for (cap, mt), (rq, rl, rd) in zip(retry_static, retries_o):
                _ids, scores, _nh, _tm, _tp = step_fn(
                    chars_o + off[None, None], lens_o, rq, rl, rd,
                    offs_o, anc_d, sc_d,
                    max_terms=mt, capacity=cap, num_docs=num_docs, k=TOP_K,
                    packed=packed_o, sweep_ids=sweep_o,
                    **({"band": 2} if use_banded else {}),
                )
                acc = acc + scores[0, 0]
        return acc * jnp.float32(1e-12)

    fn1, fn2 = (2, 6) if backend == "cpu" else (2, 10)
    per_f, _, _ = measure_scan(
        fuzzy_body, fn1, fn2, retries=1, operands=group_ops
    )
    return per_f


def fuzzy_query_arrays(vocab, nq, seed=99):
    from veloci_tpu.ops.levenshtein import encode_query

    rng = np.random.default_rng(seed)
    fuzzy_terms = []
    for t in rng.choice(vocab[:2000], size=nq):
        t = str(t)
        if len(t) > 4:
            t = t[:2] + "x" + t[3:]
        fuzzy_terms.append(t)
    queries = np.zeros((nq, 32), dtype=np.uint16)
    qlens = np.zeros(nq, dtype=np.int32)
    for row, term in enumerate(fuzzy_terms):
        qq, ql = encode_query(term.lower())
        queries[row] = qq
        qlens[row] = ql
    return fuzzy_terms, queries, qlens


def generator_requests(pers, vocab, nq, seed=5):
    """The canonical front-door workload: two-term free text through the
    query generator -> auto-levenshtein fuzzy OR (and AND) trees."""
    from veloci_tpu.query.generator import (
        SearchQueryGeneratorParameters,
        search_query,
    )

    rng = np.random.default_rng(seed)
    reqs = []
    qtexts = []
    for i in range(nq):
        a, b = (str(t) for t in rng.choice(vocab[:3000], size=2))
        text = f"{a} AND {b}" if i % 4 == 0 else f"{a} {b}"
        qtexts.append(text)
        reqs.append(
            search_query(
                pers,
                SearchQueryGeneratorParameters(search_term=text, top=TOP_K),
            )
        )
    return qtexts, reqs


def native_cpu_baseline(pers, tid_host, reps=9, field="title"):
    """Single-core C++ reference-style loop (native/baseline.cpp): raw-array
    and storage-faithful (delta+varint decode) variants.

    VERDICT r4 #4: the round-4 single-shot measurement swung 113k-412k QPS
    on this contended VM and even inverted (vint outran raw). This version
    runs ``reps`` INTERLEAVED raw/vint repetitions (so a contention window
    hits both variants alike), reports the per-variant best-case headline
    plus the {min, max} spread, and takes the BEST (min-time) rep as the
    denominator: best-case is both the strictest comparator for our ratio
    and the most stable statistic on a contended VM (a rep cannot run
    faster than the hardware; it can run arbitrarily slower). Both paths
    are page-warmed before the first timed rep.

    On the raw-vs-vint "inversion" (VERDICT r4 #4): a quiet-host A/B over
    the jmdict-shaped CSR measures raw 1.38 ms vs vint 1.39 ms median per
    200-query batch — statistically IDENTICAL. The sort+dedup+top_n tail
    dominates both variants and the postings are L2/L3-resident at this
    corpus size, so varint decode (pure ALU) hides entirely behind the
    memory-bound sort; any observed ordering between the two is VM
    contention noise, which min-time reporting now suppresses."""
    from veloci_tpu.native import (
        baseline_available,
        baseline_encode_vint,
        baseline_exact_topk,
        baseline_exact_topk_vint,
    )

    if not baseline_available():
        return {}
    store = pers.anchor_scores[f"{field}.textindex.to_anchor_id_score"]
    nq = len(tid_host)
    tids = tid_host.reshape(nq, 1).astype(np.int32)
    tscs = np.full((nq, 1), 10.0, np.float32)
    tslots = np.zeros((nq, 1), np.int32)
    raw_args = (
        store.offsets, store.anchors, store.scores, tids, tscs, tslots, TOP_K
    )
    idx = baseline_encode_vint(store.offsets, store.anchors, store.scores)
    # page-warm both variants (first-touch faults cost ~57us/page here)
    baseline_exact_topk(*raw_args)
    baseline_exact_topk(*raw_args)
    if idx is not None:
        baseline_exact_topk_vint(idx, tids, tscs, TOP_K)
    raw_s, vint_s = [], []
    for _ in range(max(reps, 3)):
        t0 = time.perf_counter()
        baseline_exact_topk(*raw_args)
        raw_s.append(time.perf_counter() - t0)
        if idx is not None:
            t0 = time.perf_counter()
            baseline_exact_topk_vint(idx, tids, tscs, TOP_K)
            vint_s.append(time.perf_counter() - t0)
    out = {
        "native_cpu_raw_qps": round(nq / min(raw_s), 1),
        "native_cpu_raw_qps_spread": [
            round(nq / max(raw_s), 1), round(nq / min(raw_s), 1)
        ],
        "native_cpu_raw_qps_median": round(nq / float(np.median(raw_s)), 1),
    }
    if vint_s:
        out["native_cpu_vint_qps"] = round(nq / min(vint_s), 1)
        out["native_cpu_vint_qps_spread"] = [
            round(nq / max(vint_s), 1), round(nq / min(vint_s), 1)
        ]
        out["native_cpu_vint_qps_median"] = round(
            nq / float(np.median(vint_s)), 1
        )
    return out


def scale_summary(n_docs, backend, on_core=None, reserve=0.0) -> dict:
    """Compact scale section (1M / 6M docs): build + upload + warmup + the
    key engine/serving numbers, without the full 100k battery. ``on_core``
    is invoked with the row BEFORE the optional cold-start subprocess so a
    cold-start stall cannot lose the core numbers (round-3: device_init_s
    hit 652s through a degraded tunnel). ``reserve`` is budget that must be
    left intact for LATER sections (the pending 6M row): every best-effort
    extra here gates on budget_left() - reserve, and the r5-rehearsal
    staller (generator_serving: compile/run storm on ~500k-posting zipf
    heads inside fuzzy trees) additionally runs under a hard alarm."""
    import jax.numpy as jnp

    from veloci_tpu import Persistence, Request
    from veloci_tpu.search.batch import search_batch

    out = {"num_docs": n_docs}
    set_phase(f"scale{n_docs}:corpus_gen")
    log(f"[scale {n_docs}] generating corpus...")
    t0 = time.time()
    corpus, vocab = build_corpus(n_docs)
    out["corpus_gen_s"] = round(time.time() - t0, 1)
    log(f"[scale {n_docs}] corpus {out['corpus_gen_s']:.0f}s; building index...")
    set_phase(f"scale{n_docs}:index_build")
    t0 = time.time()
    pers = Persistence.create_from_str(corpus, BENCH_CONFIG)
    build_s = time.time() - t0
    out["build_s"] = round(build_s, 1)
    out["index_build_mb_per_s"] = round(pers.bytes_indexed / build_s / 1e6, 2)
    out["index_bytes"] = pers.heap_size_bytes()
    del corpus
    log(f"[scale {n_docs}] built {build_s:.0f}s; warming up...")
    set_phase(f"scale{n_docs}:warmup")
    t0 = time.time()
    # exact-only battery: skip the banded fuzzy-sweep force-compiles
    # (minutes each at this dictionary size, and never used here)
    pers.warmup(sweep_compiles=False)
    out["warmup_s"] = round(time.time() - t0, 1)
    log(f"[scale {n_docs}] built {build_s:.0f}s, warmup {out['warmup_s']:.0f}s")
    if on_core is not None:
        on_core(dict(out))  # flush the build row NOW — measure stalls can't lose it
    if budget_left() - reserve < 120:
        log(f"[scale {n_docs}] budget exhausted after warmup — partial row")
        return out

    set_phase(f"scale{n_docs}:exact_engine")
    terms, tid_host = exact_query_ids(pers, vocab, N_EXACT_QUERIES)
    # retries=5: this row carries the headline vs_native_cpu ratio, and a
    # single degraded-link window swung it ~40% between r4/r5 captures
    per_iter, _w1, _w2 = engine_exact(pers, tid_host, backend, retries=5)
    out["exact_batched_engine_qps"] = round(len(tid_host) / per_iter, 1)
    log(
        f"[scale {n_docs}] exact engine: {out['exact_batched_engine_qps']:.0f} QPS"
    )

    # the single-core C++ baseline AT SCALE: at 100k docs the whole index is
    # L3-resident and a CPU core is hard to beat on 50-posting queries; the
    # honest comparison is where the index exceeds cache
    set_phase(f"scale{n_docs}:native_baseline")
    try:
        nb = native_cpu_baseline(pers, tid_host, reps=5)
        out.update(nb)
        strict = max(
            (nb[k] for k in ("native_cpu_raw_qps", "native_cpu_vint_qps")
             if nb.get(k)),
            default=None,
        )
        if strict:
            out["vs_native_cpu"] = round(
                out["exact_batched_engine_qps"] / strict, 2
            )
        log(f"[scale {n_docs}] native baseline: {nb}")
    except Exception as e:
        log(f"[scale {n_docs}] native baseline failed: {e!r}")

    if on_core is not None:
        on_core(dict(out))  # flush engine + vs_native_cpu immediately
    if budget_left() - reserve < 240:
        log(f"[scale {n_docs}] core row done; skipping extras (reserve)")
        return out
    # generator-shape serving e2e — BEST-EFFORT: in the r5 rehearsal this
    # phase ate 636s+ at 1M (fuzzy trees over zipf heads with ~500k postings
    # -> giant-capacity resolve compiles) and starved the 6M row, so it runs
    # under an alarm sized to what the reserve allows
    set_phase(f"scale{n_docs}:generator_serving")
    # at >=1M docs the AND-of-fuzzy-OR trees hit posting totals past the
    # warmable grid (c262144+ multi-slot variants compile for 10+ min in C,
    # immune to the alarm) — this extra has never landed in a TPU capture
    # and erodes the budget of the sections that do. Opt in explicitly.
    run_gen_extra = n_docs <= 200_000 or os.environ.get(
        "BENCH_SCALE_GENERATOR"
    )
    if not run_gen_extra:
        log(
            f"[scale {n_docs}] generator serving gated "
            "(BENCH_SCALE_GENERATOR=1 to run)"
        )
    else:
        try:
            with phase_deadline(
                min(240.0, budget_left() - reserve - 120), "generator_serving"
            ):
                # grid first: every completed cell persists to the compile
                # cache immediately, so even if the alarm fires mid-grid
                # this phase converges to warm across runs instead of
                # re-stalling forever
                import jax as _jax

                from veloci_tpu.search.batch import precompile_tree_grid

                for pend in precompile_tree_grid(pers, "all"):
                    _jax.device_get(pend[1][1].ravel()[0])
                _qt, reqs = generator_requests(
                    pers, vocab, min(100, N_EXACT_QUERIES)
                )
                search_batch(reqs, pers)  # warm
                t0 = time.perf_counter()
                search_batch(reqs, pers)
                out["generator_serving_e2e_qps"] = round(
                    len(reqs) / (time.perf_counter() - t0), 1
                )
                log(
                    f"[scale {n_docs}] generator serving: "
                    f"{out['generator_serving_e2e_qps']:.0f} QPS"
                )
        except PhaseTimeout:
            import traceback

            log(
                f"[scale {n_docs}] generator serving timed out (alarm) — "
                f"skipped; last frames:\n{traceback.format_exc(limit=6)}"
            )

    # warm sequential p50 (link-dominated on this tunnel; diagnostic)
    set_phase(f"scale{n_docs}:warm_seq")
    try:
        with phase_deadline(90.0, "warm_seq"):
            from veloci_tpu import search as search_one

            req = Request.from_dict(
                {"search_req": {"search": {"terms": [terms[0]], "path": "title"}}, "top": TOP_K}
            )
            search_one(req, pers)
            lat = []
            for t in terms[:10]:
                r = Request.from_dict(
                    {"search_req": {"search": {"terms": [t], "path": "title"}}, "top": TOP_K}
                )
                q0 = time.perf_counter()
                search_one(r, pers)
                lat.append(time.perf_counter() - q0)
            out["warm_seq_p50_ms"] = round(percentile(lat, 50) * 1e3, 1)
    except PhaseTimeout:
        log(f"[scale {n_docs}] warm_seq timed out (alarm) — skipped")

    if on_core is not None:
        on_core(dict(out))

    # cold start: save, then a fresh process loads + warms + answers one
    # query — the reference's mmap-load warm path analog. Diagnostic only
    # (not a headline), so it needs GENEROUS spare budget: the subprocess's
    # own axon device acquisition alone has cost 134-652s, and the deep-100k
    # battery (fuzzy/generic/generator) still has to run after the scales
    set_phase(f"scale{n_docs}:cold_start")
    if (
        os.environ.get("BENCH_COLDSTART", "1") != "0"
        and budget_left() - reserve > 1300
    ):
        import subprocess
        import tempfile

        d = tempfile.mkdtemp(prefix="veloci_bench_")
        t0 = time.time()
        pers.save(d)
        out["save_s"] = round(time.time() - t0, 1)
        # phase breakdown: device_init_s is the axon tunnel's per-process
        # device acquisition (measured 134-424s on its own, independent of
        # this code); warmup_s is OUR cost (H2D upload + compile-cache
        # loads); first_query_s is what a user feels after warmup
        code = (
            "import time, json, sys\n"
            "t0 = time.time()\n"
            "from veloci_tpu import Persistence, Request, search\n"
            f"p = Persistence.load({d!r})\n"
            "load_s = time.time() - t0\n"
            "t0 = time.time()\n"
            "import jax, jax.numpy as jnp\n"
            "float(jnp.ones((8, 8)).sum())\n"
            "init_s = time.time() - t0\n"
            "t0 = time.time()\n"
            "p.warmup(sweep_compiles=False)\n"
            "warm_s = time.time() - t0\n"
            "t0 = time.time()\n"
            "req = Request.from_dict({'search_req': {'search': "
            f"{{'terms': [{terms[0]!r}], 'path': 'title'}}}}, 'top': {TOP_K}}}) \n"
            "r = search(req, p)\n"
            "q_s = time.time() - t0\n"
            "laps = []\n"
            "for _ in range(5):\n"
            "    t0 = time.time(); search(req, p); laps.append(time.time() - t0)\n"
            "laps.sort()\n"
            "print(json.dumps({'load_s': round(load_s, 1), "
            "'device_init_s': round(init_s, 1), 'warmup_s': "
            "round(warm_s, 1), 'first_query_s': round(q_s, 2), "
            "'warm_query_p50_ms': round(laps[2] * 1e3, 1), "
            "'hits': len(r.data), "
            "**getattr(p, 'last_warmup_breakdown', {})}))\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=min(max(300, budget_left() * 0.6), 600),
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            )
            cold = json.loads(proc.stdout.strip().splitlines()[-1])
            out["cold_start"] = cold
            log(f"[scale {n_docs}] cold start: {cold}")
        except Exception as e:
            log(f"[scale {n_docs}] cold start failed: {e!r}")
        finally:
            import shutil

            shutil.rmtree(d, ignore_errors=True)
    return out


def test_large_summary(n_docs, backend="tpu", on_core=None) -> dict:
    """The reference's 6M-doc large-corpus benchmark, faithfully: a repeat
    corpus of ``{"type":"taschenbuch","title":"mein buch"}`` built and
    queried single-term (test_large_search.rs:23-45, the runnable
    large-search harness — bench_large_search.rs is bit-rotted out of the
    reference build). Captures build rate, index memory, cold first query
    (compile + H2D through the tunnel), warm p50, AND (round 5) the batched
    engine throughput + single-core native baseline at scale — the venue
    where the index is far outside CPU cache and the headline >= 10x bar
    actually lives (VERDICT r4 #7)."""
    from veloci_tpu import Persistence
    from veloci_tpu.query.generator import (
        SearchQueryGeneratorParameters,
        search_query,
    )
    from veloci_tpu.search.executor import search

    out = {"num_docs": n_docs, "corpus": "test_large_search.rs repeat doc"}
    set_phase(f"large{n_docs}:corpus_gen")
    log(f"[large {n_docs}] generating corpus...")
    doc = '{"type":"taschenbuch","title":"mein buch"}'
    data = "\n".join([doc] * n_docs)
    set_phase(f"large{n_docs}:index_build")
    log(f"[large {n_docs}] building index...")
    t0 = time.time()
    pers = Persistence.create_from_str(data, "{}")
    build_s = time.time() - t0
    out["build_s"] = round(build_s, 1)
    out["index_build_mb_per_s"] = round(pers.bytes_indexed / build_s / 1e6, 2)
    out["index_bytes"] = pers.heap_size_bytes()
    del data
    log(f"[large {n_docs}] built {build_s:.0f}s")
    if on_core is not None:
        on_core(dict(out))

    set_phase(f"large{n_docs}:cold_query")
    req = search_query(pers, SearchQueryGeneratorParameters(search_term="buch"))
    t0 = time.time()
    res = search(req, pers)
    out["cold_first_query_s"] = round(time.time() - t0, 2)
    out["num_hits"] = res.num_hits
    lat = []
    for _ in range(5):
        t0 = time.time()
        search(req, pers)
        lat.append(time.time() - t0)
    out["warm_p50_ms"] = round(percentile(lat, 50) * 1e3, 1)
    log(
        f"[large {n_docs}] {res.num_hits} hits; cold first query "
        f"{out['cold_first_query_s']}s, warm p50 {out['warm_p50_ms']}ms"
    )
    if on_core is not None:
        on_core(dict(out))
    if budget_left() < 120:
        return out

    # batched engine throughput at 6M: the reference's single query term
    # ("buch", one run of n_docs postings) — a small batch at the 6M-posting
    # capacity bucket; each query streams ~64 MB of postings from HBM, so
    # this measures the bandwidth-bound regime (no CPU cache to hide in)
    set_phase(f"large{n_docs}:exact_engine")
    try:
        dictionary = pers.get_dictionary("title")
        qterms = ["buch", "mein"] * 4
        tid_host = np.asarray(
            [int(dictionary.get_ignore_case(t)[0]) for t in qterms],
            dtype=np.int32,
        )
        per_iter, _w1, _w2 = engine_exact(
            pers, tid_host, backend, scan_depths=(2, 5)
        )
        out["exact_batched_engine_qps"] = round(len(qterms) / per_iter, 1)
        out["exact_engine_batch"] = len(qterms)
        log(
            f"[large {n_docs}] exact engine ({len(qterms)}/batch): "
            f"{out['exact_batched_engine_qps']:.0f} QPS"
        )
        set_phase(f"large{n_docs}:native_baseline")
        nb = native_cpu_baseline(pers, tid_host, reps=3)
        out.update(nb)
        strict = max(
            (nb[k] for k in ("native_cpu_raw_qps", "native_cpu_vint_qps")
             if nb.get(k)),
            default=None,
        )
        if strict:
            out["vs_native_cpu"] = round(
                out["exact_batched_engine_qps"] / strict, 2
            )
        log(
            f"[large {n_docs}] native baseline: {nb} -> "
            f"vs_native_cpu {out.get('vs_native_cpu')}"
        )
    except Exception as e:
        log(f"[large {n_docs}] engine/native at scale failed: {e!r}")
    if on_core is not None:
        on_core(dict(out))
    return out


def main() -> None:
    # Device-init watchdog: when the tunnel is down/half-up, axon backend
    # init blocks in C for up to ~25 min (observed) and can hang
    # indefinitely — unkillable from Python. If init + first op don't
    # complete within BENCH_DEVICE_PROBE_S, re-exec this process pinned to
    # XLA-CPU so the driver still gets a JSON line (flagged via
    # detail.backend). execve replaces the whole process, blocked C threads
    # included.
    _arm_guards()
    # persistent executable cache: the banded sweep kernels compile in
    # minutes on TPU; reruns on this checkout deserialise them in ~100 ms
    try:
        from veloci_tpu.compile_cache import enable_compile_cache

        cc = enable_compile_cache()
        if cc:
            log(f"compile cache: {cc}")
    except Exception as exc:  # never let cache plumbing kill the bench
        log(f"compile cache unavailable: {exc}")
    # the bench serves generator-shape trees too: warm the multi-slot
    # resolve cells as well (serving default is the cheaper "fuzzy" level)
    os.environ.setdefault("VELOCI_WARMUP_TREE_GRID", "all")
    device_ready = None
    if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        device_ready = threading.Event()

        def _watchdog():
            budget = float(os.environ.get("BENCH_DEVICE_PROBE_S", "540"))
            budget = min(budget, max(HARD_S - 420.0, 60.0))  # leave room for
            # the lean fallback battery before the hard deadline
            if not device_ready.wait(budget):
                log(
                    f"device init exceeded {budget:.0f}s — "
                    "re-exec on XLA-CPU fallback"
                )
                env = dict(
                    os.environ,
                    JAX_PLATFORMS="cpu",
                    BENCH_CPU_FALLBACK="1",
                    BENCH_START_TS=str(_ORIGIN),
                )
                os.execve(
                    sys.executable,
                    [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                    env,
                )

        threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from veloci_tpu import Persistence

    backend = jax.default_backend()
    if backend != "cpu":
        float(jnp.ones((2, 2)).sum())  # first op: a half-up tunnel hangs HERE
    if device_ready is not None:
        device_ready.set()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # Lean liveness mode (round-4 fix): the CPU fallback exists to prove the
    # harness is alive when the tunnel is down, NOT to grind the full
    # TPU-sized battery on a 1-core host (round 3's capture died doing
    # exactly that: fuzzy d=2 at 3455 ms/batch on [cpu]). Shrink to a
    # minutes-scale workload. The XLA-CPU proxy subprocess (BENCH_LITE) and
    # an explicit BENCH_FULL_CPU=1 run keep the full sizes.
    lean = bool(os.environ.get("BENCH_CPU_FALLBACK")) or (
        backend == "cpu"
        and not os.environ.get("BENCH_LITE")
        and not os.environ.get("BENCH_FULL_CPU")
    )
    global N_DOCS, N_EXACT_QUERIES, N_FUZZY_QUERIES
    if lean:
        N_DOCS = min(N_DOCS, 20_000)
        N_EXACT_QUERIES = min(N_EXACT_QUERIES, 16)
        N_FUZZY_QUERIES = min(N_FUZZY_QUERIES, 4)
        log(
            f"lean CPU-liveness mode: {N_DOCS} docs, {N_EXACT_QUERIES} "
            "exact queries; fuzzy/generic/scale/proxy sections skipped"
        )
    update_result(backend=backend, lean=lean)

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
        # the tunnel warm-up can eat many minutes; the scale-section budget
        # should start counting from here, not from process start
        globals()["_START"] = time.time()

    # declared section-cost table (VERDICT r4 #8): what the run intends to
    # spend, checked against budget_left() before each section starts
    log(
        "section plan (declared est / budget "
        f"{budget_left():.0f}s): build 30, exact 40, serving 15, seq 10, "
        "native 20, suggest 30, highlight 90, warmup <=600, fuzzy 240, "
        "generic 150, generator 240, scale_1M ~350, scale_6M ~400, "
        "proxy <=900"
    )

    set_phase("build_100k")
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
    update_result(
        section="build",
        num_docs=pers.num_docs,
        index_build_mb_per_s=round(pers.bytes_indexed / build_s / 1e6, 2),
        index_bytes=pers.heap_size_bytes(),
        link_round_trip_ms=round(link_rt_ms, 3),
    )

    dev = pers.device_field("title")
    num_docs = pers.num_docs

    # ---- query sets ------------------------------------------------------
    exact_terms, tid_host = exact_query_ids(pers, vocab, N_EXACT_QUERIES)

    # ---- engine-only batched exact throughput (the headline) -------------
    set_phase("exact_engine")
    per_iter, w1, w2 = engine_exact(pers, tid_host, backend)
    engine_ms_per_batch = per_iter * 1e3
    qps_batched = len(exact_terms) / per_iter
    log(
        f"[{backend}] exact batched ({len(exact_terms)}/batch): "
        f"{qps_batched:.0f} QPS engine-only, {engine_ms_per_batch:.3f} ms/batch "
        f"(walls {w1*1e3:.0f}/{w2*1e3:.0f} ms)"
    )
    update_result(
        section="exact_engine",
        value=qps_batched,
        engine_ms_per_batch=round(engine_ms_per_batch, 4),
        batch_size=len(exact_terms),
        methodology=(
            "on-device scan depth differencing (hoist-proof term-id "
            "perturbation); link cost cancels; serving-style per-query "
            "capacity sub-buckets"
        ),
    )

    # ---- end-to-end serving (search_batch API: host prep + dispatch + D2H)
    set_phase("serving")
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
    assert any(r.data for r in res_batch), "serving path returned no hits"
    log(
        f"[{backend}] serving e2e (search_batch, {len(reqs)} reqs): "
        f"{qps_serving:.0f} QPS ({serving_wall*1e3:.1f} ms incl. host prep + link)"
    )
    update_result(section="serving", serving_e2e_qps=round(qps_serving, 1))

    # ---- sequential dispatch (link-bound on this tunnel; diagnostic) -----
    set_phase("sequential")
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
    update_result(
        section="sequential",
        exact_sequential_qps=round(qps_seq, 1),
        exact_seq_p50_ms=round(percentile(lat, 50) * 1e3, 3),
        exact_seq_p99_ms=round(percentile(lat, 99) * 1e3, 3),
    )

    # exact sections only: the proxy subprocess (BENCH_LITE) and the lean
    # CPU-liveness fallback
    lite = bool(os.environ.get("BENCH_LITE")) or lean

    # ---- native single-core C++ baseline (reference hot path) ------------
    # seconds, and it gives every later ratio an honest denominator; runs
    # even in lean mode (the XLA-CPU proxy child BENCH_LITE skips it)
    native = {}
    try:
        if lite and not lean:
            raise RuntimeError("lite mode")
        set_phase("native_baseline")
        native = native_cpu_baseline(pers, tid_host)
        log(f"native single-core baseline: {native}")
        update_result(section="native_baseline", baselines=dict(native))
    except Exception as e:
        log(f"native baseline failed: {e!r}")

    # provisional headline ratio from the 100k native baselines; the 1M row
    # (strict venue) refines it below
    vs_baseline = 1.0
    native_strict = max(
        (native[k] for k in ("native_cpu_raw_qps", "native_cpu_vint_qps")
         if native.get(k)),
        default=None,
    )
    if native_strict:
        vs_baseline = qps_batched / native_strict
        update_result(
            vs_baseline=vs_baseline, vs_baseline_100k=round(vs_baseline, 2)
        )

    # ---- cheap aux sections BEFORE anything expensive ---------------------
    # suggest + highlight starved in BOTH the r3 and r4 captures behind the
    # fuzzy/generator sections (469s + 429s in r4); they cost ~60s together
    # and run unconditionally right after the 100k battery (VERDICT r4 #5)
    if not lite:
        _run_section("suggest", 30, section_suggest, pers, vocab, backend)
        _run_section("highlight", 90, section_highlight, backend)

    # scale plan decided EARLY: the deep battery below must leave enough
    # budget for the scale rows — the headline vs_baseline venue that
    # starved in r3/r4 (VERDICT r4 #1). Every battery section gates on
    # budget_left() minus this reserve; a slow startup (484s tunnel warm-up
    # observed this round) now shrinks the battery, never the scales.
    scales = {}
    default_scales = "" if backend == "cpu" else "1000000,6000000"
    scale_list = [
        int(s)
        for s in os.environ.get("BENCH_SCALES", default_scales).split(",")
        if s.strip()
    ]
    scale_est = {1_000_000: 450, 6_000_000: 500}
    scales_reserve = sum(scale_est.get(n, 400) for n in scale_list)

    # ---- deep 100k battery: fuzzy / generic / generator --------------------
    # On the ORIGINAL index, while its device buffers and this process's
    # compile caches are warm. Round 4 ran this after the scales on a
    # REBUILT index — the duplicate 40MB H2D took 172s in a good tunnel
    # window and 25+ minutes in a degraded one (r5 bench7), starving the
    # battery entirely. Every section is alarm-bounded, and the resolve
    # grid + banded sweeps were force-compiled by warmup above, so the
    # worst case is minutes, not the unbounded storms of r3/r4.
    if not lite:
        # H2D the window variants + force-compile the banded sweeps and the
        # many-term resolve grid NOW (disk-cache hits after the first run)
        set_phase("battery_warmup")
        warm_cap = min(600.0, max(budget_left() - scales_reserve - 700, 120.0))
        try:
            with phase_deadline(warm_cap, "battery_warmup"):
                w = pers.warmup()
            log(
                f"battery warmup {w:.1f}s "
                f"{getattr(pers, 'last_warmup_breakdown', {})}"
            )
        except PhaseTimeout:
            log(f"battery warmup timed out ({warm_cap:.0f}s) — serving "
                "sections pay remaining compiles inline")
        _run_section(
            "fuzzy", 240, section_fuzzy, pers, vocab, backend, pers.num_docs,
            reserve=scales_reserve,
        )
        _run_section(
            "generic", 150, section_generic,
            pers, exact_terms, tid_host, backend, pers.num_docs,
            reserve=scales_reserve,
        )
        _run_section(
            "generator", 240, section_generator,
            pers, vocab, len(exact_terms), backend, pers.num_docs,
            reserve=scales_reserve,
        )

    # ---- free the 100k battery state, then the scale sections -------------
    # The headline vs_baseline lives in the 1M row (at 100k the whole index
    # is CPU-cache-resident and a single core is near-unbeatable) and the
    # round-3/4 captures starved before landing it. 1M jmdict-like ~= the
    # real jmdict corpus scale; 6M runs the reference's OWN large-corpus
    # harness (test_large_search.rs).
    if scale_list:
        set_phase("free_100k")
        import gc

        pers.invalidate_device_cache()
        del pers, dev, reqs, corpus
        gc.collect()
    # each scale's best-effort extras must leave scale_est budget intact for
    # the scales still pending (r5 rehearsal: 1M's generator_serving stall
    # starved 6M entirely)
    for i, n in enumerate(scale_list):
        # entry thresholds sized so a started section can finish (observed
        # on this host: 1M corpus 6s + build 16s + warmup ~50s + measures;
        # 6M test_large ~ build 100-200s + one big-bucket compile + H2D)
        if budget_left() < (450 if n <= 1_000_000 else 350):
            log(f"skipping scale {n}: budget exhausted")
            continue
        pending_reserve = sum(
            scale_est.get(m, 400) for m in scale_list[i + 1 :]
        )
        try:

            def _flush_core(row, _n=n):
                update_result(scales=dict(scales, **{str(_n): row}))
                if _n == 1_000_000 and row.get("vs_native_cpu"):
                    # the headline ratio: engine vs strictest single-core
                    # native baseline AT SCALE — flush it NOW, before any
                    # later phase gets a chance to stall
                    update_result(vs_baseline=row["vs_native_cpu"])

            if n >= 6_000_000:
                scales[str(n)] = test_large_summary(
                    n, backend, on_core=_flush_core
                )
            else:
                scales[str(n)] = scale_summary(
                    n, backend, on_core=_flush_core, reserve=pending_reserve
                )
            update_result(section=f"scale_{n}", scales=dict(scales))
            row_vs = scales[str(n)].get("vs_native_cpu")
            if n == 1_000_000 and row_vs:
                update_result(vs_baseline=row_vs)
        except Exception as e:
            log(f"scale {n} failed: {e!r}")
        set_phase(f"free_scale{n}")
        import gc

        gc.collect()

    # ---- CPU proxy baseline (same kernels + methodology on host CPU) -----
    # LAST: it is a subprocess worth up to 900s that never sets the headline
    # (native raw/vint are stricter at 100k) — it must not starve the rows
    # above (round-3/4 lesson)
    cpu_qps = None
    if (
        not os.environ.get("BENCH_SKIP_CPU_PROXY")
        and not lean
        and not lite
        and budget_left() > 300
    ):
        import subprocess

        set_phase("cpu_proxy")
        try:
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["BENCH_DOCS"] = str(N_DOCS)
            env["BENCH_EXACT_QUERIES"] = str(N_EXACT_QUERIES)
            env["BENCH_FUZZY_QUERIES"] = "4"
            env["BENCH_SKIP_CPU_PROXY"] = "1"
            env["BENCH_SCALES"] = ""
            env["BENCH_LITE"] = "1"
            env.pop("BENCH_START_TS", None)  # proxy keeps its own deadline
            proc = subprocess.run(
                ["python", "-c",
                 "import jax; jax.config.update('jax_platforms','cpu');"
                 "import bench; bench.main()"],
                capture_output=True, text=True,
                timeout=min(900, max(120, budget_left() - 60)), env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            )
            cpu_json = json.loads(proc.stdout.strip().splitlines()[-1])
            cpu_qps = cpu_json["value"]
            log(f"cpu proxy: {cpu_qps} QPS batched engine-only")
        except Exception as e:
            log(f"cpu proxy failed: {e!r}")

    # ---- final assembly ----------------------------------------------------
    # vs_baseline_100k against the STRICTEST available 100k baseline; the
    # headline vs_baseline prefers the 1M row (strict venue) when it ran
    set_phase("final_assembly")
    candidates = {}
    if cpu_qps:
        candidates["xla_cpu_proxy"] = cpu_qps
    for k in ("native_cpu_raw_qps", "native_cpu_vint_qps"):
        if native.get(k):
            candidates[k] = native[k]
    strictest = max(candidates.values()) if candidates else None
    vs_baseline_100k = qps_batched / strictest if strictest else 1.0
    row_1m = scales.get("1000000", {})
    vs_baseline = row_1m.get("vs_native_cpu") or vs_baseline_100k
    d = _RESULT["detail"]
    d.pop("phase", None)
    d.pop("last_heartbeat_phase", None)
    update_result(
        section="baselines",
        value=qps_batched,
        vs_baseline=vs_baseline,
        cpu_proxy_batched_qps=cpu_qps,
        baselines={**native, "xla_cpu_proxy_qps": cpu_qps},
        vs_baseline_100k=round(vs_baseline_100k, 2),
        num_docs=num_docs,
        scales=scales,
    )
    emit_result(final=True)


def _run_section(name, est_s, fn, *args, reserve: float = 0.0) -> None:
    """Budget-gated, ALARM-BOUNDED section runner (VERDICT r4 #8). Each
    section declares its cost estimate up front; a section that would
    overrun the remaining budget is skipped LOUDLY instead of silently
    starving everything after it, and a running section is hard-capped at
    2.5x its estimate via SIGALRM (the r5 rehearsal's fuzzy section sat
    1366s in its first search_batch — compile storm or degraded link — and
    starved generic/generator/final assembly; with the alarm the run always
    reaches emit_result(final=True)). ``reserve`` is budget that must stay
    intact for LATER sections (the scale rows): a battery section never
    eats into it. Failures are contained per-section."""
    left = budget_left() - reserve
    if left < est_s:
        log(
            f"skip {name}: needs ~{est_s}s, only {left:.0f}s left "
            f"(after {reserve:.0f}s reserve)"
        )
        return
    set_phase(name)
    cap = min(max(2.5 * est_s, est_s + 240.0), max(left - 90.0, 60.0))
    t0 = time.time()
    try:
        with phase_deadline(cap, name):
            fn(*args)
    except PhaseTimeout:
        import traceback

        log(
            f"section {name} timed out (alarm at {cap:.0f}s) — partial; "
            f"last frames:\n{traceback.format_exc(limit=6)}"
        )
    except Exception as exc:
        log(f"{name} failed: {type(exc).__name__}: {exc}")
    log(f"section {name}: {time.time() - t0:.1f}s (declared ~{est_s}s)")


def section_suggest(pers, vocab, backend) -> None:
    """Reference suggest_multi (search_field.rs:194-219): prefix suggest
    through the batched device fast path."""
    from veloci_tpu import Request
    from veloci_tpu.search.executor import suggest as suggest_fn

    rng = np.random.default_rng(99)
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
    assert out_s, "suggest returned nothing"
    log(f"suggest (prefix, batched fan-out): {suggest_qps:.0f} QPS")
    update_result(section="suggest", suggest_qps=round(suggest_qps, 1))


def _highlight_measure(reps_hl: int = 20) -> float:
    """Gutenberg-style highlight measurement (reference
    bench_jmdict.rs:41-45): search + why_found + doc fetch + snippet
    assembly on a 2000-paragraph corpus. Pure host path (below
    SMALL_DOCS). Returns QPS; no logging/side effects so it can run in a
    clean subprocess."""
    from veloci_tpu import (
        Persistence,
        Request,
        search,
        search_to_result_with_doc,
    )

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
    t0 = time.perf_counter()
    for _ in range(reps_hl):
        res = search(req, book)
        out = search_to_result_with_doc(book, res, None)
    hl_qps = reps_hl / (time.perf_counter() - t0)
    assert out.data and out.data[0].why_found["content"]
    return hl_qps


def section_highlight(backend) -> None:
    """Highlight is a pure host path, but inside the TPU-client process
    the tunnel client's background threads contend for the GIL and tax it
    ~7x (r4/r5 captures: 231-239 QPS in-process vs ~1500 in a clean CPU
    process on the SAME host). Measure it where serving would run it —
    a process that isn't also driving a device link."""
    hl_qps, where = None, "inline"
    if backend != "cpu":
        import subprocess

        code = (
            "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
            "import importlib.util\n"
            f"spec = importlib.util.spec_from_file_location('benchmod', {os.path.abspath(__file__)!r})\n"
            "m = importlib.util.module_from_spec(spec)\n"
            "spec.loader.exec_module(m)\n"
            "print('HLQPS', m._highlight_measure(50), flush=True)\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=240,
                env=dict(os.environ, JAX_PLATFORMS="cpu"),
            )
            for line in proc.stdout.splitlines():
                if line.startswith("HLQPS "):
                    hl_qps, where = float(line.split()[1]), "cpu_subprocess"
        except Exception as exc:
            log(f"highlight subprocess failed ({exc}); measuring inline")
    if hl_qps is None:
        hl_qps = _highlight_measure()
    log(f"highlight (search+why_found+doc fetch): {hl_qps:.1f} QPS [{where}]")
    update_result(
        section="highlight",
        highlight_qps=round(hl_qps, 1),
        highlight_measured_in=where,
    )


def section_fuzzy(pers, vocab, backend, num_docs) -> None:
    """Fuzzy d=2, batched. Serving route: prefetched batched sweep + the
    sorted tree kernel with per-query capacity sub-bucketing (search_batch).
    Engine-only: the serving-route mirror (windowed sweep + tree resolve at
    known buckets), or the legacy fused kernel when VELOCI_FUZZY_VIA_TREE=0.
    Also measures the native single-core fuzzy baseline (VERDICT r3 #4)."""
    import jax.numpy as jnp

    from veloci_tpu import Request
    from veloci_tpu.search.batch import search_batch

    fq = min(N_FUZZY_QUERIES if backend != "cpu" else 8, N_FUZZY_QUERIES)
    fuzzy_terms, fqueries, fqlens = fuzzy_query_arrays(vocab, fq)
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
        for t in fuzzy_terms
    ]
    set_phase("fuzzy:first_serve")  # r5 rehearsal stalled 1366s right here
    fres = search_batch(freqs, pers)
    assert any(r.data for r in fres), "fuzzy serving returned no hits"
    log(f"[{backend}] fuzzy first serve done")
    # warm to the hint/compile fixed point: adaptive capacity hints and
    # window variants settle over the first passes (each drift compiles
    # fresh shapes — the round-3 capture measured a pass full of
    # compiles); stop when a pass is within 20% of the previous one
    set_phase("fuzzy:warm_passes")
    prev = None
    for _wp in range(4):
        if budget_left() < 180:
            break
        t0 = time.perf_counter()
        search_batch(freqs, pers)
        dt = time.perf_counter() - t0
        if prev is not None and dt < prev * 1.2:
            break
        prev = dt
    set_phase("fuzzy:serving_measure")
    t0 = time.perf_counter()
    search_batch(freqs, pers)
    fuzzy_serving_qps = fq / (time.perf_counter() - t0)
    log(f"[{backend}] fuzzy serving e2e: {fuzzy_serving_qps:.0f} QPS")
    update_result(fuzzy_serving_e2e_qps=round(fuzzy_serving_qps, 1))

    set_phase("fuzzy:engine")
    if os.environ.get("VELOCI_FUZZY_VIA_TREE", "1") != "0":
        # engine mirror of the DEFAULT serving route: windowed prefetch
        # sweep + tree-kernel resolve at known buckets
        per_f = _fuzzy_tree_engine(
            pers, [t for t in fuzzy_terms[:fq]], backend, num_docs
        )
    else:
        per_f = _fuzzy_fused_engine(
            pers, pers.device_field("title"), fuzzy_terms, fq, fqueries,
            fqlens, backend, num_docs,
        )
    fuzzy_ms_per_batch = per_f * 1e3
    qps_fuzzy_batched = fq / per_f
    log(
        f"[{backend}] fuzzy d=2 batched ({fq}/batch): "
        f"{qps_fuzzy_batched:.0f} QPS engine-only, "
        f"{fuzzy_ms_per_batch:.2f} ms/batch"
    )
    update_result(
        section="fuzzy",
        fuzzy_d2_batched_qps=round(qps_fuzzy_batched, 1),
        fuzzy_ms_per_batch=round(fuzzy_ms_per_batch, 3),
        fuzzy_serving_e2e_qps=round(fuzzy_serving_qps, 1),
    )

    # native single-core fuzzy baseline (VERDICT r3 #4): the reference's
    # Levenshtein-automaton x FST walk as a sorted-dictionary walk with
    # dead-prefix skipping + the same resolve/top_n_sort tail
    # (native/baseline.cpp vbl_fuzzy_topk; search_field.rs:85-96,400-504)
    set_phase("fuzzy:native_baseline")
    try:
        from veloci_tpu.native import baseline_fuzzy_index, baseline_fuzzy_topk

        dictionary_f = pers.get_dictionary("title")
        fidx = baseline_fuzzy_index(dictionary_f)
        if fidx is not None:
            store_f = pers.anchor_scores["title.textindex.to_anchor_id_score"]
            # engine parity: distance capped at len(term)-1
            fdists_eff = np.array(
                [min(2, max(len(t) - 1, 0)) for t in fuzzy_terms[:fq]],
                dtype=np.int32,
            )
            args = (
                fidx, fqueries[:fq], fqlens[:fq], fdists_eff,
                store_f.offsets, store_f.anchors, store_f.scores, TOP_K,
            )
            baseline_fuzzy_topk(*args)  # warm (page faults)
            reps_f = 3
            t0 = time.perf_counter()
            for _ in range(reps_f):
                baseline_fuzzy_topk(*args)
            nf_qps = round(fq / ((time.perf_counter() - t0) / reps_f), 1)
            vs_f = round(qps_fuzzy_batched / nf_qps, 2) if nf_qps else None
            log(
                f"native fuzzy baseline: {nf_qps} QPS single-core "
                f"(vs_baseline_fuzzy {vs_f})"
            )
            update_result(native_cpu_fuzzy_qps=nf_qps, vs_baseline_fuzzy=vs_f)
    except Exception as exc:
        log(f"native fuzzy baseline failed: {type(exc).__name__}: {exc}")


def section_generic(pers, exact_terms, tid_host, backend, num_docs) -> None:
    """Generic batched: filter + Log10 boost + facet in ONE program —
    BASELINE.json configs 3-5 via the round-3 sorted tree kernel
    (ops/tree_step.py), the program search_batch actually dispatches."""
    import jax.numpy as jnp

    from veloci_tpu import Request
    from veloci_tpu.create import BOOST_VALID_TO_VALUE
    from veloci_tpu.ops.postings import bucket_size
    from veloci_tpu.ops.tree_step import batched_tree_topk
    from veloci_tpu.search.batch import search_batch
    from veloci_tpu.search.facet import facet_matrix

    dev = pers.device_field("title")
    comb = pers.device_combined()
    base_t, _nk = comb.key_base["title"]
    cat_dict = pers.get_dictionary("cat")
    cat_store = pers.anchor_scores["cat.textindex.to_anchor_id_score"]
    cat_ho = np.asarray(cat_store.offsets)

    gq = len(tid_host)
    masks = []
    for i in range(16):
        cid = int(cat_dict.get_ignore_case(f"c{i}")[0])
        s, e = int(cat_ho[cid]), int(cat_ho[cid + 1])
        fa = np.asarray(cat_store.anchors[s:e], dtype=np.int32)
        m = np.zeros(num_docs, dtype=bool)
        m[fa] = True
        masks.append(m)
    fmask_stack = jnp.asarray(np.stack(masks))
    bv_j, pres_j = pers.device_boost("pop" + BOOST_VALID_TO_VALUE)
    fmat, _g = facet_matrix(pers, "cat")
    ho = dev.host_offsets
    # per-query capacity sub-buckets, exactly like _run_generic_group;
    # width floor mirrors packed's guaranteed tail pad (ADVICE r4 #2:
    # clamp to the actual slice_pad so the masked window stays in-bounds)
    counts_all = np.diff(ho[: dev.num_score_keys + 1])
    slice_pad = bucket_size(int(counts_all.max()) if len(counts_all) else 1)
    g_counts = ho[tid_host + 1] - ho[tid_host]
    g_sub = {}
    for i, c in enumerate(g_counts):
        g_sub.setdefault(
            min(bucket_size(max(int(c), 1), 256), slice_pad), []
        ).append(i)
    g_caps = []
    g_bucket_args = []
    for cap, idxs in sorted(g_sub.items()):
        g_caps.append(cap)
        g_bucket_args.append(
            (
                jnp.asarray((tid_host[idxs] + base_t).astype(np.int32)[:, None]),
                jnp.asarray(np.full((len(idxs), 1), 10.0, np.float32)),
                jnp.asarray(np.zeros((len(idxs), 1), np.int32)),
                jnp.asarray(np.ones(len(idxs), np.int32)),
                jnp.asarray((np.asarray(idxs) % 16).astype(np.int32)),
            )
        )
    log(
        "generic buckets: "
        + ", ".join(
            f"{cap}x{int(t.shape[0])}"
            for cap, (t, *_r) in zip(g_caps, g_bucket_args)
        )
    )

    def generic_body(carry, ops):
        # filter masks / boost columns / facet matrix / postings all ride
        # as jit arguments — closed over they become program CONSTANTS
        # and XLA constant-folds [NF, num_docs] gathers for seconds per
        # recompile (the round-3 capture killer)
        offs_c, packed_c, fmask_o, bv_o, pres_o, fmat_o, bucks = ops
        off = (carry * jnp.float32(1e-20)).astype(jnp.int32)
        acc = jnp.float32(0.0)
        for cap, (t_j, s_j, sl_j, ng_j, fi_j) in zip(g_caps, bucks):
            _ids, scores, _nh, _fc = batched_tree_topk(
                offs_c, None, None,
                t_j + off, s_j, sl_j, ng_j,
                fmask_o, fi_j, None,
                ((bv_o, pres_o, None),),
                (fmat_o,),
                capacity=0,
                num_docs=num_docs,
                k=TOP_K,
                boost_specs=(("Log10", 1.0, ()),),
                packed=packed_c,
                slice_widths=(cap,),
                single_slot=True,
            )
            acc = acc + scores[0, 0]
        return acc * jnp.float32(1e-12)

    gn1, gn2 = (2, 6) if backend == "cpu" else (3, 13)
    per_g, _, _ = measure_scan(
        generic_body, gn1, gn2, retries=1,
        operands=(
            comb.offsets, comb.packed, fmask_stack, bv_j, pres_j, fmat,
            tuple(g_bucket_args),
        ),
    )
    generic_ms = per_g * 1e3
    qps_generic = gq / per_g
    log(
        f"[{backend}] generic batched (filter+Log10 boost+facet, "
        f"{gq}/batch): {qps_generic:.0f} QPS engine-only, "
        f"{generic_ms:.2f} ms/batch"
    )
    update_result(
        section="generic",
        generic_batched_qps=round(qps_generic, 1),
        generic_ms_per_batch=round(generic_ms, 3),
    )

    # serving e2e through search_batch (host prep incl. filter resolve)
    greqs = [
        Request.from_dict(
            {
                "search_req": {"search": {"terms": [t], "path": "title"}},
                "filter": {
                    "search": {"terms": [f"c{i % 16}"], "path": "cat"}
                },
                "boost": [{"path": "pop", "boost_fun": "Log10", "param": 1}],
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
    update_result(generic_serving_e2e_qps=round(generic_serving_qps, 1))


def section_generator(pers, vocab, nq, backend, num_docs) -> None:
    """Generator-shape serving (the canonical front door): free text ->
    auto-levenshtein fuzzy leaves expanded across fields, OR and AND-of-ORs
    (query_generator.rs:85-99) — batched through search_batch, plus an
    engine-only replay of the exact dispatch plan."""
    import jax.numpy as jnp

    from veloci_tpu.ops.postings import bucket_size
    from veloci_tpu.ops.tree_step import batched_tree_topk
    from veloci_tpu.search import batch as batch_mod
    from veloci_tpu.search import stats as stats_mod
    from veloci_tpu.search.batch import search_batch

    _qt, genreqs = generator_requests(pers, vocab, nq)
    search_batch(genreqs, pers)  # warm (sweep prefetch + kernels)
    stats_mod.reset()
    t0 = time.perf_counter()
    search_batch(genreqs, pers)
    generator_serving_qps = len(genreqs) / (time.perf_counter() - t0)
    snap = stats_mod.snapshot()
    generator_fallbacks = snap["paths"].get("per_request_fallback", 0)
    log(
        f"[{backend}] generator serving e2e ({len(genreqs)} reqs, "
        f"fuzzy OR + AND-of-ORs): {generator_serving_qps:.0f} QPS "
        f"({generator_fallbacks} fallbacks)"
    )

    # engine-only: replay the exact dispatch plan the serving path builds
    # for this batch (sub-bucketed sorted tree kernels over the prefetched
    # fuzzy matches) inside the scan harness
    comb = pers.device_combined()
    batch_mod._prefetch_request_fuzzy(pers, genreqs)
    specs = []
    for r in genreqs:
        t = batch_mod._tree_spec(pers, comb, r.search_req)
        if t is not None:
            specs.append(t)
    ho_c = comb.host_offsets
    from veloci_tpu.ops.postings import MAX_SORT_CAPACITY as _MSC

    sub = {}
    spec_runs = {}
    for i, (gtids, ng) in enumerate(specs):
        runs = sorted(
            ((int(ho_c[e[0] + 1] - ho_c[e[0]]) , e) for e in gtids),
            key=lambda t: -t[0],
        )
        tot = sum(r for r, _e in runs)
        if not runs or tot > _MSC:
            continue
        spec_runs[i] = [e for _r, e in runs]
        sslot = ng == 1 and len({e[2] for e in gtids}) == 1
        key = batch_mod._resolve_plan_key([r for r, _e in runs], tot, sslot)
        if key[0] == "x":
            continue
        sub.setdefault(key, []).append(i)
    plan = []
    plan_bits = []
    for key, all_idxs in sorted(sub.items()):
        if key[0] == "s":
            _t, cap_big, cap_rest, sslot = key
            plan_bits.append(f"{cap_big}+{cap_rest}x{len(all_idxs)}")
        elif key[0] == "m":
            _t, capacity, _tp, sslot = key
            plan_bits.append(f"m{capacity}t{_tp}x{len(all_idxs)}")
        else:
            _t, capacity, sslot = key
            plan_bits.append(f"c{capacity}x{len(all_idxs)}")
        chunk_n = batch_mod._COMPACT_Q if key[0] == "m" else len(all_idxs)
        for base in range(0, len(all_idxs), chunk_n):
            idxs = all_idxs[base : base + chunk_n]
            if key[0] == "m":
                t_pad = key[2]
                q_pad = (
                    min(bucket_size(len(idxs), 8), batch_mod._COMPACT_Q)
                    if key[3]
                    else (8 if len(idxs) <= 8 else batch_mod._COMPACT_Q)
                )
                widths, cap = (), key[1]
            else:
                t_pad = bucket_size(max(len(specs[i][0]) for i in idxs), 8)
                q_pad = bucket_size(len(idxs), 8)
                widths = (
                    batch_mod._slice_widths(cap_big, cap_rest, t_pad)
                    if key[0] == "s"
                    else ()
                )
                cap = 0 if key[0] == "s" else key[1]
            tid = np.full((q_pad, t_pad), -1, np.int32)
            tsc = np.zeros((q_pad, t_pad), np.float32)
            tsl = np.zeros((q_pad, t_pad), np.int32)
            ngs = np.ones(q_pad, np.int32)
            for row, i in enumerate(idxs):
                _gt, ng = specs[i]
                for j, (g, sc, sl) in enumerate(spec_runs[i][:t_pad]):
                    tid[row, j] = g
                    tsc[row, j] = sc
                    tsl[row, j] = sl
                ngs[row] = ng
            plan.append(
                (
                    (widths, cap, key[3]),
                    jnp.asarray(tid), jnp.asarray(tsc), jnp.asarray(tsl),
                    jnp.asarray(ngs),
                )
            )
    log("generator engine plan: " + ", ".join(plan_bits))
    plan_static = [p[0] for p in plan]
    plan_arrays = tuple(tuple(p[1:]) for p in plan)

    def gen_body(carry, ops):
        offs_c2, packed_c2, plan_o = ops
        off = (carry * jnp.float32(1e-20)).astype(jnp.int32)
        acc = jnp.float32(0.0)
        for (widths, cap, sslot), (tid_j, tsc_j, tsl_j, ng_j) in zip(
            plan_static, plan_o
        ):
            _i, scores, _n, _f = batched_tree_topk(
                offs_c2, None, None,
                tid_j + off, tsc_j, tsl_j, ng_j,
                None, None, None, (), (),
                capacity=cap, num_docs=num_docs, k=TOP_K,
                packed=packed_c2, slice_widths=widths,
                single_slot=sslot,
            )
            acc = acc + scores[0, 0]
        return acc * jnp.float32(1e-12)

    per_ge, _, _ = measure_scan(
        gen_body, *((2, 6) if backend == "cpu" else (3, 13)), retries=1,
        operands=(comb.offsets, comb.packed, plan_arrays),
    )
    n_planned = sum(len(v) for v in sub.values())
    generator_engine_qps = max(n_planned, 1) / per_ge
    log(
        f"[{backend}] generator batched engine ({len(specs)} specs): "
        f"{generator_engine_qps:.0f} QPS, {per_ge*1e3:.2f} ms/batch"
    )
    update_result(
        section="generator",
        generator_serving_e2e_qps=round(generator_serving_qps, 1),
        generator_batched_engine_qps=round(generator_engine_qps, 1),
        generator_fallbacks=generator_fallbacks,
    )


if __name__ == "__main__":
    main()
