"""Pallas TPU kernel for the batched Levenshtein dictionary sweep.

The XLA formulation (ops/levenshtein.py) materialises `[N, 33]` DP rows in
HBM between fused passes; this kernel tiles the dictionary into VMEM-resident
term tiles (chars transposed to ``[L, N]`` so terms ride the 128-lane axis)
and runs the whole DP in VMEM: a `fori_loop` over query chars with the
33-step row relaxation fully unrolled — ~1k VPU ops per tile, zero HBM
traffic for intermediates.

Outputs per term: the full-term edit distance and the min distance over term
prefixes (the `starts_with()` automaton criterion). The surrounding jittable
wrapper computes the is-prefix flag with plain jnp and falls back to the XLA
sweep off-TPU (tests run it in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .levenshtein import MAX_QUERY_CHARS

__all__ = [
    "levenshtein_sweep_pallas",
    "levenshtein_sweep_pallas_banded",
    "levenshtein_sweep_pallas_banded_batch",
]

_BIG = np.int32(1 << 20)
TILE_N = 1024
L = 32  # term width == indices.MAX_TERM_CHARS


def _kernel(query_ref, qlen_ref, chars_ref, len_ref, dist_ref, prefix_ref):
    """One term tile: chars_ref [L, TILE_N], len_ref [1, TILE_N]."""
    qlen = qlen_ref[0]
    chars = chars_ref[:, :].astype(jnp.int32)  # [L, TILE_N]
    lens = len_ref[0, :]  # [TILE_N]

    # D rows stacked [L+1, TILE_N]; D[j] = lev(query_prefix, term[:j])
    init = jax.lax.broadcasted_iota(jnp.int32, (L + 1, TILE_N), 0)

    def step(i, D):
        qc = query_ref[i]
        new_rows = [jnp.full((TILE_N,), i + 1, dtype=jnp.int32)]
        prev = new_rows[0]
        for j in range(1, L + 1):
            cost = (chars[j - 1, :] != qc).astype(jnp.int32)
            cand = jnp.minimum(D[j, :] + 1, D[j - 1, :] + cost)
            prev = jnp.minimum(prev + 1, cand)
            new_rows.append(prev)
        D_new = jnp.stack(new_rows, axis=0)
        return jnp.where(i < qlen, D_new, D)

    D = jax.lax.fori_loop(0, MAX_QUERY_CHARS, step, init)

    js = jax.lax.broadcasted_iota(jnp.int32, (L + 1, TILE_N), 0)
    lens_b = lens[None, :]
    dist = jnp.sum(jnp.where(js == lens_b, D, 0), axis=0)
    prefix_dist = jnp.min(jnp.where(js <= lens_b, D, _BIG), axis=0)
    valid = lens > 0
    dist_ref[0, :] = jnp.where(valid, dist, _BIG)
    prefix_ref[0, :] = jnp.where(valid, prefix_dist, _BIG)


@functools.partial(jax.jit, static_argnames=("interpret",))
def levenshtein_sweep_pallas(
    chars_t: jax.Array,  # [L, N_pad] uint16 — TRANSPOSED char matrix
    term_lens: jax.Array,  # [N_pad] int32
    query: jax.Array,  # [MAX_QUERY_CHARS] uint16
    query_len: jax.Array,  # scalar int32
    interpret: bool = False,
):
    l, n = chars_t.shape
    assert l == L and n % TILE_N == 0
    grid = (n // TILE_N,)

    dist, prefix_dist = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # query chars + length in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, TILE_N), lambda t, *_: (0, t)),
                pl.BlockSpec((1, TILE_N), lambda t, *_: (0, t)),
            ],
            out_specs=[
                pl.BlockSpec((1, TILE_N), lambda t, *_: (0, t)),
                pl.BlockSpec((1, TILE_N), lambda t, *_: (0, t)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(
        query.astype(jnp.int32),
        query_len.reshape(1).astype(jnp.int32) if query_len.ndim == 0 else query_len.astype(jnp.int32),
        chars_t,
        term_lens.reshape(1, n),
    )
    dist = dist[0]
    prefix_dist = prefix_dist[0]

    # is-prefix flag (plain jnp; one fused comparison pass)
    pos = jnp.arange(l, dtype=jnp.int32)
    eq = (chars_t.astype(jnp.int32) == query[:l].astype(jnp.int32)[:, None]) | (
        pos[:, None] >= query_len
    )
    is_prefix = jnp.all(eq, axis=0) & (term_lens >= query_len) & (term_lens > 0)
    return dist, prefix_dist, is_prefix


# --------------------------------------------------------------------------
# Banded variant: edit distances are only needed up to d<=4 for matching, so
# the DP restricts to the |i-j| <= D_BAND diagonal band — 9 relaxations per
# query char instead of 33. Distances beyond the band report as _BIG (they
# cannot match). NOT valid for starts_with scoring, where matched terms can
# have full-term distance > d (the wrapper in field_search keeps the
# full-width sweep for that case).
# --------------------------------------------------------------------------

D_BAND = 4
_W = 2 * D_BAND + 1


def _kernel_banded(
    band, query_ref, qlen_ref, chars_ref, len_ref, dist_ref, prefix_ref, chars32
):
    D_BAND = band
    _W = 2 * band + 1
    qlen = qlen_ref[0]
    lens = len_ref[0, :]
    # stage chars as i32 — Mosaic only supports dynamic sublane loads on
    # 32-bit tiles ((8,128) tiling), not on the u16 input
    chars32[:, :] = chars_ref[:, :].astype(jnp.int32)

    # B[o] = D[i][i + o - D_BAND]; init row i=0: D[0][j] = j
    init_rows = []
    for oi in range(_W):
        o = oi - D_BAND
        if o >= 0:
            init_rows.append(jnp.full((TILE_N,), o, dtype=jnp.int32))
        else:
            init_rows.append(jnp.full((TILE_N,), _BIG, dtype=jnp.int32))
    init = jnp.stack(init_rows, axis=0)  # [_W, TILE_N]

    # fully unrolled over query chars: every chars row index is STATIC, so
    # Mosaic emits plain vector loads (no dynamic-slice shuffles)
    B = [init[oi] for oi in range(_W)]
    for i in range(1, MAX_QUERY_CHARS + 1):
        qc = query_ref[i - 1]
        active = i <= qlen
        prev = jnp.full((TILE_N,), _BIG, dtype=jnp.int32)
        new_rows = []
        for oi in range(_W):
            o = oi - D_BAND
            j_idx = i + o  # static!
            if j_idx < 0 or j_idx > L:
                val = jnp.full((TILE_N,), _BIG, dtype=jnp.int32)
            elif j_idx == 0:
                val = jnp.full((TILE_N,), i, dtype=jnp.int32)
            else:
                cost = (chars32[j_idx - 1, :] != qc).astype(jnp.int32)
                up = B[oi + 1] + 1 if oi + 1 < _W else jnp.full((TILE_N,), _BIG, jnp.int32)
                diag = B[oi] + cost
                val = jnp.minimum(jnp.minimum(up, diag), prev + 1)
                val = jnp.minimum(val, _BIG)
            prev = val
            new_rows.append(val)
        B = [jnp.where(active, n_, b_) for n_, b_ in zip(new_rows, B)]
    B = jnp.stack(B, axis=0)

    # dist = D[qlen][len] when |len - qlen| <= D_BAND
    off = lens - qlen + D_BAND  # band index of the term end
    dist = jnp.full((TILE_N,), _BIG, dtype=jnp.int32)
    prefix_dist = jnp.full((TILE_N,), _BIG, dtype=jnp.int32)
    for oi in range(_W):
        o = oi - D_BAND
        dist = jnp.where(off == oi, B[oi, :], dist)
        # prefix j = qlen + o must satisfy 0 <= j <= len
        ok = (qlen + o >= 0) & (qlen + o <= lens)
        prefix_dist = jnp.minimum(prefix_dist, jnp.where(ok, B[oi, :], _BIG))
    valid = lens > 0
    dist_ref[0, :] = jnp.where(valid, dist, _BIG)
    prefix_ref[0, :] = jnp.where(valid, prefix_dist, _BIG)


TILE_N_BATCH = 4096


def _kernel_banded_batch_dyn(
    band, query_ref, qlen_ref, chars_ref, len_ref, dist_ref, prefix_ref, chars32
):
    """Dynamic-length variant of `_kernel_banded_batch`: the DP loop over
    query chars is a ``fori_loop`` bounded by EACH query's actual length
    instead of a full 32-step unroll. Typical fuzzy traffic is 5-9 chars, so
    this does ~3-5x less DP per (query, tile). The price: the chars row
    index ``j = i + o`` becomes dynamic — Mosaic supports dynamic sublane
    loads on the 32-bit staged tile (the reason the ``chars32`` scratch
    exists), at slightly higher per-access cost than the static unroll.
    Semantics are identical (parity-tested in interpret mode)."""
    D_BAND = band
    _W = 2 * band + 1
    nq = dist_ref.shape[0]
    lens = len_ref[0, :]
    chars32[:, :] = chars_ref[:, :].astype(jnp.int32)

    def one_query(q, _):
        qlen = jnp.minimum(qlen_ref[q], MAX_QUERY_CHARS)
        init_rows = []
        for oi in range(_W):
            o = oi - D_BAND
            if o >= 0:
                init_rows.append(jnp.full((TILE_N_BATCH,), o, dtype=jnp.int32))
            else:
                init_rows.append(jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32))
        B0 = jnp.stack(init_rows, axis=0)  # [_W, TILE]

        def qstep(i, B):
            qc = query_ref[q, i - 1]
            i_vec = jnp.full((TILE_N_BATCH,), 0, dtype=jnp.int32) + i
            prev = jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32)
            new_rows = []
            for oi in range(_W):
                o = oi - D_BAND
                j_idx = i + o  # traced scalar
                row = chars32[jnp.clip(j_idx - 1, 0, L - 1), :]
                cost = (row != qc).astype(jnp.int32)
                up = (
                    B[oi + 1] + 1
                    if oi + 1 < _W
                    else jnp.full((TILE_N_BATCH,), _BIG, jnp.int32)
                )
                diag = B[oi] + cost
                val = jnp.minimum(jnp.minimum(up, diag), prev + 1)
                # j == 0 -> D[i][0] = i; j < 0 or j > L -> outside the DP
                val = jnp.where(j_idx == 0, i_vec, val)
                val = jnp.where((j_idx < 0) | (j_idx > L), _BIG, val)
                val = jnp.minimum(val, _BIG)
                prev = val
                new_rows.append(val)
            return jnp.stack(new_rows, axis=0)

        B = jax.lax.fori_loop(1, qlen + 1, qstep, B0)

        off = lens - qlen + D_BAND
        dist = jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32)
        prefix_dist = jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32)
        for oi in range(_W):
            o = oi - D_BAND
            dist = jnp.where(off == oi, B[oi], dist)
            ok = (qlen + o >= 0) & (qlen + o <= lens)
            prefix_dist = jnp.minimum(prefix_dist, jnp.where(ok, B[oi], _BIG))
        valid = lens > 0
        dist_ref[q, :] = jnp.where(valid, dist, _BIG)
        prefix_ref[q, :] = jnp.where(valid, prefix_dist, _BIG)
        return 0

    jax.lax.fori_loop(0, nq, one_query, 0)


def _kernel_banded_batch(
    band, query_ref, qlen_ref, chars_ref, len_ref, dist_ref, prefix_ref, chars32
):
    """Banded DP for one term tile x ALL queries. The query loop runs INSIDE
    the kernel (fori_loop) over a VMEM-staged chars tile: one fat program per
    tile instead of tiles*Q tiny ones — per-program fixed overhead dominated
    the (tile, query) grid formulation (measured ~44us/program)."""
    D_BAND = band
    _W = 2 * band + 1
    nq = dist_ref.shape[0]
    lens = len_ref[0, :]
    chars32[:, :] = chars_ref[:, :].astype(jnp.int32)

    def one_query(q, _):
        qlen = qlen_ref[q]
        init_rows = []
        for oi in range(_W):
            o = oi - D_BAND
            if o >= 0:
                init_rows.append(jnp.full((TILE_N_BATCH,), o, dtype=jnp.int32))
            else:
                init_rows.append(jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32))
        B = init_rows
        for i in range(1, MAX_QUERY_CHARS + 1):
            qc = query_ref[q, i - 1]
            active = i <= qlen
            prev = jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32)
            new_rows = []
            for oi in range(_W):
                o = oi - D_BAND
                j_idx = i + o
                if j_idx < 0 or j_idx > L:
                    val = jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32)
                elif j_idx == 0:
                    val = jnp.full((TILE_N_BATCH,), i, dtype=jnp.int32)
                else:
                    cost = (chars32[j_idx - 1, :] != qc).astype(jnp.int32)
                    up = (
                        B[oi + 1] + 1
                        if oi + 1 < _W
                        else jnp.full((TILE_N_BATCH,), _BIG, jnp.int32)
                    )
                    diag = B[oi] + cost
                    val = jnp.minimum(jnp.minimum(up, diag), prev + 1)
                    val = jnp.minimum(val, _BIG)
                prev = val
                new_rows.append(val)
            B = [jnp.where(active, n_, b_) for n_, b_ in zip(new_rows, B)]

        off = lens - qlen + D_BAND
        dist = jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32)
        prefix_dist = jnp.full((TILE_N_BATCH,), _BIG, dtype=jnp.int32)
        for oi in range(_W):
            o = oi - D_BAND
            dist = jnp.where(off == oi, B[oi], dist)
            ok = (qlen + o >= 0) & (qlen + o <= lens)
            prefix_dist = jnp.minimum(prefix_dist, jnp.where(ok, B[oi], _BIG))
        valid = lens > 0
        dist_ref[q, :] = jnp.where(valid, dist, _BIG)
        prefix_ref[q, :] = jnp.where(valid, prefix_dist, _BIG)
        return 0

    jax.lax.fori_loop(0, nq, one_query, 0)


def _dyn_default() -> bool:
    import os

    return os.environ.get("VELOCI_DYNLEN_SWEEP", "1") != "0"


@functools.partial(jax.jit, static_argnames=("interpret", "band", "dyn"))
def levenshtein_sweep_pallas_banded_batch(
    chars_t: jax.Array,  # [L, N_pad] uint16
    term_lens: jax.Array,  # [N_pad] int32
    queries: jax.Array,  # [Q, MAX_QUERY_CHARS] uint16
    query_lens: jax.Array,  # [Q] int32
    interpret: bool = False,
    band: int = D_BAND,
    dyn: bool | None = None,
):
    """Batched banded sweep: ONE kernel for a whole query batch.

    Returns (dist [Q, N], prefix_dist [Q, N], is_prefix [Q, N]). The chars
    tile stays VMEM-resident across the inner query axis, so HBM traffic is
    ~one dictionary read per batch instead of per query. ``dyn`` selects the
    dynamic-query-length DP loop (default on, VELOCI_DYNLEN_SWEEP=0 reverts
    to the full 32-step unroll)."""
    if dyn is None:
        dyn = _dyn_default()
    l, n = chars_t.shape
    q = queries.shape[0]
    tb = TILE_N_BATCH
    if n % tb:
        # pad the term axis up to the batch tile (pads have len 0 -> _BIG)
        pad = tb - n % tb
        chars_t = jnp.pad(chars_t, ((0, 0), (0, pad)))
        term_lens = jnp.pad(term_lens, (0, pad))
        n = n + pad
    assert l == L
    grid = (n // tb,)
    dist, prefix_dist = pl.pallas_call(
        functools.partial(
            _kernel_banded_batch_dyn if dyn else _kernel_banded_batch, band
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, tb), lambda t, *_: (0, t)),
                pl.BlockSpec((1, tb), lambda t, *_: (0, t)),
            ],
            out_specs=[
                pl.BlockSpec((q, tb), lambda t, *_: (0, t)),
                pl.BlockSpec((q, tb), lambda t, *_: (0, t)),
            ],
            scratch_shapes=[pltpu.VMEM((L, tb), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((q, n), jnp.int32),
            jax.ShapeDtypeStruct((q, n), jnp.int32),
        ],
        interpret=interpret,
    )(
        queries.astype(jnp.int32),
        query_lens.astype(jnp.int32),
        chars_t,
        term_lens.reshape(1, n),
    )
    pos = jnp.arange(l, dtype=jnp.int32)
    # [Q, L, N] would be large; compute is_prefix per query with a vmap over
    # the fused comparison instead
    def one_prefix(query, qlen):
        eq = (chars_t.astype(jnp.int32) == query[:l].astype(jnp.int32)[:, None]) | (
            pos[:, None] >= qlen
        )
        return jnp.all(eq, axis=0) & (term_lens >= qlen) & (term_lens > 0)

    is_prefix = jax.vmap(one_prefix)(queries, query_lens)
    return dist, prefix_dist, is_prefix


@functools.partial(jax.jit, static_argnames=("interpret", "band"))
def levenshtein_sweep_pallas_banded(
    chars_t: jax.Array,  # [L, N_pad] uint16
    term_lens: jax.Array,  # [N_pad] int32
    query: jax.Array,  # [MAX_QUERY_CHARS] uint16
    query_len: jax.Array,  # scalar int32
    interpret: bool = False,
    band: int = D_BAND,
):
    """Banded sweep: exact distances within the +-band diagonal, _BIG
    outside. ``band`` is static (one compile per width); it must be >= the
    match distance — a d<=2 query on band=2 does ~45% less DP than the
    default +-4 (Ukkonen: paths leaving the |i-j|<=d band exceed d)."""
    l, n = chars_t.shape
    assert l == L and n % TILE_N == 0
    grid = (n // TILE_N,)
    dist, prefix_dist = pl.pallas_call(
        functools.partial(_kernel_banded, band),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, TILE_N), lambda t, *_: (0, t)),
                pl.BlockSpec((1, TILE_N), lambda t, *_: (0, t)),
            ],
            out_specs=[
                pl.BlockSpec((1, TILE_N), lambda t, *_: (0, t)),
                pl.BlockSpec((1, TILE_N), lambda t, *_: (0, t)),
            ],
            scratch_shapes=[pltpu.VMEM((L, TILE_N), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(
        query.astype(jnp.int32),
        query_len.reshape(1).astype(jnp.int32)
        if query_len.ndim == 0
        else query_len.astype(jnp.int32),
        chars_t,
        term_lens.reshape(1, n),
    )
    dist = dist[0]
    prefix_dist = prefix_dist[0]
    pos = jnp.arange(l, dtype=jnp.int32)
    eq = (chars_t.astype(jnp.int32) == query[:l].astype(jnp.int32)[:, None]) | (
        pos[:, None] >= query_len
    )
    is_prefix = jnp.all(eq, axis=0) & (term_lens >= query_len) & (term_lens > 0)
    return dist, prefix_dist, is_prefix
