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

__all__ = ["levenshtein_sweep_pallas"]

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
