"""Glue for the Pallas banded Levenshtein sweep (TPU only)."""

from __future__ import annotations

import jax.numpy as jnp


def banded_sweep(dev_field, query_u16, query_len, band: int = 4):
    from ..ops.pallas_levenshtein import levenshtein_sweep_pallas_banded

    return levenshtein_sweep_pallas_banded(
        dev_field.chars_t,
        dev_field.lengths,
        jnp.asarray(query_u16),
        jnp.int32(query_len),
        band=band,
    )
