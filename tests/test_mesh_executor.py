"""Mesh serving-path parity: `search()` with an attached 8-device mesh must
match the unsharded host path for the full generic request surface (the
round-2 'make mesh sharding a real serving path' coverage). Runs on the
virtual 8-device CPU mesh (conftest forces JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax

from corpus import TEST_CONFIG, TOKEN_VALUES, data_ndjson
from veloci_tpu import (
    Persistence,
    Request,
    add_token_values_to_tokens,
    search,
)
from veloci_tpu.parallel.mesh_executor import build_doc_mesh

from test_device_path import REQUESTS


@pytest.fixture(scope="module")
def pers():
    p = Persistence.create_from_str(data_ndjson(), TEST_CONFIG)
    add_token_values_to_tokens(p, TOKEN_VALUES[0], TOKEN_VALUES[1])
    return p


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return build_doc_mesh(8)


@pytest.mark.parametrize("idx", range(len(REQUESTS)))
def test_mesh_path_matches_host(pers, mesh, idx):
    req_json = REQUESTS[idx]
    pers.detach_mesh()
    host = search(Request.from_dict(dict(req_json)), pers)
    pers.attach_mesh(mesh)
    try:
        dev = search(Request.from_dict(dict(req_json)), pers)
    finally:
        pers.detach_mesh()
    assert dev.num_hits == host.num_hits, (idx, dev.num_hits, host.num_hits)
    assert [h.id for h in dev.data] == [h.id for h in host.data], idx
    np.testing.assert_allclose(
        [h.score for h in dev.data],
        [h.score for h in host.data],
        rtol=2e-6,
        err_msg=str(idx),
    )
    if host.facets:
        assert dev.facets == host.facets


def test_mesh_uneven_shard_tail(mesh):
    """num_docs not divisible by the shard count: tail padding must not
    produce phantom hits."""
    lines = [
        '{"t": "alpha beta"}',
        '{"t": "alpha"}',
        '{"t": "gamma"}',
        '{"t": "alpha gamma"}',
        '{"t": "delta"}',
    ]  # 5 docs over 8 shards
    p = Persistence.create_from_str("\n".join(lines), "{}")
    p.attach_mesh(mesh)
    res = search(
        Request.from_dict({"search_req": {"search": {"terms": ["alpha"], "path": "t"}}}),
        p,
    )
    assert res.num_hits == 3
    assert sorted(h.id for h in res.data) == [0, 1, 3]
