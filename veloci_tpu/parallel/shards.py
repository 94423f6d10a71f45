"""Sharded indices: bounded-memory builds and multi-shard serving.

The reference left sharding as commented-out code
(server/rocket_server.rs:41,102-108 `Shards`); here it is first class:

* :func:`build_sharded` — split an ndjson corpus into K independent index
  shards (each a complete `Persistence` over a contiguous doc range), so
  build memory is bounded by the shard size, not the corpus.
* :class:`ShardedPersistence` — serves a list of shards as one index:
  searches fan out per shard, anchor ids lift by the shard's doc base,
  top-k merges by (score desc, global id desc), facet counts sum, and doc
  fetch routes to the owning shard.

Each shard's device arrays live independently, so shards can also be pinned
to different chips of a mesh — the host-level complement of
:mod:`veloci_tpu.parallel.sharding`'s in-program document sharding.

NB: index-time scores include a term-occurrence modifier
(calculate_score.rs:36-38), computed per shard — shard-local term statistics
can drift from a single-index build's global ones on skewed corpora (the
usual distributed-IDF caveat; negligible for evenly sharded data).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Optional, Tuple

import numpy as np

from ..persistence import Persistence
from ..query.request import Request
from ..search.executor import search as _search
from ..search.result import Hit, SearchResult

__all__ = ["build_sharded", "ShardedPersistence"]


def build_sharded(
    lines: Iterable[str],
    indices: str = "{}",
    *,
    shard_size: int = 1_000_000,
    target_dir: Optional[str] = None,
) -> "ShardedPersistence":
    """Build shard-per-`shard_size`-docs indices from an ndjson line stream."""
    shards: List[Persistence] = []
    buf: List[str] = []
    idx = 0

    def flush():
        nonlocal idx
        if not buf:
            return
        pers = Persistence.create_from_str("\n".join(buf), indices)
        if target_dir is not None:
            d = str(Path(target_dir) / f"shard_{idx:04d}")
            pers.save(d)
            pers = Persistence.load(d)
        shards.append(pers)
        buf.clear()
        idx += 1

    for line in lines:
        if not line.strip():
            continue
        buf.append(line.rstrip("\n"))
        if len(buf) >= shard_size:
            flush()
    flush()
    return ShardedPersistence(shards)


class ShardedPersistence:
    """Search over a list of shards as one logical index."""

    def __init__(self, shards: List[Persistence]):
        assert shards, "at least one shard required"
        self.shards = shards
        self.doc_bases = np.zeros(len(shards) + 1, dtype=np.int64)
        np.cumsum([s.num_docs for s in shards], out=self.doc_bases[1:])
        self.num_docs = int(self.doc_bases[-1])
        self.bytes_indexed = sum(s.num_docs and s.bytes_indexed for s in shards)

    @classmethod
    def load(cls, directory: str) -> "ShardedPersistence":
        d = Path(directory)
        shard_dirs = sorted(p for p in d.iterdir() if p.name.startswith("shard_"))
        return cls([Persistence.load(str(p)) for p in shard_dirs])

    def get_all_fields(self) -> List[str]:
        fields: List[str] = []
        for s in self.shards:
            for f in s.get_all_fields():
                if f not in fields:
                    fields.append(f)
        return fields

    # ----------------------------------------------------------- searching
    def search(self, request: Request) -> SearchResult:
        """Fan out, lift ids, merge (score desc, global id desc) top-k."""
        top = request.top if request.top is not None else 10
        skip = request.skip or 0
        merged = SearchResult()
        all_hits: List[Tuple[float, int]] = []
        facet_acc = {}

        def run_shard(shard):
            sub = Request(**{**request.__dict__})
            # per-shard: fetch enough to cover global top+skip
            sub.top = top + skip
            sub.skip = None
            return _search(sub, shard)

        # parallel fan-out (reference searches shards on rayon threads in the
        # vestigial Shards code, rocket_server.rs:102-108); numpy and device
        # dispatch release the GIL so threads overlap
        if len(self.shards) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(self.shards))) as pool:
                shard_results = list(pool.map(run_shard, self.shards))
        else:
            shard_results = [run_shard(sh) for sh in self.shards]

        for si, res in enumerate(shard_results):
            base = int(self.doc_bases[si])
            merged.num_hits += res.num_hits
            for h in res.data:
                all_hits.append((h.score, base + h.id))
            if res.facets:
                for field, counts in res.facets.items():
                    acc = facet_acc.setdefault(field, {})
                    for text, c in counts:
                        acc[text] = acc.get(text, 0) + c
            for path, texts in res.why_found_terms.items():
                dst = merged.why_found_terms.setdefault(path, [])
                for t in texts:
                    if t not in dst:
                        dst.append(t)
        all_hits.sort(key=lambda el: (-el[0], -el[1]))
        window = all_hits[skip : skip + top] if top is not None else all_hits[skip:]
        merged.data = [Hit(gid, score) for score, gid in window]
        if facet_acc:
            merged.facets = {
                field: sorted(acc.items(), key=lambda el: -el[1])[
                    : (request.facets[0].top if request.facets else None)
                ]
                for field, acc in facet_acc.items()
            }
        return merged

    # ---------------------------------------------------------- doc access
    def shard_of(self, global_id: int) -> Tuple[Persistence, int]:
        si = int(np.searchsorted(self.doc_bases, global_id, side="right")) - 1
        return self.shards[si], global_id - int(self.doc_bases[si])

    def get_doc(self, global_id: int) -> str:
        shard, local = self.shard_of(global_id)
        return shard.doc_loader.get_doc(local)
