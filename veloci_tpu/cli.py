"""Command-line tools.

Mirrors the reference's veloci_bins (veloci_bins/src/bin/):

* ``create_index`` — build an index directory from an ndjson file + TOML/JSON
  config (create_index.rs:22-37)
* ``convert_json_to_line_delimited`` — arbitrary JSON -> ndjson
* ``create_test_index`` — build the bundled test corpora (jmdict-like
  synthetic / gutenberg text) (create_test_index.rs:19-31)
* ``test_large_search`` — N-doc repeat corpus smoke test
  (test_large_search.rs:23-45)

Usage: ``python -m veloci_tpu.cli <command> [args]``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from .json_flatten import to_line_delimited
from .persistence import Persistence

__all__ = ["main"]


def cmd_create_index(args) -> None:
    config = Path(args.config).read_text() if args.config else "{}"
    data = Path(args.data).read_text()
    t0 = time.time()
    pers = Persistence.create_from_str(data, config)
    pers.save(args.target)
    print(
        f"created index {args.target!r}: {pers.num_docs} docs, "
        f"{pers.bytes_indexed} bytes indexed in {time.time() - t0:.1f}s"
    )


def cmd_convert(args) -> None:
    data = Path(args.input).read_bytes()
    out = to_line_delimited(data)
    if args.output:
        Path(args.output).write_text(out)
    else:
        sys.stdout.write(out)


def cmd_create_test_index(args) -> None:
    if args.corpus == "gutenberg":
        # one doc per paragraph of the provided text file
        text = Path(args.data).read_text()
        paragraphs = [p.strip() for p in text.split("\n\n") if p.strip()]
        docs = [json.dumps({"line": p, "nr": str(i)}) for i, p in enumerate(paragraphs)]
        data = "\n".join(docs)
        config = '{"line": {"fulltext": {"tokenize": true}}}'
        target = args.target or "gutenberg"
    else:  # jmdict-like synthetic corpus
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from bench import build_corpus

        data, _vocab = build_corpus(args.num_docs)
        config = "{}"
        target = args.target or "jmdict_like"
    pers = Persistence.create_from_str(data, config)
    pers.save(target)
    print(f"created {target!r}: {pers.num_docs} docs")


def cmd_test_large_search(args) -> None:
    """Repeat-corpus smoke test (reference test_large_search.rs:39-45)."""
    from .query.generator import SearchQueryGeneratorParameters, search_query
    from .search.executor import search

    doc = '{"type":"taschenbuch","title":"mein buch"}'
    data = "\n".join([doc] * args.num_docs)
    t0 = time.time()
    pers = Persistence.create_from_str(data, "{}")
    print(f"built {args.num_docs}-doc index in {time.time() - t0:.1f}s")
    t0 = time.time()
    req = search_query(pers, SearchQueryGeneratorParameters(search_term="buch"))
    res = search(req, pers)
    print(
        f"search 'buch' (cold: compile + H2D of the index): "
        f"{res.num_hits} hits in {(time.time() - t0) * 1e3:.1f}ms"
    )
    lat = []
    for _ in range(5):
        t0 = time.time()
        res = search(req, pers)
        lat.append((time.time() - t0) * 1e3)
    print(
        f"search 'buch' warm: {res.num_hits} hits, "
        f"p50 {sorted(lat)[len(lat) // 2]:.1f}ms over {len(lat)} runs"
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="veloci_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("create_index", help="build an index from ndjson")
    p.add_argument("--data", "-d", required=True, help="ndjson data file")
    p.add_argument("--target", "-t", required=True, help="index directory")
    p.add_argument("--config", "-c", help="TOML/JSON fields config file")
    p.set_defaults(fn=cmd_create_index)

    p = sub.add_parser(
        "convert_json_to_line_delimited", help="arbitrary JSON -> ndjson"
    )
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--output", "-o")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("create_test_index", help="build a test corpus index")
    p.add_argument("--corpus", choices=["jmdict", "gutenberg"], default="jmdict")
    p.add_argument("--data", help="text file for the gutenberg corpus")
    p.add_argument("--target", "-t")
    p.add_argument("--num-docs", type=int, default=100_000)
    p.set_defaults(fn=cmd_create_test_index)

    p = sub.add_parser("test_large_search", help="repeat-corpus smoke test")
    p.add_argument("--num-docs", type=int, default=1_000_000)
    p.set_defaults(fn=cmd_test_large_search)

    p = sub.add_parser("serve", help="start the HTTP server")
    p.add_argument("databases", nargs="*")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=3000)

    def run_serve(args):
        from .server import ensure_database, make_server

        for db in args.databases:
            ensure_database(db, trusted_path=True)
        server = make_server(args.host, args.port)
        print(f"Starting Server on {args.host}:{args.port} ...")
        server.serve_forever()

    p.set_defaults(fn=run_serve)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    main()
