"""CLI smoke tests (reference veloci_bins: create_index.rs, convert, etc.)."""

import json
import subprocess
import sys

from veloci_tpu import Persistence
from veloci_tpu.cli import main as cli_main

from tests.corpus import TEST_CONFIG, data_ndjson


def test_cli_create_index_and_load(tmp_path, capsys):
    data = tmp_path / "data.ndjson"
    data.write_text(data_ndjson())
    cfg = tmp_path / "config.toml"
    cfg.write_text(TEST_CONFIG)
    target = tmp_path / "db"
    cli_main(
        [
            "create_index",
            "--data",
            str(data),
            "--config",
            str(cfg),
            "--target",
            str(target),
        ]
    )
    out = capsys.readouterr().out
    assert "created index" in out
    p = Persistence.load(str(target))
    assert p.num_docs > 0


def test_cli_convert_json_to_ndjson(tmp_path, capsys):
    inp = tmp_path / "arr.json"
    inp.write_text(json.dumps([{"a": 1}, {"a": 2}]))
    out_file = tmp_path / "out.ndjson"
    cli_main(
        ["convert_json_to_line_delimited", "--input", str(inp), "--output", str(out_file)]
    )
    lines = out_file.read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0]) == {"a": 1}


def test_cli_heap_report_runs(tmp_path):
    p = Persistence.create_im(data_ndjson(), TEST_CONFIG)
    report = p.heap_size_report()
    assert "to_anchor_id_score" in report
