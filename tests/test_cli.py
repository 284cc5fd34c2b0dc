"""CLI lifecycle test (reference `__main__`/`run_etl`, `:829-831`):
first run processes everything; a second run against the same state
path skips everything (the incremental-resume contract,
`README.md:458-466`); dry-run discovers without writing.
"""

from __future__ import annotations

import json
import pathlib

from notion_vector_store_etl_pipeline_spark.__main__ import main


def _run(capsys, *argv) -> str:
    rc = main(list(argv))
    assert rc == 0
    return capsys.readouterr().out.strip().splitlines()[-1]


def test_cli_full_then_incremental_then_dry(spark, tmp_path, capsys):
    state = str(tmp_path / "state")
    out1 = str(tmp_path / "chunks1")
    out2 = str(tmp_path / "chunks2")

    line1 = _run(
        capsys, "--data-dir", "/root/testdata/sf0.001",
        "--state-path", state, "--output-dir", out1,
    )
    assert "processed=500 skipped=0" in line1

    # JSONL sink wrote one record per chunk with the upload shape
    files = list(pathlib.Path(out1).glob("*.json")) + list(
        pathlib.Path(out1).glob("part-*")
    )
    assert files
    rec = json.loads(
        next(l for f in files for l in f.read_text().splitlines() if l.strip())
    )
    assert "text" in rec and "id" in rec

    # second run: same data, state now covers it all -> everything skips
    line2 = _run(
        capsys, "--data-dir", "/root/testdata/sf0.001",
        "--state-path", state, "--output-dir", out2,
    )
    assert "processed=0" in line2
    assert "skipped=500" in line2

    # dry-run with a lang filter: reports without touching state/output
    line3 = _run(
        capsys, "--data-dir", "/root/testdata/sf0.001",
        "--state-path", state, "--dry-run", "--lang-filter", "en,fr",
    )
    assert line3.startswith("[dry-run]")
    assert "would process 0" in line3


def test_cli_max_files_limit(spark, tmp_path, capsys):
    state = str(tmp_path / "state")
    line = _run(
        capsys, "--data-dir", "/root/testdata/sf0.001",
        "--state-path", state, "--dry-run", "--max-files", "7",
    )
    assert "would process 7" in line
