"""CLI job tests: the spark-submit entrypoints run end-to-end as real
subprocesses (the --py-files deployment surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rle_array_spark.datagen import generate_block

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str]) -> dict:
    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run(
        [sys.executable, "-m", "rle_array_spark.jobs", *args, "--cores", "4"],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        check=False,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_encode_decode_verify(tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    pq.write_table(
        pa.Table.from_batches([generate_block(0, 10)]), os.path.join(input_dir, "p.parquet")
    )
    enc_dir = str(tmp_path / "enc")
    dec_dir = str(tmp_path / "dec")

    enc = _run(["encode", "--input", input_dir, "--output", enc_dir])
    assert enc["rows"] > 0 and enc["encoded_bytes"] < enc["raw_bytes"]

    dec = _run(["decode", "--blocks", enc_dir, "--output", dec_dir])
    assert dec["rows"] == enc["rows"]

    ver = _run(["verify", "--input", input_dir, "--blocks", enc_dir])
    assert ver["mismatches"] == 0


@pytest.mark.slow
def test_cli_salted_encode_resume(tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    pq.write_table(
        pa.Table.from_batches([generate_block(1, 10)]), os.path.join(input_dir, "p.parquet")
    )
    out_dir = str(tmp_path / "enc")
    first = _run(["encode", "--input", input_dir, "--output", out_dir, "--salted", "--partitions", "4"])
    assert first["skipped"] == 0
    second = _run(["encode", "--input", input_dir, "--output", out_dir, "--salted", "--partitions", "4"])
    assert second["skipped"] == 4  # full checkpoint hit
    assert second["tokens"] == first["tokens"]
    # verify/decode must accept the writer dir the salted encode just
    # produced (blocks/ subdir layout), not only a flat parquet dir —
    # the spark-submit lifecycle encode → verify → decode (r4 fix)
    ver = _run(["verify", "--input", input_dir, "--blocks", out_dir])
    assert ver["mismatches"] == 0
    dec_dir = str(tmp_path / "dec")
    dec = _run(["decode", "--blocks", out_dir, "--output", dec_dir])
    assert dec["rows"] > 0


def test_cli_stats(tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    pq.write_table(
        pa.Table.from_batches([generate_block(0, 10)]), os.path.join(input_dir, "p.parquet")
    )
    enc_dir = str(tmp_path / "enc")
    _run(["encode", "--input", input_dir, "--output", enc_dir])
    out = _run(["stats", "--blocks", enc_dir, "--contains", "0"])
    # every datagen source appears with ordered quartiles
    assert set(out["quantiles"]) == {
        "padded", "natural", "code", "lowcard", "narrow", "random", "giant"
    }
    for q in out["quantiles"].values():
        assert q["p25"] <= q["p50"] <= q["p75"] and q["n_toks"] > 0
    # PAD token 0 dominates the padded source: plenty of hits
    assert out["contains"]["docs"] > 0
    assert out["contains"]["occurrences"] > out["contains"]["docs"]
