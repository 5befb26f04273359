"""CLI harness tests (reference flag surface: part1/main.cpp:95-117)."""

import json

import numpy as np
import pytest

from ppsim_tpu.harness import build_parser, main
from ppsim_tpu.io import read_trajectory


def test_default_flags():
    args = build_parser().parse_args([])
    assert args.n == 1000 and args.s == 0 and args.o is None


@pytest.mark.parametrize(
    "engine", ["binned", "grid", "pallas", "sharded", "sharded_grid"]
)
def test_cli_run_saves_and_checks(tmp_path, capsys, engine):
    """The -o/--check path must work (and PASS the checker) on every engine —
    the reference exercises its save path in every job script; round 1 only
    covered `binned` here."""
    out = str(tmp_path / "traj.txt")
    metrics = str(tmp_path / "m.jsonl")
    rc = main(
        ["-n", "300", "-s", "42", "-o", out, "--steps", "40", "--check",
         "--metrics", metrics, "--engine", engine, "--savefreq", "8",
         # small grid config keeps CPU compiles of the unrolled Mosaic/XLA
         # rebin graphs cheap (ignored by the sort-binned engines)
         "--grid-bin-scale", "3.0", "--grid-capacity", "6", "--rebin-every", "4"]
    )
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "Simulation Time = " in stdout
    assert "seconds for 300 particles." in stdout
    assert "PASS" in stdout

    frames, size = read_trajectory(out)
    assert frames.shape == (5, 300, 2)  # saves at steps 1,9,17,25,33

    rec = json.loads(open(metrics).read().strip().split("\n")[-1])
    assert rec["num_parts"] == 300
    assert rec["particle_steps_per_sec"] > 0


def test_cli_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "state.npz")
    rc = main(["-n", "200", "-s", "7", "--steps", "20", "--checkpoint-out", ck])
    assert rc == 0
    rc = main(["-n", "200", "--steps", "20", "--resume", ck])
    assert rc == 0


def test_cli_engine_selection(tmp_path):
    rc = main(["-n", "200", "-s", "7", "--steps", "10", "--engine", "oracle"])
    assert rc == 0


def test_cli_rejects_unknown_engine():
    with pytest.raises(ValueError):
        main(["-n", "100", "--steps", "5", "--engine", "nope"])
