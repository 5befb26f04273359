"""CLI harness tests (reference flag surface: part1/main.cpp:95-117)."""

import json

import numpy as np
import pytest

from ppsim_tpu.harness import build_parser, main
from ppsim_tpu.io import read_trajectory


def test_default_flags():
    args = build_parser().parse_args([])
    assert args.n == 1000 and args.s == 0 and args.o is None


def test_cli_run_saves_and_checks(tmp_path, capsys):
    out = str(tmp_path / "traj.txt")
    metrics = str(tmp_path / "m.jsonl")
    rc = main(
        ["-n", "300", "-s", "42", "-o", out, "--steps", "40", "--check",
         "--metrics", metrics]
    )
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "Simulation Time = " in stdout
    assert "seconds for 300 particles." in stdout
    assert "PASS" in stdout

    frames, size = read_trajectory(out)
    assert frames.shape == (4, 300, 2)  # saves at steps 0,10,20,30

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
