"""CLI surface tests: every subcommand runs end-to-end on the CPU mesh
(component #25; the reference ships a 2-command stub, `tsu/cli.py:9-37`)."""

import json

import pytest

from tsu_tpu.cli import main


def test_version(capsys):
    assert main(["version"]) == 0
    out = capsys.readouterr().out
    assert "tsu_tpu" in out and "backend" in out


def test_sample_moments(capsys):
    assert main(["sample", "--n", "2000", "--mu", "1.0", "--sigma", "2.0",
                 "--seed", "0"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert abs(res["sample_mean"] - 1.0) < 0.3
    assert abs(res["sample_std"] - 2.0) < 0.5


def test_ising_sweep_orders_below_tc(capsys):
    assert main(["ising-sweep", "--size", "8", "--t-min", "1.0",
                 "--t-max", "4.0", "--n-temps", "3",
                 "--n-samples", "20"]) == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if "T=" in ln]
    assert len(lines) == 3
    m_cold = float(lines[0].split("|M|=")[1].split()[0])
    assert m_cold > 0.9


def test_bnn_trains(capsys):
    assert main(["bnn", "--n-train", "40", "--epochs", "30"]) == 0
    out = capsys.readouterr().out
    assert out.count("pred=") == 9


def test_anneal_ferromagnet_exact(capsys):
    assert main(["anneal", "--size", "8", "--steps", "200",
                 "--restarts", "1"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["energy_per_site"] == -2.0  # periodic ferromagnet ground state


def test_anneal_spin_glass(capsys):
    assert main(["anneal", "--size", "8", "--steps", "200",
                 "--spin-glass"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["model"] == "ea_pm1_spin_glass"
    assert res["energy_per_site"] < -1.2


def test_no_command_prints_help(capsys):
    assert main([]) == 1
    assert "usage" in capsys.readouterr().out.lower()
