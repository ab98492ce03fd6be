"""CLI + config system (write-config -> rerun pattern, cg_main.cc:23-33)."""
import os

import numpy as np
import pytest

from dune_hdd_tpu.cli.examples import (
    LinearellipticExampleBlockSWIPDG,
    LinearellipticExampleCG,
    LinearellipticExampleSWIPDG,
    ThermalblockExample,
)
from dune_hdd_tpu.cli.main import main
from dune_hdd_tpu.utils.config import Configuration, parse_value


def test_parse_values():
    assert parse_value("42") == 42
    assert parse_value("0.5") == 0.5
    assert parse_value("true") is True
    assert parse_value("[4 4 1]") == [4, 4, 1]
    assert parse_value("[0.95 1.10; 0.30 0.45]") == [[0.95, 1.10], [0.30, 0.45]]
    assert parse_value("stuff.grid.provider.cube") == "stuff.grid.provider.cube"


def test_config_roundtrip(tmp_path):
    cfg = Configuration()
    cfg["grid.type"] = "cube"
    cfg["grid.num_elements"] = [8, 8]
    cfg["parameter.0.mu"] = [0.1]
    path = str(tmp_path / "test.cfg")
    cfg.write(path)
    back = Configuration.from_file(path)
    assert back["grid.type"] == "cube"
    assert back["grid.num_elements"] == [8, 8]
    assert back.sub("parameter").sub("0")["mu"] == [0.1]
    assert back.has_sub("grid") and not back.has_sub("nope")


def test_example_write_config_and_initialize(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = LinearellipticExampleSWIPDG.write_config_file()
    assert os.path.isfile(path)
    ex = LinearellipticExampleSWIPDG().initialize([path])
    d = ex.discretization()
    u = d.solve(options={"type": "direct"})
    assert np.isfinite(np.asarray(u)).all()


def test_cli_write_then_solve(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    # first run writes the config
    assert main(["swipdg"]) == 0
    out = capsys.readouterr().out
    assert "wrote default config" in out
    # second run solves the [parameter] blocks (ESV2007 is nonparametric, so
    # parameter blocks are ignored by parse but solve still runs)
    assert main(["swipdg", "--solver", "direct"]) == 0
    out = capsys.readouterr().out
    assert "|u|_max" in out


def test_cli_thermalblock_parametric(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["thermalblock"]) == 0
    assert main(["thermalblock", "--solver", "direct", "--visualize", "tb"]) == 0
    out = capsys.readouterr().out
    assert "parameter block 1" in out
    assert os.path.isfile("tb_mu_0.vtu")


def test_block_swipdg_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = LinearellipticExampleBlockSWIPDG.write_config_file()
    ex = LinearellipticExampleBlockSWIPDG().initialize([path])
    d = ex.discretization()
    assert d.num_subdomains() == 4
