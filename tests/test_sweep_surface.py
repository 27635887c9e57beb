"""The Run2.ipynb sweep surface: all 55 concrete commands (41 cells,
two of them seed loops) from the reference notebook parse into valid
MimrlConfigs, and the generator emits runnable scripts for each
(ref: /root/reference/Run2.ipynb; VERDICT round-1 item 6)."""

import json
import os
import subprocess
import sys

import pytest

from mimrl_tpu.core.config import parse_args

HERE = os.path.dirname(os.path.abspath(__file__))
RECIPES = os.path.join(HERE, "..", "recipes")
MANIFEST = os.path.join(RECIPES, "run2_manifest.json")


def _commands():
    return json.load(open(MANIFEST))


def test_manifest_covers_41_cells_55_commands():
    cmds = _commands()
    assert len(cmds) == 55
    assert len({c["cell"] for c in cmds}) == 41


def test_every_command_parses_into_valid_config():
    for entry in _commands():
        argv = entry["cmd"].split()[2:]  # strip "python Main.py"
        cfg = parse_args(argv)  # __post_init__ validates
        assert cfg.dataset in ("mosi_Dec", "mosi_50", "avec2019"), entry
        assert len(cfg.loss_mi_coefficient1) == 11
        assert len(cfg.loss_mi_coefficient2) == 8


def test_canonical_readme_command_present_verbatim():
    """The README.md:17-24 canonical recipe appears in the notebook
    surface (cells 7-10 are reruns of mosiDec52.1)."""
    names = [c["cmd"].split("--task_name ")[1].split()[0]
             for c in _commands()]
    assert "mosiDec52.1" in names


def test_generator_writes_all_scripts(tmp_path):
    out = tmp_path / "sweep"
    subprocess.run(
        [sys.executable, os.path.join(RECIPES, "generate_sweep.py"),
         "--outdir", str(out)],
        check=True, capture_output=True)
    scripts = sorted(os.listdir(out))
    assert len(scripts) == 55
    text = (out / scripts[0]).read_text()
    assert "python -m mimrl_tpu.cli.main" in text
    assert "Main.py" not in text.replace("Run2.ipynb cell", "")
    assert os.access(out / scripts[0], os.X_OK)


@pytest.mark.parametrize("idx", [0, 17, 52])
def test_representative_flagsets_build_solver_configs(idx):
    """Representatives (first MOSI cell, the AVEC cell, the SupInv cell)
    parse and validate including their DSL-encoded depth tables."""
    entry = _commands()[idx]
    cfg = parse_args(entry["cmd"].split()[2:])
    assert len(cfg.d_hiddens) == len(cfg.res_project)
