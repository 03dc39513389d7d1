"""Smoke: every CLI driver imports and answers --help.

Guards the 26 reference-script-compatible drivers (SURVEY.md layer 1,
reference scripts/*.py) plus the four new pipeline drivers against import
or flag-decorator regressions — the cheapest possible whole-surface check.
"""

import importlib
import pkgutil

import click
import pytest
from click.testing import CliRunner

import salve_tpu.cli

CLI_MODULES = sorted(
    m.name for m in pkgutil.iter_modules(salve_tpu.cli.__path__)
)


def test_all_drivers_enumerated():
    assert len(CLI_MODULES) == 30


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help(name):
    mod = importlib.import_module(f"salve_tpu.cli.{name}")
    commands = [
        obj for obj in vars(mod).values()
        if isinstance(obj, click.BaseCommand)
    ]
    assert commands, f"{name} exposes no click command"
    runner = CliRunner()
    for cmd in commands:
        result = runner.invoke(cmd, ["--help"])
        assert result.exit_code == 0, (
            f"{name} --help failed:\n{result.output}"
        )
        assert "Usage" in result.output
