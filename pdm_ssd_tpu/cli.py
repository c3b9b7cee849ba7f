"""Console entry points (`pyproject.toml [project.scripts]`).

The runner scripts live in `tools/` next to the package (the reference keeps
its runners outside the `pcdet` package the same way, driven from a repo
checkout); an editable install (`pip install -e .`) exposes them as
`pdm-ssd-train` / `pdm-ssd-test` / `pdm-ssd-demo`. Experiment outputs keep
the repo-relative `output/<exp_group>/<tag>/<extra_tag>` convention.
"""
from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _run_tool(name: str):
    repo = Path(__file__).resolve().parent.parent
    script = repo / 'tools' / f'{name}.py'
    if not script.exists():
        raise SystemExit(
            f'{script} not found: the runner scripts require a repo '
            f'checkout (install with `pip install -e .` from the repo).')
    spec = importlib.util.spec_from_file_location(f'tools.{name}', script)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    mod.main()


def train():
    _run_tool('train')


def test():
    _run_tool('test')


def demo():
    _run_tool('demo')
