"""Every script in scripts/ must import and parse --help from any cwd.

Round-4 postmortem: ``scripts/profile_anatomy.py`` was the only script
missing the repo-root ``sys.path`` shim; launched by the measurement
watcher as ``python -u scripts/profile_anatomy.py`` it died instantly with
``ModuleNotFoundError`` and burned the round's only real-chip anatomy slot
(docs/measurements/r4/r4_anatomy.log).  This test runs every Python script
the way the watcher does — as a file path, from a cwd that is NOT the repo
root — so a missing shim or a top-level import error fails CI instead of a
measurement battery.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
SCRIPTS = sorted((REPO_ROOT / "scripts").glob("*.py"))


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda s: s.name)
def test_script_help_runs(script, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the watcher invokes scripts by path; sys.path[0] is then scripts/,
    # not the repo root, and cwd contributes nothing -> run from a neutral
    # cwd to prove the script carries its own repo-root shim
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, str(script), "--help"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=180,
    )
    assert proc.returncode == 0, (
        f"{script.name} --help failed (rc={proc.returncode}):\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    )
