#!/usr/bin/env python3
"""Simulation submission harness: local executor + Slurm sbatch generation.

Analog of the reference run_lbm_simulation.py (reference:
run_lbm_simulation.py:1-466): prepares a run directory with a manifest,
executes the solver (locally or via sbatch), and collects the single-value
result file.  The "binary" here is a Python module CLI
(e.g. ``tnl_lbm_tpu.apps.sim2d_3``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


@dataclasses.dataclass
class Submission:
    """One solver run (reference run_lbm_simulation.py Submission dataclass)."""

    geometry: str
    resolution: int = 1
    bouzidi: bool = True
    module: str = "tnl_lbm_tpu.apps.sim2d_3"
    executor: str = "local"  # local | slurm
    run_root: Path = Path("runs")
    final_time: float | None = None
    slurm_partition: str = "gp"
    slurm_cpus: int = 4
    slurm_mem: str = "16G"

    @property
    def name(self) -> str:
        tag = "on" if self.bouzidi else "off"
        return f"{Path(self.geometry).stem}_b{tag}_res{self.resolution}"


def resolve_geometry(name: str, search_dirs) -> Path:
    """Case-insensitive geometry lookup (reference run_lbm_simulation.py:111-137)."""
    p = Path(name)
    if p.exists():
        return p
    for d in search_dirs:
        d = Path(d)
        if not d.is_dir():
            continue
        for cand in d.iterdir():
            if cand.name.lower() == name.lower():
                return cand
    raise FileNotFoundError(f"geometry '{name}' not found in {search_dirs}")


def prepare_run_dir(sub: Submission, geometry_path: Path) -> Path:
    # absolute: the solver subprocess runs with cwd=REPO_ROOT
    run_dir = (Path(sub.run_root) / sub.name).resolve()
    run_dir.mkdir(parents=True, exist_ok=True)
    staged = run_dir / geometry_path.name
    shutil.copy2(geometry_path, staged)
    manifest = {
        "geometry": str(geometry_path),
        "resolution": sub.resolution,
        "bouzidi": sub.bouzidi,
        "module": sub.module,
        "created": time.time(),
        "argv": sys.argv,
    }
    (run_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return run_dir


def solver_command(sub: Submission, run_dir: Path, geometry_path: Path) -> list[str]:
    cmd = [
        sys.executable, "-m", sub.module,
        str(sub.resolution), str(run_dir / geometry_path.name),
        "--results-dir", str(run_dir),
        "--values-dir", str(run_dir / "values"),
    ]
    if not sub.bouzidi:
        cmd.append("--no-bouzidi")
    if sub.final_time is not None:
        cmd += ["--final-time", str(sub.final_time)]
    return cmd


def build_sbatch_script(sub: Submission, run_dir: Path, geometry_path: Path) -> str:
    """Generate the sbatch body (reference run_lbm_simulation.py:154-240)."""
    cmd = " ".join(solver_command(sub, run_dir, geometry_path))
    value_file = run_dir / "values" / f"value_{geometry_path.name}"
    return f"""#!/bin/bash
#SBATCH --job-name=lbm_{sub.name}
#SBATCH --partition={sub.slurm_partition}
#SBATCH --cpus-per-task={sub.slurm_cpus}
#SBATCH --mem={sub.slurm_mem}
#SBATCH --output={run_dir}/slurm_%j.out
set -e
cd {REPO_ROOT}
rm -f {value_file}
{cmd}
test -f {value_file}
"""


def execute_local(sub: Submission, run_dir: Path, geometry_path: Path) -> int:
    """Run the solver in-process-ish (reference run_lbm_simulation.py:399-466)."""
    cmd = solver_command(sub, run_dir, geometry_path)
    with open(run_dir / "stdout.log", "w") as out, open(run_dir / "stderr.log", "w") as err:
        proc = subprocess.run(cmd, stdout=out, stderr=err, cwd=REPO_ROOT)
    return proc.returncode


def submit_slurm(sub: Submission, run_dir: Path, geometry_path: Path, poll: float = 10.0) -> int:
    script = run_dir / "job.sbatch"
    script.write_text(build_sbatch_script(sub, run_dir, geometry_path))
    if shutil.which("sbatch") is None:
        print("sbatch not available; wrote script to", script)
        return 127
    out = subprocess.run(["sbatch", str(script)], capture_output=True, text=True)
    if out.returncode != 0:
        return out.returncode
    job_id = out.stdout.strip().split()[-1]
    while True:  # poll squeue (reference run_lbm_simulation.py:330-370)
        q = subprocess.run(["squeue", "-j", job_id, "-h"], capture_output=True, text=True)
        if not q.stdout.strip():
            return 0
        time.sleep(poll)


def read_result(run_dir: Path, geometry_path: Path) -> float | None:
    value_file = run_dir / "values" / f"value_{geometry_path.name}"
    if value_file.exists():
        return float(value_file.read_text().strip())
    return None


def run_submission(sub: Submission, search_dirs=(REPO_ROOT / "geometries",)) -> float | None:
    geometry_path = resolve_geometry(sub.geometry, search_dirs)
    run_dir = prepare_run_dir(sub, geometry_path)
    if sub.executor == "slurm":
        rc = submit_slurm(sub, run_dir, geometry_path)
    elif sub.executor == "in-process":
        rc = execute_in_process(sub, run_dir, geometry_path)
    else:
        rc = execute_local(sub, run_dir, geometry_path)
    if rc != 0:
        print(f"run {sub.name} failed with rc={rc}", file=sys.stderr)
        return None
    return read_result(run_dir, geometry_path)


def execute_in_process(sub: Submission, run_dir: Path, geometry_path: Path) -> int:
    """Run the solver inside THIS interpreter (same run-dir layout and
    value file as execute_local).  Batch sweeps gain enormously: import +
    device-client setup happen once, and since the geometry map enters
    jit as an argument (kernels/fused_2d.py sharded_consts) one compiled
    program serves every geometry with the same GEO-code set - the
    round-4 sweep paid ~150 s/row in subprocess mode, nearly all of it
    per-process compiles."""
    import importlib

    mod = importlib.import_module(sub.module)
    try:
        sim = mod.build(
            sub.resolution, str(run_dir / geometry_path.name), sub.bouzidi,
            sub.final_time if sub.final_time is not None else 4.0,
            results_parent=run_dir, values_dir=run_dir / "values",
        )
        sim.run()
    except Exception as exc:
        print(f"in-process run {sub.name} failed: {exc!r}", file=sys.stderr)
        return 1
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description="submit one LBM simulation run")
    p.add_argument("geometry")
    p.add_argument("--resolution", type=int, default=1)
    p.add_argument("--no-bouzidi", action="store_true")
    p.add_argument("--executor", choices=["local", "slurm"], default="local")
    p.add_argument("--run-root", default="runs")
    p.add_argument("--final-time", type=float, default=None)
    p.add_argument("--geometry-dir", action="append", default=[])
    args = p.parse_args(argv)
    sub = Submission(
        geometry=args.geometry, resolution=args.resolution,
        bouzidi=not args.no_bouzidi, executor=args.executor,
        run_root=Path(args.run_root), final_time=args.final_time,
    )
    dirs = [Path(d) for d in args.geometry_dir] or [REPO_ROOT / "geometries", Path(".")]
    value = run_submission(sub, dirs)
    print(f"{sub.name}: {value}")
    return 0 if value is not None else 1


if __name__ == "__main__":
    sys.exit(main())
