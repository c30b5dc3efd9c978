#!/usr/bin/env python3
"""Batch sweep over numbered geometries -> CSV of KE values.

Analog of the reference run_all_geometries.py (reference:
run_all_geometries.py:1-120): runs sim2d_3 for every numbered geometry in a
directory, in Bouzidi on/off pairs, in batches, and collects the single-value
results into a CSV (the 180-geometry golden-value regression harness,
SURVEY.md section 4.4).
"""

from __future__ import annotations

import argparse
import csv
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root: in-process solver imports
from run_lbm_simulation import Submission, run_submission  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description="run all geometries, collect KE values")
    p.add_argument("geometry_dir")
    p.add_argument("--resolution", type=int, default=1)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--bouzidi", choices=["on", "off", "both"], default="both")
    p.add_argument("--run-root", default="runs")
    p.add_argument("--final-time", type=float, default=None)
    p.add_argument("--csv", default="geometry_values.csv")
    p.add_argument("--in-process", action="store_true",
                   help="run solvers inside this interpreter (sequential): "
                        "one import + one compile serves the whole sweep")
    args = p.parse_args(argv)

    # persistent XLA compile cache: subprocess rows with identical HLO
    # (the geometry map is a jit argument, not a baked constant) skip
    # recompilation across processes
    import os
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "tnl_lbm_tpu" / "xla_cache"))

    gdir = Path(args.geometry_dir)
    geometries = sorted(
        (g for g in gdir.iterdir() if g.suffix == ".txt"),
        key=lambda g: (len(g.stem), g.stem),
    )
    modes = {"on": [True], "off": [False], "both": [True, False]}[args.bouzidi]

    jobs = [
        Submission(
            geometry=str(g), resolution=args.resolution, bouzidi=b,
            run_root=Path(args.run_root), final_time=args.final_time,
            executor="in-process" if args.in_process else "local",
        )
        for g in geometries
        for b in modes
    ]
    if args.in_process:
        args.batch = 1  # sequential: one device, one jit cache
    # the CSV is appended row-by-row and flushed: a sweep killed by a
    # walltime limit keeps every completed row (round-4 lost a partial
    # sweep because the file was written only at completion)
    n_rows = 0
    with open(args.csv, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=["geometry", "bouzidi", "value"])
        writer.writeheader()
        fh.flush()
        with ThreadPoolExecutor(max_workers=args.batch) as pool:
            for sub, value in zip(jobs, pool.map(lambda s: run_submission(s, [gdir]), jobs)):
                row = {
                    "geometry": Path(sub.geometry).name,
                    "bouzidi": "on" if sub.bouzidi else "off",
                    "value": value,
                }
                writer.writerow(row)
                fh.flush()
                n_rows += 1
                print(row)
    print(f"wrote {n_rows} rows to {args.csv}")


if __name__ == "__main__":
    main()
