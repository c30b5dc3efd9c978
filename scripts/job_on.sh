#!/bin/bash
# Batch job: run all geometries with Bouzidi interpolation ON
# (analog of reference job_on.sh - Slurm array over the geometry sweep).
#SBATCH --job-name=lbm_geoms_on
#SBATCH --cpus-per-task=4
#SBATCH --mem=16G
set -e
cd "$(dirname "$0")/.."
python scripts/run_all_geometries.py "${1:-geometries}" --bouzidi on --csv geometry_values_on.csv "${@:2}"
