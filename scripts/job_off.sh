#!/bin/bash
# Batch job: run all geometries with Bouzidi interpolation OFF
# (analog of reference job_off.sh).
#SBATCH --job-name=lbm_geoms_off
#SBATCH --cpus-per-task=4
#SBATCH --mem=16G
set -e
cd "$(dirname "$0")/.."
python scripts/run_all_geometries.py "${1:-geometries}" --bouzidi off --csv geometry_values_off.csv "${@:2}"
