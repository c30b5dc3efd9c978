#!/usr/bin/env python3
"""Multi-process launcher: the ``mpirun`` analog for the JAX runtime.

The reference launches one MPI rank per GPU via mpirun/srun (reference
run_lbm_simulation.py sbatch bodies; lbm.hpp:195-280 assumes an initialized
MPI world).  The TPU-native runtime needs one *controller process per
host*; this script provides the local form of that launch:

  python scripts/launch_distributed.py -n 2 -m tnl_lbm_tpu.apps.sim_2 \
      -- 1 --sharded --final-time 0.5 --results-dir /tmp/out

spawns N processes on this machine, rendezvouses them over a localhost
port, initializes ``parallel.distributed`` in each, and then runs the app
module unchanged (``runpy``) - the app sees the global device mesh exactly
as on a real pod.  ``--devices-per-proc`` forces K virtual CPU devices per
process (testing the multi-host path without hardware).

On a Slurm cluster no launcher is needed: run one task per host with
``srun --ntasks-per-node=1`` and call ``distributed.initialize()`` in the
app (JAX auto-detects the Slurm world); on TPU pods the runtime provides
the rendezvous natively.
"""

import argparse
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


BOOTSTRAP = r"""
import sys
mod, coord, n, rank, platform = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
import jax
if platform:
    jax.config.update("jax_platforms", platform)
from tnl_lbm_tpu.parallel import distributed
distributed.initialize(coord, num_processes=n, process_id=rank)
import runpy
sys.argv = [mod] + sys.argv[6:]
runpy.run_module(mod, run_name="__main__")
"""


def main(argv=None):
    p = argparse.ArgumentParser(
        description="spawn an N-process distributed run of an app module")
    p.add_argument("-n", "--nprocs", type=int, default=2)
    p.add_argument("-m", "--module", required=True,
                   help="app module, e.g. tnl_lbm_tpu.apps.sim_2")
    p.add_argument("--devices-per-proc", type=int, default=None,
                   help="force K virtual CPU devices per process "
                        "(multi-host testing without hardware)")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu); implied by "
                        "--devices-per-proc")
    p.add_argument("app_args", nargs="*",
                   help="arguments for the app module (prefix with --)")
    args = p.parse_args(argv)

    port = _free_port()
    coord = f"localhost:{port}"
    platform = args.platform or ("cpu" if args.devices_per_proc else "")
    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (root + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else root)
    if args.devices_per_proc:
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
        ).strip()

    procs = []
    for rank in range(args.nprocs):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", BOOTSTRAP, args.module, coord,
             str(args.nprocs), str(rank), platform] + args.app_args,
            env=env))
    codes = [q.wait() for q in procs]
    for rank, code in enumerate(codes):
        if code != 0:
            print(f"rank {rank} exited with {code}", file=sys.stderr)
    # signal deaths are negative wait() codes - any nonzero rank fails the run
    return 0 if all(c == 0 for c in codes) else 1


if __name__ == "__main__":
    sys.exit(main())
