"""Real multi-process SPMD test: two jax processes (2 virtual CPU devices
each) rendezvous via jax.distributed and drive the production Trainer for an
epoch — exercising init_distributed, the strided per-process loader shard,
and stage_global_batch's make_array_from_process_local_data assembly.

This is the working substitute for a multi-host TPU pod (SURVEY §2.6): the
collectives and the global-array input path are identical; only the
transport differs.
"""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_multihost_worker.py")
    port = _free_port()
    nproc = 2

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # both processes share the persistent compile cache
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(here, ".jax_cache"))

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    oks = [l for out in outs for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
    assert len(oks) == nproc, f"missing OK lines: {outs}"

    def field(line, key):
        return float(dict(kv.split("=") for kv in line.split()[1:])[key])

    # SPMD: every process computes the identical global loss and ends with
    # bitwise-identical replicated parameters
    losses = [field(l, "loss") for l in oks]
    fps = [field(l, "fp") for l in oks]
    assert np.allclose(losses, losses[0], rtol=0, atol=0), losses
    assert np.allclose(fps, fps[0], rtol=0, atol=0), fps
    # leader-gated Evaluator: extraction work is done ONCE across the whole
    # job (leader extracts total_size=8 rows, the other host none)
    extracted = sorted(field(l, "extracted") for l in oks)
    assert extracted == [0.0, 8.0], extracted
