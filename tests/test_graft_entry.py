"""The driver-scored entry points must keep working.

``dryrun_multichip`` must succeed even when the calling process's jax backend
is already initialized with fewer devices than requested — it runs its body in
a child process with forced virtual CPU devices (the round-1 failure mode was
initializing the single-chip backend before the fallback could apply).
"""

import sys


sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

import __graft_entry__ as graft


def test_entry_forward_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape
    assert out.dtype == args[1].dtype


def test_dryrun_multichip_with_initialized_backend():
    # Initialize the backend first (here: 8 virtual CPU devices from
    # conftest; in the driver: one real TPU chip) — the dryrun must not
    # depend on the parent process's device count.
    jax.devices()
    graft.dryrun_multichip(8)
