"""Multi-host SPMD serving discipline (SURVEY §7 hard part 5).

The reference is single-node by design; BASELINE metric 4 demands >=85%
scaling to 2 hosts. The TPU recipe: every process runs the SAME host loop
and the SAME jitted step over one process-spanning mesh.

  * The Generator's pagetable, job queue and scheduling decisions are pure
    host state computed from the job stream — identical on every process as
    long as every process enqueues the same jobs in the same order (the
    serving frontend broadcasts requests; see serve_loop discipline below).
  * Step inputs (ids / positions / block tables) are small replicated
    arrays: plain numpy is fine — JAX replicates uncommitted inputs across
    the mesh.
  * The KV pages shard over the global "sp" axis exactly as single-host
    sequence parallelism (parallel/sp.py) — each host's chips hold their
    slice, attention merges online-softmax stats over ICI/DCN, and no K/V
    bytes cross hosts.
  * Sampling runs IN-GRAPH from a deterministically split PRNG key, so
    sampled tokens replicate bit-identically; Generator(mh_broadcast=True)
    additionally routes every sampled token through a host-0 broadcast
    (jax.experimental.multihost_utils) as a divergence barrier — host 0
    owns the canonical sample stream.

Dryrun: __graft_entry__.dryrun_multichip stage 6 spawns two CPU processes
(4 virtual devices each) via jax.distributed and checks the decoded tokens
match the single-process run exactly (exllamav3_tpu/parallel/mh_worker.py).
"""
from __future__ import annotations

import numpy as np


def init(coordinator_address: str, num_processes: int, process_id: int,
         **kw) -> None:
    """jax.distributed.initialize wrapper (call BEFORE any jax op)."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def is_host0() -> bool:
    import jax

    return jax.process_index() == 0


def global_sp_mesh(axis: str = "sp"):
    """One sp axis over every device of every process — the serving mesh."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), axis_names=(axis,))


def broadcast_from_host0(tree):
    """Replicate host 0's value to all processes (divergence barrier for
    host-side decisions: sampled tokens, admission order, defrag moves)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def assert_in_sync(value: np.ndarray, what: str = "state") -> None:
    """Debug guard: raise if `value` differs across processes."""
    import jax

    if jax.process_count() == 1:
        return
    ref = broadcast_from_host0(value)
    if not np.array_equal(np.asarray(value), np.asarray(ref)):
        raise RuntimeError(
            f"multi-host divergence in {what} on process "
            f"{jax.process_index()}")
