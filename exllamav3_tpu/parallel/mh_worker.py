"""Multi-host serving worker (dryrun stage 6 subprocess).

Usage:
    python -m exllamav3_tpu.parallel.mh_worker \
        <process_id> <num_processes> <port> <devices_per_proc> \
        <model_dir> <out_path>

Each process joins the jax.distributed cluster, builds the GLOBAL sp mesh,
runs the SAME Generator loop (page-sharded cache, host-0 token broadcast)
and decodes greedily; process 0 writes the token stream to <out_path>.
The parent compares it against a single-process run — the multi-host SPMD
discipline is correct iff the streams are identical.
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pid, nproc, port, ndev = (int(a) for a in sys.argv[1:5])
    model_dir, out_path = sys.argv[5], sys.argv[6]

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from . import multihost

    multihost.init(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * ndev

    import numpy as np
    from ..model import Cache, CacheSpec, Config, Model
    from ..generator import Generator, Job, GreedySampler

    from ..model import InferParams

    # bf16 pinned: the dryrun compares tokens against a single-process run
    # loaded with linear_mode="bf16" (auto would resolve by footprint)
    model = Model.from_config(Config.from_directory(
        model_dir, infer_params=InferParams(linear_mode="bf16")))
    model.load()
    mesh = multihost.global_sp_mesh()
    cache = Cache(model, CacheSpec(layout="paged",
                                   num_pages=2 * nproc * ndev))
    gen = Generator(model, cache, sp_mesh=mesh, max_batch_size=4,
                    mh_broadcast=True)
    gen.enqueue(Job(np.arange(20, dtype=np.int64) % 500 + 3,
                    max_new_tokens=8, sampler=GreedySampler()))
    toks = None
    while gen.pending or gen.active:
        for ev in gen.iterate():
            if ev["stage"] == "finished":
                toks = ev["new_tokens"]
    assert toks is not None
    multihost.assert_in_sync(np.asarray(toks, np.int64), "decoded tokens")
    if multihost.is_host0():
        with open(out_path, "w") as f:
            json.dump([int(t) for t in toks], f)
    # give the coordinator a clean shutdown
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
