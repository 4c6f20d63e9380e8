"""Multi-host training support (new TPU-native design; SURVEY.md §2.11).

The reference is single-process/single-GPU. For pod slices spanning hosts:

* **Ray-DP across all chips of all hosts** — one global 1-D mesh; the
  per-step ray batch is sampled *inside* the jitted step from a replicated
  RNG key and shard-constrained over the global 'data' axis, so every
  process executes the same SPMD program on its local shard and XLA's
  partitioner inserts the ICI/DCN gradient all-reduce. Host inputs
  (scene pytree, params, schedules) are identical on every process and
  placed fully replicated.
* **Multi-scan across hosts** — scans are partitioned per process
  (`shard_scans`); each host trains its local scans with the in-process
  multi-scan machinery (parallel/multi_scan.py), zero cross-host traffic.

Run `python -m neuraludf_tpu.parallel.multihost --self-test` under a
2-process launcher to smoke-test (tests/test_multihost.py does this on a
virtual CPU mesh: 2 processes x 4 devices).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit or env-provided topology
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        missing = [
            name
            for name, val in (
                ("JAX_NUM_PROCESSES", num_processes
                 or os.environ.get("JAX_NUM_PROCESSES")),
                ("JAX_PROCESS_ID", process_id
                 if process_id is not None else os.environ.get("JAX_PROCESS_ID")),
            )
            if val is None
        ]
        if missing:
            raise ValueError(
                "multihost.initialize: JAX_COORDINATOR_ADDRESS is set but "
                f"{' and '.join(missing)} "
                "is missing — the coordinator env-var trio must be set together"
            )
        kwargs = dict(
            coordinator_address=coordinator_address
            or os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=process_id if process_id is not None
            else int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def replicate(tree, mesh):
    """Place identical per-host values as fully-replicated global arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_scans(data_dirs: Sequence[str], process_id: int, num_processes: int) -> List[str]:
    """Round-robin per-host partition of the scan list (multi-scan DP).

    Round-robin balances the shares (|share_i| differs by at most 1), so
    trailing hosts only end up empty when n_scans < n_processes; callers
    must keep scan-less processes alive until the others finish (see
    barrier()) or the coordination service treats the departed peer as a
    failure and aborts the remaining hosts mid-training."""
    dirs = list(data_dirs)
    return dirs[process_id::num_processes]


def barrier(name: str = "neuraludf_barrier") -> None:
    """Block until every process of the distributed job reaches this point
    (keeps scan-less hosts alive while the others train)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def _self_test() -> None:
    """One ray-DP train step on the global mesh; prints a loss every process
    must agree on. Driven by tests/test_multihost.py with 2 CPU processes."""
    import jax

    # the axon sitecustomize force-sets jax_platforms and ignores the env
    # var; a CPU self-test must win (same dance as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    initialize()
    import jax.numpy as jnp

    from ..render.renderer import UDFRenderer
    from ..train.optim import init_adam_state
    from ..train.runner import init_params
    from ..train.schedules import compute_step_schedules
    from ..utils.testing import synthetic_scene_arrays, tiny_config
    from .sharding import build_parallel_train_step

    n_dev = len(jax.devices())
    assert n_dev > len(jax.local_devices()), "expected a multi-process mesh"
    mesh = global_mesh()

    cfg = tiny_config(batch_size=8 * n_dev)
    renderer = UDFRenderer(cfg.model)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = init_adam_state(params)
    scene, pairs = synthetic_scene_arrays(jax.random.PRNGKey(1))

    # identical host data -> fully-replicated global arrays
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    scene = replicate(scene, mesh)
    pairs = replicate(pairs, mesh)

    step = build_parallel_train_step(cfg, renderer, mesh, blending=False)
    s = compute_step_schedules(
        1, cfg.train, 0.01, 1.0, 0.0, 0.0,
        is_finetune=False, reg_weights_schedule=False, same_lr=False,
        beta_trainable=True, variance_trainable=True,
    )
    with mesh:
        params, opt_state, metrics = step(
            params, opt_state, scene, pairs,
            jnp.asarray(0), jax.random.PRNGKey(2), dict(s.__dict__),
        )
    # outputs are fully replicated: read this process's local copy
    loss = float(np.asarray(metrics["loss"].addressable_data(0)))
    assert np.isfinite(loss)
    # every process must hold the same replicated post-step parameters
    leaf = jax.tree_util.tree_leaves(params)[0]
    digest = float(np.abs(np.asarray(leaf.addressable_data(0))).sum())
    print(f"MULTIHOST_OK process={jax.process_index()} loss={loss:.6f} "
          f"digest={digest:.6f} devices={n_dev}")


if __name__ == "__main__":
    import sys

    if "--self-test" in sys.argv:
        _self_test()
