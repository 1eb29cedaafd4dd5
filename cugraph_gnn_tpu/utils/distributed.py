"""Multi-host initialization helpers.

ref python/pylibwholegraph/pylibwholegraph/torch/initialize.py:18-93
(init / init_torch_env: rank env resolution + process-group init) and
distributed_launch.py:11-329 (mpi / torchrun / spawn launch agents).

TPU redesign: `jax.distributed.initialize` is the only bootstrap needed
(the JAX coordinator replaces the NCCL unique-id broadcast); rank info
comes from the standard env (JAX_COORDINATOR_ADDRESS etc.) or TPU
metadata.  This module resolves the env the way the reference's launch
agents do and builds the standard meshes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from cugraph_gnn_tpu.parallel.mesh import (
    create_hierarchical_mesh,
    create_store_mesh,
)
from cugraph_gnn_tpu.utils.logging import get_logger, set_log_level


def init(log_level: str = "info",
         coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None):
    """Initialize multi-host JAX (no-op on single host).

    Env resolution mirrors the reference's launch-agent flags
    (ref distributed_launch.py:77-120): explicit args beat env beats
    auto-detection.
    """
    set_log_level(log_level)
    log = get_logger()
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES", "WORLD_SIZE")
    process_id = process_id if process_id is not None else _int_env(
        "PROCESS_ID", "RANK")
    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
    else:
        log.info("single-process init (%d local devices)",
                 jax.local_device_count())


def _int_env(*names):
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return int(v)
    return None


def finalize():
    """ref initialize.py finalize."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def world_info():
    """(rank, world_size, local_rank, local_size) — ref comm.py
    set_world_info/get_world_info."""
    return (jax.process_index(), jax.process_count(),
            0, jax.local_device_count())


def get_global_mesh():
    """All devices, 1-D 'store' axis (the reference's global
    communicator, ref comm.py:202-224)."""
    return create_store_mesh()


def get_hierarchical_mesh():
    """(node=host, device=local) 2-D mesh (the reference's local-node +
    global communicator pair, ref comm.py:227-258)."""
    return create_hierarchical_mesh(max(jax.process_count(), 1))
