"""Device mesh construction (single- and multi-host).

Multi-host story (the TPU analog of the reference-ecosystem's NCCL role is
XLA collectives over ICI within a slice and DCN across slices — SURVEY.md
§2.2): every host runs the SAME program, one JAX process per host.

Launch recipe (N hosts):

    # on every host, before any jax call:
    import nf4_tpu.parallel.mesh as mesh
    mesh.initialize_distributed()          # TPU pods: args auto-detected
    # or explicitly:
    # mesh.initialize_distributed("10.0.0.1:8476", num_processes=N,
    #                             process_id=<this host's index>)
    m = mesh.make_mesh(tp=8, dp=N)         # global mesh over all chips

``make_mesh`` places the tensor-parallel axis on ICI-adjacent devices (via
``mesh_utils.create_device_mesh``) so the per-layer psums ride ICI and only
the data-parallel axis ever crosses DCN.  All shard_map entry points in
``parallel.tp`` operate on the global mesh unchanged — under multi-host
JAX, globally-sharded arrays + the same jitted program is the whole
programming model.

On this rig (one tunneled chip) the multi-host path is exercised on the
virtual CPU mesh: ``__graft_entry__.dryrun_multichip(8)`` runs a dp=2 x
tp=4 factoring — the layout of a 2-host x 4-chip slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "initialize_distributed"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (one process per host) — idempotent.

    With no arguments, relies on the TPU pod metadata autodetection built
    into ``jax.distributed.initialize``; pass explicit values for other
    launch environments.  Safe to call on a single host (no-op when there
    is nothing to coordinate and no arguments are given).
    """
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-host / no coordinator: fine
            # A genuine pod-init failure must not silently degrade a
            # multi-host launch to single-host (the only later symptom is a
            # confusing device-count assert in make_mesh): if the
            # environment looks distributed, surface the real cause here.
            import os

            markers = [
                v
                for v in (
                    "JAX_COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS",
                    "TPU_WORKER_HOSTNAMES",
                    "TPU_WORKER_ID",
                    "CLOUD_TPU_TASK_ID",
                )
                if os.environ.get(v)
            ]
            if markers:
                import logging

                logging.getLogger(__name__).warning(
                    "jax.distributed.initialize() failed (%s) although "
                    "distributed environment markers are set (%s); "
                    "continuing single-host — multi-host collectives will "
                    "NOT span this job",
                    e,
                    ", ".join(markers),
                )
            return
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh.  ``tp`` defaults to all devices / dp.

    Without explicit ``devices``, the mesh is laid out with
    ``mesh_utils.create_device_mesh``, which orders devices by ICI
    adjacency (and host locality under multi-host) so the tp axis — the
    one carrying per-layer psums — stays on the fastest links.  Passing
    ``devices`` (tests, sub-meshes) keeps the given order.
    """
    all_devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(all_devices) // dp
    assert dp * tp <= len(all_devices), (
        f"need {dp * tp} devices, have {len(all_devices)}"
    )
    import numpy as np

    if devices is None and dp * tp == len(all_devices):
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh(
                (dp, tp), devices=all_devices
            )
            return Mesh(grid, axis_names=("dp", "tp"))
        except Exception:
            pass  # fall back to linear order (e.g. odd virtual topologies)
    grid = np.asarray(all_devices[: dp * tp], dtype=object).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))
