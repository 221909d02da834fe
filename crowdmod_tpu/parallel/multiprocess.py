"""Multi-process (multi-host) runtime glue.

Single-process SPMD over a ``Mesh`` (:mod:`crowdmod_tpu.parallel.mesh`)
covers one host's chips; a real TPU pod runs N Python processes — one per
host — that must agree on a *global* mesh, feed *process-local* data into
globally-sharded arrays, and commit checkpoints exactly once.  The
reference has no distributed code at all (SURVEY.md §2.9); this module is
the framework's process-topology layer:

* :func:`initialize` — ``jax.distributed.initialize`` wrapper that works
  both on real pods (no-arg autodetection via the TPU metadata server) and
  in CPU-backed harnesses (explicit coordinator/process_id, used by
  ``tools/dryrun_multihost.py`` and CI).
* :func:`global_batch` — assemble a globally-sharded batch from each
  process's local shard (the multi-host input-pipeline step: each process
  loads only its own files via :func:`crowdmod_tpu.data.prefetch.host_shard`
  and contributes a slice of the global batch).
* :func:`all_processes_equal` — cross-host agreement check used by tests
  and the doctor-style dryrun (loss divergence across hosts is the classic
  silent pod bug: different data orders or non-deterministic compiles).
* :func:`barrier` / :func:`is_main` — sync + process-0 commit helpers for
  checkpoint/logging paths.

All helpers degrade to sensible single-process behavior so library code can
call them unconditionally.
"""

from __future__ import annotations

import logging
from typing import Any, Sequence

import numpy as np

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join (or form) the distributed runtime.

    On a real TPU pod call with no arguments — jax autodetects the
    coordinator through the TPU metadata service.  CPU harnesses pass all
    three explicitly, or export ``CROWDMOD_COORDINATOR`` /
    ``CROWDMOD_NUM_PROCESSES`` / ``CROWDMOD_PROCESS_ID`` (how the
    ``--multihost`` CLI flag picks up a manual launch without per-flag
    plumbing).  Idempotent: a second call is a no-op instead of the
    RuntimeError jax raises.
    """
    import os

    if jax._src.distributed.global_state.client is not None:  # noqa: SLF001
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("CROWDMOD_COORDINATOR")
        if coordinator_address:
            try:
                num_processes = int(os.environ["CROWDMOD_NUM_PROCESSES"])
                process_id = int(os.environ["CROWDMOD_PROCESS_ID"])
            except KeyError as missing:
                raise RuntimeError(
                    "CROWDMOD_COORDINATOR is set but "
                    f"{missing.args[0]} is not — a manual multi-process "
                    "launch needs all three of CROWDMOD_COORDINATOR, "
                    "CROWDMOD_NUM_PROCESSES, CROWDMOD_PROCESS_ID "
                    "(docs/SCALING.md pod runbook)"
                ) from None
    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logging.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        len(jax.local_devices()), len(jax.devices()),
    )


def is_main() -> bool:
    """True on the process that owns single-writer side effects (checkpoint
    commit, metrics files, logging)."""
    return jax.process_index() == 0


def barrier(name: str = "crowdmod") -> None:
    """Block until every process reaches this point (no-op single-process).

    Used around process-0 filesystem commits: writers must not rename a
    checkpoint into place while another host still reads the previous one,
    and readers must not start restoring before the commit finished.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def global_batch(local: Any, mesh) -> Any:
    """Assemble a globally-sharded batch from this process's local slice.

    Every leaf of ``local`` is the rows THIS process contributes; the result
    is a pytree of global ``jax.Array``s sharded over the mesh's "data" axis
    — i.e. the global batch is the concatenation of all processes' slices in
    process order, laid out so each host's rows live on its own chips (no
    cross-host transfer at input time; DCN only carries the gradient
    all-reduce XLA inserts).

    Single-process this is just a sharded ``device_put``, so input pipelines
    can call it unconditionally.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), local)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local,
    )


def process_allgather(tree: Any) -> Any:
    """Gather a (possibly cross-host-sharded) pytree to full host-local numpy
    arrays on EVERY process — the pre-step for process-0 checkpoint commit of
    FSDP-sharded state.

    Per-leaf dispatch: only leaves with non-addressable shards (sharded or
    replicated over the global mesh) go through the collective gather.
    Host-local leaves — python/numpy scalars and single-device arrays such
    as the plateau scheduler's injected LR — are identical on every process
    already; multihost_utils' tiled gather would CONCATENATE those across
    processes, silently turning scalars into ``(nprocs,)`` arrays inside
    checkpoints (round-5 bug: reloading a multihost-trained checkpoint then
    crashed on ``float(lr)``).
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree.flatten(tree)
    needs_gather = [
        isinstance(x, jax.Array) and not x.is_fully_addressable
        for x in leaves
    ]
    # ONE tree-level collective for the whole non-addressable subtree (an
    # FSDP state is hundreds of leaves; per-leaf gathers would pay per-call
    # dispatch each) — host-local leaves just device_get.
    gathered = iter(multihost_utils.process_allgather(
        tuple(x for x, g in zip(leaves, needs_gather) if g), tiled=True
    )) if any(needs_gather) else iter(())
    out = [
        next(gathered) if g else jax.device_get(x)
        for x, g in zip(leaves, needs_gather)
    ]
    return jax.tree.unflatten(treedef, out)


def all_processes_equal(value, *, atol: float = 0.0, name: str = "value") -> bool:
    """Check that ``value`` (scalar or small array) is identical on every
    process.

    Implemented as an all-gather + local compare so every process gets the
    verdict.  The classic silent pod bugs — per-host data-order divergence,
    non-deterministic reductions — show up here first.
    """
    arr = np.asarray(jax.device_get(value), dtype=np.float64)
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(arr)  # (nprocs, ...)
    ok = bool(np.all(np.abs(gathered - gathered[0]) <= atol))
    if not ok:
        logging.error(
            "cross-process mismatch in %s: %s", name, gathered.tolist()
        )
    return ok
