"""Multi-host setup — the DCN layer of the scaling story.

The reference has no multi-node story (its "collective" is `screen` +
the filesystem, SURVEY.md §2.4). Here hosts join a single JAX runtime
via `jax.distributed.initialize`; meshes from `parallel.mesh.make_mesh`
then span all hosts, with the convention that the fast (ICI) axes carry
the tensor/sequence-parallel traffic and the slow (DCN) host axis only
carries data-parallel gradient reductions:

    mesh = make_mesh({"data": num_hosts * per_host_dp,
                      "model": tp, "seq": sp})

Typical launch (per host):

    python -c "from mamimo_tpu.parallel.multihost import init; init()" \\
        COORD=<host0-addr:port> NPROC=<n> PID=<i>
"""

from __future__ import annotations

import os


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (idempotent, env-overridable).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    when args are None; no-ops in single-process settings so the same
    entrypoints run unchanged on one host.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return
    # Cross-process collectives on the CPU backend need an explicit
    # transport; gloo is the in-tree one. Set it unconditionally — the
    # option only affects CPU client creation (TPU/ICI collectives are
    # untouched), and gating on JAX_PLATFORMS would miss the cases where
    # jax auto-selects cpu or the platform was pinned via jax.config.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older/newer jax naming
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch: int) -> slice:
    """The host-local slice of a globally-sharded batch axis."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
