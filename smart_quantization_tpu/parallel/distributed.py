"""Multi-host initialization for TPU pod slices.

The reference relies on Lightning spawning one process per GPU and NCCL
(SURVEY.md row 28).  The TPU-native equivalent is single-program multi-host
JAX: every host runs the same program, ``jax.distributed.initialize`` wires
the hosts together, and the global mesh spans all chips — intra-slice
collectives ride ICI, inter-slice DCN.

Usage on a pod slice (one process per host):
    from smart_quantization_tpu.parallel.distributed import init_multihost
    init_multihost()                    # env-driven (TPU auto-detect)
    mesh = make_mesh(dp=jax.device_count())

On single-host (or CPU test rigs) this is a no-op.
"""

from __future__ import annotations

import os

import jax


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    With no arguments, TPU pod environments auto-detect everything from the
    metadata/env; explicit arguments support CPU/GPU clusters or tests.
    Returns a summary dict (process_index, process_count, device counts).
    """
    want_init = (
        coordinator_address is not None
        or os.environ.get("SMAQ_MULTIHOST") == "1"
        or int(os.environ.get("TPU_NUM_PROCESSES", "1") or 1) > 1
    )
    if want_init:
        # NOTE: must run before anything touches a backend (even
        # jax.process_count() would initialize one and poison this call).
        # A second call is a no-op: check the client first (the message of
        # the RuntimeError differs across JAX versions — 0.9.0 says
        # "should only be called once", older said "already initialized").
        # The probe reads private jax internals; a JAX release that moves
        # them must fall through to already=False so the string-matched
        # RuntimeError below remains the safety net (ADVICE r4).
        try:
            already = (
                getattr(jax._src.distributed.global_state, "client", None)
                is not None
            )
        except (AttributeError, ImportError):
            already = False
        if not already:
            try:
                jax.distributed.initialize(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes,
                    process_id=process_id,
                )
            except RuntimeError as e:
                msg = str(e)
                if (
                    "already initialized" not in msg
                    and "only be called once" not in msg
                ):
                    raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_primary() -> bool:
    """True on the host that should write checkpoints/logs."""
    return jax.process_index() == 0
