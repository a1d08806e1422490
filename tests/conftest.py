"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without a pod (the JAX-idiomatic fake backend —
the reference had no equivalent, SURVEY.md section 4).

The container's sitecustomize registers a TPU PJRT plugin and imports jax at
interpreter startup, so setting JAX_PLATFORMS here is too late — the conftest
re-execs pytest once with the corrected environment.  Set SMAQ_TEST_TPU=1 to
skip the re-exec and run the suite against the real TPU chip instead.
"""

import os
import sys

if (
    os.environ.get("SMAQ_TEST_TPU") != "1"
    and os.environ.get("SMAQ_TEST_REEXEC") != "1"
):
    env = dict(os.environ)
    env["SMAQ_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the TPU plugin sitecustomize
    # zero-egress container: skip huggingface's 5-retry DNS timeout (~30 s
    # per GLUE/IMDB test) and go straight to the synthetic fallback
    env.setdefault("HF_HUB_OFFLINE", "1")
    env.setdefault("HF_DATASETS_OFFLINE", "1")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
