"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without a pod (the JAX-idiomatic fake backend —
the reference had no equivalent, SURVEY.md section 4).

The container's sitecustomize registers a TPU PJRT plugin and imports jax at
interpreter startup, so setting JAX_PLATFORMS here is too late — the conftest
re-execs pytest once with the corrected environment.  The re-exec lives in
``pytest_configure`` (not import time) so pytest's fd-level capture can be
suspended first: exec'ing while capture is active hands the child pytest's
capture temp file as stdout and every line of output silently vanishes.
Set SMAQ_TEST_TPU=1 to skip the re-exec and run the suite against the real
TPU chip instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _needs_reexec() -> bool:
    return (
        os.environ.get("SMAQ_TEST_TPU") != "1"
        and os.environ.get("SMAQ_TEST_REEXEC") != "1"
    )


def pytest_configure(config):
    if not _needs_reexec():
        return
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
    cap = config.pluginmanager.getplugin("capturemanager")
    if cap is not None:
        # restore the real stdout/stderr fds before exec (see module docstring)
        cap.suspend_global_capture(in_=True)
    os.execvpe(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )
