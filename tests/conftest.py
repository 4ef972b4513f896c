"""Test bootstrap: force a virtual 8-device CPU platform before JAX imports.

Multi-host/multi-chip behavior is tested without a pod via JAX's standard fake:
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4.4). Real-TPU smoke
coverage comes from bench.py / __graft_entry__.py, which do not import this file.
"""

import os
import sys

# Force-override: the session environment pins JAX_PLATFORMS to the real TPU
# platform, but tests must run on the virtual multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# The machine's sitecustomize registers a remote-TPU PJRT plugin and overrides
# jax_platforms at interpreter start, so the env var alone is not enough.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
