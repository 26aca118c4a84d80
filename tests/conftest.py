"""Test bootstrap: force an 8-virtual-device CPU mesh.

All distributed logic (TP/DP/EP/CP shardings, collectives) is tested on a
virtual CPU mesh — this exceeds the reference's multi-node test coverage,
which has no multi-node harness at all (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
