"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the tunneled TPU backend for every
interpreter; tests must run locally instead (fast, and they exercise the
multi-device sharding path via 8 virtual CPU devices — the JAX way to
simulate a slice, SURVEY.md §4).  jax.config must be updated before the
backend initializes, hence this runs at conftest import time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
