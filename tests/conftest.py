"""Test harness: force the CPU backend with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding tests run on a
virtual 8-device CPU mesh (`xla_force_host_platform_device_count`), the
pattern the driver's `dryrun_multichip` also uses.

Note: the environment's sitecustomize registers the remote-TPU PJRT
plugin at interpreter startup, so plain env vars are too late — we flip
the platform through jax.config before any backend is resolved.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)


# --- minimal async test support (pytest-asyncio is not in the image) -------

import asyncio
import inspect


def pytest_configure(config):
    config.addinivalue_line("markers", "asyncio: run test in an event loop")


@pytest.hookimpl(tryfirst=True)
def pytest_pyfunc_call(pyfuncitem):
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
    return None
