"""Regression tests for the driver entry's mesh-bootstrap decision.

MULTICHIP_r03 hung (rc=124) because ``_needs_virtual_mesh`` probed
``jax.device_count()`` in a process whose axon PJRT plugin was retrying a
dead tunnel endpoint forever (no timeout on backend init). The decision
must short-circuit on the environment alone — it may only touch the jax
backend when the env proves the probe can't reach a remote plugin.
"""
import sys
import types

import __graft_entry__ as ge


class _TrappedJax(types.ModuleType):
    """Stands in for a jax whose backend init would hang: any probe is a
    test failure (in production it would be an unbounded nanosleep loop)."""

    def __init__(self):
        super().__init__("jax")
        self.probed = False

    def device_count(self):
        self.probed = True
        raise AssertionError("backend probe ran under a hangable env")


def test_axon_env_short_circuits_before_any_backend_probe(monkeypatch):
    fake = _TrappedJax()
    monkeypatch.setitem(sys.modules, "jax", fake)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert ge._needs_virtual_mesh(8) is True
    assert not fake.probed


def test_axon_env_wins_even_when_platform_claims_cpu(monkeypatch):
    # sitecustomize registers the axon plugin whenever POOL_IPS is set,
    # regardless of JAX_PLATFORMS — the env check must key on POOL_IPS.
    fake = _TrappedJax()
    monkeypatch.setitem(sys.modules, "jax", fake)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert ge._needs_virtual_mesh(8) is True
    assert not fake.probed


def test_non_cpu_platform_short_circuits(monkeypatch):
    fake = _TrappedJax()
    monkeypatch.setitem(sys.modules, "jax", fake)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    assert ge._needs_virtual_mesh(8) is True
    assert not fake.probed


def test_missing_device_count_flag_short_circuits(monkeypatch):
    fake = _TrappedJax()
    monkeypatch.setitem(sys.modules, "jax", fake)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "")
    assert ge._needs_virtual_mesh(8) is True
    assert not fake.probed


def test_prepared_cpu_env_uses_the_real_probe(monkeypatch):
    # conftest set up this very process as an 8-device virtual CPU mesh —
    # with the env fully prepared the probe is safe and decides by count.
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert ge._needs_virtual_mesh(8) is False
    # a bigger mesh than the env provides still re-execs (flag mismatch)
    assert ge._needs_virtual_mesh(16) is True
