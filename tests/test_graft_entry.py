"""Driver entry-point contract: dryrun_multichip must be hang-proof.

Round 3 lost its MULTICHIP capture (rc=124) because the parent process
called jax.devices() — initializing a hung tunneled TPU backend — before
deciding to self-provision a virtual CPU mesh.  These tests pin the two
load-bearing properties of the fix:

* the CPU-pinned path runs the full body in-process (and emits the
  work-balance evidence line), and
* when the default backend cannot be probed, the parent NEVER touches
  jax.devices() — it goes straight to the virtual-CPU respawn.
"""

import sys

import pytest


@pytest.fixture
def graft(monkeypatch):
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    monkeypatch.delenv("_FRACTAL_TPU_DRYRUN_CHILD", raising=False)
    return g


def test_dryrun_runs_in_process_when_cpu_pinned(graft, monkeypatch, capsys):
    # conftest already provisioned 8 virtual CPU devices in this process;
    # the env pin tells the dryrun it is safe to use them directly.
    monkeypatch.setenv("FRACTAL_TPU_PLATFORM", "cpu")
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "work-balance" in out
    assert "max/mean=" in out


def test_parent_never_inits_backend_when_probe_fails(graft, monkeypatch):
    monkeypatch.delenv("FRACTAL_TPU_PLATFORM", raising=False)
    monkeypatch.setattr(graft, "_probe_default_backend", lambda timeout=60: None)
    respawned = []
    monkeypatch.setattr(
        graft, "_respawn_virtual_cpu", lambda n: respawned.append(n)
    )

    def _forbidden(*a, **k):  # a hung backend would block here for hours
        raise AssertionError("parent touched jax.devices() with a dead probe")

    monkeypatch.setattr(graft.jax, "devices", _forbidden)
    graft.dryrun_multichip(8)
    assert respawned == [8]


def test_parent_respawns_when_backend_has_too_few_devices(graft, monkeypatch):
    monkeypatch.delenv("FRACTAL_TPU_PLATFORM", raising=False)
    # live backend, but a single chip: must self-provision, not run local
    monkeypatch.setattr(graft, "_probe_default_backend", lambda timeout=60: 1)
    respawned = []
    monkeypatch.setattr(
        graft, "_respawn_virtual_cpu", lambda n: respawned.append(n)
    )
    graft.dryrun_multichip(8)
    assert respawned == [8]
