"""Pallas kernel gating in the entry runtime.

A bare pallas_call has no GSPMD partitioning rule, so under a
>1-device mesh the kernels must run shard_mapped over the batch axis:
the runtime passes the live mesh (``pallas_mesh``) whenever it enables
the fused path, and never enables it on platforms without Pallas.
"""

from pemp_tpu.config import Config
from pemp_tpu.core.experiment import EntryRuntime
from pemp_tpu.models import registry


class _Runtime(EntryRuntime):
    name = "pemp_stage1"


def _cfg(mesh):
    cfg = Config(tag="t")
    cfg.net = registry.net_config("pemp_stage1")
    cfg.split = 0
    cfg.tpu.mesh = mesh
    cfg.tpu.use_pallas = True
    return cfg


def _build(mesh, monkeypatch, available):
    from pemp_tpu.ops.pallas import mpm
    monkeypatch.setattr(mpm, "pallas_available", lambda: available)
    return _Runtime(_cfg(mesh), None)


def test_single_device_enables_pallas(monkeypatch):
    rt = _build(mesh=0, monkeypatch=monkeypatch, available=True)
    assert rt.model.use_pallas is True
    assert rt.model.pallas_mesh is None
    assert rt.eval_model.use_pallas is True


def test_multi_device_mesh_passes_shard_map_mesh(monkeypatch):
    rt = _build(mesh=8, monkeypatch=monkeypatch, available=True)
    assert rt.mesh is not None
    assert rt.model.use_pallas is True
    assert rt.model.pallas_mesh is rt.mesh      # kernels will shard_map


def test_unavailable_platform_disables_pallas(monkeypatch):
    rt = _build(mesh=0, monkeypatch=monkeypatch, available=False)
    assert rt.model.use_pallas is False
