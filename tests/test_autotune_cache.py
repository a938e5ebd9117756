"""Autotune gate plumbing: disk-cache round-trip, mode gating, VMEM params.

The measurement legs of ops/pallas/autotune.py are TPU-only (compile-probe +
timing against the attached device); what CPU CI can pin is the machinery
around them — the cache serialization every TPU process relies on, the mode
gates, and the scoped-VMEM compiler-params plumbing that keeps a probed
group compilable inside a full model (the batch-512 int8 ResNet OOM'd at
Mosaic's 16 MiB default before kernels carried an explicit limit).
"""

import json

import pytest

import fp8_quantization_tpu.ops.pallas.autotune as at


@pytest.fixture
def fresh_cache(tmp_path, monkeypatch):
    path = tmp_path / "cache.json"
    monkeypatch.setattr(at, "_CACHE_PATH", str(path))
    monkeypatch.setattr(at, "_CACHE", {})
    monkeypatch.setattr(at, "_DISK_LOADED", False)
    return path


def test_disk_cache_round_trip_all_tag_forms(fresh_cache):
    """Every key form in use survives save->load: untagged matmul bools,
    conv group ints ('c'/'c2'/'d'/'ig'/'igp2'), '!'-tagged always-mode
    entries, and the g0 dimension added in v3."""
    entries = {
        (4096, 1024, 1024): True,               # matmul: fused wins
        (512, 512, 1000): False,
        ("c", 512, 14, 256, 256, 31): 8,        # bf16 conv, auto mode
        ("c2", 512, 28, 128, 256, 7): 0,        # stride-2: XLA won
        ("c!", 512, 14, 256, 256, 31): 4,       # always mode: probed only
        ("ig", 8, 14, 256, 256, 31): 8,
        ("igp2!", 512, 28, 128, 256, 7): 2,
        ("d", 256, 56, 96, 2): 2,               # depthwise
        ("d2!", 256, 28, 144, 4): 1,
    }
    at._CACHE.update(entries)
    at._save_disk_cache()
    assert json.loads(fresh_cache.read_text())

    at._CACHE.clear()
    at._DISK_LOADED = False
    at._load_disk_cache()
    assert at._CACHE == entries
    # type discipline: conv tags load as int, matmul as bool
    assert isinstance(at._CACHE[("c!", 512, 14, 256, 256, 31)], int)
    assert isinstance(at._CACHE[(4096, 1024, 1024)], bool)


def test_mode_gates_on_cpu(fresh_cache, monkeypatch):
    """CPU backend: never/heuristic say 0 (conv) — auto and always trust
    g0 (interpret mode has no VMEM constraint, tests drive the kernels)."""
    for mode in ("never", "heuristic"):
        monkeypatch.setattr(at, "MODE", mode)
        assert at.conv3_group(8, 14, 256, 256, 4) == 0
        assert at.dw_group(8, 14, 96, 4) == 0
        assert at.conv3_int8_group(8, 14, 256, 256, 4) == 0
    for mode in ("auto", "always"):
        monkeypatch.setattr(at, "MODE", mode)
        assert at.conv3_group(8, 14, 256, 256, 4) == 4
        assert at.dw_group(8, 14, 96, 4) == 4
        assert at.conv3_int8_group(8, 14, 256, 256, 4) == 4


def test_compiler_params_limits():
    from fp8_quantization_tpu.ops.pallas.common import (
        PROBE_VMEM_LIMIT_BYTES, VMEM_LIMIT_BYTES, tpu_compiler_params)

    assert tpu_compiler_params().vmem_limit_bytes == VMEM_LIMIT_BYTES
    assert (tpu_compiler_params(PROBE_VMEM_LIMIT_BYTES).vmem_limit_bytes
            == PROBE_VMEM_LIMIT_BYTES)
    # the probe margin exists so a group that probes clean can't OOM when
    # the same kernel is embedded in a model (observed +8% scoped-VMEM at
    # ResNet block shapes); keep it a real margin
    assert PROBE_VMEM_LIMIT_BYTES <= 0.9 * VMEM_LIMIT_BYTES
    # and both must fit a v5e core's 128 MiB physical VMEM
    assert VMEM_LIMIT_BYTES <= 128 * 1024 * 1024
