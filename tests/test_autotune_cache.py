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


def test_committed_seed_answers_gates_without_measuring(tmp_path, monkeypatch):
    """VERDICT r3 item 5 / r4 item 3: a fresh checkout (cold /tmp cache)
    must reproduce the measured v5e gate verdicts from the committed seed
    with ZERO on-chip races.  Uses the committed v5_<kind>.json for
    whatever kind(s) have been harvested (tools/harvest_autotune_seed.py);
    skips only if none is committed yet."""
    import glob
    import os

    seeds = sorted(glob.glob(os.path.join(
        os.path.dirname(at.__file__), "autotune_seed", "v5_*.json")))
    if not seeds:
        pytest.skip("no committed autotune seed yet (run "
                    "tools/harvest_autotune_seed.py on a TPU session)")
    seed = seeds[0]
    with open(seed) as f:
        entries = json.load(f)
    assert entries, f"{seed} is empty"

    # cold live cache; seed path pinned to the committed file
    monkeypatch.setattr(at, "_CACHE_PATH", str(tmp_path / "live.json"))
    monkeypatch.setattr(at, "_CACHE", {})
    monkeypatch.setattr(at, "_DISK_LOADED", False)
    monkeypatch.setattr(at, "_seed_path", lambda: seed)
    # any attempt to measure is a test failure: the seed must answer
    for fname in ("_measure", "_resolve_conv3_group", "_resolve_int8_group",
                  "_resolve_dw_group", "_resolve_stem_group", "_resolve_attn",
                  "_resolve_ir_group"):
        if hasattr(at, fname):
            monkeypatch.setattr(
                at, fname,
                lambda *a, _f=fname, **k: pytest.fail(
                    f"{_f} re-raced despite the committed seed"))
    at._load_disk_cache()
    assert len(at._CACHE) == len(entries)
    # every cached verdict is served for its own key form (matmul bools /
    # tagged group ints) — exercise via the public decisions() view
    for key, val in list(at._CACHE.items())[:50]:
        assert at.decisions()[key] == val
