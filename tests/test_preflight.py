"""preflight auto-detection of mounted real assets (VERDICT r3 item 7)."""


def test_scan_real_assets_detects_mounted_tree(tmp_path, monkeypatch):
    """An ImageFolder-shaped tree + torch ckpts under the env-pointed roots
    are found and mapped to archs."""
    from cli.image_net import _scan_real_assets

    data = tmp_path / "imagenet"
    for i in range(60):
        (data / "val" / f"n{i:08d}").mkdir(parents=True)
    ck = tmp_path / "ckpts"
    ck.mkdir()
    (ck / "resnet18-f37072fd.pth").write_bytes(b"x")
    (ck / "mobilenet_v2.pth.tar").write_bytes(b"x")
    monkeypatch.setenv("IMAGENET_DIR", str(tmp_path))
    monkeypatch.setenv("MODEL_DIR", str(ck))

    scan = _scan_real_assets()
    assert scan["imagenet_root"] == str(data)
    assert scan["checkpoints"]["resnet18"].endswith("resnet18-f37072fd.pth")
    assert scan["checkpoints"]["mobilenet_v2"].endswith("mobilenet_v2.pth.tar")


def test_scan_real_assets_empty_env(tmp_path, monkeypatch):
    """No assets -> no detection, no crash (the synthetic-fallback mode)."""
    from cli.image_net import _scan_real_assets

    monkeypatch.setenv("IMAGENET_DIR", str(tmp_path / "nope"))
    monkeypatch.setenv("MODEL_DIR", str(tmp_path / "nope2"))
    scan = _scan_real_assets()
    assert isinstance(scan["checkpoints"], dict)
