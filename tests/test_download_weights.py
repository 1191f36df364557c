"""Weight downloader (reference download_weights.py): plan, fetch via
injected transports, local validation, and CLI surface."""

import os

import pytest

from metric_depth_video_toolbox_tpu.models import convert


def test_registry_has_sources_for_every_entry():
    """Every registry entry names where its checkpoints come from
    (direct URLs or an HF repo) — the download plan the reference
    encodes in its MODELS table."""
    for name in convert.WEIGHT_REGISTRY:
        urls, hf = convert.weight_sources(name)
        assert urls or hf, name
        for u in urls:
            assert u.startswith("https://"), u


def test_dry_run_prints_plan_and_downloads_nothing(tmp_path, capsys):
    got = convert.download_weights("vda", str(tmp_path), dry_run=True)
    assert got == []
    out = capsys.readouterr().out
    assert "video_depth_anything_vitl.pth" in out
    assert os.listdir(tmp_path) == []


def test_download_via_injected_transport(tmp_path):
    def fake_urlretrieve(url, dest):
        with open(dest, "wb") as f:
            f.write(b"ckpt:" + url.encode())

    paths = convert.download_weights("vda", str(tmp_path),
                                     _urlretrieve=fake_urlretrieve)
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p)
    # idempotent: second call skips (transport that would fail loudly)
    def boom(url, dest):
        raise AssertionError("re-downloaded an existing file")
    again = convert.download_weights("vda", str(tmp_path),
                                     _urlretrieve=boom)
    assert again == paths


def test_hf_snapshot_via_injected_transport(tmp_path):
    def fake_snapshot(repo_id, local_dir):
        os.makedirs(local_dir, exist_ok=True)
        with open(os.path.join(local_dir, "model.safetensors"), "wb") as f:
            f.write(b"x")

    paths = convert.download_weights("moge", str(tmp_path),
                                     _snapshot=fake_snapshot)
    assert paths and os.path.isdir(paths[0])


def test_offline_failure_names_missing_files(tmp_path):
    def offline(url, dest):
        raise OSError("no route to host")

    with pytest.raises(FileNotFoundError) as e:
        convert.download_weights("raft", str(tmp_path),
                                 _urlretrieve=offline)
    assert "raft-large.pth" in str(e.value)
    assert "no route to host" in str(e.value)


def test_cli_dry_run(capsys):
    from metric_depth_video_toolbox_tpu.cli import download_weights as dw
    dw.main(["--model", "inspatio_world", "--dry_run"])
    assert "InSpatio-World-1.3B" in capsys.readouterr().out
