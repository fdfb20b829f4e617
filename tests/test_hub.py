"""Hub-upload wiring (VERDICT r3 #9): exercise train.hub.push_to_hub beyond
the no-op branch against a filesystem-remote stub of `huggingface_hub.HfApi`.

No real hub is reachable offline, so the stub implements the two API calls
the uploader uses (create_repo with exist_ok, upload_folder) by copying into
a local "remote" directory — the test then asserts the UPLOADED FILE SET is
exactly the run directory the trainer assembles (model card, trainer state,
results JSONs, checkpoints), and that failures leave the run directory
intact and report False.

Reference surface: finetuning.py:141-149 (trainer.push_to_hub(**kwargs)).
"""

import os
import shutil
import sys

import numpy as np
import pytest

from rgbdseg_tpu.train import hub as hub_mod


def _make_run_dir(tmp_path):
    run = tmp_path / "finished_run"
    (run / "checkpoint-6").mkdir(parents=True)
    (run / "checkpoint-6" / "params.octet").write_bytes(b"\x00" * 64)
    (run / "README.md").write_text("# model card")
    (run / "trainer_state.json").write_text("{}")
    (run / "train_results.json").write_text("{}")
    (run / "all_results.json").write_text("{}")
    return run


class _FsRemoteApi:
    """Filesystem-remote HfApi stub: repos are directories under `root`."""

    root = None
    calls = []

    def __init__(self, token=None):
        type(self).calls.append(("init", token))

    def create_repo(self, repo_id, private=True, exist_ok=False):
        path = os.path.join(self.root, repo_id)
        if os.path.exists(path) and not exist_ok:
            raise FileExistsError(repo_id)
        os.makedirs(path, exist_ok=True)
        type(self).calls.append(("create_repo", repo_id, private, exist_ok))

    def upload_folder(self, repo_id, folder_path):
        dst = os.path.join(self.root, repo_id)
        assert os.path.isdir(dst), "upload_folder before create_repo"
        shutil.copytree(folder_path, dst, dirs_exist_ok=True)
        type(self).calls.append(("upload_folder", repo_id, folder_path))


def _install_stub(monkeypatch, tmp_path):
    import types

    _FsRemoteApi.root = str(tmp_path / "remote")
    _FsRemoteApi.calls = []
    os.makedirs(_FsRemoteApi.root, exist_ok=True)
    fake = types.ModuleType("huggingface_hub")
    fake.HfApi = _FsRemoteApi
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)


def test_push_to_hub_uploads_exact_file_set(tmp_path, monkeypatch):
    run = _make_run_dir(tmp_path)
    _install_stub(monkeypatch, tmp_path)

    assert hub_mod.push_to_hub(str(run), repo_id="user/run-a", token="tok") is True
    assert ("create_repo", "user/run-a", True, True) in _FsRemoteApi.calls

    remote = os.path.join(_FsRemoteApi.root, "user/run-a")
    uploaded = {
        os.path.relpath(os.path.join(d, f), remote)
        for d, _, fs in os.walk(remote)
        for f in fs
    }
    local = {
        os.path.relpath(os.path.join(d, f), run)
        for d, _, fs in os.walk(run)
        for f in fs
    }
    assert uploaded == local == {
        "README.md",
        "trainer_state.json",
        "train_results.json",
        "all_results.json",
        os.path.join("checkpoint-6", "params.octet"),
    }


def test_push_to_hub_default_repo_id_is_run_basename(tmp_path, monkeypatch):
    run = _make_run_dir(tmp_path)
    _install_stub(monkeypatch, tmp_path)
    assert hub_mod.push_to_hub(str(run) + os.sep) is True  # trailing sep normalized
    assert os.path.isdir(os.path.join(_FsRemoteApi.root, "finished_run"))


def test_push_to_hub_failure_returns_false_and_keeps_run(tmp_path, monkeypatch):
    run = _make_run_dir(tmp_path)
    _install_stub(monkeypatch, tmp_path)

    def boom(self, repo_id, folder_path):
        raise ConnectionError("remote unreachable")

    monkeypatch.setattr(_FsRemoteApi, "upload_folder", boom)
    assert hub_mod.push_to_hub(str(run), repo_id="user/run-b") is False
    # run directory untouched
    assert (run / "trainer_state.json").exists()
    assert (run / "checkpoint-6" / "params.octet").exists()


def test_push_to_hub_without_client_is_logged_noop(tmp_path, monkeypatch):
    run = _make_run_dir(tmp_path)
    monkeypatch.setitem(sys.modules, "huggingface_hub", None)  # import -> ImportError
    assert hub_mod.push_to_hub(str(run)) is False
    assert (run / "README.md").exists()
