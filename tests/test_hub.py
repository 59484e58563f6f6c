"""Hub model surface (reference models/factory/hub.py contract):
config.json + model.onnx repo layout, loaded offline from a directory
or a file:// store into a picklable HubModel/EngineConfig."""

import hashlib
import json
import pickle

import pytest

from onnxtr_spark.engine import EngineConfig
from onnxtr_spark.hub import HubModel, from_hub, save_model_and_config


@pytest.fixture
def store(tmp_path):
    src = tmp_path / "trained.onnx"
    src.write_bytes(b"reco-weights")
    repo = save_model_and_config(
        src, tmp_path / "store" / "me" / "my-crnn",
        arch="stub_crnn", task="recognition",
        vocab="abc", input_shape=[3, 32, 128], mean=[0.5, 0.5, 0.5], std=[1.0, 1.0, 1.0],
    )
    assert (repo / "model.onnx").read_bytes() == b"reco-weights"
    assert json.loads((repo / "config.json").read_text())["task"] == "recognition"
    return tmp_path / "store"


def test_from_hub_local_dir(store):
    m = from_hub("me/my-crnn", base=str(store))
    assert m.task == "recognition" and m.arch == "stub_crnn"
    assert m.engine.arch == "stub_crnn"
    assert m.engine.model_path.endswith("model.onnx")
    assert m.param("vocab") == "abc"
    assert m.param("input_shape") == (3, 32, 128)  # list -> tuple (reference hub.py:217-221)
    assert m.engine.mean == (0.5, 0.5, 0.5)
    pickle.loads(pickle.dumps(m))  # ships inside stage configs


def test_from_hub_file_url_with_checksum(store, tmp_path, monkeypatch):
    monkeypatch.setenv("ONNXTR_SPARK_CACHE_DIR", str(tmp_path / "cache"))
    sha = hashlib.sha256(b"reco-weights").hexdigest()
    m = from_hub("me/my-crnn", base=store.as_uri(), model_sha256=sha[:16])
    from pathlib import Path

    assert Path(m.engine.model_path).read_bytes() == b"reco-weights"
    assert str(tmp_path / "cache") in m.engine.model_path  # went through the cache
    with pytest.raises(ValueError, match="corrupted download"):
        from_hub("me/my-crnn", base=store.as_uri(), model_sha256="deadbeef" * 8)


def test_from_hub_validation(store, tmp_path):
    with pytest.raises(FileNotFoundError):
        from_hub("nobody/missing", base=str(store))
    bad = tmp_path / "store2" / "x" / "y"
    bad.mkdir(parents=True)
    (bad / "config.json").write_text(json.dumps({"arch": "a"}))  # no task
    (bad / "model.onnx").write_bytes(b"z")
    with pytest.raises(ValueError, match="missing required key"):
        from_hub("x/y", base=str(tmp_path / "store2"))
    (bad / "config.json").write_text(json.dumps({"arch": "a", "task": "segmentation"}))
    with pytest.raises(ValueError, match="unknown hub task"):
        from_hub("x/y", base=str(tmp_path / "store2"))
    with pytest.raises(ValueError, match="not in"):
        save_model_and_config(bad / "model.onnx", bad, arch="a", task="nope")


def test_hub_model_resolves_through_registry(store):
    """End-to-end: the HubModel's EngineConfig resolves via the model
    registry exactly like a hand-built config (config-only model swap)."""
    from onnxtr_spark import engine as eng

    m = from_hub("me/my-crnn", base=str(store))
    sess = eng.get_recognition_engine(vocab=m.param("vocab"), cfg=m.engine)
    assert sess.vocab == "abc"
    assert isinstance(m, HubModel) and isinstance(m.engine, EngineConfig)
