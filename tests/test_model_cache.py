"""S5 URL half: model artifact download + cache (utils/data.py),
exercised with file:// URLs only — no network (reference contract:
utils/data.py:44-121 + models/engine.py:102-112)."""

import hashlib

import pytest

from onnxtr_spark.utils.data import check_integrity, download_from_url


@pytest.fixture
def artifact(tmp_path):
    src = tmp_path / "store" / "det_fast-cafe01.onnx"
    src.parent.mkdir()
    src.write_bytes(b"onnx-bytes-v1")
    sha = hashlib.sha256(b"onnx-bytes-v1").hexdigest()
    return src, src.as_uri(), sha


def test_download_miss_then_hit(tmp_path, artifact):
    src, url, sha = artifact
    cache = tmp_path / "cache"
    got = download_from_url(url, hash_prefix=sha[:12], cache_dir=str(cache))
    assert got.read_bytes() == b"onnx-bytes-v1"
    assert got.parent == cache / "models"  # reference cache_subdir layout
    # cache HIT: delete the source — a second resolve must not touch it
    src.unlink()
    again = download_from_url(url, hash_prefix=sha[:12], cache_dir=str(cache))
    assert again == got and again.read_bytes() == b"onnx-bytes-v1"


def test_hash_prefix_from_filename(tmp_path):
    """A name like model-<hex>.onnx carries its own expected prefix
    (reference HASH_REGEX) — a mismatching payload must be rejected."""
    src = tmp_path / "det_fast-0000ff.onnx"  # prefix that won't match
    src.write_bytes(b"payload")
    with pytest.raises(ValueError, match="corrupted download"):
        download_from_url(src.as_uri(), cache_dir=str(tmp_path / "c"))
    assert not (tmp_path / "c" / "models" / "det_fast-0000ff.onnx").exists()
    assert not list((tmp_path / "c" / "models").glob("*.part"))  # tmp cleaned


def test_checksum_mismatch_removes_and_raises(tmp_path, artifact):
    _, url, _ = artifact
    cache = tmp_path / "cache"
    with pytest.raises(ValueError, match="corrupted download"):
        download_from_url(url, hash_prefix="deadbeef" * 8, cache_dir=str(cache))
    assert not list((cache / "models").glob("*")) or not any(
        p.suffix != ".part" for p in (cache / "models").glob("*")
    )


def test_stale_cached_file_redownloaded(tmp_path, artifact):
    """An existing cache entry whose hash no longer matches is replaced
    (reference data.py:86-88: hit requires existence AND integrity)."""
    _, url, sha = artifact
    cache = tmp_path / "cache"
    target = cache / "models" / "det_fast-cafe01.onnx"
    target.parent.mkdir(parents=True)
    target.write_bytes(b"stale-bytes")
    got = download_from_url(url, hash_prefix=sha, cache_dir=str(cache))
    assert got.read_bytes() == b"onnx-bytes-v1"
    assert check_integrity(got, sha)


def test_env_var_cache_root(tmp_path, artifact, monkeypatch):
    _, url, sha = artifact
    monkeypatch.setenv("ONNXTR_SPARK_CACHE_DIR", str(tmp_path / "envcache"))
    got = download_from_url(url, hash_prefix=sha)
    assert got.parent == tmp_path / "envcache" / "models"


def test_resolve_feeds_factory_a_verified_local_path(tmp_path, artifact, monkeypatch):
    """engine._resolve with a URL model_path: the registry factory
    receives the cache-local path, never the URL (engine.py wiring)."""
    from onnxtr_spark import engine as eng

    _, url, sha = artifact
    monkeypatch.setenv("ONNXTR_SPARK_CACHE_DIR", str(tmp_path / "ecache"))
    seen = {}

    def factory(cfg):
        seen["path"] = cfg.model_path
        return object()

    eng.register_model("fake_url_arch", factory)
    try:
        cfg = eng.EngineConfig(arch="fake_url_arch", model_path=url, model_sha256=sha[:16])
        eng._resolve("det", cfg)
        assert "://" not in seen["path"]
        assert seen["path"].endswith("det_fast-cafe01.onnx")
        from pathlib import Path

        assert Path(seen["path"]).read_bytes() == b"onnx-bytes-v1"
    finally:
        eng.MODEL_REGISTRY.pop("fake_url_arch", None)
        eng._SESSIONS.pop(("det", cfg, ()), None)


def test_quantization_flags_reach_factory_and_swap_artifact():
    """EngineConfig.load_in_8_bit / precision are part of the session
    contract (reference crnn.py:152-162 + scripts/convert_to_float16.py):
    the factory sees the flags, load_in_8_bit swaps model_path to the
    8-bit artifact (the url_8_bit pattern), and differing quantization
    configs never share a cached session."""
    from onnxtr_spark import engine as eng

    seen = []

    def factory(cfg):
        seen.append(cfg)
        return object()

    eng.register_model("fake_quant_arch", factory)
    try:
        base = eng.EngineConfig(
            arch="fake_quant_arch", model_path="/m/fp32.onnx", model_path_8_bit="/m/int8.onnx"
        )
        q8 = eng.EngineConfig(
            arch="fake_quant_arch", model_path="/m/fp32.onnx", model_path_8_bit="/m/int8.onnx",
            load_in_8_bit=True,
        )
        fp16 = eng.EngineConfig(arch="fake_quant_arch", model_path="/m/fp16.onnx", precision="float16")
        s_base = eng._resolve("reco", base)
        s_q8 = eng._resolve("reco", q8)
        s_fp16 = eng._resolve("reco", fp16)
        assert len({id(s_base), id(s_q8), id(s_fp16)}) == 3  # no session sharing
        assert seen[0].model_path == "/m/fp32.onnx"
        assert seen[1].model_path == "/m/int8.onnx" and seen[1].load_in_8_bit  # url_8_bit swap
        assert seen[2].precision == "float16"
        assert eng._resolve("reco", q8) is s_q8  # same cfg -> cached session
    finally:
        eng.MODEL_REGISTRY.pop("fake_quant_arch", None)
        for k in [k for k in eng._SESSIONS if isinstance(k[1], eng.EngineConfig) and k[1].arch == "fake_quant_arch"]:
            eng._SESSIONS.pop(k, None)


def test_unregistered_arch_gate_names_quantization_flags():
    from onnxtr_spark import engine as eng
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="load_in_8_bit=True"):
        eng._resolve("reco", eng.EngineConfig(arch="no_such_arch_q", load_in_8_bit=True))
    with _pytest.raises(NotImplementedError, match="precision='float16'"):
        eng._resolve("reco", eng.EngineConfig(arch="no_such_arch_q", precision="float16"))
