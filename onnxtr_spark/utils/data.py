"""Model-artifact download + cache (S5's URL half).

Re-derives the reference's checkpoint fetch contract (utils/data.py:
44-121 ``download_from_url`` + models/engine.py:102-112, which resolves
``url`` through the cache before opening the InferenceSession):

- cache root from ``ONNXTR_SPARK_CACHE_DIR`` else ``~/.cache/
  onnxtr_spark`` (reference: ONNXTR_CACHE_DIR / ~/.cache/onnxtr);
- a filename like ``crnn_vgg16_bn-deadbeef.onnx`` carries its own
  sha256 prefix (reference HASH_REGEX) — an explicit ``hash_prefix``
  overrides it;
- cache hit = file exists and hash matches → no network touched;
- corrupted download → file removed, ValueError raised (reference
  data.py:115-119).

Spark-specific hardening (NOT in the reference, which writes the cache
file in place): the download lands in a per-process temp name and is
``os.replace``d into the cache atomically, so many executor workers on
one host resolving the same model concurrently can never observe a
half-written artifact — each either hits the finished file or installs
its own complete copy.

Deployment note: each executor host keeps its own cache (this function
runs inside the Python worker via engine._resolve). For cold-start-free
clusters, ship the artifact with ``spark-submit --files`` /
``SparkContext.addFile`` instead and pass the ``SparkFiles.get`` path
as ``model_path`` — both routes end at the same registry factory.
"""

from __future__ import annotations

import hashlib
import os
import re
import urllib.request
from pathlib import Path

__all__ = ["download_from_url"]

# matches deadbeef in crnn_vgg16_bn-deadbeef.onnx (reference data.py:22)
_HASH_IN_NAME = re.compile(r"-([a-f0-9]*)\.")
_USER_AGENT = "onnxtr-spark"


def _sha256(path: Path | str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def check_integrity(path: Path | str, hash_prefix: str) -> bool:
    """True if the file's sha256 starts with ``hash_prefix``."""
    return _sha256(path).startswith(hash_prefix)


def download_from_url(
    url: str,
    file_name: str | None = None,
    hash_prefix: str | None = None,
    cache_dir: str | None = None,
    cache_subdir: str = "models",
) -> Path:
    """Resolve ``url`` to a verified local file through the cache.

    Supports http(s):// and file:// URLs (file:// is how the no-network
    test environment and local artifact stores exercise the same path).
    """
    if file_name is None:
        file_name = url.rpartition("/")[-1].split("&")[0].split("?")[0]
    if hash_prefix is None:
        m = _HASH_IN_NAME.search(file_name)
        hash_prefix = m.group(1) if m else None

    root = cache_dir or os.environ.get(
        "ONNXTR_SPARK_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "onnxtr_spark")
    )
    folder = Path(root, cache_subdir)
    target = folder / file_name
    if target.is_file() and (hash_prefix is None or check_integrity(target, hash_prefix)):
        return target

    folder.mkdir(parents=True, exist_ok=True)
    tmp = folder / f".{file_name}.{os.getpid()}.part"
    try:
        req = urllib.request.Request(url, headers={"User-Agent": _USER_AGENT})
        with urllib.request.urlopen(req) as resp, open(tmp, "wb") as out:
            for chunk in iter(lambda: resp.read(1 << 20), b""):
                out.write(chunk)
        if hash_prefix is not None and not check_integrity(tmp, hash_prefix):
            raise ValueError(
                f"corrupted download, the hash of {url} does not match its expected value"
            )
        os.replace(tmp, target)  # atomic: concurrent workers race safely
    finally:
        if tmp.exists():
            tmp.unlink()
    return target
