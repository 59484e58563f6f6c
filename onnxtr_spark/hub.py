"""Model-hub surface: load (arch + params + artifact) from a hub-style
repo layout (reference models/factory/hub.py).

The reference's hub contract is a repo holding two files —
``config.json`` ({"arch", "task", plus task params: vocab /
input_shape / classes / mean / std}) and ``model.onnx`` — fetched with
hf_hub_download and dispatched to the arch factory
(hub.py:184-225 ``from_hub``; writer side
``_save_model_and_config_for_hf_hub`` hub.py:80-104). This module
re-derives that contract storage-agnostically: a repo is any directory
or URL base reachable as ``<base>/<repo_id>/<file>`` — a local dir, a
``file://`` store, or an HTTP artifact server — resolved through the
same cached, checksum-verified ``utils/data.download_from_url`` the
engine uses (huggingface_hub is absent in this container; its download
is the same fetch+cache shape).

The Spark-first difference: ``from_hub`` does NOT build a live model
object (sessions are per-executor-worker singletons, engine.py); it
returns a picklable ``HubModel`` whose ``EngineConfig`` ships to
executors inside stage configs, where the registry resolves it.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from onnxtr_spark.engine import EngineConfig

HUB_TASKS = ("classification", "detection", "recognition")


@dataclass(frozen=True)
class HubModel:
    """Resolved hub model: everything a stage config needs, picklable."""

    task: str
    arch: str
    engine: EngineConfig
    # task params with lists tuple-ified (reference hub.py:217-221):
    # vocab/input_shape for recognition, classes for classification, ...
    cfg: tuple[tuple[str, Any], ...] = field(default=())

    def param(self, key: str, default: Any = None) -> Any:
        return dict(self.cfg).get(key, default)


def save_model_and_config(
    model_path: str | Path, save_dir: str | Path, arch: str, task: str, **params: Any
) -> Path:
    """Writer side (the push_to_hf_hub layout, reference hub.py:80-104):
    copy the artifact as ``model.onnx`` and dump ``config.json`` with
    arch + task + params. Returns the repo directory."""
    if task not in HUB_TASKS:
        raise ValueError(f"task {task!r} not in {HUB_TASKS}")
    repo = Path(save_dir)
    repo.mkdir(parents=True, exist_ok=True)
    shutil.copy2(model_path, repo / "model.onnx")
    cfg = {**params, "arch": arch, "task": task}
    (repo / "config.json").write_text(json.dumps(cfg, indent=2, ensure_ascii=False))
    return repo


def _fetch(repo_id: str, base: str, filename: str, hash_prefix: str | None = None) -> Path:
    base = base.rstrip("/")
    if "://" in base:
        from onnxtr_spark.utils.data import download_from_url

        # cache under the repo id so two repos' model.onnx don't collide
        return download_from_url(
            f"{base}/{repo_id}/{filename}",
            file_name=f"{repo_id.replace('/', '--')}--{filename}",
            hash_prefix=hash_prefix,
        )
    local = Path(base) / repo_id / filename
    if not local.is_file():
        raise FileNotFoundError(f"hub file not found: {local}")
    if hash_prefix:
        # a caller-supplied checksum must be enforced on the local-dir
        # branch too — otherwise a corrupted artifact in a local store
        # passes silently while the same file over URL would be rejected
        from onnxtr_spark.utils.data import check_integrity

        if not check_integrity(local, hash_prefix):
            raise ValueError(
                f"hub file {local} failed sha256 check against prefix {hash_prefix!r}"
            )
    return local


def from_hub(
    repo_id: str,
    base: str,
    engine_cfg: EngineConfig | None = None,
    model_sha256: str | None = None,
) -> HubModel:
    """Resolve a hub repo to a ``HubModel`` (reference from_hub,
    hub.py:184-225: fetch config.json, fetch model.onnx, dispatch on
    task, tuple-ify list params).

    ``base``: the store root — a directory path or a URL base
    (file:///... works offline). ``engine_cfg`` carries session options
    to merge (providers, threads); arch/model_path/checksum come from
    the hub.
    """
    cfg = json.loads(Path(_fetch(repo_id, base, "config.json")).read_text())
    try:
        arch, task = cfg.pop("arch"), cfg.pop("task")
    except KeyError as e:
        raise ValueError(f"hub config.json missing required key: {e}") from None
    if task not in HUB_TASKS:
        raise ValueError(f"unknown hub task {task!r} (expected one of {HUB_TASKS})")
    model_path = _fetch(repo_id, base, "model.onnx", hash_prefix=model_sha256)
    # lists → tuples so the params are hashable alongside EngineConfig
    params = tuple(
        (k, tuple(v) if isinstance(v, list) else v) for k, v in sorted(cfg.items())
    )
    ecfg = engine_cfg or EngineConfig()
    from dataclasses import replace

    engine = replace(
        ecfg,
        arch=arch,
        model_path=str(model_path),
        model_sha256=model_sha256,
        mean=tuple(cfg.get("mean", ecfg.mean)),
        std=tuple(cfg.get("std", ecfg.std)),
    )
    return HubModel(task=task, arch=arch, engine=engine, cfg=params)
