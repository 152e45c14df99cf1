"""Per-build manifest with per-shard lineage — the resumability unit.

Replaces the reference's ``processed_files`` checkpoint semantics
(/root/reference/src/ir/index/incremental_builder.py:415-418,508-552):
a re-run skips shards whose manifest entry is complete, and rebuilds the
rest.  Manifest writes are atomic (tmp + rename).  The build fingerprint
(input file list + sizes + config) invalidates stale state, mirroring
the reference's dataset-hash manifest (index_service.py:102-218).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

MANIFEST_VERSION = "nirs_ray_v1"


def write_json_atomic(path: str, obj: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def fingerprint(files: list[str], config: dict) -> str:
    h = hashlib.md5()
    for f in sorted(files):
        h.update(f.encode())
        h.update(str(os.path.getsize(f)).encode())
    h.update(json.dumps(config, sort_keys=True, default=str).encode())
    return h.hexdigest()


class BuildManifest:
    """Tracks stage/shard completion for one index build directory."""

    def __init__(self, index_dir: str, files: list[str], config: dict):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "manifest.json")
        self.fp = fingerprint(files, config)
        existing = read_json(self.path)
        if existing and existing.get("version") == MANIFEST_VERSION and existing.get("fingerprint") == self.fp:
            self.state = existing
        else:
            if existing is not None:
                # stale build (inputs or config changed) -> start clean
                for sub in ("tokens", "segments"):
                    shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
            self.state = {
                "version": MANIFEST_VERSION,
                "fingerprint": self.fp,
                "config": config,
                "files": files,
                "shards": {},
                "stats": None,
                "segments_done": False,
            }
            self.save()

    def save(self) -> None:
        write_json_atomic(self.path, self.state)

    # --- shard (tokens stage) lineage ---
    def shard_done(self, shard_id: int) -> bool:
        return self.state["shards"].get(str(shard_id), {}).get("done", False)

    def mark_shard(self, shard_id: int, *, rows: int, inputs: list[str],
                   save: bool = True) -> None:
        """``save=False`` defers the disk write so a batch of promotions
        does one atomic manifest write instead of one per shard."""
        self.state["shards"][str(shard_id)] = {"done": True, "rows": rows, "inputs": inputs}
        if save:
            self.save()

    # --- global stats ---
    @property
    def stats(self) -> dict | None:
        return self.state["stats"]

    def set_stats(self, n_docs: int, total_len: int) -> None:
        self.state["stats"] = {
            "n_docs": n_docs,
            "total_len": total_len,
            "avg_doc_length": total_len / max(1, n_docs),
        }
        self.save()

    # --- segments stage ---
    @property
    def segments_done(self) -> bool:
        return self.state["segments_done"]

    def mark_segments(self, n_rows: int) -> None:
        self.state["segments_done"] = True
        self.state["segments_rows"] = n_rows
        self.save()
