"""Mini copy-on-write table format: snapshot versioning / time travel
over plain parquet, in the shape Iceberg/Delta standardized for object
stores (public designs; implemented from scratch here):

- every write produces a NEW immutable data directory plus a snapshot
  manifest `_snapshots/v{N}.json` listing exactly the files that make
  up that version (append mode inherits the parent's file list;
  overwrite starts fresh);
- readers resolve a version (or the `_latest` pointer) to a file list
  and read ONLY those files — a crashed writer's orphan data files
  are invisible because nothing references them;
- publication is one atomic pointer swap (`_latest` written
  temp-then-rename), never a directory rename — object stores have no
  atomic rename of prefixes, but a single small object CAN be
  replaced atomically, which is the whole trick.

Time travel falls out: historical versions stay readable until a
retention job deletes their manifests + unreferenced files.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _snap_dir(table_path: str) -> str:
    return os.path.join(table_path, "_snapshots")


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(_snap_dir(table_path), f"v{version}.json")


def current_version(table_path: str) -> int | None:
    ptr = os.path.join(_snap_dir(table_path), "_latest")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def write_snapshot(df: DataFrame, table_path: str, mode: str = "append") -> int:
    """Write `df` as a new snapshot; returns the new version number.
    mode='append' adds the new files to the parent version's list;
    mode='overwrite' starts the list fresh (copy-on-write: the
    parent's files remain on disk and referenced by ITS manifest, so
    old versions stay readable)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot mode: {mode}")
    parent = current_version(table_path)
    version = 1 if parent is None else parent + 1

    data_dir = os.path.join(table_path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    files: list[str] = []
    if mode == "append" and parent is not None:
        with open(_manifest_path(table_path, parent)) as f:
            files = json.load(f)["files"]
    files = files + new_files

    os.makedirs(_snap_dir(table_path), exist_ok=True)
    manifest = {"version": version, "parent": parent, "mode": mode, "files": files}
    mpath = _manifest_path(table_path, version)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    # atomic publication: the pointer swap IS the commit
    ptr = os.path.join(_snap_dir(table_path), "_latest")
    tmp_ptr = ptr + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp_ptr, "w") as f:
        f.write(str(version))
    os.replace(tmp_ptr, ptr)
    return version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read a specific version (default: latest). Only the manifest's
    files are scanned — orphans and later versions' files are not part
    of this table version by construction."""
    v = version if version is not None else current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no snapshots at {table_path}")
    with open(_manifest_path(table_path, v)) as f:
        files = json.load(f)["files"]
    return spark.read.parquet(*files)


def vacuum(table_path: str, keep_last: int = 1) -> dict:
    """Retention maintenance: keep the newest `keep_last` versions,
    delete older manifests and every data file no kept version
    references. Runs strictly AFTER readers of expired versions are
    gone (retention window), like any table format's vacuum. Returns
    counts for observability — a maintenance job that reports nothing
    cannot be audited."""
    latest = current_version(table_path)
    if latest is None:
        return {"kept_versions": 0, "deleted_manifests": 0, "deleted_files": 0}
    keep = set(range(max(1, latest - keep_last + 1), latest + 1))
    referenced: set[str] = set()
    for v in keep:
        with open(_manifest_path(table_path, v)) as f:
            referenced.update(json.load(f)["files"])

    deleted_manifests = 0
    for name in os.listdir(_snap_dir(table_path)):
        if not name.startswith("v") or not name.endswith(".json"):
            continue
        v = int(name[1:-5])
        if v not in keep:
            os.remove(os.path.join(_snap_dir(table_path), name))
            deleted_manifests += 1

    deleted_files = 0
    data_root = os.path.join(table_path, "data")
    for root, _dirs, files in os.walk(data_root):
        for fname in files:
            path = os.path.join(root, fname)
            if fname.endswith(".parquet") and path not in referenced:
                os.remove(path)
                deleted_files += 1
    return {
        "kept_versions": len(keep),
        "deleted_manifests": deleted_manifests,
        "deleted_files": deleted_files,
    }
