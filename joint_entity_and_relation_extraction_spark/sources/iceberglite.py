"""IcebergLite — a thin Iceberg-semantics table layer over parquet.

BASELINE.json mandates Iceberg tables; no iceberg-spark-runtime jar exists
in this sandbox (SURVEY.md §0.4), so this module reproduces the *logical*
semantics that the pipeline depends on — snapshot isolation via atomic
metadata swap, append / dynamic-partition-overwrite, snapshot pinning
(time travel), and manifest-side partition pruning — over plain parquet
files. The physical design mirrors Iceberg's: data files are written first
(never visible), then a single atomic ``os.replace`` of ``manifest.json``
commits the snapshot. On a real cluster every call site swaps to
``spark.read/writeTo .format("iceberg")`` — all reads/writes go through
this one module (SURVEY.md §0.4 implication 1).

Layout::

    <root>/manifest.json            # atomic commit point
    <root>/data/snap-<id>/<col=val>/...parquet

A snapshot records the *complete* list of leaf partition-directory units
composing the table at that version, so reads never list the filesystem.
"""

from __future__ import annotations

import json
import os
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(root: str) -> str:
    return os.path.join(root, "manifest.json")


def _load(root: str) -> dict:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return {"partition_by": [], "current_snapshot": None, "snapshots": []}
    with open(p) as f:
        return json.load(f)


def _commit(root: str, manifest: dict) -> None:
    """Last-write-atomic commit: temp file + os.replace (SURVEY.md §7 hard
    part 5)."""
    tmp = _manifest_path(root) + f".tmp-{os.getpid()}-{time.time_ns()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root))


def _leaf_units(snap_dir: str) -> list[str]:
    """Leaf partition directories (relative to table root) that directly
    contain parquet files; the snap dir itself for unpartitioned tables."""
    units = []
    for dirpath, _dirnames, filenames in os.walk(snap_dir):
        if any(f.endswith(".parquet") for f in filenames):
            units.append(dirpath)
    root = os.path.dirname(os.path.dirname(snap_dir))  # <root>/data/snap-N
    return sorted(os.path.relpath(u, root) for u in units)


def _partition_values(unit: str) -> dict[str, str]:
    """Parse ``col=value`` components out of a unit's relative path."""
    vals: dict[str, str] = {}
    for comp in unit.split(os.sep):
        if "=" in comp:
            k, _, v = comp.partition("=")
            vals[k] = v
    return vals


def _write_snapshot(df: DataFrame, root: str, snap_id: int,
                    partition_by: list[str]) -> list[str]:
    snap_dir = os.path.join(root, "data", f"snap-{snap_id}")
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snap_dir)
    return _leaf_units(snap_dir)


def _next_id(manifest: dict) -> int:
    ids = [s["id"] for s in manifest["snapshots"]]
    return (max(ids) + 1) if ids else 1


def append(df: DataFrame, root: str, partition_by: list[str] | None = None) -> int:
    """SNK1: append a snapshot; returns the new snapshot id."""
    m = _load(root)
    partition_by = partition_by or m["partition_by"]
    snap_id = _next_id(m)
    new_units = _write_snapshot(df, root, snap_id, partition_by)
    parent = m["current_snapshot"]
    prev = _units_at(m, parent)
    m["partition_by"] = partition_by
    m["snapshots"].append({
        "id": snap_id, "parent": parent, "operation": "append",
        "units": prev + new_units, "added": new_units,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    })
    m["current_snapshot"] = snap_id
    _commit(root, m)
    return snap_id


def overwrite_partitions(df: DataFrame, root: str,
                         partition_by: list[str] | None = None) -> int:
    """SNK2: dynamic-partition overwrite — partitions present in ``df``
    replace their previous units; untouched partitions survive. Idempotent
    re-runs of a stage therefore converge (checkpoint-resume, SURVEY.md §3.2)."""
    m = _load(root)
    partition_by = partition_by or m["partition_by"]
    snap_id = _next_id(m)
    new_units = _write_snapshot(df, root, snap_id, partition_by)
    replaced = {tuple(sorted(_partition_values(u).items())) for u in new_units}
    parent = m["current_snapshot"]
    kept = [u for u in _units_at(m, parent)
            if tuple(sorted(_partition_values(u).items())) not in replaced]
    m["partition_by"] = partition_by
    m["snapshots"].append({
        "id": snap_id, "parent": parent, "operation": "overwrite",
        "units": kept + new_units, "added": new_units,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    })
    m["current_snapshot"] = snap_id
    _commit(root, m)
    return snap_id


def _units_at(manifest: dict, snapshot: int | None) -> list[str]:
    if snapshot is None:
        return []
    for s in manifest["snapshots"]:
        if s["id"] == snapshot:
            return list(s["units"])
    raise ValueError(f"unknown snapshot {snapshot}")


def snapshots(root: str) -> list[dict]:
    return _load(root)["snapshots"]


def current_snapshot(root: str) -> int | None:
    return _load(root)["current_snapshot"]


def partitions(root: str, snapshot: int | None = None) -> list[dict[str, str]]:
    """Distinct partition-value dicts at a snapshot (manifest-side only)."""
    m = _load(root)
    snap = snapshot if snapshot is not None else m["current_snapshot"]
    seen, out = set(), []
    for u in _units_at(m, snap):
        pv = _partition_values(u)
        key = tuple(sorted(pv.items()))
        if key not in seen:
            seen.add(key)
            out.append(pv)
    return out


def read(spark: SparkSession, root: str, snapshot: int | None = None,
         where: dict[str, object] | None = None) -> DataFrame:
    """SRC2: scan at a snapshot with manifest-side partition pruning.

    ``where`` maps partition column → value (or list of values); matching is
    done against the ``col=value`` path components BEFORE any Spark plan is
    built, so pruned partitions are never even listed — the IcebergLite
    analogue of Iceberg manifest pruning (SURVEY.md §4.2). Returns an empty
    DataFrame with no schema knowledge if the table has no snapshot yet —
    callers use :func:`exists` / :func:`is_empty` first.
    """
    m = _load(root)
    snap = snapshot if snapshot is not None else m["current_snapshot"]
    units = _units_at(m, snap)
    if where:
        def keep(u: str) -> bool:
            pv = _partition_values(u)
            for k, v in where.items():
                if k in pv:
                    vals = v if isinstance(v, (list, tuple, set)) else [v]
                    if pv[k] not in {str(x) for x in vals}:
                        return False
            return True
        units = [u for u in units if keep(u)]
    if not units:
        raise ValueError(f"IcebergLite table {root} has no data"
                         f" (snapshot={snap}, where={where})")
    # group by owning snap dir so partition columns resolve via basePath
    by_snap: dict[str, list[str]] = {}
    for u in units:
        snap_dir = os.sep.join(u.split(os.sep)[:2])  # data/snap-N
        by_snap.setdefault(snap_dir, []).append(os.path.join(root, u))
    parts = [
        spark.read.option("basePath", os.path.join(root, snap_dir)).parquet(*paths)
        for snap_dir, paths in sorted(by_snap.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def drop_partitions(root: str, where: dict[str, object]) -> int:
    """Metadata-only partition delete (Iceberg ``DELETE WHERE`` on partition
    predicates): commits a snapshot whose unit list excludes matching
    partitions. Data files stay on disk (time travel still sees them)."""
    m = _load(root)
    parent = m["current_snapshot"]

    def match(u: str) -> bool:
        pv = _partition_values(u)
        for k, v in where.items():
            vals = v if isinstance(v, (list, tuple, set)) else [v]
            if k in pv and pv[k] in {str(x) for x in vals}:
                continue
            return False
        return True

    kept = [u for u in _units_at(m, parent) if not match(u)]
    snap_id = _next_id(m)
    m["snapshots"].append({
        "id": snap_id, "parent": parent, "operation": "delete",
        "units": kept, "added": [],
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    })
    m["current_snapshot"] = snap_id
    _commit(root, m)
    return snap_id


def exists(root: str) -> bool:
    return current_snapshot(root) is not None
