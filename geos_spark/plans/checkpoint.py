"""Snapshot-checkpointed, resumable pipeline runs with per-partition
lineage + metrics.

The reference has no engine-level resumability (single-address-space
library); the north rule requires batch resumability at 10^12-doc
scale. Design (SURVEY §2.10): a pipeline stage writes its output
partitioned by a *cell-range bucket*; a manifest records each
completed bucket with row count and wall time. A restarted run skips
completed buckets — per-partition lineage, not job-level retry. In
production the table format would be Iceberg (snapshot per bucket
commit); here the same contract is implemented over parquet
subdirectories + a JSON manifest (atomic rename per bucket).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST = "_lineage_manifest.json"


def _load_manifest(path: str) -> dict:
    p = os.path.join(path, MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"buckets": {}}


def _save_manifest(path: str, m: dict) -> None:
    p = os.path.join(path, MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, p)  # atomic snapshot commit


def run_checkpointed(
    df: DataFrame,
    out_path: str,
    bucket_col: str,
    n_buckets: int,
) -> dict:
    """Write df partitioned into n_buckets by hash(bucket_col),
    committing one bucket at a time with lineage. Resumable: completed
    buckets are skipped on re-run.

    Returns the final manifest (bucket -> {rows, seconds, path}).
    At 100 TB each bucket is one independent job over a cell range —
    partition pruning on the bucket predicate keeps restarts
    incremental.
    """
    os.makedirs(out_path, exist_ok=True)
    manifest = _load_manifest(out_path)
    bucket = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    staged = df.withColumn("__bucket", bucket)
    for b in range(n_buckets):
        key = str(b)
        if key in manifest["buckets"]:
            continue  # lineage says done — skip (resume path)
        t0 = time.perf_counter()
        part_path = os.path.join(out_path, f"bucket={b}")
        part = staged.where(F.col("__bucket") == b).drop("__bucket")
        part.write.mode("overwrite").parquet(part_path)
        rows = part.count()
        manifest["buckets"][key] = {
            "rows": rows,
            "seconds": round(time.perf_counter() - t0, 3),
            "path": part_path,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _save_manifest(out_path, manifest)
    return manifest


def read_checkpointed(spark, out_path: str) -> DataFrame:
    manifest = _load_manifest(out_path)
    paths = [v["path"] for v in manifest["buckets"].values()]
    return spark.read.parquet(*paths)


def lineage_metrics(out_path: str) -> dict:
    m = _load_manifest(out_path)
    total_rows = sum(v["rows"] for v in m["buckets"].values())
    total_sec = sum(v["seconds"] for v in m["buckets"].values())
    return {
        "buckets_done": len(m["buckets"]),
        "rows": total_rows,
        "seconds": total_sec,
        "rows_per_sec": round(total_rows / total_sec) if total_sec else None,
    }
