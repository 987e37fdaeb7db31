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
    per_bucket_jobs: bool = False,
) -> dict:
    """Write df partitioned into n_buckets by hash(bucket_col) with
    per-bucket lineage. Resumable: completed buckets are skipped on
    re-run.

    Default (single-pass): every MISSING bucket is written in ONE job
    via ``partitionBy`` + dynamic partition overwrite — the upstream
    pipeline is computed once per invocation, regardless of bucket
    count (at 100 TB, n_buckets upstream scans is the difference
    between one pass and an unrunnable job). The job commit is atomic,
    so a crash mid-job commits nothing and the next invocation redoes
    exactly the still-missing buckets; per-bucket row counts come from
    the written parquet footers (metadata-only read-back), and
    per-bucket seconds are the job wall amortized by row share.

    ``per_bucket_jobs=True`` restores one-job-per-bucket commits —
    lineage advances after every bucket, the right trade when
    preemption is likely and the source table is itself bucketed by
    ``bucket_col`` so each job's filter prunes at the scan.

    Returns the final manifest (bucket -> {rows, seconds, path}).
    """
    os.makedirs(out_path, exist_ok=True)
    manifest = _load_manifest(out_path)
    bucket = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    missing = [
        b for b in range(n_buckets) if str(b) not in manifest["buckets"]
    ]
    if not missing:
        return manifest
    stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    if not per_bucket_jobs:
        t0 = time.perf_counter()
        staged = df.withColumn("bucket", bucket)
        if len(missing) < n_buckets:
            staged = staged.where(F.col("bucket").isin(missing))
        (
            staged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(out_path)
        )
        job_sec = time.perf_counter() - t0
        spark = df.sparkSession
        counts = {}
        for b in missing:
            part_path = os.path.join(out_path, f"bucket={b}")
            if not os.path.exists(part_path):
                # empty bucket: partitionBy wrote no directory —
                # materialize an empty one so readers see the schema
                staged.where(F.lit(False)).drop("bucket").write.mode(
                    "overwrite"
                ).parquet(part_path)
                counts[b] = 0
                continue
            counts[b] = spark.read.parquet(part_path).count()
        total = sum(counts.values()) or 1
        for b in missing:
            manifest["buckets"][str(b)] = {
                "rows": counts[b],
                "seconds": round(job_sec * counts[b] / total, 3),
                "path": os.path.join(out_path, f"bucket={b}"),
                "committed_at": stamp,
            }
        _save_manifest(out_path, manifest)
        return manifest
    staged = df.withColumn("__bucket", bucket)
    for b in missing:
        t0 = time.perf_counter()
        part_path = os.path.join(out_path, f"bucket={b}")
        part = staged.where(F.col("__bucket") == b).drop("__bucket")
        part.write.mode("overwrite").parquet(part_path)
        # count from the written footers — metadata-only, instead of
        # recomputing the upstream a second time
        rows = df.sparkSession.read.parquet(part_path).count()
        manifest["buckets"][str(b)] = {
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
