"""Small-file compaction — the lake-maintenance op every long-running
ingest needs: streaming/checkpointed writers leave thousands of small
parquet files per table, and at 100 TB the scan-planning overhead (one
footer read + task per file) dominates queries long before data size does.

`compact_parquet` rewrites ONLY the small files: files already at/above
the target size are copied through byte-identical (at scale: a rename/
hardlink — no decode, no shuffle), the small remainder is read as one
dataset and rewritten into ~target-size files. The rewrite cost is
proportional to the SMALL bytes, not the table — the property that makes
nightly compaction affordable on a petabyte table.

Driver-side work is control-plane only (listing file sizes); the data
path is one spark.read over the small-file list + one repartition write.
"""

from __future__ import annotations

import math
import os
import shutil


def compact_parquet(
    spark,
    input_dir: str,
    output_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact `input_dir`'s parquet files into `output_dir`. Returns
    stats: files in/out, bytes rewritten vs passed through."""
    files = sorted(
        f
        for f in os.listdir(input_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    sizes = {f: os.path.getsize(os.path.join(input_dir, f)) for f in files}
    big = [f for f in files if sizes[f] >= target_bytes]
    small = [f for f in files if sizes[f] < target_bytes]

    os.makedirs(output_dir, exist_ok=True)
    for f in big:
        shutil.copyfile(
            os.path.join(input_dir, f), os.path.join(output_dir, f)
        )

    n_moved = 0
    small_bytes = sum(sizes[f] for f in small)
    if small:
        n_out = max(1, math.ceil(small_bytes / target_bytes))
        df = spark.read.parquet(*[os.path.join(input_dir, f) for f in small])
        # repartition (round-robin) balances rows across the output files;
        # compacted files land next to the passed-through ones with the
        # standard part-* naming, so the dir stays one readable dataset
        tmp = output_dir.rstrip("/") + "._compact_tmp"
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
        # count the part files actually moved, not the n_out estimate —
        # empty partitions (row count < n_out) write fewer files
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(
                    os.path.join(tmp, f), os.path.join(output_dir, "compact-" + f)
                )
                n_moved += 1
        shutil.rmtree(tmp)

    return {
        "files_in": len(files),
        "files_kept": len(big),
        "files_rewritten": len(small),
        "files_out": len(big) + n_moved,
        "bytes_passed_through": sum(sizes[f] for f in big),
        "bytes_rewritten": small_bytes,
    }
