"""WebDataset tar-shard export — the standard serving format for
large-scale (multimodal) training data.

A WebDataset is a directory of .tar shards; each sample is a group of
members sharing a basename with different extensions (000042.jpg +
000042.txt + 000042.json …). Trainers stream shards sequentially, so
the export must (a) keep every sample's members adjacent and ordered,
(b) bound shard size, and (c) be deterministic — re-exporting the same
frame must produce byte-identical shards (resumable uploads, content
addressing).

Plan shape: shard id = floor(id / shard_size) (a pure projection), one
`repartition(shard)` shuffle routes each shard's rows to a single
writer task, and an Arrow-batched `mapInPandas` writes each shard as
one tar (temp file + atomic rename; fixed USTAR metadata, zero mtime,
members sorted by (id, extension)). The returned DataFrame is the
manifest — (shard, n_samples, n_bytes, path) — produced by the same
pass, so `.collect()`ing it materializes the export and hands back
exactly what was written. At 100 TB the writer is embarrassingly
parallel: one task per shard, no driver involvement, no small-file
problem (shard_size controls tar granularity).
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard long, n_samples long, n_bytes long, path string"


def export_webdataset(
    df: DataFrame, out_dir: str, id_col: str,
    payloads: dict[str, str], shard_size: int = 1000,
) -> DataFrame:
    """Write `df` as WebDataset tar shards under `out_dir`.

    `payloads` maps member extension -> source column (binary or
    string), e.g. {"jpg": "image_bytes", "txt": "caption"}; every
    sample emits one member per extension, named
    f"{id:012d}.{ext}". Returns the manifest DataFrame (collect it to
    run the export). Ids should be reasonably dense for even shards —
    compose with `operators/sampling.py::deterministic_shuffle` first
    to assign dense positions (and get epoch shuffling for free).
    """
    import pandas as pd

    if shard_size <= 0:
        raise ValueError("shard_size must be positive")
    os.makedirs(out_dir, exist_ok=True)
    exts = sorted(payloads)
    # Shard id = floor(id / shard_size) in pure INTEGER arithmetic:
    # (id - pmod(id, n)) is exactly divisible, and `div` never routes
    # through a double — so negative ids floor (not truncate toward
    # zero) and ids beyond 2^53 keep full precision.
    sel = df.select(
        F.col(id_col).cast("long").alias("_id"),
        *[F.col(col).alias(f"_p_{ext}") for ext, col in payloads.items()],
    ).withColumn(
        "_shard",
        F.expr(f"(_id - pmod(_id, {shard_size})) div {shard_size}"),
    )

    def write(batches):
        # one partition may arrive as several Arrow batches; a shard is
        # whole within the partition (repartition key), so concat first
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True)
        for shard, grp in rows.groupby("_shard"):
            grp = grp.sort_values("_id")
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w",
                              format=tarfile.USTAR_FORMAT) as tar:
                for _, r in grp.iterrows():
                    for ext in exts:
                        v = r[f"_p_{ext}"]
                        data = v.encode("utf-8") if isinstance(v, str) \
                            else bytes(v)
                        info = tarfile.TarInfo(f"{int(r['_id']):012d}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # determinism: no wall clock
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tar.addfile(info, io.BytesIO(data))
            payload = buf.getvalue()
            path = os.path.join(out_dir, f"shard-{int(shard):06d}.tar")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)  # atomic: rerun/retry safe
            yield pd.DataFrame({
                "shard": [int(shard)],
                "n_samples": [len(grp)],
                "n_bytes": [len(payload)],
                "path": [path],
            })

    # repartition on the shard key: every shard's rows reach exactly one
    # writer task (tar members must be adjacent and ordered).
    return sel.repartition("_shard").mapInPandas(write, MANIFEST_SCHEMA)


def read_webdataset_manifest(spark, out_dir: str) -> DataFrame:
    """Re-derive the manifest from an exported directory (audits,
    resumption): one row per shard tar on disk."""
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard-") or not name.endswith(".tar"):
            continue
        path = os.path.join(out_dir, name)
        with tarfile.open(path) as tar:
            n = len(tar.getmembers())
        rows.append((int(name[6:-4]), n, os.path.getsize(path), path))
    return spark.createDataFrame(
        rows, "shard long, n_members long, n_bytes long, path string")


def read_webdataset(spark, out_dir: str) -> DataFrame:
    """Distributed WebDataset reader: one row per member —
    (id, ext, content) — via the binaryFile source (each task untars
    the shards it was assigned; shards stream independently, which is
    the whole point of the format). Reassemble samples with
    `groupBy(id).pivot(ext)` or a self-join on id."""
    import pandas as pd

    files = spark.read.format("binaryFile") \
        .load(os.path.join(out_dir, "shard-*.tar")) \
        .select("path", "content")

    def untar(batches):
        for pdf in batches:
            ids, exts, blobs = [], [], []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar.getmembers():
                        stem, _, ext = m.name.partition(".")
                        ids.append(int(stem))
                        exts.append(ext)
                        blobs.append(tar.extractfile(m).read())
            yield pd.DataFrame({"id": pd.array(ids, dtype="Int64"),
                                "ext": exts, "content": blobs})

    return files.mapInPandas(untar, "id long, ext string, content binary")
