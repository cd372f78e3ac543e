"""WebDataset tar-shard interchange (the multimodal training
staple: github.com/webdataset/webdataset — plain POSIX tar archives
where one SAMPLE is a run of adjacent members sharing a basename
key: ``000123.jpg`` + ``000123.json`` + ``000123.txt``; training
loaders stream shards sequentially, so the shard file is the unit of
read parallelism, exactly like the gzip JSONL and WARC tiers).

Reader: ``binaryFile`` scan (one tar per task — tar has no random
index worth seeking; the whole-file read IS the access pattern) ->
python ``tarfile`` over the in-memory bytes inside mapInPandas ->
one row per sample ``(shard, key, parts array<struct<ext, data>>)``.
Member order inside a sample is preserved; samples are delimited by
the WebDataset contiguity rule (key change = new sample), so a key
reappearing later in the shard is a NEW sample, as the reference
loader treats it.

Writer: the write_warc shape — repartition by key hash + sort within
partitions (deterministic file set), ONE tar per task built in
memory, metadata pinned (mtime 0, uid/gid 0, no user/group names) so
reruns produce byte-identical shards, temp-write + os.replace so a
retried/speculated task overwrites atomically, stale ``part-*``
removal for overwrite semantics.

Scale notes: peak memory is one partition of payload bytes per task
(size partitions accordingly — the warc writer's rule); the sample
row carries opaque binary parts, decode stays in the multimodal
operators (decode_image handles the BMP/PNM payloads natively).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

#: reader/writer row schema for one sample
WDS_SCHEMA = "shard string, key string, parts array<struct<ext string, data binary>>"


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset name rule: key = path up to the FIRST dot of the
    basename (so ``a/b/000123.seg.png`` -> key ``a/b/000123``, ext
    ``seg.png`` — multi-dot extensions stay whole)."""
    d, _, base = name.rpartition("/")
    stem, _, ext = base.partition(".")
    key = f"{d}/{stem}" if d else stem
    return key, ext


def _iter_samples(blob: bytes, shard: str):
    """(shard, key, [(ext, data), ...]) per contiguous key run."""
    cur_key = None
    parts: list[dict] = []
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        for m in tf:
            if not m.isfile():
                continue
            key, ext = _split_key(m.name)
            data = tf.extractfile(m).read()
            if cur_key is not None and key != cur_key:
                yield (shard, cur_key, parts)
                parts = []
            cur_key = key
            parts.append({"ext": ext, "data": data})
    if cur_key is not None:
        yield (shard, cur_key, parts)


def _frame_tar_files(files: DataFrame) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(path)
                for r in _iter_samples(bytes(content), shard):
                    rows.append(r)
            if rows:
                yield pd.DataFrame(rows, columns=["shard", "key", "parts"])

    return files.select("path", "content").mapInPandas(gen, WDS_SCHEMA)


def wds_samples(spark: SparkSession, path: str) -> DataFrame:
    """Batch read: one row per sample across every matched shard."""
    return _frame_tar_files(spark.read.format("binaryFile").load(path))


def wds_samples_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming flavor (AvailableNow-friendly): new shard files are
    the micro-batch unit, the same framing per file."""
    return _frame_tar_files(
        spark.readStream.format("binaryFile")
        # binaryFile's fixed schema must be EXPLICIT on the stream
        # side (no inference scan for streaming sources)
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", 4)
        .load(path)
    )


def wds_part(df: DataFrame, ext: str, out_col: str | None = None) -> DataFrame:
    """Project one extension's bytes out of the parts array (NULL
    when the sample lacks it): the typed-column bridge to the text /
    multimodal operators."""
    out_col = out_col or ext.replace(".", "_")
    m = F.map_from_entries("parts")
    return df.withColumn(out_col, F.try_element_at(m, F.lit(ext)))


def write_wds(
    df: DataFrame,
    out_dir: str,
    key_col: str = "key",
    parts_col: str = "parts",
    num_files: int | None = None,
) -> DataFrame:
    """Distributed WebDataset sink: one ``part-*.tar`` per task,
    byte-deterministic (pinned tar metadata, sorted keys within a
    shard, content-derived names), atomically replaced. Returns the
    (path, n_samples, n_bytes) manifest — materialized, the write is
    the action."""
    spark = df.sparkSession
    out = df.select(F.col(key_col).alias("key"), F.col(parts_col).alias("parts"))
    n = num_files or spark.sparkContext.defaultParallelism
    out = out.repartition(n, "key").sortWithinPartitions("key")
    out = out.withColumn("_pid", F.spark_partition_id())
    os.makedirs(out_dir, exist_ok=True)
    import glob as _glob

    for stale in _glob.glob(os.path.join(out_dir, "part-*")):
        os.remove(stale)

    def gen(batches):
        samples: list[tuple[str, list]] = []
        pid = 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            for key, parts in zip(pdf["key"], pdf["parts"]):
                samples.append((key, list(parts)))
        if not samples:
            return
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for key, parts in samples:
                for p in parts:
                    data = bytes(p["data"]) if p["data"] is not None else b""
                    ti = tarfile.TarInfo(name=f"{key}.{p['ext']}")
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    tf.addfile(ti, io.BytesIO(data))
        blob = buf.getvalue()
        digest = hashlib.md5(samples[0][0].encode()).hexdigest()[:16]
        name = f"part-{pid:05d}-{digest}.tar"
        tmp = os.path.join(out_dir, f".tmp-{name}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame(
            {
                "path": [os.path.join(out_dir, name)],
                "n_samples": [len(samples)],
                "n_bytes": [len(blob)],
            }
        )

    manifest = out.mapInPandas(gen, "path string, n_samples long, n_bytes long")
    rows = manifest.collect()
    return spark.createDataFrame(rows, "path string, n_samples long, n_bytes long")
