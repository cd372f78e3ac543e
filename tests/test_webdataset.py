"""WebDataset tar-shard source/sink (sources/webdataset.py):
round-trip byte-exactness, contiguity sample grouping, deterministic
rerun bytes, typed-column projection, streaming parity, and the
multimodal decode composition."""

from __future__ import annotations

import glob
import hashlib
import io
import json
import tarfile

from pyspark.sql import functions as F

from ocr_compare_spark.sources import webdataset as wds


def _sample_rows(n=12):
    rows = []
    for i in range(n):
        key = f"{i:06d}"
        parts = [
            {"ext": "txt", "data": f"document {i} body text".encode()},
            {"ext": "json", "data": json.dumps({"id": i, "lang": "en"}).encode()},
            {"ext": "img.bin", "data": bytes([i % 251]) * (16 + i)},
        ]
        rows.append((key, parts))
    return rows


def test_wds_roundtrip_byte_exact_and_deterministic(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(
        _sample_rows(), "key string, parts array<struct<ext string, data binary>>"
    )
    m = wds.write_wds(df, out, num_files=3)
    assert m.count() >= 1
    assert sum(r.n_samples for r in m.collect()) == 12
    back = wds.wds_samples(spark, f"{out}/part-*.tar")
    got = {
        r.key: [(p.ext, bytes(p.data)) for p in r.parts] for r in back.collect()
    }
    want = {k: [(p["ext"], p["data"]) for p in parts] for k, parts in _sample_rows()}
    assert got == want  # byte-exact incl. member order within a sample
    # rerun produces byte-identical shard files
    h1 = {f.rsplit("/")[-1]: hashlib.md5(open(f, "rb").read()).hexdigest()
          for f in glob.glob(f"{out}/part-*.tar")}
    wds.write_wds(df, out, num_files=3)
    h2 = {f.rsplit("/")[-1]: hashlib.md5(open(f, "rb").read()).hexdigest()
          for f in glob.glob(f"{out}/part-*.tar")}
    assert h1 == h2


def test_wds_contiguity_and_key_rules(spark, tmp_path):
    # hand-built tar: directory-qualified keys, multi-dot exts, a key
    # reappearing later = a NEW sample (the webdataset loader rule)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("train/0001.txt", b"a"),
            ("train/0001.seg.png", b"b"),
            ("train/0002.txt", b"c"),
            ("train/0001.txt", b"d"),  # reappears -> separate sample
        ]:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    p = tmp_path / "manual.tar"
    p.write_bytes(buf.getvalue())
    rows = wds.wds_samples(spark, str(p)).collect()
    assert [(r.key, [(x.ext, bytes(x.data)) for x in r.parts]) for r in rows] == [
        ("train/0001", [("txt", b"a"), ("seg.png", b"b")]),
        ("train/0002", [("txt", b"c")]),
        ("train/0001", [("txt", b"d")]),
    ]
    assert all(r.shard == "manual.tar" for r in rows)


def test_wds_part_projection_and_text_composition(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(
        _sample_rows(), "key string, parts array<struct<ext string, data binary>>"
    )
    wds.write_wds(df, out, num_files=2)
    back = wds.wds_samples(spark, f"{out}/part-*.tar")
    texts = wds.wds_part(back, "txt").withColumn(
        "text", F.col("txt").cast("string")
    )
    got = {r.key: r.text for r in texts.collect()}
    assert got["000003"] == "document 3 body text"
    # absent extension -> NULL, never an error (try_element_at)
    assert all(r.missing is None for r in wds.wds_part(back, "npz", "missing").collect())
    # text feeds the text operators directly
    from ocr_compare_spark.operators.textstats import stats_columns

    tc = texts.select(stats_columns("text")["token_count"].alias("n")).collect()
    assert all(r.n == 4 for r in tc)


def test_wds_stream_equals_batch(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(
        _sample_rows(8), "key string, parts array<struct<ext string, data binary>>"
    )
    wds.write_wds(df, out, num_files=2)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        wds.wds_samples_stream(spark, f"{out}/part-*.tar")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    streamed = {
        r.key: [(p.ext, bytes(p.data)) for p in r.parts]
        for r in spark.read.parquet(sink).collect()
    }
    batch = {
        r.key: [(p.ext, bytes(p.data)) for p in r.parts]
        for r in wds.wds_samples(spark, f"{out}/part-*.tar").collect()
    }
    assert streamed == batch
