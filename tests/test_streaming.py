"""Streaming extra + JSON interop + recursive corpus read tests."""

import os

from crrf_det_spark import synth
from crrf_det_spark.pipeline import (
    extract_transcripts,
    read_corpus,
    read_segments_json,
    write_segments_json,
)
from crrf_det_spark.schema import TRANSCRIPT_SCHEMA
from crrf_det_spark.streaming import start_extraction_stream


def _write_corpus(spark, path, n_convs=6, seed=5):
    rows, _ = synth.generate(n_convs=n_convs, seed=seed)
    spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(path)
    return len(rows)


def test_streaming_extraction(spark, tmp_path):
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n = _write_corpus(spark, in_path)
    q = start_extraction_stream(spark, in_path, out_path, ckpt)
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(out_path)
    assert out.count() == n
    # restart with no new data: exactly-once, no duplicates
    q2 = start_extraction_stream(spark, in_path, out_path, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out_path).count() == n


def test_json_interop(spark, tmp_path):
    in_path = str(tmp_path / "in")
    json_path = str(tmp_path / "segments_json")
    n = _write_corpus(spark, in_path)
    ext = extract_transcripts(spark.read.parquet(in_path), order=True)
    write_segments_json(ext, json_path)
    back = read_segments_json(spark, json_path)
    assert back.count() == n
    a = {(r.conv_id, r.turn_idx): r.extracted_text
         for r in ext.select("conv_id", "turn_idx", "extracted_text").collect()}
    b = {(r.conv_id, r.turn_idx): r.extracted_text
         for r in back.select("conv_id", "turn_idx", "extracted_text").collect()}
    assert a == b


def test_recursive_read(spark, tmp_path):
    # nested folder tree, one parquet dir per "user folder"
    rows, _ = synth.generate(n_convs=4, seed=9)
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    for sub in ("u1/a", "u1/b/c", "u2"):
        df.write.mode("overwrite").parquet(str(tmp_path / "corpus" / sub))
    all_rows = read_corpus(spark, str(tmp_path / "corpus"))
    assert all_rows.count() == 3 * len(rows)
    assert os.path.isdir(str(tmp_path / "corpus" / "u1/b/c"))
