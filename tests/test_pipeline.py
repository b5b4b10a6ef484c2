"""Spark pipeline tests: mapInPandas extraction, salting, lineage, and the
checkpoint/resume driver."""

import os

import pytest

from crrf_det_spark import synth
from crrf_det_spark.pipeline import (
    extract_transcripts,
    lineage,
    run_resumable_extraction,
    segments_view,
)
from crrf_det_spark.schema import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def transcripts_df(spark):
    rows, _ = synth.generate(n_convs=12, seed=42, skew_convs=1, skew_factor=10)
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).cache()


def test_extraction_matches_golden(spark, transcripts_df):
    rows, goldens = synth.generate(n_convs=12, seed=42, skew_convs=1, skew_factor=10)
    out = extract_transcripts(transcripts_df, order=True).collect()
    assert len(out) == len(rows)
    # stable ordering
    keys = [(r.conv_id, r.turn_idx) for r in out]
    assert keys == sorted(keys)
    # spot-check segment equality against golden
    gold = {}
    for g in goldens:
        gold.setdefault((g["conv_id"], g["turn_idx"]), []).append(g)
    for r in out[:200]:
        want = sorted(gold[(r.conv_id, r.turn_idx)], key=lambda g: g["cindex"])
        got = [(s.type, s.content) for s in r.segments]
        assert got == [(g["type"], g["content"]) for g in want]
        assert r.extracted_text == "\n".join(g["content"] for g in want)


def test_lineage_totals(spark, transcripts_df):
    ext = extract_transcripts(transcripts_df)
    lin = lineage(ext).collect()
    assert sum(r.n_rows for r in lin) == transcripts_df.count()
    assert all(r.stage == "extract" for r in lin)


def test_segments_view(spark, transcripts_df):
    ext = extract_transcripts(transcripts_df)
    seg = segments_view(ext)
    assert seg.columns == ["conv_id", "turn_idx", "cindex", "type", "content"]
    assert seg.count() > 0


def test_resume_skips_done_buckets(spark, transcripts_df, tmp_path):
    out = str(tmp_path / "extraction")
    first = run_resumable_extraction(spark, transcripts_df, out, n_buckets=8)
    assert sorted(first) == list(range(8))
    n_rows = spark.read.parquet(out).count()
    assert n_rows == transcripts_df.count()
    # second run: everything already done
    second = run_resumable_extraction(spark, transcripts_df, out, n_buckets=8)
    assert second == []
    # simulate a crash that lost one bucket (dir gone, manifest stale)
    import json
    import shutil

    victim = [d for d in os.listdir(out) if d.startswith("bucket=")][0]
    victim_id = int(victim.split("=")[1])
    shutil.rmtree(os.path.join(out, victim))
    manifest = os.path.join(out, "_crrf_done.json")
    done = [b for b in json.load(open(manifest)) if b != victim_id]
    json.dump(done, open(manifest, "w"))
    third = run_resumable_extraction(spark, transcripts_df, out, n_buckets=8)
    assert third == [victim_id]
    assert spark.read.parquet(out).count() == n_rows


def test_salting_bounds_partition_size(spark):
    # one giant conversation must not land in a single partition slice
    rows, _ = synth.generate(n_convs=1, seed=5, skew_convs=1, skew_factor=200)
    assert len(rows) > 1000
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    from crrf_det_spark.pipeline import salted

    import pyspark.sql.functions as F

    sizes = (
        salted(df, num_partitions=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(sizes) > 1, "salting failed: one conversation in one partition"
    assert max(r["count"] for r in sizes) < len(rows)


def test_payload_turns_pdf_and_html(spark):
    from crrf_det_spark.pdfmini import make_pdf
    from crrf_det_spark.pipeline import extract_payload_turns

    pdf = make_pdf([
        "Account      Q1      Q2",
        "Revenue      100     200",
        "",
        "Totals are preliminary and unaudited, pending further review.",
    ])
    html = (b"<!DOCTYPE html><html><body><nav><a href='/'>x</a></nav>"
            b"<article><p>real content paragraph</p></article>"
            b"<footer>f</footer></body></html>")
    rows = [("c1", 0, bytearray(pdf)), ("c1", 1, bytearray(html)),
            ("c2", 0, bytearray(b"plain text payload")),
            ("c2", 1, bytearray(b"\xff\xfe\x00broken")), ("c2", 2, None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, payload binary"
    )
    out = {
        (r.conv_id, r.turn_idx): r
        for r in extract_payload_turns(df, num_partitions=4).collect()
    }
    assert out[("c1", 0)].n_tables == 1
    assert "Revenue" in out[("c1", 0)].extracted_text
    assert out[("c1", 1)].extracted_text == "real content paragraph"
    assert out[("c2", 0)].extracted_text == "plain text payload"
    assert out[("c2", 1)].n_segments == 0
    assert out[("c2", 2)].n_segments == 0


def test_payload_turns_cid_cmap_xref_stream_pdf(spark):
    """Round-4 VERDICT #6 'done' criterion: a fixture PDF with a CMap'd
    Type0 font, object-stream-packed dicts, and a PNG-predictor xref
    stream roundtrips through extract_payload_turns with golden spans —
    the table rows come out exactly, which is only possible if the
    ToUnicode decode ran (codes are offset from their characters)."""
    from crrf_det_spark.pdfmini import make_pdf_cid
    from crrf_det_spark.pipeline import extract_payload_turns

    pdf = make_pdf_cid([
        "Account      Q1      Q2",
        "Revenue      100     200",
        "Cost         40      90",
        "",
        "Totals are preliminary and unaudited, pending further review.",
    ])
    df = spark.createDataFrame(
        [("c1", 0, bytearray(pdf))],
        "conv_id string, turn_idx int, payload binary",
    )
    row = extract_payload_turns(df, num_partitions=2).collect()[0]
    tables = [s for s in row.segments if s.type == "table"]
    assert len(tables) == 1
    assert tables[0].rows[0] == ["Account", "Q1", "Q2"]
    assert tables[0].rows[1] == ["Revenue", "100", "200"]
    assert "unaudited" in row.extracted_text


def test_payload_turns_differences_lzw_pdf(spark):
    """Round-5 VERDICT #4 'done' criterion: a fixture PDF with an
    LZWDecode content stream and a /Differences-encoded simple font
    roundtrips through extract_payload_turns with golden spans — digits
    ride control codes 0x01-0x0A on the wire, so the exact table values
    prove both decoders ran."""
    from crrf_det_spark.pdfmini import make_pdf_diff
    from crrf_det_spark.pipeline import extract_payload_turns

    pdf = make_pdf_diff([
        "Account      Q1      Q2",
        "Revenue      100     200",
        "Cost         40      90",
        "",
        "Totals are preliminary and unaudited, pending further review.",
    ])
    df = spark.createDataFrame(
        [("c1", 0, bytearray(pdf))],
        "conv_id string, turn_idx int, payload binary",
    )
    row = extract_payload_turns(df, num_partitions=2).collect()[0]
    tables = [s for s in row.segments if s.type == "table"]
    assert len(tables) == 1
    assert tables[0].rows[0] == ["Account", "Q1", "Q2"]
    assert tables[0].rows[1] == ["Revenue", "100", "200"]
    assert "unaudited" in row.extracted_text
    # parity pin: the Differences/LZW route must land byte-identical to
    # the same page through the CID/Flate route (same kernel inputs)
    from crrf_det_spark.pdfmini import (
        make_pdf_cid, make_pdf_diff, pdf_text_lines_geometry,
    )

    src = [
        "Account      Q1      Q2",
        "Revenue      100     200",
        "Cost         40      90",
        "",
        "Totals are preliminary and unaudited, pending further review.",
    ]
    assert (pdf_text_lines_geometry(make_pdf_diff(src))
            == pdf_text_lines_geometry(make_pdf_cid(src)))


def test_single_conversation_skew_is_salted_across_partitions(spark):
    """Worst-case conversation skew: ONE conv with 20k turns must spread
    across all partitions via the turn-slice salt (north rule: explicit
    skew handling; AQE cannot rebalance inside mapInPandas groups)."""
    from pyspark.sql import functions as F

    from crrf_det_spark.pipeline import extract_transcripts, lineage

    df = spark.range(20_000).select(
        F.lit("mega-conv").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.concat(
            F.lit("turn body text number "), F.col("id").cast("string")
        ).alias("text"),
    )
    lin = lineage(extract_transcripts(df, num_partitions=12)).collect()
    rows = [r.n_rows for r in lin if r.n_rows]
    assert len(rows) == 12              # every partition got work
    assert max(rows) / (sum(rows) / len(rows)) < 3.0


def test_observed_extraction_metrics(spark):
    from crrf_det_spark.pipeline import observed_extraction

    df = spark.createDataFrame(
        [("c1", 0, "hello world line"), ("c1", 1, "another turn body"),
         ("c2", 0, "third body of text")],
        "conv_id string, turn_idx int, text string",
    )
    out, obs = observed_extraction(df, num_partitions=4)
    rows = out.collect()
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_segments"] == sum(r.n_segments for r in rows)
    assert got["n_chars_out"] == sum(r.n_chars_out for r in rows)
    assert got["n_chars_in"] == sum(len(t) for _c, _i, t in [
        ("c1", 0, "hello world line"), ("c1", 1, "another turn body"),
        ("c2", 0, "third body of text")])


def test_ingest_stats_columns(spark):
    from crrf_det_spark.pipeline import ingest_transcripts

    df = spark.createDataFrame(
        [
            ("c1", 0, "alpha beta\ngamma delta epsilon\nzz"),
            ("c2", 0, "x" * 900),
            ("c3", 0, "one\ntwo\nthree\nfour\nfive\nsix\nseven"),
            ("c4", 0, ""),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {r.conv_id: r for r in ingest_transcripts(df).collect()}
    # preview truncation at 750 chars (the 750px preview analogue)
    assert got["c2"].preview == "x" * 750
    # thumbs capped at 5 (pages 1-5 analogue)
    assert got["c3"].n_thumbs == 5 and got["c3"].page_h == 7
    # page dims: widest line x line count
    assert (got["c1"].page_w, got["c1"].page_h) == (19, 3)
    # empty text: one empty line
    assert (got["c4"].page_w, got["c4"].page_h, got["c4"].n_thumbs) == (0, 1, 1)
    # document_stats columns present and sane
    assert got["c1"].n_tokens_ws == 6
    assert set(
        ["lang_id", "quality", "n_tokens_ws", "n_tokens_bpe", "fingerprint"]
    ) <= set(got["c1"].asDict())
    # ingest columns flow through extraction unchanged (same scan: the
    # derived columns don't block downstream extraction)
    from crrf_det_spark.pipeline import extract_transcripts

    assert extract_transcripts(ingest_transcripts(df)).count() == 4
