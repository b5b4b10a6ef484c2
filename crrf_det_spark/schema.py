"""Canonical schemas (SURVEY.md section 1.3).

Input:  transcripts table per BASELINE.json input_hint.
Output: per-turn extraction with a nested ``segments`` array, mirroring the
reference's page record (/root/reference/src/t-pdf:78-83) and segment dicts
(/root/reference/src/tpdf/aggr.py:122-126,145-149).
"""

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("cindex", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType())), True),
        T.StructField("box", T.ArrayType(T.IntegerType()), False),
    ]
)

EXTRACTION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("segments", T.ArrayType(SEGMENT_SCHEMA), False),
        # per-turn canonical extraction text (the equality invariant)
        T.StructField("extracted_text", T.StringType(), False),
        # lightweight per-row metrics (aggregated into the lineage table)
        T.StructField("n_segments", T.IntegerType(), False),
        T.StructField("n_tables", T.IntegerType(), False),
        T.StructField("n_chars_in", T.IntegerType(), False),
        T.StructField("n_chars_out", T.IntegerType(), False),
    ]
)

# exploded per-segment view used by the search layer (one row per segment,
# analogue of the search-index document {_id: 'page-cindex', text|table},
# /root/reference/src/search/index.js:37-48)
SEGMENT_ROW_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("cindex", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_segments", T.LongType(), False),
        T.StructField("n_bytes_in", T.LongType(), False),
        T.StructField("n_bytes_out", T.LongType(), False),
    ]
)
