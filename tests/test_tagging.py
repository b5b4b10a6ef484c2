"""Tagging-crop generation tests: global numbering, batch assignment,
8-block crop rounding, split-for-mobile sizes — checked against a direct
Python transcription of the reference arithmetic
(/root/reference/src/task/project.py:172-226)."""

import pytest
from pyspark.sql import functions as F

from crrf_det_spark.tagging import (
    global_entry_ids,
    tagging_entries,
    tagging_meta,
)


def ref_crop(box, scale):
    y0 = int(box[0] * scale / 8) * 8
    x0 = int(box[1] * scale / 8) * 8
    y1 = int(box[2] * scale / 8 + 1) * 8
    x1 = int(box[3] * scale / 8 + 1) * 8
    return y0, x0, y1, x1


def ref_split(crop_width, crop_height):
    crop_sizes = [[crop_width, crop_height]]
    margins = []
    if crop_width / crop_height >= 2:
        if crop_width >= 2000:
            unit_width = crop_width / 4
            margins = [
                [0, int(unit_width / 8 + 1) * 8],
                [int(unit_width / 8 - 1) * 8, int(2 * unit_width / 8 + 1) * 8],
                [int(2 * unit_width / 8 - 1) * 8, int(3 * unit_width / 8 + 1) * 8],
                [int(3 * unit_width / 8 - 1) * 8, crop_width],
            ]
        elif crop_width >= 1400:
            unit_width = crop_width / 3
            margins = [
                [0, int(unit_width / 8 + 1) * 8],
                [int(unit_width / 8 - 1) * 8, int(2 * unit_width / 8 + 1) * 8],
                [int(2 * unit_width / 8 - 1) * 8, crop_width],
            ]
        elif crop_width >= 800:
            unit_width = crop_width / 2
            margins = [
                [0, int(unit_width / 8 + 1) * 8],
                [int(unit_width / 8 - 1) * 8, crop_width],
            ]
        if margins:
            crop_sizes = []
        for ml, mr in margins:
            crop_sizes.append([mr - ml, crop_height])
    return crop_sizes


@pytest.fixture(scope="module")
def segments(spark):
    rows = []
    # widths spanning every split branch (incl. exact thresholds) and a
    # tall box that must not split despite being wide
    for i, (w, h) in enumerate(
        [
            (300, 40),
            (799, 40),
            (800, 40),
            (1399, 40),
            (1400, 40),
            (1999, 40),
            (2000, 40),
            (2600, 40),
            (900, 600),  # ratio < 2 -> no split
            (2500, 30),
        ]
    ):
        rows.append((f"c{i:02d}", i % 3, i, 10 + i, 5 + i, 10 + i + h, 5 + i + w))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, cindex int, "
        "box_y0 int, box_x0 int, box_y1 int, box_x1 int",
    )


class TestTagging:
    def test_crop_and_split_match_reference(self, segments, spark):
        out = {
            (r.conv_id): r
            for r in tagging_entries(
                segments, batch_size=4, target_scale=1.0, n_partitions=3
            ).collect()
        }
        for s in segments.collect():
            got = out[s.conv_id]
            y0, x0, y1, x1 = ref_crop(
                (s.box_y0, s.box_x0, s.box_y1, s.box_x1), 1.0
            )
            assert (got.crop_y0, got.crop_x0, got.crop_y1, got.crop_x1) == (
                y0, x0, y1, x1,
            ), s.conv_id
            want_sizes = ref_split(x1 - x0, y1 - y0)
            assert [list(p) for p in got.crop_sizes] == want_sizes, s.conv_id

    def test_crop_split_randomized_equivalence(self, spark):
        # 400 random geometries in one job vs the direct transcription of
        # the reference arithmetic (incl. threshold-straddling widths)
        import numpy as np

        rng = np.random.RandomState(99)
        ws = np.concatenate(
            [
                rng.randint(1, 3200, size=360),
                np.array([799, 800, 1399, 1400, 1999, 2000, 2047, 2048]),
                rng.randint(780, 820, size=32),
            ]
        )
        hs = rng.randint(1, 900, size=len(ws))
        rows = [
            (int(i), 0, int(0 + h), int(0 + w))
            for i, (w, h) in enumerate(zip(ws, hs))
        ]
        df = spark.createDataFrame(
            rows, "conv_id long, box_x0 int, box_y1 int, box_x1 int"
        ).withColumn("box_y0", F.lit(0)).withColumn("turn_idx", F.lit(0)) \
         .withColumn("cindex", F.lit(0))
        got = {
            r.conv_id: r
            for r in tagging_entries(df, batch_size=50, n_partitions=4).collect()
        }
        for i, (w, h) in enumerate(zip(ws, hs)):
            y0, x0, y1, x1 = ref_crop((0, 0, int(h), int(w)), 1.0)
            r = got[i]
            assert (r.crop_y0, r.crop_x0, r.crop_y1, r.crop_x1) == (
                y0, x0, y1, x1,
            ), (i, w, h)
            assert [list(p) for p in r.crop_sizes] == ref_split(
                x1 - x0, y1 - y0
            ), (i, w, h)

    def test_global_ids_dense_and_ordered(self, segments):
        got = (
            tagging_entries(segments, batch_size=4, n_partitions=3)
            .orderBy("conv_id", "turn_idx", "cindex")
            .collect()
        )
        assert [r.entry_id for r in got] == list(range(1, len(got) + 1))
        # reference batch dir: int(entry_count / batch_size) * batch_size
        assert [r.batch_index for r in got] == [
            (e // 4) * 4 for e in range(1, len(got) + 1)
        ]

    def test_global_ids_many_partitions(self, spark):
        df = spark.range(0, 997).select(
            F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
                "k"
            )
        )
        got = global_entry_ids(df, ["k"], n_partitions=13).orderBy("k").collect()
        assert [r.entry_id for r in got] == list(range(1, 998))
        # checkpoint=True (production durability mode) assigns identically
        ck = (
            global_entry_ids(df, ["k"], n_partitions=13, checkpoint=True)
            .orderBy("k")
            .collect()
        )
        assert [r.entry_id for r in ck] == list(range(1, 998))

    def test_meta(self, segments):
        e = tagging_entries(segments, batch_size=4)
        m = tagging_meta(e, batch_size=4).collect()[0]
        assert m["count"] == segments.count() and m.batch_size == 4

    def test_write_batches_layout(self, segments, tmp_path):
        from crrf_det_spark.tagging import write_tagging_batches

        e = tagging_entries(segments, batch_size=4)
        out = str(tmp_path / "tagging")
        write_tagging_batches(e, out)
        import os

        dirs = sorted(
            d for d in os.listdir(out) if d.startswith("batch_index=")
        )
        assert dirs == ["batch_index=0", "batch_index=4", "batch_index=8"]

    def test_release_drops_all_caches(self, spark, segments):
        # checked via the registered handles' storage level, not a global
        # persistent-RDD count: Spark's ContextCleaner asynchronously
        # unpersists out-of-scope RDDs from earlier tests, making global
        # before/after counts flaky
        from crrf_det_spark.caching import release

        e = tagging_entries(segments, batch_size=4)
        e.count()
        cached = list(getattr(e, "_crrf_cached", []))
        assert cached, "tagging must register its internal persist"

        def held(df):
            lv = df.storageLevel
            return lv.useMemory or lv.useDisk

        assert any(held(c) for c in cached)
        release(e)
        assert not any(held(c) for c in cached)

    def test_pack_archive(self, segments, tmp_path):
        import zipfile

        from crrf_det_spark.tagging import (
            pack_tagging_archive,
            write_tagging_batches,
        )

        out = str(tmp_path / "tagging2")
        write_tagging_batches(tagging_entries(segments, batch_size=4), out)
        archive = str(tmp_path / "tagging.zip")
        n = pack_tagging_archive(out, archive)
        assert n >= 3
        with zipfile.ZipFile(archive) as z:
            names = z.namelist()
        assert all(name.startswith("batch_index=") for name in names)
        assert {name.split("/")[0] for name in names} == {
            "batch_index=0", "batch_index=4", "batch_index=8",
        }
