"""M3/M4: checkpoint-resume (exactly-once per bucket), raster↔vector
round trip, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elevation_service_spark import fixtures, kernels
from elevation_service_spark.operators.lookup import enrich_points
from elevation_service_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                          decode_image,
                                                          fake_image_payload,
                                                          frame_sample_plan,
                                                          image_features,
                                                          resize_images)
from elevation_service_spark.operators.raster import (points_to_tiles,
                                                      tiles_to_points)
from elevation_service_spark.sources.manifest import (PartitionManifest,
                                                      run_resumable)
from elevation_service_spark.sources.tiles import fixture_tiles_df


# --- checkpoint / resume -----------------------------------------------------

def test_resumable_exactly_once(spark, tmp_path):
    out_path = str(tmp_path / "out")
    man_path = str(tmp_path / "manifest")
    pts = spark.range(0, 2000).select(
        F.col("id").alias("pid"),
        (F.lit(57.0) + (F.col("id") % 960 + 20) / 1000.0).alias("lat"),
        (F.lit(11.0) + (F.col("id") % 960 + 20) / 1000.0).alias("lon"))
    tiles = fixture_tiles_df(spark)

    def job(pending):
        return enrich_points(pending, tiles, strategy="broadcast")

    # first run: process only buckets 0..7 (simulated crash: restrict input)
    r1 = run_resumable(job, pts.filter(F.pmod(F.hash("pid"), F.lit(16)) < 8),
                       out_path, man_path, key_cols=["pid"], n_buckets=16)
    assert 0 < len(r1["processed"]) <= 8
    n_after_crash = spark.read.parquet(out_path).count()

    # resume with the FULL input: completed buckets must be skipped
    r2 = run_resumable(job, pts, out_path, man_path, key_cols=["pid"], n_buckets=16)
    assert set(r2["skipped"]) == set(r1["processed"])
    assert not (set(r2["processed"]) & set(r1["processed"]))

    final = spark.read.parquet(out_path)
    assert final.count() == 2000
    assert final.select("pid").distinct().count() == 2000  # no duplicates
    assert final.filter(F.col("status") != "OK").count() == 0
    # lineage metrics recorded for every bucket
    man = PartitionManifest(man_path).completed()
    assert set(man) == set(r1["processed"]) | set(r2["processed"])
    assert sum(e["rows"] for e in man.values()) == 2000
    assert all(e["rows_ok"] == e["rows"] for e in man.values())

    # third run: nothing pending
    r3 = run_resumable(job, pts, out_path, man_path, key_cols=["pid"], n_buckets=16)
    assert r3["processed"] == []
    assert n_after_crash < 2000  # the crash simulation actually did less


# --- raster <-> vector --------------------------------------------------------

def test_tiles_to_points_and_back_roundtrip(spark):
    tiles = fixture_tiles_df(spark).filter(F.col("tile_key") == "N57E011")
    pts = tiles_to_points(tiles, stride=8)
    rows = pts.limit(5).collect()
    grid = fixtures.tile_grid(57, 11, 1201)
    for r in rows:
        rr = round((r["lat"] - 57) * 1200)
        cc = round((r["lon"] - 11) * 1200)
        assert r["elev"] == float(grid[rr, cc])
    n = pts.count()
    assert n == ((1200 // 8) + 1) ** 2

    # full-resolution round trip: rasterize the exploded nodes back.
    # the grid spans the CLOSED 1-degree interval, so the north/east edge
    # nodes floor-route to the neighbor tiles (reference keying semantics);
    # exclude them and expect exactly the interior back.
    full = tiles_to_points(tiles, stride=1).filter(
        (F.col("lat") < 58.0) & (F.col("lon") < 12.0))
    rebuilt = points_to_tiles(full, size=1201).collect()
    assert len(rebuilt) == 1 and rebuilt[0]["tile_key"] == "N57E011"
    back = kernels.decode_terrarium_png(bytes(rebuilt[0]["data"]))
    np.testing.assert_array_equal(back[:1200, :1200], grid[:1200, :1200].astype(np.float64))
    assert (back[1200, :] == kernels.VOID).all()
    assert (back[:, 1200] == kernels.VOID).all()


def test_points_to_tiles_voids_and_collisions(spark):
    pts = spark.createDataFrame(
        [(57.0, 11.0, 100.0), (57.0, 11.0, 200.0),   # collision -> mean 150
         (57.5, 11.5, 42.0)],
        ["lat", "lon", "elev"])
    out = points_to_tiles(pts, size=1201).collect()
    grid = kernels.decode_terrarium_png(bytes(out[0]["data"]))
    assert grid[0, 0] == 150.0
    assert grid[600, 600] == 42.0
    assert grid[5, 5] == kernels.VOID


# --- multimodal plumbing ---------------------------------------------------------

def _media_df(spark):
    rows = [(i, "image", "image/fake", 32, 16, None,
             bytearray(fake_image_payload(i))) for i in range(6)]
    rows.append((100, "video", "video/fake", None, None, 3500, bytearray(b"vid")))
    rows.append((101, "audio", "audio/fake", None, None, 2000, bytearray(b"aud")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", 4, 4)


def test_image_features_deterministic(spark):
    df = _media_df(spark)
    got = {r["media_id"]: r for r in image_features(df, fake_decode=True).collect()}
    assert set(got) == set(range(6))
    for mid, r in got.items():
        img = decode_image(fake_image_payload(mid), 32, 16, fake=True)
        means = img.reshape(-1, 3).mean(axis=0)
        assert r["mean_r"] == float(means[0])
        assert r["brightness_milli"] == int(means.mean() * 1000)


def test_resize_shape_and_bytes(spark):
    got = resize_images(_media_df(spark), 8, 4, fake_decode=True).collect()
    assert len(got) == 6
    for r in got:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(bytes(r["pixels"])) == 8 * 4 * 3


def test_frame_sample_plan(spark):
    got = frame_sample_plan(_media_df(spark), every_ms=1000).collect()
    assert sorted((r["frame_idx"], r["ts_ms"]) for r in got) == \
        [(0, 0), (1, 1000), (2, 2000), (3, 3000)]


# --- binaryFile tile-directory source (FileTileSet parity) --------------------

def test_read_hgt_dir(spark, tmp_path):
    from elevation_service_spark.sources.tiles import read_hgt_dir
    import gzip as _gzip
    d = tmp_path / "tiles" / "N57"
    d.mkdir(parents=True)
    grid = fixtures.tile_grid(57, 11, 1201)
    (d / "N57E011.hgt").write_bytes(kernels.encode_hgt(grid))
    grid2 = fixtures.tile_grid(-34, -71, 1201)
    (tmp_path / "tiles" / "S34W071.hgt.gz").write_bytes(
        _gzip.compress(kernels.encode_hgt(grid2)))
    (tmp_path / "tiles" / "README.txt").write_text("ignore me")
    tiles = read_hgt_dir(spark, str(tmp_path / "tiles"))
    rows = {r["tile_key"]: r for r in tiles.collect()}
    assert set(rows) == {"N57E011", "S34W071"}
    assert (rows["N57E011"]["sw_lat"], rows["N57E011"]["sw_lon"]) == (57, 11)
    assert (rows["S34W071"]["sw_lat"], rows["S34W071"]["sw_lon"]) == (-34, -71)
    assert rows["S34W071"]["encoding"] == "hgt.gz"
    # and it plugs straight into the core operator
    pts = spark.createDataFrame([(0, 57.5, 11.5), (1, -33.5, -70.5)],
                                ["pid", "lat", "lon"])
    out = {r["pid"]: r for r in enrich_points(pts, tiles, strategy="broadcast").collect()}
    from helpers import ref_bilinear
    assert out[0]["elevation"] == ref_bilinear(grid, 57.5, 11.5, 57, 11)
    assert out[1]["elevation"] == ref_bilinear(grid2, -33.5, -70.5, -34, -71)


def test_write_enriched_range_partitioned(spark, tmp_path):
    from elevation_service_spark.sources.tiles import (iceberg_available,
                                                       read_enriched,
                                                       write_enriched)
    assert iceberg_available(spark) is False  # sandbox: documented downgrade
    pts = spark.createDataFrame(
        [(i, 57.0 + (i % 900) / 1000.0, 11.0 + (i % 900) / 1000.0) for i in range(500)]
        + [(999, 10.5, 10.5)], ["pid", "lat", "lon"])
    out = enrich_points(pts, fixture_tiles_df(spark), strategy="broadcast")
    # the sink plan must contain an explicit range partitioning on tile_key
    plan = (out.repartitionByRange(8, F.col("tile_key"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "rangepartitioning(tile_key" in plan.lower(), plan
    path = str(tmp_path / "enriched")
    write_enriched(out, path, n_range_partitions=8)
    back = read_enriched(spark, path)
    assert back.count() == 501
    assert back.filter(F.col("status") == "TILE_MISSING").count() == 1
    import os
    assert any(d.startswith("status=") for d in os.listdir(path))


def test_audio_features_stub_plumbing(spark):
    from elevation_service_spark.operators.multimodal import (audio_features,
                                                              decode_audio)
    with pytest.raises(NotImplementedError):
        decode_audio(b"x", 100)
    got = audio_features(_media_df(spark), fake_decode=True).collect()
    assert len(got) == 1
    r = got[0]
    assert r["media_id"] == 101 and r["n_samples"] == 32000
    wav = decode_audio(b"aud", 2000, fake=True)
    import numpy as _np
    wav64 = wav.astype(_np.float64)  # operator stats run in float64
    assert r["rms_milli"] == int(float(_np.sqrt(_np.mean(wav64 ** 2))) * 1000)


def test_compact_parquet_small_files(spark, tmp_path):
    """Compaction collapses a many-tiny-files dataset into the byte-target
    file count while preserving every row."""
    from elevation_service_spark.sources.tiles import compact_parquet
    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 3)
    df.repartition(64).write.parquet(src)  # 64 tiny files
    stats = compact_parquet(spark, src, out, target_file_bytes=1 << 30)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1
    assert stats["rows"] == 10_000
    back = spark.read.parquet(out)
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # sorted variant: range-partitioned on the sort col
    out2 = str(tmp_path / "compact_sorted")
    stats2 = compact_parquet(spark, src, out2, target_file_bytes=1, sort_col="id")
    assert stats2["rows"] == 10_000 and stats2["files_after"] >= 2


def test_resumable_group_crash_loses_only_inflight_group(spark, tmp_path):
    """VERDICT r2 #5: with group_size set, a crash mid-run keeps every
    already-marked group; the resume processes only the unmarked buckets."""
    out_path = str(tmp_path / "out")
    man_path = str(tmp_path / "manifest")
    pts = spark.range(0, 2000).select(
        F.col("id").alias("pid"),
        (F.lit(57.0) + (F.col("id") % 960 + 20) / 1000.0).alias("lat"),
        (F.lit(11.0) + (F.col("id") % 960 + 20) / 1000.0).alias("lon"))
    tiles = fixture_tiles_df(spark)

    calls = {"n": 0}

    def crashing_job(pending):
        calls["n"] += 1
        # call 1 is the schema probe (limit 0); crash while building the
        # THIRD group's transform -> groups 1-2 are written AND marked
        if calls["n"] == 4:
            raise RuntimeError("simulated executor-fleet loss")
        return enrich_points(pending, tiles, strategy="broadcast")

    with pytest.raises(RuntimeError, match="simulated"):
        run_resumable(crashing_job, pts, out_path, man_path,
                      key_cols=["pid"], n_buckets=16, group_size=4)
    marked = set(PartitionManifest(man_path).completed())
    assert len(marked) == 8  # two complete groups of 4, nothing in-flight

    def job(pending):
        return enrich_points(pending, tiles, strategy="broadcast")

    r2 = run_resumable(job, pts, out_path, man_path,
                       key_cols=["pid"], n_buckets=16, group_size=4)
    assert set(r2["skipped"]) == marked
    assert set(r2["processed"]) == set(range(16)) - marked

    final = spark.read.parquet(out_path)
    assert final.count() == 2000
    assert final.select("pid").distinct().count() == 2000
    man = PartitionManifest(man_path).completed()
    assert sum(e["rows"] for e in man.values()) == 2000


def test_tile_slope_stats_semantics_and_plan(spark):
    """r5 raster derivative: slope stats against a handcrafted mini-grid
    computed by hand — ramp gradients, one void whose 5-point stencil
    excludes exactly 5 interior nodes — and the plan is map-only."""
    import numpy as np

    from elevation_service_spark import fixtures, kernels
    from elevation_service_spark.operators.raster import tile_slope_stats

    size = 8
    # z[r, c] = 3r + 5c  ->  dx = 10, dy = 6 everywhere, slope2 = 136
    grid = (3 * np.arange(size)[:, None]
            + 5 * np.arange(size)[None, :]).astype(np.int16)
    grid[3, 3] = kernels.VOID
    tiles = spark.createDataFrame(
        [("T", 0, 0, "terrarium-png",
          bytearray(kernels.encode_terrarium_png(grid)))],
        "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
    row = tile_slope_stats(tiles).collect()[0]
    n_int = (size - 2) ** 2
    assert row["n_interior"] == n_int
    # stencil touches (3,3): the 5 nodes (3,2)(3,3)(3,4)(2,3)(4,3) — all interior
    assert row["n_void_adj"] == 5
    assert row["n_valid"] == n_int - 5
    assert row["max_slope2"] == 136
    assert row["sum_slope2"] == 136 * (n_int - 5)
    assert row["n_steep"] == 0
    plan = tile_slope_stats(tiles)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # all-void tile: zero valid interior nodes -> null max, zero sums
    allv = np.full((size, size), kernels.VOID, dtype=np.int16)
    tiles2 = spark.createDataFrame(
        [("V", 0, 0, "terrarium-png",
          bytearray(kernels.encode_terrarium_png(allv)))],
        "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
    r2 = tile_slope_stats(tiles2).collect()[0]
    assert r2["n_valid"] == 0 and r2["max_slope2"] is None
    assert r2["sum_slope2"] == 0 and r2["n_steep"] == 0
    # the real fixture tile matches a direct numpy recomputation
    g = fixtures.tile_grid(57, 11, 1201).astype(np.int64)
    void = g == kernels.VOID
    sv = (void[1:-1, 1:-1] | void[1:-1, 2:] | void[1:-1, :-2]
          | void[2:, 1:-1] | void[:-2, 1:-1])
    dx = g[1:-1, 2:] - g[1:-1, :-2]
    dy = g[2:, 1:-1] - g[:-2, 1:-1]
    s2 = (dx * dx + dy * dy)[~sv]
    from elevation_service_spark.sources.tiles import fixture_tiles_df
    rows = {r["tile_key"]: r for r in tile_slope_stats(
        fixture_tiles_df(spark)).collect()}
    r = rows["N57E011"]
    assert (r["max_slope2"], r["sum_slope2"]) == (int(s2.max()), int(s2.sum()))
    assert r["n_void_adj"] == int(sv.sum())


def test_decode_image_real_png_path(spark):
    """r5: PNG payloads decode through the in-repo codec with fake=False;
    the decode→feature pipeline over real PNG bytes produces exactly the
    fake-decoder features (same pixel law, genuine bytes)."""
    import numpy as np

    from elevation_service_spark import kernels
    from elevation_service_spark.operators import multimodal

    img = multimodal.decode_image(
        multimodal.fake_image_payload(7), 20, 13, fake=True)
    png = kernels.encode_png_rgb(img)
    # real path: no fake flag, bytes round-trip exactly
    got = multimodal.decode_image(png, 20, 13, fake=False)
    assert np.array_equal(got, img)
    # non-PNG without fake still refuses loudly
    import pytest
    with pytest.raises(NotImplementedError, match="non-PNG"):
        multimodal.decode_image(b"\xff\xd8\xff\xe0jpegish", 4, 4, fake=False)
    # end-to-end: image_features over real PNG rows == over fake payloads
    rows = [(i, "image", "image/png", 16 + i % 7, 12 + i % 5, None,
             bytearray(kernels.encode_png_rgb(multimodal.decode_image(
                 multimodal.fake_image_payload(i), 16 + i % 7, 12 + i % 5,
                 fake=True)))) for i in range(12)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    fake_rows = [(i, "image", "image/fake", 16 + i % 7, 12 + i % 5, None,
                  bytearray(multimodal.fake_image_payload(i)))
                 for i in range(12)]
    fake_media = spark.createDataFrame(fake_rows, multimodal.MEDIA_SCHEMA)
    real = {r["media_id"]: tuple(r) for r in
            multimodal.image_features(media, fake_decode=False).collect()}
    fake = {r["media_id"]: tuple(r) for r in
            multimodal.image_features(fake_media, fake_decode=True).collect()}
    assert real == fake and len(real) == 12


def test_tile_aspect_hist_semantics(spark):
    """r5: 8-way aspect sectors on a handcrafted grid — pure E ramp, pure
    N ramp, exact diagonal, flat, and the void exclusion; sector counts
    sum to n_valid."""
    import numpy as np

    from elevation_service_spark import kernels
    from elevation_service_spark.operators.raster import (_ASPECT_FIELDS,
                                                          tile_aspect_hist,
                                                          tile_slope_stats)

    size = 8

    def run(grid):
        tiles = spark.createDataFrame(
            [("T", 0, 0, "terrarium-png",
              bytearray(kernels.encode_terrarium_png(grid.astype(np.int16))))],
            "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
        return tile_aspect_hist(tiles).collect()[0], tiles

    n_int = (size - 2) ** 2
    # pure E ramp: z = 5c -> dx=10, dy=0 -> all E
    r, _ = run(5 * np.arange(size)[None, :] * np.ones((size, 1)))
    assert r["h_e"] == n_int and r["n_flat"] == 0
    # pure N ramp: z = 5r -> dy=10 -> all N
    r, _ = run(5 * np.arange(size)[:, None] * np.ones((1, size)))
    assert r["h_n"] == n_int
    # exact diagonal z = 3r + 3c -> |dx|=|dy|=6, both positive -> all NE
    r, _ = run(3 * np.arange(size)[:, None] + 3 * np.arange(size)[None, :]
               + np.zeros((size, size)))
    assert r["h_ne"] == n_int
    # flat grid -> all flat
    r, _ = run(np.full((size, size), 7.0))
    assert r["n_flat"] == n_int
    # void exclusion consistent with slope stats on the fixture tile
    from elevation_service_spark.sources.tiles import fixture_tiles_df
    arows = {x["tile_key"]: x for x in
             tile_aspect_hist(fixture_tiles_df(spark)).collect()}
    srows = {x["tile_key"]: x for x in
             tile_slope_stats(fixture_tiles_df(spark)).collect()}
    for k in arows:
        total = sum(arows[k][f] for f in _ASPECT_FIELDS)
        assert total == srows[k]["n_valid"], k


def test_tile_tri_stats_semantics(spark):
    """r6 Terrain Ruggedness Index: hand-computed TRI on a linear ramp
    (every 8-neighbour |dz| is |3dr + 5dc|), the stricter 3x3 void
    exclusion (9 centres vs the slope stencil's 5), and a direct numpy
    recomputation on a fixture tile — all from the ONE fused decode."""
    import numpy as np

    from elevation_service_spark import fixtures, kernels
    from elevation_service_spark.operators.raster import (tile_terrain_stats,
                                                          tile_tri_stats)

    size = 8
    # z = 3r + 5c -> per-node TRI = 3+3+5+5+8+8+2+2 = 36
    grid = (3 * np.arange(size)[:, None]
            + 5 * np.arange(size)[None, :]).astype(np.int16)
    grid[3, 3] = kernels.VOID
    tiles = spark.createDataFrame(
        [("T", 0, 0, "terrarium-png",
          bytearray(kernels.encode_terrarium_png(grid)))],
        "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
    row = tile_tri_stats(tiles).collect()[0]
    n_int = (size - 2) ** 2
    # 3x3 exclusion: all 9 centres around the void are interior here
    assert row["n_void_adj8"] == 9 and row["n_valid8"] == n_int - 9
    # slope fields ride along in the same pass, 5-point exclusion intact
    assert row["n_void_adj"] == 5 and row["n_valid"] == n_int - 5
    assert row["max_tri"] == 36
    assert row["sum_tri"] == 36 * (n_int - 9)
    assert row["n_rough"] == 0
    plan = tile_tri_stats(tiles)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # fixture tile: direct numpy recomputation of the 8-neighbour sums
    g = fixtures.tile_grid(57, 11, 1201).astype(np.int64)
    void = g == kernels.VOID
    v8 = np.zeros((1199, 1199), dtype=bool)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            v8 |= void[dr:dr + 1199, dc:dc + 1199]
    zc = g[1:-1, 1:-1]
    tri = np.zeros_like(zc)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            if (dr, dc) != (1, 1):
                tri += np.abs(g[dr:dr + 1199, dc:dc + 1199] - zc)
    tri = tri[~v8]
    from elevation_service_spark.sources.tiles import fixture_tiles_df
    full = {r["tile_key"]: r for r in tile_terrain_stats(
        fixture_tiles_df(spark), tri=True).collect()}
    r = full["N57E011"]
    assert (r["sum_tri"], r["max_tri"]) == (int(tri.sum()), int(tri.max()))
    assert r["n_void_adj8"] == int(v8.sum())
    # full fused schema carries all three families at once
    assert "h_ne" in r.asDict() and "sum_slope2" in r.asDict()


def test_tile_flowdir_stats_semantics(spark):
    """r6 D8 flow direction: hand-computed steepest descent on a linear
    ramp, the clockwise-from-East tie rule on a pure-E ramp (SW beats W
    and NW at equal unweighted drop), pits on a flat grid, the 3x3 void
    exclusion shared with TRI, and a direct numpy recomputation on a
    fixture tile — all from the ONE fused decode."""
    import numpy as np

    from elevation_service_spark import fixtures, kernels
    from elevation_service_spark.operators.raster import (_FLOW_DIRS,
                                                          tile_flowdir_stats)

    size = 8
    n_int = (size - 2) ** 2

    def run(grid):
        tiles = spark.createDataFrame(
            [("T", 0, 0, "terrarium-png",
              bytearray(kernels.encode_terrarium_png(
                  grid.astype(np.int16))))],
            "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
        return tile_flowdir_stats(tiles).collect()[0]

    # z = 3r + 5c -> unique steepest drop 8 toward (dr,dc)=(-1,-1) = SW
    r = run(3 * np.arange(size)[:, None] + 5 * np.arange(size)[None, :]
            + np.zeros((size, size)))
    assert r["f_sw"] == n_int and r["n_pit"] == 0
    # pure E ramp z = 5c: drop 5 ties across SW/W/NW; clockwise-from-East
    # priority (E,SE,S,SW,W,NW,N,NE) picks SW first
    r = run(5 * np.arange(size)[None, :] * np.ones((size, 1)))
    assert r["f_sw"] == n_int and r["f_w"] == 0 and r["f_nw"] == 0
    # flat grid -> every interior node is a pit
    r = run(np.full((size, size), 7.0))
    assert r["n_pit"] == n_int and sum(r[n] for n, _, _ in _FLOW_DIRS) == 0
    # void: 3x3 exclusion, remaining counts partition n_valid8
    grid = (3 * np.arange(size)[:, None] + 5 * np.arange(size)[None, :]
            + np.zeros((size, size))).astype(np.int16)
    grid[3, 3] = kernels.VOID
    r = run(grid)
    assert (r["n_pit"] + sum(r[n] for n, _, _ in _FLOW_DIRS)
            == n_int - 9)
    # slope fields ride along in the same pass
    assert r["n_void_adj"] == 5 and r["n_valid"] == n_int - 5
    plan = (tile_flowdir_stats(spark.createDataFrame(
        [("T", 0, 0, "terrarium-png",
          bytearray(kernels.encode_terrarium_png(grid)))],
        "tile_key string, sw_lat int, sw_lon int, encoding string, data binary"))
        ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    # fixture tile: direct numpy recomputation of the D8 histogram
    g = fixtures.tile_grid(57, 11, 1201).astype(np.int64)
    void = g == kernels.VOID
    n = 1199
    v8 = np.zeros((n, n), dtype=bool)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            v8 |= void[dr:dr + n, dc:dc + n]
    zc = g[1:-1, 1:-1][~v8]
    drops = np.stack([zc - g[1 + dr:1 + dr + n, 1 + dc:1 + dc + n][~v8]
                      for _, dr, dc in _FLOW_DIRS])
    best = drops.max(axis=0)
    code = drops.argmax(axis=0)
    pit = best <= 0
    from elevation_service_spark.sources.tiles import fixture_tiles_df
    full = {x["tile_key"]: x for x in
            tile_flowdir_stats(fixture_tiles_df(spark)).collect()}
    row = full["N57E011"]
    assert row["n_pit"] == int(pit.sum())
    for k, (name, _, _) in enumerate(_FLOW_DIRS):
        assert row[name] == int(((code == k) & ~pit).sum()), name


def test_tile_pyramid_roundtrip_and_voids(spark):
    """Materialized overview tiles decode back to the iterated block-max
    of the base grid (odd-size ceil-halving included), and the crafted
    void patch walks n_void 4 -> 1 -> 0 across the three levels."""
    import numpy as np

    from elevation_service_spark import fixtures, kernels
    from elevation_service_spark.operators.raster import (
        _blockmax, tile_pyramid, tile_pyramid_stats)
    from elevation_service_spark import queries as _q  # noqa: F401 (import
    # order: queries_sinks circularly imports queries; load parent first)
    from elevation_service_spark.queries_sinks import (
        _PYR_PATCH, _PYR_VOID_TILE, _pyramid_tiles_df)

    tiles = _pyramid_tiles_df(spark)
    got = {(r["tile_key"], r["level"]): bytes(r["data"])
           for r in tile_pyramid(tiles, levels=2).collect()}
    key, sw_lat, sw_lon, size = _PYR_VOID_TILE
    lo, hi = _PYR_PATCH
    base = fixtures.tile_grid(sw_lat, sw_lon, size).copy()
    base[lo:hi, lo:hi] = kernels.VOID
    exp = {}
    z = base
    for lvl in (1, 2):
        z = _blockmax(z)
        exp[lvl] = z
    for lvl in (1, 2):
        dec = kernels.decode_hgt(got[(key, lvl)], allow_overview=True)
        assert dec.shape == exp[lvl].shape
        assert np.array_equal(dec, exp[lvl]), lvl
    # ceil-halving widths for the odd base size
    assert exp[1].shape[0] == (size + 1) // 2
    # void progression on the crafted tile
    st = {r["level"]: r["n_void"]
          for r in tile_pyramid_stats(tiles, levels=3).collect()
          if r["tile_key"] == key}
    assert st == {1: 4, 2: 1, 3: 0}


def test_tile_mosaic_roundtrip_and_errors(spark):
    """Materialized parent tiles decode to the block-max of the assembled
    mosaic (shared edges overlapping); a missing quadrant stays VOID; a
    mixed-size group raises."""
    import numpy as np
    import pytest

    from elevation_service_spark import fixtures, kernels
    from elevation_service_spark.operators.raster import (
        _blockmax, tile_mosaic)
    from elevation_service_spark import queries as _q  # noqa: F401
    from elevation_service_spark.queries_sinks import (
        _MOSAIC_SIZE, _mosaic_tiles_df)

    got = {r["parent_key"]: r.asDict(True)
           for r in tile_mosaic(_mosaic_tiles_df(spark)).collect()}
    s = _MOSAIC_SIZE
    # full group N56E010: assemble by hand
    m = np.full((2 * s - 1, 2 * s - 1), kernels.VOID, dtype=np.int64)
    for la, lo in [(56, 10), (56, 11), (57, 10), (57, 11)]:
        z = fixtures.tile_grid(la, lo, s)
        m[(la - 56) * (s - 1):(la - 56) * (s - 1) + s,
          (lo - 10) * (s - 1):(lo - 10) * (s - 1) + s] = z
    exp = _blockmax(m)
    full = got["N56E010"]
    assert full["n_children"] == 4 and full["size"] == s
    dec = kernels.decode_hgt(bytes(full["data"]), allow_overview=True)
    assert np.array_equal(dec, exp)
    # partial group N58E010: SW+NE quadrants only -> voids present
    part = got["N58E010"]
    assert part["n_children"] == 2
    decp = kernels.decode_hgt(bytes(part["data"]), allow_overview=True)
    assert (decp == kernels.VOID).sum() > 0
    # the NW coarse quadrant interior must be void, its SW interior real
    assert decp[2, (s - 1) // 2 + 2] == kernels.VOID
    assert decp[2, 2] != kernels.VOID
    # mixed sizes refuse loudly
    from elevation_service_spark.sources.tiles import TILES_SCHEMA
    bad = spark.createDataFrame(
        [("A", None, None, None, 56, 10, 41, "hgt",
          bytearray(fixtures.encode_tile(fixtures.tile_grid(56, 10, 41), "hgt"))),
         ("B", None, None, None, 56, 11, 1201, "hgt",
          bytearray(fixtures.encode_tile(fixtures.tile_grid(56, 11, 1201), "hgt")))],
        schema=TILES_SCHEMA)
    with pytest.raises(Exception, match="mixes tile sizes"):
        tile_mosaic(bad).collect()


def test_tile_flowacc_stats_semantics(spark):
    """r6 D8 flow accumulation: independent brute-force upstream-BFS
    reference on small crafted grids — diagonal ramp chains, flat-grid
    pits, the 3x3 void exclusion, and interior-edge drains."""
    import numpy as np

    from elevation_service_spark import kernels
    from elevation_service_spark.operators.raster import (ACC_ROUNDS,
                                                          CHANNEL_ACC,
                                                          _FLOW_DIRS,
                                                          tile_flowacc_stats)

    def brute(grid):
        """acc_k per valid8 interior node by literal k-round recurrence."""
        z = grid.astype(np.int64)
        size = z.shape[0]
        void = z == kernels.VOID
        n = size - 2
        nodes = {}
        for i in range(n):          # interior array coords
            for j in range(n):
                if not void[i:i + 3, j:j + 3].any():
                    nodes[(i, j)] = True
        tgt = {}
        for (i, j) in nodes:
            zc = z[i + 1, j + 1]
            best, code = None, None
            for k, (_, dr, dc) in enumerate(_FLOW_DIRS):
                d = zc - z[i + 1 + dr, j + 1 + dc]
                if best is None or d > best:  # first-max tie rule
                    best, code = d, k
            if best > 0:
                _, dr, dc = _FLOW_DIRS[code]
                t = (i + dr, j + dc)
                if t in nodes:
                    tgt[(i, j)] = t
        acc = {v: 1 for v in nodes}
        for _ in range(ACC_ROUNDS):
            nxt = {v: 1 for v in nodes}
            for s, t in tgt.items():
                nxt[t] += acc[s]
            acc = nxt
        vals = list(acc.values())
        return (sum(vals), max(vals) if vals else None,
                sum(1 for v in vals if v >= CHANNEL_ACC))

    def run(grid):
        tiles = spark.createDataFrame(
            [("T", 0, 0, "terrarium-png",
              bytearray(kernels.encode_terrarium_png(
                  grid.astype(np.int16))))],
            "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
        r = tile_flowacc_stats(tiles).collect()[0]
        return (r["sum_acc"], r["max_acc"], r["n_channel"])

    size = 12
    # diagonal ramp: chains to SW, acc = 1 + min(k, upstream chain)
    g = (3 * np.arange(size)[:, None] + 5 * np.arange(size)[None, :]
         + np.zeros((size, size)))
    assert run(g) == brute(g)
    # flat: all pits, acc = 1 everywhere
    g = np.full((size, size), 9.0)
    assert run(g) == brute(g) == ((size - 2) ** 2, 1, 0)
    # void in the middle of a ramp: 3x3 exclusion + broken chains
    g = (3 * np.arange(size)[:, None] + 5 * np.arange(size)[None, :]
         + np.zeros((size, size)))
    g[5, 6] = kernels.VOID
    assert run(g) == brute(g)
    # rough terrain: deterministic pseudo-random heights, many pits/chains
    rng = np.random.default_rng(7)
    g = rng.integers(0, 50, (size, size)).astype(np.int16)
    g[3, 3] = kernels.VOID
    assert run(g) == brute(g)


def test_tile_contour_stats_semantics(spark):
    """r6 contour census: a column ramp crosses once per row, a
    checkerboard is ALL saddles, and a void knocks out its edges and
    cells."""
    import numpy as np

    from elevation_service_spark import kernels
    from elevation_service_spark.operators.raster import tile_contour_stats

    def run(grid, levels):
        tiles = spark.createDataFrame(
            [("T", 0, 0, "terrarium-png",
              bytearray(kernels.encode_terrarium_png(
                  grid.astype(np.int16))))],
            "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
        return {r["level"]: r for r in
                tile_contour_stats(tiles, levels=levels).collect()}

    size = 8
    # column ramp z = 100c, level 350: one h-crossing per row at c=3|4
    g = 100 * np.arange(size)[None, :] * np.ones((size, 1))
    r = run(g, (350,))[350]
    assert (r["n_hcross"], r["n_vcross"]) == (size, 0)
    assert (r["n_cells_cut"], r["n_saddle"]) == (size - 1, 0)
    # checkerboard at level 50: every edge crosses, every cell a saddle
    g = 100.0 * ((np.arange(size)[:, None] + np.arange(size)[None, :]) % 2)
    r = run(g, (50,))[50]
    assert r["n_hcross"] == r["n_vcross"] == size * (size - 1)
    assert r["n_cells_cut"] == r["n_saddle"] == (size - 1) ** 2
    # void at (4,4) removes its 4 edges and 4 cells
    g[4, 4] = kernels.VOID
    r = run(g, (50,))[50]
    assert r["n_hcross"] == r["n_vcross"] == size * (size - 1) - 2
    assert r["n_cells_cut"] == r["n_saddle"] == (size - 1) ** 2 - 4


def test_tile_viewshed_stats_semantics(spark):
    """r6 viewshed: flat terrain shows only the first node per ray
    (equal horizon never exceeds), a convex bowl shows everything, a
    wall hides the plain behind it, and a void node is skipped without
    blocking."""
    import numpy as np

    from elevation_service_spark import kernels
    from elevation_service_spark.operators.raster import tile_viewshed_stats

    size = 9  # centre (4,4), rays of length 4

    def run(grid):
        tiles = spark.createDataFrame(
            [("T", 0, 0, "terrarium-png",
              bytearray(kernels.encode_terrarium_png(
                  grid.astype(np.int16))))],
            "tile_key string, sw_lat int, sw_lon int, encoding string, data binary")
        return {r["ray"]: r for r in tile_viewshed_stats(tiles).collect()}

    # flat: ms = 0 everywhere -> only d=1 visible on every ray
    got = run(np.full((size, size), 7.0))
    for r in got.values():
        assert (r["n_nodes"], r["n_visible"], r["max_ms"]) == (4, 1, 0)
    # convex bowl z = (r-4)^2 + (c-4)^2: slope strictly rises -> all 4
    rr, cc = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    got = run(((rr - 4) ** 2 + (cc - 4) ** 2).astype(float))
    for r in got.values():
        assert r["n_visible"] == 4, r
    # wall at d=2 on the E ray hides d=3,4 (their ms < the wall's)
    g = np.zeros((size, size)); g[4, 6] = 100
    r = run(g)["e"]
    # visible: d=1 (ms 0), d=2 (the wall, ms 5e7); d=3,4 blocked
    assert (r["n_visible"], r["max_ms"]) == (2, 50_000_000)
    # void at d=2 on the E ray: skipped, not blocking -> d=1,3|4 logic
    g = np.zeros((size, size)); g[4, 6] = kernels.VOID; g[4, 7] = 9
    r = run(g)["e"]
    # nodes: d=1 (0), d=3 (9 -> ms 3e6), d=4 (0) -> visible d=1, d=3
    assert (r["n_nodes"], r["n_visible"], r["max_ms"]) == (3, 2, 3_000_000)


def test_tile_watershed_stats_semantics(spark):
    """r7 watershed delineation: independent brute-force follow-the-arrows
    reference on crafted grids — ramp basins, flat all-pits, a planted
    void, interior-edge drains, and (rounds=1) the bounded-depth
    n_open_basins contract for paths longer than 2^rounds."""
    import numpy as np

    from elevation_service_spark import kernels
    from elevation_service_spark.operators.raster import (_FLOW_DIRS,
                                                          tile_watershed_stats)

    def brute(grid, rounds):
        z = grid.astype(np.int64)
        size = z.shape[0]
        void = z == kernels.VOID
        n = size - 2
        nodes = set()
        for i in range(n):
            for j in range(n):
                if not void[i:i + 3, j:j + 3].any():
                    nodes.add((i, j))
        ptr, pit = {}, {}
        for (i, j) in nodes:
            zc = z[i + 1, j + 1]
            best, code = None, None
            for k, (_, dr, dc) in enumerate(_FLOW_DIRS):
                d = zc - z[i + 1 + dr, j + 1 + dc]
                if best is None or d > best:  # first-max tie rule
                    best, code = d, k
            pit[(i, j)] = best <= 0
            _, dr, dc = _FLOW_DIRS[code]
            t = (i + dr, j + dc)
            ptr[(i, j)] = t if (best > 0 and t in nodes) else (i, j)
        lab = dict(ptr)
        for _ in range(rounds):
            lab = {v: lab[lab[v]] for v in nodes}  # pointer doubling
        from collections import Counter
        basins = Counter(lab.values())
        n_pit = sum(1 for r in basins if pit[r])
        n_out = sum(1 for r in basins if not pit[r] and ptr[r] == r)
        n_open = sum(1 for r in basins if ptr[r] != r)
        return (len(nodes), len(basins), n_pit, n_out, n_open,
                max(basins.values()) if basins else 0)

    def run(grid, rounds):
        tiles = spark.createDataFrame(
            [("T", "terrarium-png",
              bytearray(kernels.encode_terrarium_png(
                  grid.astype(np.int16))))],
            "tile_key string, encoding string, data binary")
        r = tile_watershed_stats(tiles, rounds=rounds).collect()[0]
        return (r["n_nodes"], r["n_basins"], r["n_pit_basins"],
                r["n_outlet_basins"], r["n_open_basins"],
                r["largest_basin"])

    size = 12
    # diagonal ramp: everything drains toward the SW interior edge
    g = (3 * np.arange(size)[:, None] + 5 * np.arange(size)[None, :]
         + np.zeros((size, size)))
    got, exp = run(g, 8), brute(g, 8)
    assert got == exp
    assert got[4] == 0  # converged: no open basins
    # flat: every node its own pit basin
    g = np.full((size, size), 9.0)
    n = (size - 2) ** 2
    assert run(g, 8) == brute(g, 8) == (n, n, n, 0, 0, 1)
    # planted void: 3x3 exclusion changes the node set and basin shapes
    g = (3 * np.arange(size)[:, None] + 5 * np.arange(size)[None, :]
         + np.zeros((size, size)))
    g[5, 6] = kernels.VOID
    assert run(g, 8) == brute(g, 8)
    # rough terrain: many pits and drains
    rng = np.random.default_rng(11)
    g = rng.integers(0, 50, (size, size)).astype(np.int16)
    assert run(g, 8) == brute(g, 8)
    # bounded-depth contract: a long monotone chain with rounds=1 leaves
    # mid-path ancestors as open-basin roots; both sides must agree
    g = (10 * np.arange(size)[:, None] + np.zeros((size, size)))
    got1, exp1 = run(g, 1), brute(g, 1)
    assert got1 == exp1
    assert got1[4] > 0  # the open-basin path is genuinely exercised
