"""Engine facade smoke: every public method returns a working DataFrame.
(The operators behind them have their own correctness/property tests —
this guards the veneer's wiring.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    from pydatalake_gen2_spark.engine import Engine
    from pydatalake_gen2_spark.tables import register_views

    register_views(spark, sf_dir)
    return Engine(spark, sf_dir)


def test_sql_and_table(eng):
    assert eng.sql("SELECT count(*) AS n FROM region").first()["n"] == 5
    assert eng.table("nation").count() == 25


def test_read_parquet(eng, sf_dir):
    assert eng.read_parquet(f"{sf_dir}/region.parquet").count() == 5


def test_asof_and_salted_join(eng):
    ev = eng.table("events")
    res = eng.asof_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_order="event_id",
        carry=["event_id"],
        how="left",
    )
    assert res.count() > 0
    sj = eng.salted_join(
        eng.table("lineitem"), eng.table("supplier"), "l_suppkey", "s_suppkey"
    )
    assert sj.count() == eng.table("lineitem").count()


def test_text_and_dedup_surface(eng):
    docs = eng.table("documents")
    assert eng.dedup_exact(docs).count() <= docs.count()
    assert eng.simhash(docs).count() == docs.count()
    assert eng.language_id(docs).count() == docs.count()
    assert eng.quality_score(docs).count() == docs.count()
    assert eng.fingerprint(docs).count() == docs.count()
    assert eng.token_frequencies(docs).count() > 0
    assert eng.tfidf_top_terms(docs).count() > 0
    assert eng.near_dups(docs).count() >= 0


def test_similarity_surface(eng):
    emb = eng.table("embeddings")
    q = emb.filter(F.col("vec_id") < 2)
    assert eng.cosine_topk(emb, q, k=3).count() == 2 * 3
    assert eng.ivf_topk(emb, k=3, n_cells=4, n_probe=4).count() > 0
    assert eng.lsh_topk(emb, k=3).count() > 0


def test_catalog_roundtrip(eng, tmp_path):
    from pydatalake_gen2_spark.sources.lake import LakeCatalog

    cat = LakeCatalog(eng.spark, f"file://{tmp_path}")
    assert cat.create_filesystem("fs1")
    assert "fs1" in cat.list_filesystems()


def test_stream_events_is_streaming(eng, sf_dir):
    src = eng.stream_events(sf_dir)
    assert src.isStreaming


def test_open_lake_helper(sf_dir):
    import pydatalake_gen2_spark as pkg

    eng2 = pkg.open_lake(sf_dir)
    assert eng2.table("region").count() == 5
