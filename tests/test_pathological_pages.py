"""Pathological-input robustness: empty html, non-UTF8 bytes, pages
with no relation sentences, null html — the pipeline must neither
crash nor emit self-loop or phantom triples."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphgen_spark.pipelines import run_kg_pipeline

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

TS = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def pathological_pages(spark):
    rows = [
        ("http://x/empty", TS, b"", "", "en"),
        ("http://x/nonutf8", TS, b"\xff\xfe\x80<p>Zorvex Dynamics "
         b"acquired Calyra Labs.</p>\x80\xff", "", "en"),
        ("http://x/norel", TS, b"<p>just plain words with no "
         b"relation grammar at all</p>", "", "en"),
        ("http://x/selfloop", TS, b"<p>Calyra Labs acquired Calyra "
         b"Labs.</p>", "", "en"),
        ("http://x/null", TS, None, "", "en"),
        ("http://x/good", TS, b"<html><head><title>t</title></head>"
         b"<body><p>Bramwell Institute merged with Delphora Capital."
         b"</p></body></html>", "", "en"),
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


class TestPathologicalPages:
    def test_pipeline_survives_and_filters(self, spark,
                                           pathological_pages):
        out = run_kg_pipeline(
            spark, pathological_pages, chunk_size=256, chunk_overlap=32,
        )
        triples = out["triples"].collect()
        # no self-loops ever (subj == obj must be 0)
        assert all(t["subj"] != t["obj"] for t in triples)
        urls = {t["url"] for t in triples}
        # empty/null/no-relation pages contribute nothing
        assert "http://x/empty" not in urls
        assert "http://x/null" not in urls
        assert "http://x/norel" not in urls
        assert "http://x/selfloop" not in urls  # self-loop dropped
        # the good page and the salvageable non-UTF8 page extract
        assert "http://x/good" in urls
        assert "http://x/nonutf8" in urls

    def test_fused_path_same_behavior(self, spark, pathological_pages):
        composed = run_kg_pipeline(
            spark, pathological_pages, chunk_size=256, chunk_overlap=32,
            fused=False,
        )
        fused = run_kg_pipeline(
            spark, pathological_pages, chunk_size=256, chunk_overlap=32,
            fused=True,
        )
        c = {tuple(r) for r in composed["triples"]
             .select("subj", "pred", "obj", "url").collect()}
        f = {tuple(r) for r in fused["triples"]
             .select("subj", "pred", "obj", "url").collect()}
        assert c == f

    def test_byte_identical_text_per_url(self, spark,
                                         pathological_pages):
        """BASELINE input_hint invariant: same html bytes -> same
        extracted text, across runs and parallelism."""
        from graphgen_spark.operators.text import with_extracted_text

        a = {r["url"]: r["t"] for r in with_extracted_text(
            pathological_pages, out_col="t").select("url", "t").collect()}
        b = {r["url"]: r["t"] for r in with_extracted_text(
            pathological_pages.repartition(7), out_col="t"
        ).select("url", "t").collect()}
        assert a == b
