"""Fusion equivalence: the one-hop fused extraction must be
bit-identical to the composed text->chunk->records path."""

from graphgen_spark import synth
from graphgen_spark.pipelines import run_kg_pipeline


def _triples(out):
    return {
        tuple(r)
        for r in out["triples"].select("subj", "pred", "obj", "url").collect()
    }


class TestFusedEquivalence:
    def test_fused_triples_equal_composed(self, spark):
        """With a dictionary: fused mode links map-side (records are
        already canonical), composed mode links via JVM joins — the
        final triples must be identical."""
        pages = synth.pages_df(spark, 50, 200)
        alias = synth.alias_dictionary_df(spark, 200)
        composed = run_kg_pipeline(
            spark, pages, alias_dict=alias,
            chunk_size=256, chunk_overlap=32, fused=False,
        )
        fused = run_kg_pipeline(
            spark, pages, alias_dict=alias,
            chunk_size=256, chunk_overlap=32, fused=True,
        )
        assert _triples(fused) == _triples(composed)

    def test_fused_records_equal_composed_without_dict(self, spark):
        """Without a dictionary fusion is pure plan-level: the records
        table must be bit-identical."""
        pages = synth.pages_df(spark, 50, 200)
        composed = run_kg_pipeline(
            spark, pages, chunk_size=256, chunk_overlap=32, fused=False,
        )
        fused = run_kg_pipeline(
            spark, pages, chunk_size=256, chunk_overlap=32, fused=True,
        )
        rc = {tuple(r) for r in composed["records"].collect()}
        rf = {tuple(r) for r in fused["records"].collect()}
        assert rf == rc
        assert _triples(fused) == _triples(composed)


class TestLabelMapSizeGuard:
    def test_guard_falls_back_to_jvm_join(self, spark):
        """label_map_max_rows=0 forces the fused path to skip the
        driver collect and link via the JVM broadcast join — triples
        must be identical to the map-side-linked fused run."""
        pages = synth.pages_df(spark, 50, 200)
        alias = synth.alias_dictionary_df(spark, 200)
        mapside = run_kg_pipeline(
            spark, pages, alias_dict=alias,
            chunk_size=256, chunk_overlap=32, fused=True,
        )
        guarded = run_kg_pipeline(
            spark, pages, alias_dict=alias,
            chunk_size=256, chunk_overlap=32, fused=True,
            label_map_max_rows=0,
        )
        assert _triples(guarded) == _triples(mapside)
