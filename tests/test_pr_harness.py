"""Triple P/R harness — the BASELINE.json correctness gate.

Ground truth is computed OUTSIDE the Spark pipeline: relation sentences
are found on the whole page text (before any chunking), surface forms
are resolved to canonical entities with a pure-python union-find over
the alias dictionary (the same min-representative rule the pipeline's
CC stage implements).  The pipeline must recover >=0.95 of those
triples (recall) with >=0.95 precision — chunk-boundary losses are the
only legitimate miss source, bounded by the overlap.
"""



import pytest
from pyspark.sql import functions as F

from graphgen_spark import synth
from graphgen_spark.extraction import find_relation_sentences
from graphgen_spark.pipelines import run_kg_pipeline
from graphgen_spark.textkit import clean_str

N_PAGES = 120
N_ENT = synth.n_entities_for(N_PAGES)


def _alias_canonical_map(n_entities: int) -> dict:
    """Pure-python replica of the dictionary resolution rule: an alias
    shared by several entities resolves to the MIN canonical_id."""
    best = {}
    for eid in range(n_entities):
        canon = synth.canonical_name(eid).upper()
        for alias in synth.aliases_of(eid):
            norm = clean_str(alias.upper())
            if norm not in best or eid < best[norm][0]:
                best[norm] = (eid, canon)
    return {norm: canon for norm, (eid, canon) in best.items()}


def _expected_triples(n_pages: int, n_entities: int) -> set:
    amap = _alias_canonical_map(n_entities)
    expected = set()
    for pid in range(n_pages):
        url, _, text, _ = synth.gen_page(pid, n_entities)
        for src_alias, verb, tgt_alias, _sent in find_relation_sentences(text):
            s = amap.get(clean_str(src_alias.upper()),
                         clean_str(src_alias.upper()))
            t = amap.get(clean_str(tgt_alias.upper()),
                         clean_str(tgt_alias.upper()))
            if s == t:
                continue  # pipeline drops self-loops post-canonicalization
            pred = f"{src_alias} {verb} {tgt_alias}"
            a, b = sorted((s, t))
            expected.add((a, pred, b, url))
    return expected


@pytest.fixture(scope="module")
def pipeline_triples(spark):
    pages = synth.pages_df(spark, N_PAGES, N_ENT)
    alias = synth.alias_dictionary_df(spark, N_ENT)
    out = run_kg_pipeline(
        spark, pages, alias_dict=alias, chunk_size=256, chunk_overlap=64
    )
    rows = out["triples"].select("subj", "pred", "obj", "url").collect()
    return {(r["subj"], r["pred"], r["obj"], r["url"]) for r in rows}


class TestTriplePR:
    def test_precision_recall(self, pipeline_triples):
        expected = _expected_triples(N_PAGES, N_ENT)
        got = pipeline_triples
        assert expected, "fixture must produce ground-truth triples"
        tp = len(got & expected)
        precision = tp / len(got) if got else 0.0
        recall = tp / len(expected)
        print(f"\nP={precision:.4f} R={recall:.4f} "
              f"(got={len(got)}, expected={len(expected)}, tp={tp})")
        assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
        assert recall >= 0.95, f"recall {recall:.4f} < 0.95"

    def test_zh_pages_contribute(self, pipeline_triples):
        # the corpus has ~15% zh pages; their triples must be present
        expected = _expected_triples(N_PAGES, N_ENT)
        zh_urls = set()
        for pid in range(N_PAGES):
            url, lang, _, _ = synth.gen_page(pid, N_ENT)
            if lang == "zh":
                zh_urls.add(url)
        zh_expected = {t for t in expected if t[3] in zh_urls}
        if zh_expected:
            zh_got = {t for t in pipeline_triples if t[3] in zh_urls}
            assert len(zh_got & zh_expected) / len(zh_expected) >= 0.9
