"""curate_corpus: funnel semantics, dedup/sample interaction,
count conservation."""

from graphgen_spark.datapipe.curate import curate_corpus


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


class TestCurateCorpus:
    def test_funnel_conserves_and_tags(self, spark):
        rows = [
            (1, "one two three four five", "en"),          # kept
            (2, "one two three four five", "en"),          # dup of 1
            (3, "short", "en"),                            # length
            (4, "rep rep rep rep rep rep", "en"),          # repetition
            (5, "uno dos tres cuatro cinco", "es"),        # lang
            (6, "alpha beta gamma delta epsilon", "en"),   # kept
        ]
        curated, funnel = curate_corpus(
            _docs(spark, rows), min_tokens=5, max_tokens=100,
            max_repetition_pct=50, langs=["en"], sample_k=None,
        )
        f = {r["stage"]: r["n_docs"] for r in funnel.collect()}
        assert f == {"length": 1, "repetition": 1, "lang": 1,
                     "duplicate": 1, "kept": 2}
        assert sum(f.values()) == len(rows)
        kept = sorted(r["doc_id"] for r in curated.collect())
        assert kept == [1, 6]

    def test_duplicates_do_not_consume_sample_ranks(self, spark):
        # 1 unique text duplicated 5x + 3 distinct: with sample_k=3 the
        # 3 distinct + 1 keeper must all be rankable 1..4 -> 3 kept
        rows = [(i, "same text here repeated not", "en")
                for i in range(5)]
        rows += [(10 + i, f"unique text number {i} words here", "en")
                 for i in range(3)]
        curated, funnel = curate_corpus(
            _docs(spark, rows), min_tokens=2, sample_k=3,
        )
        ranks = sorted(
            r["sample_rank"] for r in curated.collect()
        )
        assert ranks == [1, 2, 3]
        f = {r["stage"]: r["n_docs"] for r in funnel.collect()}
        assert f["duplicate"] == 4
        assert f["kept"] == 3
        assert f["sampled_out"] == 1

    def test_sample_k_exact_per_lang(self, spark):
        rows = [
            (i, f"doc {i} has distinct tokens {i * 7} {i * 13}",
             "en" if i % 2 else "zh")
            for i in range(40)
        ]
        curated, _ = curate_corpus(
            _docs(spark, rows), min_tokens=2, sample_k=5,
        )
        by_lang = (
            curated.groupBy("lang").count().collect()
        )
        assert {r["lang"]: r["count"] for r in by_lang} == {
            "en": 5, "zh": 5,
        }

    def test_deterministic_across_partitioning(self, spark):
        rows = [
            (i, f"tokens {i} {i * 3} {i * 5} {i * 7} tail", "en")
            for i in range(30)
        ]
        a = sorted(map(tuple, curate_corpus(
            _docs(spark, rows).repartition(1), min_tokens=2,
            sample_k=7,
        )[0].collect()))
        b = sorted(map(tuple, curate_corpus(
            _docs(spark, rows).repartition(11), min_tokens=2,
            sample_k=7,
        )[0].collect()))
        assert a == b and len(a) == 7
