"""Unit tests for the training-data pipeline operators (text/dedup/similarity/multimodal)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from alphastats_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (3, "completely different text about spark engines and data"),
        (4, "el perro y el gato y el raton y el pajaro"),
        (5, ""),
        (6, "x"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestText:
    def test_token_count(self, spark, docs):
        out = {r["doc_id"]: r["n"] for r in docs.select("doc_id", text.token_count(F.col("text")).alias("n")).collect()}
        assert out[0] == 9
        assert out[5] == 0
        assert out[6] == 1

    def test_bpe_ish(self, spark):
        df = spark.createDataFrame([(0, "hello, world! it's 42")], "id int, text string")
        n = df.select(text.bpe_ish_token_count(F.col("text")).alias("n")).first()["n"]
        # hello | , | world | ! | it | ' | s | 42
        assert n == 8

    def test_normalize_fingerprint(self, spark, docs):
        rows = docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()
        fp = {r["doc_id"]: r["fp"] for r in rows}
        assert fp[0] == fp[2]
        assert fp[0] != fp[1]

    def test_ratios_bounds(self, spark, docs):
        out = text.with_text_stats(docs).collect()
        for r in out:
            for field in ("punct_ratio", "digit_ratio", "stopword_ratio", "quality_score"):
                assert 0.0 <= r[field] <= 1.0, (r["doc_id"], field, r[field])

    def test_lang_id(self, spark, docs):
        out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", text.lang_id(F.col("text")).alias("lang")).collect()}
        assert out[0] == "en"
        assert out[4] == "es"
        assert out[5] == "unknown"


class TestDedup:
    def test_exact(self, spark, docs):
        groups = dedup.exact_duplicates(docs).collect()
        by_rep = {r["representative"]: r["copies"] for r in groups}
        assert by_rep[0] == 2  # docs 0 and 2
        assert by_rep[1] == 1

    def test_paragraph_dedup(self, spark):
        rows = [
            (0, "intro zero\ncookie banner\nunique zero"),
            (1, "intro one\nCookie   Banner!\nunique one"),  # normalizes equal
            (2, "cookie banner\ncookie banner"),  # all boilerplate → ''
            (3, None),  # null text → backfill row
            (4, "   \n \n"),  # whitespace-only paragraphs → backfill row
            (5, "z last\na first\ncookie banner"),  # order preserved, not sorted
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in dedup.paragraph_dedup(df, max_copies=2).collect()}
        assert len(out) == 6
        # 'cookie banner' occurs 5x (normalization folds doc 1's variant) > 2
        assert out[0]["text_clean"] == "intro zero\nunique zero"
        assert (out[0]["n_paragraphs"], out[0]["n_dropped"]) == (3, 1)
        assert out[1]["text_clean"] == "intro one\nunique one"
        assert out[2]["text_clean"] == ""
        assert (out[2]["n_paragraphs"], out[2]["n_dropped"]) == (2, 2)
        for null_doc in (3, 4):
            r = out[null_doc]
            assert r["text_clean"] is None
            assert (r["n_paragraphs"], r["n_dropped"]) == (0, 0)
        assert out[5]["text_clean"] == "z last\na first"

    def test_ngram_novelty(self, spark):
        ref = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")],
            "doc_id bigint, text string",
        )
        rows = [
            (0, "alpha beta gamma delta epsilon"),  # fully contained → 0.0
            (1, "zeta eta theta iota kappa"),       # fully novel → 1.0
            (2, "alpha beta gamma nu xi"),          # 1 of 3 grams seen
            (3, "two words"),                       # < n tokens → no grams
            (4, None),                              # null text → no grams
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in dedup.ngram_novelty(df, ref).collect()}
        assert len(out) == 5
        assert out[0]["novelty"] == 0.0 and out[0]["n_unseen"] == 0
        assert out[1]["novelty"] == 1.0 and out[1]["n_unseen"] == out[1]["n_grams"] == 3
        # doc 2: grams {alpha beta gamma, beta gamma nu, gamma nu xi} — 1 seen
        assert (out[2]["n_grams"], out[2]["n_unseen"]) == (3, 2)
        assert abs(out[2]["novelty"] - 2 / 3) < 1e-12
        for no_grams in (3, 4):
            r = out[no_grams]
            assert (r["n_grams"], r["n_unseen"]) == (0, 0)
            assert r["novelty"] is None

    def test_paragraph_dedup_below_threshold_is_identity(self, spark):
        rows = [(i, f"shared header\nbody {i}") for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = dedup.paragraph_dedup(df, max_copies=3).collect()
        assert all(r["n_dropped"] == 0 for r in out)
        assert {r["text_clean"] for r in out} == {f"shared header\nbody {i}" for i in range(3)}

    def test_lsh_finds_near_dup(self, spark, docs):
        pairs = dedup.lsh_candidate_pairs(docs).collect()
        pairset = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 2) in pairset  # exact dups always collide on all bands

    def test_jaccard(self, spark, docs):
        pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
        d = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        assert d[(0, 2)] == 1.0
        assert 0.4 < d[(0, 1)] < 1.0

    def test_simhash_identical_docs(self, spark, docs):
        sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.where("text <> ''")).collect()}
        assert sigs[0] == sigs[2]
        d01 = dedup_hamming(spark, sigs[0], sigs[1])
        d03 = dedup_hamming(spark, sigs[0], sigs[3])
        assert d01 < d03  # near-dup closer than unrelated doc

    def test_simhash_banded_pairs_exact(self, spark):
        """The Manku pigeonhole band join must equal the brute-force
        all-pairs hamming scan EXACTLY (it is a guarantee, not a recall
        trade), and reject configs that void the guarantee."""
        import itertools

        import pytest as _pytest

        words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]
        rows = []
        for i in range(40):
            if i % 8 == 0:
                text = " ".join(words * 3)  # shared hub text → 0-distance dups
            elif i % 8 == 1:
                text = " ".join(words * 3) + " extra" + str(i)  # near dup
            else:
                text = " ".join(words[(i * 5 + j) % 8] + str((i * 13 + j * 7) % 23) for j in range(20))
            rows.append((i, text))
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")

        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_near_dups(docs, max_hamming=4).collect()
        }
        sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        brute = {
            (a, b): bin(sigs[a] ^ sigs[b]).count("1")
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= 4
        }
        assert got == brute and got, (len(got), len(brute))

        with _pytest.raises(ValueError):
            dedup.simhash_near_dups(docs, max_hamming=4, n_bands=4)

    def test_embedding_near_dups(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        pairs = dedup.embedding_near_dup_pairs(df, threshold=0.9).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}

    def test_embedding_near_dups_lsh_subset_of_exact(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        # 10 clusters of 3 near-identical vectors + noise singletons
        for cluster in range(10):
            base = [rng.gauss(0, 1) for _ in range(8)]
            for j in range(3):
                rows.append(
                    (cluster * 3 + j, [x + rng.gauss(0, 0.01) for x in base])
                )
        for i in range(30, 50):
            rows.append((i, [rng.gauss(0, 1) for _ in range(8)]))
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

        exact = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in dedup.embedding_near_dup_pairs(df, threshold=0.9).collect()
        }
        approx = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in dedup.embedding_near_dup_pairs_lsh(
                df, threshold=0.9, n_planes=4, n_tables=6
            ).collect()
        }
        # LSH pairs are a subset of exact pairs with identical scores
        assert set(approx) <= set(exact)
        for k, v in approx.items():
            assert v == exact[k]
        # with 6 tables × 4 planes, recall on tight clusters is near-total
        assert len(approx) >= 0.8 * len(exact) > 0

    def test_lsh_verified_subset_of_exact_jaccard(self, spark, docs):
        exact = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
        }
        verified = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.lsh_verified_pairs(docs, threshold=0.2).collect()
        }
        assert set(verified) <= set(exact)
        for k, v in verified.items():
            assert v == exact[k]
        # the identical pair always band-collides
        assert (0, 2) in verified and verified[(0, 2)] == 1.0

    def test_incremental_equals_straddling_self_join(self, spark):
        """Cross-corpus equivalence: for ANY split of a corpus into
        batch/existing, incremental_near_dups must return exactly the
        self-join lsh_verified_pairs that straddle the split (same seeded
        band family → same collisions; same verification arithmetic →
        same scores). Randomized corpora over a tiny vocabulary so band
        collisions and near-dups are dense; 3 fixed seeds keep it
        deterministic."""
        import random

        for seed in (0, 1, 2):
            rng = random.Random(seed)
            vocab = [f"w{i}" for i in range(12)]
            base = [" ".join(rng.choices(vocab, k=10)) for _ in range(8)]
            texts = [
                rng.choice(base)
                if rng.random() < 0.6
                else " ".join(rng.choices(vocab, k=10))
                for _ in range(24)
            ]
            df = spark.createDataFrame(
                list(enumerate(texts)), "doc_id bigint, text string"
            )
            full = {
                (r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.lsh_verified_pairs(df, threshold=0.4).collect()
            }
            straddle = {
                k: v for k, v in full.items() if (k[0] % 3 == 0) != (k[1] % 3 == 0)
            }
            new = df.where("doc_id % 3 = 0")
            old = df.where("doc_id % 3 != 0")
            inc = {
                (r["new_id"], r["match_id"]): r["jaccard"]
                for r in dedup.incremental_near_dups(new, old, threshold=0.4).collect()
            }
            normalized = {(min(a, b), max(a, b)): j for (a, b), j in inc.items()}
            assert normalized == straddle, (seed, normalized, straddle)

        # asymmetric containment dominates Jaccard for every pair
        cont = {
            (r["contained_id"], r["container_id"]): r["containment"]
            for r in dedup.containment_pairs(df, threshold=0.0).collect()
        }
        jac = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
        }
        for (a, b), j in jac.items():
            assert cont[(a, b)] >= j and cont[(b, a)] >= j

    def test_duplicate_clusters_components(self, spark):
        # chain 1-2-3-4-5 (needs multiple propagation rounds), pair (7,8),
        # and a star 10-{11,12}
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8), (10, 11), (10, 12)],
            "id_a bigint, id_b bigint",
        )
        got = {
            r["id"]: r["cluster_id"]
            for r in dedup.duplicate_clusters(pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 7: 7, 8: 7, 10: 10, 11: 10, 12: 10}

    def test_deduplicate_threads_band_bucket_cap(self, spark):
        # a 6-copy near-dup group: with the default cap (far above 6) the
        # copies collapse to one representative; with cap=1 every band
        # bucket holding the group is over-cap, so no candidates survive
        # and nothing is dropped - the knob demonstrably reaches the guard
        rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(6)]
        rows += [(10 + i, f"unrelated text number {i} with its own words entirely")
                 for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        assert dedup.deduplicate(df, threshold=0.5).count() == 4  # 1 rep + 3 unrelated
        assert dedup.deduplicate(df, threshold=0.5, max_band_bucket=1).count() == 9
        lin = dedup.deduplicate(df, threshold=0.5, lineage=True,
                                max_band_bucket=None)
        drops = [r for r in lin.collect() if r["reason"] == "near_dup_dropped"]
        assert len(drops) == 5  # exact unguarded join still finds the group

    def test_duplicate_clusters_stats_out_param(self, spark):
        # the scale-probe hook: edge/node counts and propagation rounds
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)],
            "id_a bigint, id_b bigint",
        )
        stats: dict = {}
        dedup.duplicate_clusters(pairs, stats=stats).collect()
        assert stats["n_edges"] == 10  # 5 pairs symmetrized, all distinct
        assert stats["n_nodes"] == 7
        # the 5-chain needs >1 min-label round; fixpoint found within cap
        assert 2 <= stats["iterations"] <= 30

    def test_embedding_lsh_plan_has_no_nested_loop(self, spark):
        from alphastats_spark import plans

        rows = [(i, [float(i), 1.0, 0.5]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        out = dedup.embedding_near_dup_pairs_lsh(df, threshold=0.5, dim=3)
        kinds = {f.kind for f in plans.audit(out)}
        assert "nested-loop-join" not in kinds


def dedup_hamming(spark, a: int, b: int) -> int:
    return (
        spark.range(1)
        .select(dedup.hamming_distance(F.lit(a), F.lit(b)).alias("d"))
        .first()["d"]
    )


class TestSimilarity:
    @pytest.fixture
    def vectors(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        base = rng.standard_normal(8)
        rows = [(0, [float(x) for x in base])]
        for i in range(1, 50):
            noise = rng.standard_normal(8) * (0.01 if i < 5 else 1.0)
            rows.append((i, [float(x) for x in base * (1 if i < 5 else 0) + noise]))
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def test_bruteforce_topk(self, spark, vectors):
        q = vectors.where("vec_id = 0").first()["embedding"]
        top = similarity.cosine_topk(vectors, [float(x) for x in q], k=5).collect()
        assert top[0]["vec_id"] == 0
        assert top[0]["cosine"] == pytest.approx(1.0)
        # the 4 perturbed copies dominate the top-5
        assert {r["vec_id"] for r in top} == {0, 1, 2, 3, 4}

    def test_lsh_topk_recall(self, spark, vectors):
        q = vectors.where("vec_id = 0").first()["embedding"]
        top = similarity.lsh_topk(vectors, [float(x) for x in q], k=5, n_planes=4).collect()
        ids = {r["vec_id"] for r in top}
        # near-identical vectors share the query's bucket
        assert 0 in ids
        assert len(ids & {1, 2, 3, 4}) >= 3

    def test_bucket_determinism(self, spark, vectors):
        b1 = {r["vec_id"]: r["lsh_bucket"] for r in similarity.lsh_buckets(vectors).collect()}
        b2 = {r["vec_id"]: r["lsh_bucket"] for r in similarity.lsh_buckets(vectors).collect()}
        assert b1 == b2

    def test_ivf_full_probe_equals_bruteforce(self, spark, vectors):
        q = [float(x) for x in vectors.where("vec_id = 0").first()["embedding"]]
        cents = similarity.ivf_centroids(vectors, n_centroids=4, seed=11)
        exact = similarity.cosine_topk(vectors, q, k=5).collect()
        ivf = similarity.ivf_topk(vectors, q, cents, k=5, nprobe=4).collect()
        assert [(r["vec_id"], r["cosine"]) for r in ivf] == [
            (r["vec_id"], r["cosine"]) for r in exact
        ]

    def test_ivf_probe_one_finds_cluster(self, spark, vectors):
        q = [float(x) for x in vectors.where("vec_id = 0").first()["embedding"]]
        cents = similarity.ivf_centroids(vectors, n_centroids=4, seed=11)
        top = similarity.ivf_topk(vectors, q, cents, k=5, nprobe=1).collect()
        ids = {r["vec_id"] for r in top}
        # the query's own inverted list holds the near-identical copies
        assert 0 in ids and len(ids & {1, 2, 3, 4}) >= 3

    def test_ivf_index_then_probe(self, spark, vectors):
        q = [float(x) for x in vectors.where("vec_id = 0").first()["embedding"]]
        cents = similarity.ivf_centroids(vectors, n_centroids=4, seed=11)
        indexed = similarity.ivf_index(vectors, cents)
        via_index = similarity.ivf_topk(indexed, q, cents, k=5, nprobe=4, indexed=True).collect()
        direct = similarity.ivf_topk(vectors, q, cents, k=5, nprobe=4).collect()
        assert via_index == direct


class TestMultimodal:
    @pytest.fixture
    def media(self, spark):
        rows = [
            (0, b"payload-one", ("image/png", 640, 480, None)),
            (1, b"payload-two", ("image/png", 800, 600, None)),
            (2, None, ("video/mp4", 1920, 1080, 4500)),
        ]
        return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    def test_fake_decode_shapes(self, spark, media):
        feats = multimodal.decode_features(media).collect()
        assert len(feats) == 3
        for r in feats:
            assert len(r["features"]) == multimodal.FEATURE_DIM
            assert all(0.0 <= x <= 1.0 for x in r["features"])

    def test_fake_decode_deterministic(self, spark, media):
        a = {r["media_id"]: r["features"] for r in multimodal.decode_features(media).collect()}
        b = {r["media_id"]: r["features"] for r in multimodal.decode_features(media).collect()}
        assert a == b

    def test_real_decoder_rejects_undecodable(self, spark, media):
        # the fixture payloads are not actually PNG/MP4 bytes: the real
        # decoder must surface that (raise by default, null with on_error)
        with pytest.raises(Exception, match="PNG|mime"):
            multimodal.decode_features(media, decoder="real").collect()
        out = {
            r["media_id"]: r["features"]
            for r in multimodal.decode_features(
                media, decoder="real", on_error="null"
            ).collect()
        }
        assert out == {0: None, 1: None, 2: None}


def test_jaccard_shingle_df_cap(spark):
    # a boilerplate shingle shared by ALL docs is dropped by the cap;
    # genuinely similar docs still pair up
    rows = [
        (0, "common header line alpha beta gamma delta"),
        (1, "common header line alpha beta gamma epsilon"),
        (2, "common header line totally different content here"),
        (3, "common header line nothing shared with others zzz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.01).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.01, max_shingle_df=3
        ).collect()
    }
    # capped similarities never exceed exact ones
    for k, v in capped.items():
        assert v <= exact[k] + 1e-9
    # the near-identical pair survives the cap
    assert (0, 1) in capped


def test_ann_recall_at_k(spark):
    """recall@20 of the approximate ANN paths vs exact cosine top-k on the
    driver embeddings table, at the GATE parameters (lsh_topk radius 2 ×
    4 tables, ivf nprobe=8). Everything is seeded and the data is fixed,
    so recall is deterministic — pinned just below the measured values so
    any regression in the index structures fails here. Radius comparison
    (radius 2 ≥ radius 1) guards the probe_set expansion itself."""
    import os

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    q = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    k = 20
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=k).collect()}

    lsh1 = {r["vec_id"] for r in similarity.lsh_topk(emb, q, k=k, n_tables=8).collect()}
    r_l1 = len(lsh1 & exact) / k
    assert r_l1 >= 0.8, f"LSH radius-1 recall@20 {r_l1:.2f} below pin"

    lsh2 = {
        r["vec_id"]
        for r in similarity.lsh_topk(emb, q, k=k, n_tables=4, multiprobe=2).collect()
    }
    r_l2 = len(lsh2 & exact) / k
    assert r_l2 >= 0.9, f"LSH gate (radius 2 × 4 tables) recall@20 {r_l2:.2f} below pin"

    cents = similarity.ivf_centroids(emb, n_centroids=16, seed=42)
    ivf4 = {r["vec_id"] for r in similarity.ivf_topk(emb, q, cents, k=k, nprobe=4).collect()}
    ivf8 = {r["vec_id"] for r in similarity.ivf_topk(emb, q, cents, k=k, nprobe=8).collect()}
    r4, r8 = len(ivf4 & exact) / k, len(ivf8 & exact) / k
    assert r4 >= 0.45, f"IVF nprobe=4 recall@20 {r4:.2f} below pin"
    assert r8 >= 0.7, f"IVF gate (nprobe=8) recall@20 {r8:.2f} below pin"
    assert r8 >= r4, "raising nprobe must not lower recall"


def test_knn_join_recall(spark):
    """Mean recall@5 of the LSH kNN self-join vs exact per-vector top-5 on
    the driver embeddings, at the GATE parameters (3 planes × 2 tables ×
    multiprobe radius 1 — measured 0.89, beating 8 radius-0 tables at a
    quarter of the shuffles; 0.08 at 6 planes × 2 tables radius 0, which
    is why the gate uses coarse buckets on this weakly-clustered corpus).
    Seeded + fixed data → deterministic; pinned below the measurement so
    an index regression fails here. Also guards that the multiprobe lever
    actually lifts recall over the same tables at radius 0."""
    import os

    import numpy as np

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    ids = np.array(t.column("vec_id").to_pylist())
    V = np.array(t.column("embedding").to_pylist(), dtype="float64")
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    np.fill_diagonal(S, -2)
    k = 5
    exact = {vid: set(ids[np.argsort(-S[i])[:k]]) for i, vid in enumerate(ids)}

    emb = spark.read.parquet(path)

    def mean_recall(**kw):
        got = {}
        rows = similarity.knn_join(emb, k=k, n_planes=3, seed=42, **kw)
        for r in rows.collect():
            got.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        return float(np.mean([len(got.get(v, set()) & exact[v]) / k for v in exact]))

    gate = mean_recall(n_tables=2, multiprobe=1)
    assert gate >= 0.8, f"kNN-join gate recall@5 {gate:.2f} below pin"
    r0 = mean_recall(n_tables=2)
    assert gate > r0, "multiprobe must lift recall over radius 0"


def test_embedding_lsh_gate_recall(spark):
    """Quantitative recall check at the GATE parameters (harness
    emb_near_dups_lsh: threshold=0.4, n_planes=3, n_tables=12 — expected
    recall ≈ 0.97, see harness calibration note) on the real driver
    embeddings table — the approximate 100 TB path must recover nearly all
    exact pairs, not just produce plausible rows."""
    import os

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs_lsh(
            emb, threshold=0.4, n_planes=3, n_tables=12
        ).collect()
    }
    assert approx <= exact
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.9, f"LSH recall {recall:.2f} below target at gate params"


def test_ivfpq_recall_and_levers(spark):
    """IVF-PQ on the driver embeddings (unit-norm 64-d, weakly clustered —
    the hard case for quantizers). Measured at sf0.001: pure-ADC recall@20
    is 0.30 at the compact gate config (m=4 × 16 codes, 16 bits/vector) and
    0.40 at m=8 × 64 codes (48 bits); the exact-cosine refine rerank of the
    ADC top-100 reaches 0.70 — capped by nprobe=8/16 coarse coverage, not
    by PQ (same 0.7 ceiling as the plain-IVF nprobe=8 pin). Pins sit just
    under the measurements so a quantizer regression fails here, and both
    levers (codebook size, refine) must not go backwards. The plan must
    stay scan-only: no shuffle, no row-UDF, no driver loop."""
    import os

    import numpy as np

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(10_000).collect()
    sample = np.array([r[1] for r in rows], dtype="float64")
    q = [float(x) for x in next(r[1] for r in rows if r[0] == 0)]
    k = 20
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=k).collect()}

    cents = similarity.kmeans_train(sample, 16, 5, 42)
    small = similarity.pq_train(sample, m=4, n_codes=16, seed=42)
    big = similarity.pq_train(sample, m=8, n_codes=64, seed=42)

    def recall(books, **kw):
        got = {
            r["vec_id"]
            for r in similarity.ivfpq_topk(emb, q, cents, books, k=k, nprobe=8, **kw).collect()
        }
        return len(got & exact) / k

    r_small = recall(small)
    r_big = recall(big)
    r_refine = recall(small, refine=100)
    assert r_small >= 0.25, f"gate-config ADC recall {r_small:.2f} below pin"
    assert r_big >= r_small, "richer codebooks must not lower ADC recall"
    assert r_refine >= 0.65, f"refine-rerank recall {r_refine:.2f} below pin"
    assert r_refine > r_small, "exact rerank must lift recall over pure ADC"

    from alphastats_spark import plans

    out = similarity.ivfpq_topk(emb, q, cents, small, k=k, nprobe=8)
    kinds = {f.kind for f in plans.audit(out)}
    assert kinds <= {"unfiltered-scan"}, kinds


class TestRealCodecs:
    """Dependency-free decode kernels: stdlib+numpy WAV/BMP/PPM/PNG."""

    @staticmethod
    def _wav_bytes(freq=440.0, sr=8000, seconds=0.5, amp=0.5):
        import io
        import wave

        import numpy as np

        t = np.arange(int(sr * seconds)) / sr
        samples = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    @staticmethod
    def _bmp_bytes(img):
        """Minimal 24-bit bottom-up BMP writer (test-local oracle encoder)."""
        import struct

        import numpy as np

        h, w = img.shape[:2]
        stride = (w * 3 + 3) & ~3
        body = b""
        for y in range(h - 1, -1, -1):  # bottom-up
            row = img[y, :, ::-1].astype(np.uint8).tobytes()  # RGB->BGR
            body += row + b"\x00" * (stride - len(row))
        header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        return header + info + body

    def test_wav_roundtrip_features(self):
        import numpy as np

        from alphastats_spark.functions import codecs

        payload = self._wav_bytes(freq=440.0, sr=8000, seconds=0.5, amp=0.5)
        samples, sr = codecs.decode_wav(payload)
        assert sr == 8000 and samples.shape == (4000, 1)
        assert abs(float(np.sqrt((samples**2).mean())) - 0.5 / 2**0.5) < 1e-3
        feats = codecs.audio_features(samples, sr)
        assert len(feats) == 16
        assert abs(feats[0] - 0.5) < 1e-9          # duration
        assert abs(feats[1] - 0.3536) < 1e-3       # rms
        # dominant energy lands in the log band containing 440 Hz
        edges = np.geomspace(20.0, 4000.0, 13)
        band = int(np.searchsorted(edges, 440.0) - 1)
        assert feats[4 + band] > 0.9

    def test_bmp_decode(self):
        import numpy as np

        from alphastats_spark.functions import codecs

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
        decoded = codecs.decode_bmp(self._bmp_bytes(img))
        assert (decoded == img).all()

    def test_ppm_roundtrip(self):
        import numpy as np

        from alphastats_spark.functions import codecs

        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (6, 4, 3), dtype=np.uint8)
        assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()
        gray = rng.randint(0, 256, (6, 4), dtype=np.uint8)
        assert (codecs.decode_ppm(codecs.encode_ppm(gray)) == gray).all()

    def test_png_roundtrip_filter0(self):
        import numpy as np

        from alphastats_spark.functions import codecs

        rng = np.random.RandomState(5)
        for shape in [(8, 5, 3), (8, 5, 4), (8, 5)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            decoded = codecs.decode_png(codecs.encode_png(img))
            assert (decoded == img).all(), shape

    def test_png_all_filters(self):
        """Decode rows filtered with Sub/Up/Average/Paeth by applying the
        forward filter manually and checking the decoder inverts it."""
        import struct
        import zlib

        import numpy as np

        from alphastats_spark.functions import codecs

        rng = np.random.RandomState(6)
        img = rng.randint(0, 256, (5, 6, 3), dtype=np.uint8)
        h, w, ch = img.shape
        rows = img.reshape(h, w * ch).astype(np.int32)
        raw = b""
        for y, ftype in enumerate([0, 1, 2, 3, 4]):
            cur = rows[y]
            prev = rows[y - 1] if y > 0 else np.zeros_like(cur)
            if ftype == 0:
                filt = cur
            elif ftype == 1:
                left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
                filt = (cur - left) % 256
            elif ftype == 2:
                filt = (cur - prev) % 256
            elif ftype == 3:
                left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
                filt = (cur - (left + prev) // 2) % 256
            else:
                filt = np.zeros_like(cur)
                for x in range(w * ch):
                    a = int(cur[x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    filt[x] = (int(cur[x]) - pred) % 256
            raw += bytes([ftype]) + filt.astype(np.uint8).tobytes()

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert (codecs.decode_png(payload) == img).all()

    def test_resize_nearest(self):
        import numpy as np

        from alphastats_spark.functions import codecs

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        up = codecs.resize_nearest(img, 8, 8)
        assert up.shape == (8, 8)
        assert (codecs.resize_nearest(up, 4, 4) == img).all()

    def test_spark_real_decode_mixed_mimes(self, spark):
        import numpy as np

        from alphastats_spark.functions import codecs, multimodal

        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
        rows = [
            (0, bytearray(self._wav_bytes()), ("audio/wav", None, None, 500)),
            (1, bytearray(codecs.encode_png(img)), ("image/png", 4, 4, None)),
            (2, bytearray(codecs.encode_ppm(img)), ("image/x-portable-pixmap", 4, 4, None)),
            (3, bytearray(b"garbage"), ("application/octet-stream", None, None, None)),
        ]
        df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        out = {
            r["media_id"]: r["features"]
            for r in multimodal.decode_features(df, decoder="real", on_error="null").collect()
        }
        assert out[3] is None  # unsupported mime -> null row, job survives
        assert len(out[0]) == 16 and abs(out[0][0] - 0.5) < 1e-6  # wav duration
        # png and ppm carry the same pixels -> identical image features
        assert out[1] == pytest.approx(out[2])
        import math

        expected_mean = float(img[:, :, 0].mean()) / 255.0
        assert math.isclose(out[1][0], expected_mean, rel_tol=1e-5)

    def test_spark_resize_images(self, spark):
        import numpy as np

        from alphastats_spark.functions import codecs, multimodal

        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_png(img)), ("image/png", 8, 8, None))],
            multimodal.MEDIA_SCHEMA,
        )
        row = multimodal.resize_images(df, 4, 4).first()
        assert row["meta"]["width"] == 4 and row["meta"]["mime"] == "image/x-portable-pixmap"
        decoded = codecs.decode_ppm(bytes(row["content"]))
        assert (decoded == codecs.resize_nearest(img, 4, 4)).all()

    def test_jpeg_roundtrip(self):
        import numpy as np

        from alphastats_spark.functions import codecs

        rng = np.random.RandomState(13)
        # constant blocks: bit-exact (only the integer DC survives)
        for v in (0, 37, 128, 255):
            img = np.full((8, 8), v, dtype=np.uint8)
            assert np.array_equal(codecs.decode_jpeg(codecs.encode_jpeg(img)), img)
        # arbitrary grayscale with the flat quant table: within 1 LSB
        img = rng.randint(0, 256, (40, 56), dtype=np.uint8)
        out = codecs.decode_jpeg(codecs.encode_jpeg(img))
        assert out.shape == img.shape
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1
        # RGB with non-multiple-of-8 dims: YCbCr rounds both ways
        img = rng.randint(0, 256, (33, 41, 3), dtype=np.uint8)
        out = codecs.decode_jpeg(codecs.encode_jpeg(img))
        assert out.shape == img.shape
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 6
        # lossy quant table still decodes to the right shape
        q = np.clip(np.arange(64).reshape(8, 8) + 8, 1, 255)
        img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
        assert codecs.decode_jpeg(codecs.encode_jpeg(img, quant=q)).shape == (24, 24)
        # non-JPEG payload rejected
        with pytest.raises(ValueError, match="SOI"):
            codecs.decode_jpeg(b"P5\n8 8\n255\n" + b" " * 64)

    def test_spark_transcode_jpeg(self, spark):
        import numpy as np

        from alphastats_spark.functions import codecs, multimodal

        img = np.full((8, 8), 77, dtype=np.uint8)
        df = spark.createDataFrame(
            [(3, bytearray(codecs.encode_ppm(img)), ("image/x-portable-graymap", 8, 8, None))],
            multimodal.MEDIA_SCHEMA,
        )
        row = multimodal.transcode_images(df, "image/jpeg").first()
        assert row["meta"]["mime"] == "image/jpeg"
        assert bytes(row["content"])[:2] == b"\xff\xd8"
        assert np.array_equal(codecs.decode_jpeg(bytes(row["content"])), img)

    def test_split_ppm_frames(self):
        import numpy as np

        from alphastats_spark.functions import codecs

        rng = np.random.RandomState(11)
        imgs = [rng.randint(0, 256, (4, 4), dtype=np.uint8) for _ in range(3)]
        payload = b"".join(codecs.encode_ppm(i) for i in imgs)
        frames = codecs.split_ppm_frames(payload)
        assert len(frames) == 3
        for fb, img in zip(frames, imgs):
            assert (codecs.decode_ppm(fb) == img).all()
        with pytest.raises(ValueError):
            codecs.split_ppm_frames(payload[:-3])  # truncated last frame

    def test_spark_sample_frames(self, spark):
        import numpy as np

        from alphastats_spark.functions import codecs, multimodal

        rng = np.random.RandomState(12)
        imgs = [rng.randint(0, 256, (4, 4), dtype=np.uint8) for _ in range(5)]
        payload = b"".join(codecs.encode_ppm(i) for i in imgs)
        df = spark.createDataFrame(
            [(7, bytearray(payload), ("animation/x-ppm", 4, 4, None))],
            multimodal.MEDIA_SCHEMA,
        )
        rows = {r["frame_idx"]: r for r in multimodal.sample_frames(df, every=2).collect()}
        # frames 0, 2, 4 sampled; payload round-trips per frame
        assert sorted(rows) == [0, 2, 4]
        for fi, r in rows.items():
            assert r["media_id"] == 7
            assert r["meta"]["mime"] == "image/x-portable-graymap"
            assert (codecs.decode_ppm(bytes(r["content"])) == imgs[fi]).all()
        # chains into decode_features with the frame index passed through
        feats = multimodal.decode_features(
            multimodal.sample_frames(df, every=2),
            decoder="real",
            passthrough_cols=("frame_idx",),
        ).collect()
        assert {r["frame_idx"] for r in feats} == {0, 2, 4}
        for r in feats:
            fi = r["frame_idx"]
            assert abs(r["features"][0] * 255 - imgs[fi].mean()) < 1e-3


class TestCorpusStats:
    def test_term_frequencies(self, spark, docs):
        tf = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in text.term_frequencies(docs).collect()
        }
        assert tf[(0, "the")] == 2  # "the quick ... the lazy"
        assert tf[(0, "fox")] == 1
        assert (5, "") not in tf  # empty doc contributes nothing

    def test_tfidf_topk_ranks_distinctive_terms(self, spark, docs):
        import math

        out = text.tf_idf_topk(docs, k=3).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # ranks are 1..k, scores non-increasing within a doc
        for doc_id, rows in by_doc.items():
            rows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
            scores = [r["tf_idf"] for r in rows]
            assert all(a >= b for a, b in zip(scores, scores[1:]))
        # doc 3's top terms are its unique words, not corpus-common ones
        # every doc-3 word is unique to it (tf=1, df=1 → equal scores), so
        # the term-asc tiebreak yields the first three alphabetically
        top3 = [r["term"] for r in sorted(by_doc[3], key=lambda r: r["rank"])]
        assert top3 == ["about", "and", "completely"]
        # smoothed idf formula: unique term in 7-doc corpus
        n_docs = 7
        expected = 1.0 * (math.log((1 + n_docs) / (1 + 1)) + 1)
        uniq = [r for r in by_doc[3] if r["term"] == "spark"]
        if uniq:
            assert uniq[0]["tf_idf"] == pytest.approx(expected, rel=1e-12)

    def test_ngram_counts(self, spark, docs):
        counts = {
            r["ngram"]: r["n_occurrences"]
            for r in text.ngram_counts(docs, n=2, min_count=2).collect()
        }
        # docs 0/1/2 share "the quick", "quick brown", ...
        assert counts["the quick"] == 3
        assert counts["lazy dog"] == 2  # docs 0 and 2 (doc 1 has "lazy cat")
        assert all(v >= 2 for v in counts.values())

    def test_redact_pii(self, spark):
        df = spark.createDataFrame(
            [
                (0, "mail me at jane.doe+x@corp.example.org today"),
                (1, "see https://ex.org/a?b=1#f and http://plain.net"),
                (2, "call +1 (555) 010-7788 or 555-010-9999 now"),
                (3, "no pii here, just 42 and v1.2"),
            ],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: r["red"]
            for r in df.select("doc_id", text.redact_pii(F.col("text")).alias("red")).collect()
        }
        assert out[0] == "mail me at <EMAIL> today"
        assert out[1] == "see <URL> and <URL>"
        assert out[2] == "call <PHONE> or <PHONE> now"
        assert out[3] == "no pii here, just 42 and v1.2"


def test_deduplicate_keeps_representatives(spark, docs):
    out = dedup.deduplicate(docs, threshold=0.5)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # docs 0 and 2 are identical: exactly one (the min id) survives;
    # everything unrelated survives untouched
    assert 0 in kept and 2 not in kept
    assert {3, 4, 5, 6} <= kept
    assert out.columns == docs.columns


def test_substring_dedup_semantics(spark):
    # doc 0 and 1 share an 8-token span (cross-doc repeat); doc 2 repeats
    # its own 8-token opening (within-doc repeat); doc 3 is short; doc 4 is
    # null text. k=4 keeps the fixture small.
    rows = [
        (0, "a b c d e f g h unique0 tail0"),
        (1, "prefix1 a b c d e f g h tail1"),
        (2, "r s t u r s t u"),
        (3, "x y"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in dedup.substring_dedup(df, k=4).collect()}
    assert len(out) == 5
    # the duplicated 4-gram chain "a b c d e f g h" covers those 8 tokens in
    # both docs; surrounding unique tokens survive
    assert out[0]["deduped_text"] == "unique0 tail0"
    assert out[0]["n_tokens"] == 10 and out[0]["n_removed"] == 8
    assert out[1]["deduped_text"] == "prefix1 tail1"
    # within-doc repeat: "r s t u" occurs twice -> the whole doc is covered
    assert out[2]["n_removed"] == 8 and out[2]["deduped_text"] == ""
    # shorter than k: no grams, nothing removed
    assert out[3]["n_removed"] == 0 and out[3]["deduped_text"] == "x y"
    # null text -> empty doc, not a crash
    assert out[4]["n_tokens"] == 0 and out[4]["deduped_text"] == ""


class TestReportFormatOracle:
    """The formatted-string report oracle (_fmt_sql) must replicate the
    report's Python formatter (reports._format_value) bit-for-bit — this is
    what makes report_basic / report_full_bench value-hashable."""

    def _duck_fmt(self, values):
        import duckdb

        from alphastats_spark.harness import _fmt_sql

        con = duckdb.connect()
        con.execute("CREATE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
        sql = f"SELECT {_fmt_sql('x')} FROM t"
        return [r[0] for r in con.execute(sql).fetchall()]

    def test_edge_cases(self):
        from alphastats_spark.reports import _format_value

        vals = [
            0.0, -0.0, 1e-12, -1e-12, 0.004999, -0.004999,
            2.675, 0.615, 0.125, -0.125, 1.005, 56.655449999999995,
            12.0, 120.0, 123.456, -123.456, 0.1, 0.25, 33.0,
            float("nan"), float("inf"), float("-inf"), None,
        ]
        got = self._duck_fmt(vals)
        want = [_format_value(v) for v in vals]
        assert got == want

    def test_random_doubles(self):
        import random

        from alphastats_spark.reports import _format_value

        rng = random.Random(42)
        vals = []
        for _ in range(2000):
            # mix magnitudes that actually occur in report cells
            mag = 10 ** rng.uniform(-6, 4)
            vals.append(rng.choice([-1, 1]) * mag * rng.random())
        got = self._duck_fmt(vals)
        want = [_format_value(v) for v in vals]
        assert got == want


class TestPipeline:
    """Training-data pipeline operators (functions/pipeline.py)."""

    def test_hash_bucket_deterministic_and_bounded(self, spark):
        from alphastats_spark.functions import pipeline

        df = spark.range(200).select(
            pipeline.hash_bucket(F.col("id")).alias("b"),
            pipeline.hash_bucket(F.col("id")).alias("b2"),
        )
        rows = df.collect()
        assert all(0 <= r["b"] < 100 for r in rows)
        assert all(r["b"] == r["b2"] for r in rows)
        # md5('42') first 8 hex = a1d0c6e8 = 2714814184; 2714814184 % 100 = 84
        one = spark.range(42, 43).select(pipeline.hash_bucket(F.col("id")).alias("b")).first()
        assert one["b"] == 84

    def test_stratified_sample_rates(self, spark):
        from alphastats_spark.functions import pipeline

        rows = [(i, "keep_all" if i % 2 == 0 else "drop_all") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id bigint, source string")
        kept = pipeline.stratified_sample(df, {"keep_all": 100, "drop_all": 0}).collect()
        assert len(kept) == 200
        assert all(r["source"] == "keep_all" for r in kept)
        # unlisted strata fall back to default_rate=0
        other = spark.createDataFrame([(1, "mystery")], "doc_id bigint, source string")
        assert pipeline.stratified_sample(other, {"keep_all": 100}).count() == 0
        # sample membership is stable under growth: membership is decided
        # per-row from the id hash, so re-sampling a GROWN corpus at the
        # same rate keeps every previously-kept row
        half = pipeline.stratified_sample(df, {"keep_all": 50, "drop_all": 50})
        half_ids = {r["doc_id"] for r in half.collect()}
        grown_rows = [
            (i, "keep_all" if i % 2 == 0 else "drop_all") for i in range(800)
        ]
        grown_df = spark.createDataFrame(grown_rows, "doc_id bigint, source string")
        grown = pipeline.stratified_sample(grown_df, {"keep_all": 50, "drop_all": 50})
        grown_ids = {r["doc_id"] for r in grown.collect()}
        assert half_ids <= grown_ids
        assert 0 < len(half_ids) < len(rows)

    def test_chunk_documents(self, spark, docs):
        from alphastats_spark.functions import pipeline

        out = pipeline.chunk_documents(docs, chunk_tokens=4)
        rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
        # doc 0 has 9 tokens -> chunks of 4,4,1
        assert rows[(0, 0)]["n_chunk_tokens"] == 4
        assert rows[(0, 0)]["chunk_text"] == "the quick brown fox"
        assert rows[(0, 1)]["chunk_text"] == "jumps over the lazy"
        assert rows[(0, 2)]["n_chunk_tokens"] == 1
        assert rows[(0, 2)]["chunk_text"] == "dog"
        # empty doc 5 yields no chunks; single-token doc 6 yields one
        assert not any(k[0] == 5 for k in rows)
        assert rows[(6, 0)]["n_chunk_tokens"] == 1
        # reassembling chunks reproduces the tokenized document
        joined = " ".join(rows[(0, i)]["chunk_text"] for i in range(3))
        assert joined == "the quick brown fox jumps over the lazy dog"

    def test_pack_documents(self, spark):
        from alphastats_spark.functions import pipeline

        # 10 docs x 30 tokens, budget 100: packs split at 100-token marks
        rows = [(i, " ".join(["w"] * 30)) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in pipeline.pack_documents(df, budget=100).collect()}
        assert out[0]["pack_id"] == 0 and out[0]["pack_offset"] == 0
        assert out[3]["pack_id"] == 0 and out[3]["pack_offset"] == 90   # straddles
        assert out[4]["pack_id"] == 1 and out[4]["pack_offset"] == 20
        assert out[9]["pack_id"] == 2 and out[9]["pack_offset"] == 70
        assert all(r["n_tokens"] == 30 for r in out.values())

    def test_decontaminate(self, spark):
        from alphastats_spark.functions import pipeline

        train = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon"),   # contains eval 3-grams
                (1, "alpha beta gamma zeta eta"),        # shares 1 of 3 grams
                (2, "one two three four five"),          # disjoint
                (3, ""),                                 # no grams
            ],
            "doc_id bigint, text string",
        )
        eval_df = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
        )
        out = {
            r["doc_id"]: r
            for r in pipeline.decontaminate(train, eval_df, n=3, threshold=0.5).collect()
        }
        assert out[0]["n_ngrams"] == 3 and out[0]["n_contaminated"] == 3
        assert out[0]["contamination_frac"] == 1.0 and out[0]["flagged"]
        assert out[1]["n_contaminated"] == 1 and not out[1]["flagged"]
        assert out[2]["n_contaminated"] == 0 and not out[2]["flagged"]
        assert out[3]["n_ngrams"] == 0 and not out[3]["flagged"]

    def test_quality_filter(self, spark):
        from alphastats_spark.functions import pipeline

        rows = [
            (0, "the cat sat on the mat and that is all of it right now here"),  # passes all
            (1, "aa bb cc"),                                     # too short, no stopwords
            (2, "x " * 30),                                      # short words, no stopwords
            (3, None),                                           # null text
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {
            r["doc_id"]: r
            for r in pipeline.quality_filter(
                df, min_tokens=5, min_mean_word_len=2.0, min_stopwords=2
            ).collect()
        }
        assert out[0]["keep"] and out[0]["failed_rules"] == ""
        assert "min_tokens" in out[1]["failed_rules"]
        assert "stopwords" in out[1]["failed_rules"]
        assert not out[1]["keep"]
        assert "word_len" in out[2]["failed_rules"]  # mean len 1 < 2.0
        assert out[3]["n_tokens"] == 0 and not out[3]["keep"]

    def test_lm_score(self, spark):
        import math

        from alphastats_spark.functions import pipeline

        # corpus: "a b" x2 docs and one "a c" doc -> c(a)=3, c(b)=2? no:
        # tokens: doc0 "a b a b", doc1 "a b", doc2 "a c", doc3 "" (no pairs)
        df = spark.createDataFrame(
            [(0, "a b a b"), (1, "a b"), (2, "a c"), (3, "x")],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in pipeline.lm_score(df, alpha=0.5).collect()}
        # corpus counts: unigrams a=4, b=3, c=1, x=1 (V=4);
        # bigrams: "a b"=3, "b a"=1, "a c"=1
        def lp(c2, c1):
            return math.log((c2 + 0.5) / (c1 + 0.5 * 4))

        exp0 = (lp(3, 4) + lp(1, 3) + lp(3, 4)) / 3  # a b, b a, a b
        assert out[0]["n_bigrams"] == 3
        assert out[0]["avg_logprob"] == pytest.approx(round(exp0, 7), abs=1e-7)
        assert out[1]["avg_logprob"] == pytest.approx(round(lp(3, 4), 7), abs=1e-7)
        assert out[2]["avg_logprob"] == pytest.approx(round(lp(1, 4), 7), abs=1e-7)
        # single-token doc: no bigrams, sentinel 0.0
        assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] == 0.0
        # the common transition scores higher than the rare one
        assert out[1]["avg_logprob"] > out[2]["avg_logprob"]

    def test_weighted_sample(self, spark):
        from alphastats_spark.functions import pipeline

        rows = [(i, 1.0) for i in range(50)] + [(100, 1e6), (101, 0.0), (102, -3.0)]
        df = spark.createDataFrame(rows, "doc_id bigint, w double")
        out = pipeline.weighted_sample(df, weight=F.col("w"), n=10).collect()
        ids = [r["doc_id"] for r in out]
        assert len(ids) == 10
        # the overwhelming-weight item wins a slot (P(miss) ~ (1-1e6/(1e6+50))^10)
        assert 100 in ids
        # non-positive weights can never be drawn
        assert 101 not in ids and 102 not in ids
        # deterministic: identical selection on rerun
        again = [r["doc_id"] for r in pipeline.weighted_sample(df, weight=F.col("w"), n=10).collect()]
        assert ids == again
        # priorities are log-uniforms scaled by weight: non-positive, and
        # the extreme weight's rounds to -0.0 at 7dp
        assert all(r["priority"] <= 0 for r in out)

    def test_hash_split(self, spark):
        from alphastats_spark.functions import pipeline

        df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
        out = pipeline.hash_split(df, {"train": 0.9, "val": 0.05, "test": 0.05})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
            F.count("*").alias("n")).collect()}
        # every row lands in exactly one split; fractions roughly honored
        assert sum(counts.values()) == 2000
        assert 1700 < counts["train"] < 1900
        assert counts["val"] > 0 and counts["test"] > 0
        # growth-stability: adding docs never moves an existing assignment
        first = {r["doc_id"]: r["split"] for r in out.collect()}
        grown = pipeline.hash_split(
            spark.createDataFrame([(i,) for i in range(3000)], "doc_id bigint"),
            {"train": 0.9, "val": 0.05, "test": 0.05},
        )
        after = {r["doc_id"]: r["split"] for r in grown.collect()}
        assert all(after[i] == s for i, s in first.items())
        # a different salt redraws the assignment
        resalted = {r["doc_id"]: r["split"]
                    for r in pipeline.hash_split(
                        df, {"train": 0.9, "val": 0.05, "test": 0.05}, salt="v2"
                    ).collect()}
        assert any(resalted[i] != s for i, s in first.items())
        with pytest.raises(ValueError, match="sum to 1"):
            pipeline.hash_split(df, {"train": 0.5, "test": 0.4})

    def test_shard_corpus(self, spark):
        from alphastats_spark.functions import pipeline

        df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id bigint")
        out = pipeline.shard_corpus(df, n_shards=8).collect()
        shards = {r["doc_id"]: r["shard"] for r in out}
        assert set(shards.values()) == set(range(8))
        # roughly balanced (md5 is uniform): no shard under half the mean
        from collections import Counter

        c = Counter(shards.values())
        assert min(c.values()) > 1000 / 8 / 2
        # deterministic and key-consistent: shard == key % n
        assert all(r["shard"] == r["shard_key"] % 8 for r in out)
        with pytest.raises(ValueError, match="n_shards"):
            pipeline.shard_corpus(df, n_shards=0)

    def test_lm_buckets(self, spark):
        from alphastats_spark.functions import pipeline

        # 6 docs of a repeated fluent phrase (high bigram prob), 3 of
        # shuffled rare transitions, corpus of 9 -> terciles split cleanly
        rows = [(i, "the cat sat on the mat " * 3) for i in range(6)] + [
            (6, "zeta omega prime quux"),
            (7, "omega quux zeta prime"),
            (8, "prime zeta quux omega"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r["bucket"] for r in pipeline.lm_buckets(df).collect()}
        assert len(out) == 9
        # the rare-transition docs land strictly in the tail
        assert {out[6], out[7], out[8]} == {"tail"}
        # all six fluent docs share one score, so the 2/3 quantile EQUALS
        # it and the strict-> boundary sends the tie to the lower bucket:
        # everything non-tail is middle, deterministically (no head)
        assert all(out[i] == "middle" for i in range(6))

        # untied corpus: a strictly-more-fluent doc group claims the head
        rows2 = [(i, "aa bb " * 20) for i in range(3)] + [
            (i, "the cat sat on the mat " * 3) for i in range(3, 6)
        ] + [(6, "zeta omega prime quux"), (7, "omega quux zeta prime")]
        df2 = spark.createDataFrame(rows2, "doc_id bigint, text string")
        out2 = {r["doc_id"]: r["bucket"] for r in pipeline.lm_buckets(df2).collect()}
        assert all(out2[i] == "head" for i in range(3))
        assert {out2[6], out2[7]} == {"tail"}

    def test_mix_sample(self, spark):
        from alphastats_spark.functions import pipeline

        rows = [(i, "web" if i < 80 else "books", "tok " * 10) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
        # books (20 docs x 10 tokens = 200 mass) gets 8/10 of a 1000-token
        # budget -> 800 > 200 -> capped at rate 1.0 (kept whole);
        # web (800 mass) gets 200 -> rate 0.25; unknown sources dropped
        out = pipeline.mix_sample(
            df, weights={"books": 8.0, "web": 2.0}, token_budget=1000
        ).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src["books"]) == 20  # capped source kept whole
        assert all(r["keep_rate"] == 1.0 for r in by_src["books"])
        assert 0 < len(by_src["web"]) < 80  # fractional source subsampled
        assert all(r["keep_rate"] == pytest.approx(0.25) for r in by_src["web"])
        # determinism + growth stability: rerun yields identical membership
        again = {r["doc_id"] for r in pipeline.mix_sample(
            df, weights={"books": 8.0, "web": 2.0}, token_budget=1000
        ).collect()}
        assert again == {r["doc_id"] for r in out}
        # zero-weight source is dropped entirely
        none_kept = pipeline.mix_sample(
            df, weights={"books": 1.0}, token_budget=100
        ).where("source = 'web'").count()
        assert none_kept == 0

    def test_dsir_weights(self, spark):
        from alphastats_spark.functions import pipeline

        # Two vocabularies: target docs speak "alpha beta", raw-only docs
        # speak "gamma delta"; a target-leaning mixed doc sits between.
        rows = (
            [(i, "en", "alpha beta alpha beta") for i in range(10)]
            + [(i, "de", "gamma delta gamma delta") for i in range(10, 20)]
            + [(20, "de", "alpha beta gamma")]
            + [(21, "en", None)]
        )
        df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
        out = {
            r["doc_id"]: r
            for r in pipeline.dsir_weights(
                df, target=F.col("lang") == "en", n_buckets=256, top_n=10
            ).collect()
        }
        assert len(out) == 22
        # target-vocabulary docs outrank raw-only docs
        assert out[0]["log_weight"] > 0 > out[10]["log_weight"]
        # the mixed doc lands strictly between the two pure vocabularies
        # (its one off-target token drags it negative, but less so than a
        # pure raw-vocabulary doc)
        assert out[10]["log_weight"] < out[20]["log_weight"] < out[0]["log_weight"]
        # empty doc: zero tokens, neutral weight — ranks 11th, outside top 10
        assert out[21]["n_tokens"] == 0 and out[21]["log_weight"] == 0.0
        assert not out[21]["selected"]
        # exactly the 10 target docs selected (equal weights, id tiebreak)
        sel = {i for i, r in out.items() if r["selected"]}
        assert sel == set(range(10))

        from alphastats_spark import plans

        scored = pipeline.dsir_weights(df, target=F.col("lang") == "en", n_buckets=256)
        kinds = {f.kind for f in plans.audit(scored)}
        assert kinds <= {"unfiltered-scan"}, kinds

    def test_containment_pairs(self, spark):
        from alphastats_spark.functions import dedup

        quote = "to be or not to be that is the question"
        filler = " ".join(f"filler{i} pad{i} word{i}" for i in range(30))
        df = spark.createDataFrame(
            [(1, quote), (2, filler + " " + quote + " " + filler)],
            "doc_id bigint, text string",
        )
        got = {
            (r["contained_id"], r["container_id"]): r["containment"]
            for r in dedup.containment_pairs(df, threshold=0.8).collect()
        }
        # the short quote is fully contained in the long wrapper...
        assert got[(1, 2)] == 1.0
        # ...but NOT vice versa, and Jaccard misses the pair entirely
        assert (2, 1) not in got
        jac = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
        assert jac == []

    def test_session_paths(self, spark):
        from alphastats_spark.functions import events as ev_ops

        m = 60_000_000  # one minute in microseconds
        rows = [
            # user 1, session 1: a>b>c ; session 2 (gap > 30 min): a>b
            (1, 0 * m, 1, "a"), (1, 1 * m, 2, "b"), (1, 2 * m, 3, "c"),
            (1, 60 * m, 4, "a"), (1, 61 * m, 5, "b"),
            # user 2, one session: a>b>c
            (2, 0 * m, 6, "a"), (2, 5 * m, 7, "b"), (2, 6 * m, 8, "c"),
            # user 3, 7 events in one session: path truncates at k=5
            *[(3, i * m, 9 + i, "x") for i in range(7)],
        ]
        df = spark.createDataFrame(
            rows, "user_id bigint, us bigint, event_id bigint, event_type string"
        )
        got = {r["path"]: r["n_sessions"] for r in ev_ops.session_paths(df, k=5).collect()}
        assert got == {"a>b>c": 2, "a>b": 1, "x>x>x>x>x": 1}

    def test_chunk_shards(self, spark):
        from alphastats_spark.functions import pipeline

        rows = [
            (1, " ".join(f"w{i}" for i in range(70))),  # 3 chunks at 32
            (2, "common vocabulary shared across the corpus here"),
            (3, None),  # no tokens -> no chunks
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = pipeline.chunk_shards(df, chunk_tokens=32)
        got = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
        assert {k[0] for k in got} == {1, 2}
        assert [got[(1, i)]["n_chunk_tokens"] for i in range(3)] == [32, 32, 6]
        assert all(0 <= r["shard"] < 64 for r in got.values())
        # deterministic: same input -> same shards
        again = {
            (r["doc_id"], r["chunk_id"]): r["shard"]
            for r in pipeline.chunk_shards(df, chunk_tokens=32).collect()
        }
        assert again == {k: r["shard"] for k, r in got.items()}

        from alphastats_spark import plans

        kinds = {f.kind for f in plans.audit(out)}
        assert kinds <= {"unfiltered-scan"}, kinds

    def test_value_anomalies(self, spark):
        from alphastats_spark.functions import events as ev_ops

        rows = (
            # tight cluster around 10 with one wild outlier
            [(i, "pay", 10.0 + (i % 3) * 0.1) for i in range(9)]
            + [(9, "pay", 1000.0)]
            # constant group: MAD 0 -> flags nothing, no division blowup
            + [(100 + i, "ping", 5.0) for i in range(5)]
        )
        df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
        got = ev_ops.value_anomalies(df, z=3.0).collect()
        assert [(r["event_id"], r["event_type"]) for r in got] == [(9, "pay")]
        assert got[0]["robust_z"] > 1000

    def test_incremental_dedup(self, spark):
        from alphastats_spark.functions import dedup

        base_text = "the quick brown fox jumps over the lazy dog again and again"
        corpus = spark.createDataFrame(
            [(1, base_text), (2, "completely different content about spark engines here")],
            "doc_id bigint, text string",
        )
        new = spark.createDataFrame(
            [
                (10, base_text + " today"),          # near-dup of corpus doc 1
                (11, "entirely novel material nobody wrote before in any corpus"),
                (12, "entirely novel material nobody wrote before in any corpus"),
            ],
            "doc_id bigint, text string",
        )
        matches = {
            (r["new_id"], r["match_id"])
            for r in dedup.incremental_near_dups(new, corpus, threshold=0.5).collect()
        }
        assert matches == {(10, 1)}

        adm = {r["doc_id"]: r for r in dedup.incremental_admit(new, corpus).collect()}
        assert not adm[10]["admitted"]
        assert adm[10]["best_match_id"] == 1 and adm[10]["best_jaccard"] >= 0.5
        # batch-internal duplicates (11 ≡ 12) are NOT this operator's job —
        # both admit; run the self-join deduplicate() on the admitted batch
        assert adm[11]["admitted"] and adm[12]["admitted"]
        assert adm[11]["best_match_id"] == -1 and adm[11]["best_jaccard"] == 0.0

        # the batch side must broadcast: the corpus band table never
        # reshuffles through a sort-merge join
        from alphastats_spark.plans.audit import explain_string

        plan = explain_string(
            dedup.incremental_near_dups(new, corpus, threshold=0.5), "simple"
        )
        assert "BroadcastHashJoin" in plan

    def test_corpus_rollup(self, spark):
        from alphastats_spark.functions import pipeline
        from alphastats_spark.plans.audit import explain_string

        rows = [
            ("web", "en", "a b c"),
            ("web", "de", "a b"),
            ("books", "en", "x"),
            ("books", "en", None),
        ]
        df = spark.createDataFrame(rows, "source string, lang string, text string")
        out = pipeline.corpus_rollup(df)
        got = {(r["source"], r["lang"], r["grouping_id"]): r for r in out.collect()}
        assert got[("web", "en", 0)]["total_tokens"] == 3
        assert got[("web", None, 1)]["n_docs"] == 2
        assert got[("books", None, 1)]["total_tokens"] == 1  # null text counts 0
        assert got[(None, None, 3)]["n_docs"] == 4
        assert got[(None, None, 3)]["avg_tokens"] == pytest.approx(6 / 4)
        # the Expand (grouping-set duplication) must sit above the fine-
        # grained aggregate, never on raw corpus rows: exactly one Expand,
        # with an aggregate between it and the scan
        plan = explain_string(out, "simple").split("Initial Plan")[0]
        assert plan.count("Expand") == 1
        scan_pos = max(plan.rfind("Scan"), plan.rfind("LocalTableScan"))
        agg_pos = plan.rfind("HashAggregate")
        assert plan.find("Expand") < agg_pos < scan_pos, plan

    def test_source_stats(self, spark):
        from alphastats_spark.functions import pipeline

        rows = [
            ("web", "en", "a b c"),       # 3 tokens
            ("web", "de", "a b c d"),     # 4 tokens -> median 3.5 interpolated
            ("books", "en", "x"),
        ]
        df = spark.createDataFrame(rows, "source string, lang string, text string")
        out = {r["source"]: r for r in pipeline.source_stats(df).collect()}
        assert out["web"]["n_docs"] == 2
        assert out["web"]["total_tokens"] == 7
        assert out["web"]["avg_tokens"] == 3.5
        assert out["web"]["median_tokens"] == 3.5
        assert out["web"]["n_langs"] == 2
        assert out["books"]["median_tokens"] == 1.0

    def test_knn_join(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        # two tight clusters far apart: neighbours must stay within-cluster
        a = rng.normal(0, 0.05, (6, 16)) + np.array([5.0] * 8 + [0.0] * 8)
        b = rng.normal(0, 0.05, (6, 16)) + np.array([0.0] * 8 + [-5.0] * 8)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([a, b]))]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        out = similarity.knn_join(df, k=3, n_planes=2, n_tables=2)
        got = out.collect()
        assert got, "knn_join returned no rows"
        for r in got:
            same_cluster = (r["vec_id"] < 6) == (r["neighbor_id"] < 6)
            assert same_cluster, r
            assert r["vec_id"] != r["neighbor_id"]
            assert 1 <= r["rank"] <= 3
        # ranks are dense per query and ordered by descending cosine
        per_q = {}
        for r in got:
            per_q.setdefault(r["vec_id"], []).append((r["rank"], r["cosine"]))
        for q, rs in per_q.items():
            rs.sort()
            assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
            cosines = [x[1] for x in rs]
            assert cosines == sorted(cosines, reverse=True)

    def test_pack_documents_null_text(self, spark):
        from alphastats_spark.functions import pipeline

        # a NULL document must contribute 0 tokens, not null-out the
        # prefix sum / pack assignment of itself and later documents
        rows = [(0, " ".join(["w"] * 60)), (1, None), (2, " ".join(["w"] * 60))]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in pipeline.pack_documents(df, budget=100).collect()}
        assert out[1]["n_tokens"] == 0
        assert out[1]["pack_id"] == 0 and out[1]["pack_offset"] == 60
        assert out[2]["pack_id"] == 0 and out[2]["pack_offset"] == 60
        # budget 7 (non-power-of-two) exercises the integer-div path
        out7 = {r["doc_id"]: r for r in pipeline.pack_documents(df, budget=7).collect()}
        assert out7[2]["pack_id"] == 60 // 7 and out7[2]["pack_offset"] == 60 % 7

    def test_pack_documents_invariants(self, spark):
        from alphastats_spark.functions import pipeline

        import numpy as np

        rng = np.random.RandomState(3)
        rows = [
            (int(i), " ".join(["w"] * int(n)) if n else None)
            for i, n in enumerate(rng.randint(0, 40, size=60))
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        for budget in (7, 64, 100):
            out = sorted(
                pipeline.pack_documents(df, budget=budget).collect(),
                key=lambda r: r["doc_id"],
            )
            cum = 0
            prev_pack = 0
            for r in out:
                # offset in range; pack_id reconstructs the exclusive prefix
                assert 0 <= r["pack_offset"] < budget
                assert r["pack_id"] * budget + r["pack_offset"] == cum
                assert r["pack_id"] >= prev_pack
                prev_pack = r["pack_id"]
                cum += r["n_tokens"]

    def test_pack_documents_crosses_prefix_buckets(self, spark):
        from alphastats_spark.functions import pipeline

        # bucket_width=4 forces many prefix buckets; the two-phase cumsum
        # must still produce the single-sequence packing
        rows = [(i, " ".join(["w"] * 10)) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = pipeline.pack_documents(df, budget=100, bucket_width=4).collect()
        for r in out:
            assert r["pack_id"] == (r["doc_id"] * 10) // 100, r

    def test_repetition_stats(self, spark):
        from alphastats_spark.functions import pipeline

        rows = [
            (0, "spam spam spam spam"),                # one token repeated
            (1, "a b c d e"),                          # all distinct
            (2, "x y x y x y"),                        # repeated bigrams
            (3, ""),                                   # empty -> zeros
            (4, "solo"),                               # no bigrams
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in pipeline.repetition_stats(df).collect()}
        assert out[0]["top_token_frac"] == 1.0
        assert out[0]["dup_bigram_frac"] == 1.0        # "spam spam" x3
        assert out[1]["top_token_frac"] == 0.2
        assert out[1]["dup_bigram_frac"] == 0.0
        assert out[1]["top_bigram_frac"] == 0.25
        # "x y" x3, "y x" x2 of 5 bigrams
        assert out[2]["dup_bigram_frac"] == 1.0
        assert out[2]["top_bigram_frac"] == 0.6
        assert out[3]["top_token_frac"] == 0.0
        assert out[4]["top_token_frac"] == 1.0 and out[4]["top_bigram_frac"] == 0.0


def test_semdedup_drop_list(spark):
    from alphastats_spark.functions import dedup

    # two tight groups + one outlier; centroids chosen so each group maps
    # to its own cluster. min-id member of each epsilon-group survives.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),    # near-dup of 0 -> dropped
        (2, [0.998, 0.02, 0.0]),    # near-dup of 0/1 -> dropped
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.999, 0.01]),   # near-dup of 10 -> dropped
        (20, [0.0, 0.0, 1.0]),      # outlier, survives
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    out = {r["vec_id"]: r["max_cosine"] for r in
           dedup.semdedup_drop_list(df, cents, threshold=0.99).collect()}
    assert set(out) == {1, 2, 11}
    assert all(c >= 0.99 for c in out.values())


def test_pipeline_plans_scale(spark, docs):
    """Scale guardrails for the pipeline operators: no raw-row
    single-partition exchange (the packing prefix sum's only global window
    runs over the tiny per-bucket totals table), no Python row UDF, no
    nested-loop join anywhere."""
    from alphastats_spark.functions import pipeline
    from alphastats_spark.plans.audit import audit as plan_audit

    plans = {
        "sample": pipeline.stratified_sample(docs.withColumn("source", F.lit("s")), {"s": 50}),
        "chunks": pipeline.chunk_documents(docs, chunk_tokens=4),
        "repetition": pipeline.repetition_stats(docs),
    }
    for name, df in plans.items():
        bad = [f for f in plan_audit(df)
               if f.kind in ("single-partition-exchange", "python-row-udf", "nested-loop-join")]
        assert not bad, (name, bad)
    # packing: the bucket-offset branch is an intentional single-partition
    # window over one-row-per-bucket totals; nothing else may funnel
    packed = pipeline.pack_documents(docs, budget=8, bucket_width=4)
    bad = [f for f in plan_audit(packed) if f.kind in ("python-row-udf", "nested-loop-join")]
    assert not bad, bad


class TestEventAnalytics:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, us bigint, event_type string"
        )

    def test_funnel_semantics(self, spark):
        from alphastats_spark.functions import events as ev_ops

        M = 1_000_000  # one second in microseconds
        rows = [
            # user 1: full conversion within gaps
            (1, 0 * M, "a"), (1, 10 * M, "b"), (1, 20 * M, "c"),
            # user 2: step-2 event BEFORE step 1 -> never chains
            (2, 0 * M, "b"), (2, 10 * M, "a"), (2, 20 * M, "c"),
            # user 3: simultaneous a and b -> strict > rejects the chain
            (3, 5 * M, "a"), (3, 5 * M, "b"),
            # user 4: b beyond the 30s gap cap
            (4, 0 * M, "a"), (4, 40 * M, "b"),
            # user 5: first qualifying b is the MIN, later c chains off it
            (5, 0 * M, "a"), (5, 1 * M, "b"), (5, 25 * M, "b"), (5, 9 * M, "c"),
        ]
        out = ev_ops.funnel(
            self._ev(spark, rows), steps=["a", "b", "c"], max_gap_s=30
        ).collect()
        by_step = {r["step"]: r["n_users"] for r in out}
        assert [r["event_type"] for r in sorted(out, key=lambda r: r["step"])] == ["a", "b", "c"]
        # reached a: users 1,2,3,4,5 ... user 2 reaches 'a' at t=10
        assert by_step[1] == 5
        # reached b after a within 30s: users 1, 5 (user 2's b precedes a;
        # user 3 simultaneous; user 4 beyond cap)
        assert by_step[2] == 2
        # reached c: user 1 (20s after b) and 5 (c at 9s > b at 1s)
        assert by_step[3] == 2

    def test_funnel_user2_c_does_not_skip_levels(self, spark):
        from alphastats_spark.functions import events as ev_ops

        # c present but b never reached -> funnel stops at level 1
        rows = [(7, 0, "a"), (7, 1_000_000, "c")]
        out = {r["step"]: r["n_users"]
               for r in ev_ops.funnel(self._ev(spark, rows), ["a", "b", "c"]).collect()}
        assert out == {1: 1, 2: 0, 3: 0}

    def test_cohort_retention(self, spark):
        from alphastats_spark.functions import events as ev_ops

        B = 100  # tiny bucket for the test
        rows = [
            (1, 5, "x"), (1, 150, "x"), (1, 160, "x"), (1, 350, "x"),
            (2, 120, "x"), (2, 250, "x"),
            (3, 20, "x"),
        ]
        out = {(r["cohort_bucket"], r["bucket_offset"]): r["n_users"]
               for r in ev_ops.cohort_retention(self._ev(spark, rows), bucket_us=B).collect()}
        # user 1 cohort 0 active buckets {0,1,3}; user 3 cohort 0 bucket {0};
        # user 2 cohort 1 active {1,2}
        assert out == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


class TestMarkupAndCuration:
    def test_strip_markup(self, spark):
        rows = [
            (0, '<div class="c"><b>hello</b> <script>var x = 1 < 2;</script>world</div>'),
            (1, "&lt;p&gt; is literal &amp;amp; stays escaped-once"),
            (2, "a<br>b<!-- gone -->c"),
            (3, "plain text unchanged"),
            (4, "<style>p { color: red }</style>body"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r["t"]
               for r in df.select("doc_id", text.strip_markup(F.col("text")).alias("t")).collect()}
        assert out[0] == "hello world"
        # entities unescape AFTER tag removal: escaped markup is content
        assert out[1] == "<p> is literal &amp; stays escaped-once"
        assert out[2] == "a b c"
        assert out[3] == "plain text unchanged"
        assert out[4] == "body"

    def test_topk_by_quality(self, spark):
        from alphastats_spark.functions import pipeline

        rows = []
        for s in ("a", "b"):
            for i in range(5):
                # longer docs score higher on the length component
                rows.append((len(rows), "word " * (10 * (i + 1)), s))
        df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
        out = pipeline.topk_by_quality(df, k=2).collect()
        assert len(out) == 4
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        for s, docs in by_src.items():
            ranks = sorted(r["rank"] for r in docs)
            assert ranks == [1, 2]
            qs = [r["quality"] for r in sorted(docs, key=lambda r: r["rank"])]
            assert qs[0] >= qs[1]

    def test_topk_tiebreak_deterministic(self, spark):
        from alphastats_spark.functions import pipeline

        # identical texts -> equal scores -> doc_id breaks ties
        rows = [(i, "same text here", "s") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
        out = sorted(pipeline.topk_by_quality(df, k=3).collect(), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in out] == [0, 1, 2]


def test_length_quantiles(spark):
    from alphastats_spark.functions import pipeline

    rows = [(i, "w " * (i + 1), "s") for i in range(9)]  # 1..9 tokens
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = pipeline.length_quantiles(df).collect()[0]
    assert out["n_docs"] == 9 and out["max_tokens"] == 9
    assert out["p50_tokens"] == 5.0   # exact interpolated median of 1..9
    assert out["p25_tokens"] == 3.0
    assert out["mean_tokens"] == 5.0


def test_funnel_per_user_times(spark):
    from alphastats_spark.functions import events as ev_ops

    M = 1_000_000
    rows = [
        (1, 0 * M, "a"), (1, 10 * M, "b"), (1, 25 * M, "c"),
        (2, 5 * M, "a"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, us bigint, event_type string")
    out = {r["user_id"]: r for r in
           ev_ops.funnel(df, ["a", "b", "c"], max_gap_s=60, per_user=True).collect()}
    assert out[1]["lvl"] == 3
    assert out[1]["t_first"] == 0 and out[1]["t_last"] == 25 * M
    assert out[2]["lvl"] == 1 and out[2]["t_first"] == 5 * M


def test_inter_event_gaps(spark):
    from alphastats_spark.functions import events as ev_ops

    # user 1: events at 0, 10, 30 us -> gaps 10 (to 'b'), 20 (to 'c');
    # user 2: single event -> no gap; tie at us=10 broken by event_id
    ev = spark.createDataFrame(
        [
            (1, 0, 1, "a"),
            (1, 10, 2, "b"),
            (1, 30, 3, "c"),
            (2, 5, 4, "a"),
        ],
        "user_id bigint, us bigint, event_id bigint, event_type string",
    )
    out = {r["event_type"]: r for r in ev_ops.inter_event_gaps(ev).collect()}
    assert "a" not in out  # first events carry no gap
    assert out["b"]["n_gaps"] == 1 and out["b"]["median_gap_us"] == 10.0
    assert out["c"]["p95_gap_us"] == 20.0
    # plan: user-partitioned lag, no funnel, no row UDF
    from alphastats_spark import plans

    kinds = {f.kind for f in plans.audit(ev_ops.inter_event_gaps(ev))}
    assert kinds <= {"unfiltered-scan"}, kinds


def test_attribute_conversions(spark):
    """Last-/first-touch attribution semantics: latest (or earliest)
    in-window touch wins, simultaneous touches count for the conversion,
    out-of-window and touchless conversions carry -1/'none' sentinels,
    touches AFTER a conversion never attribute. Plan: one user-partitioned
    window pass, no self-join, no funnel, no row UDF."""
    from alphastats_spark import plans
    from alphastats_spark.functions import events as ev_ops

    ev = spark.createDataFrame(
        [
            (1, 5, "view", 100), (1, 10, "click", 101), (1, 20, "purchase", 102),
            (2, 50, "purchase", 200),                      # no touch at all
            (3, 30, "click", 300), (3, 30, "purchase", 301),  # simultaneous
            (4, 70, "purchase", 400), (4, 80, "click", 401),  # touch after
            (5, 10, "click", 500), (5, 200, "purchase", 501),  # out of window
        ],
        "user_id bigint, us bigint, event_type string, event_id bigint",
    )
    lt = {
        r["event_id"]: (r["touch_event_id"], r["touch_type"], r["gap_us"], r["attributed"])
        for r in ev_ops.attribute_conversions(ev, window_us=50, model="last_touch").collect()
    }
    assert lt == {
        102: (101, "click", 10, True),   # latest touch wins over view@5
        200: (-1, "none", -1, False),
        301: (300, "click", 0, True),    # simultaneous touch counts
        400: (-1, "none", -1, False),    # later touch never attributes
        501: (-1, "none", -1, False),    # gap 190 > window 50
    }
    # first-touch, window 12: user 1's conv@20 window [8, 20] excludes
    # view@5, so the earliest IN-WINDOW touch is click@10
    ft = {
        r["event_id"]: (r["touch_event_id"], r["attributed"])
        for r in ev_ops.attribute_conversions(ev, window_us=12, model="first_touch").collect()
    }
    assert ft[102] == (101, True) and ft[501] == (-1, False)
    # first-touch, window 50: view@5 is now in user 1's window and wins
    ft50 = {
        r["event_id"]: r["touch_event_id"]
        for r in ev_ops.attribute_conversions(ev, window_us=50, model="first_touch").collect()
    }
    assert ft50[102] == 100
    # linear: window 50 — conv 102's window [−30, 20] holds view@5 and
    # click@10, each credited 1/2; touchless/out-of-window conversions
    # emit exactly ONE sentinel row with credit 0
    lin = {}
    for r in ev_ops.attribute_conversions(ev, window_us=50, model="linear").collect():
        lin.setdefault(r["event_id"], []).append(
            (r["touch_event_id"], r["touch_type"], r["gap_us"], r["credit"], r["attributed"])
        )
    assert sorted(lin[102]) == [
        (100, "view", 15, 0.5, True),
        (101, "click", 10, 0.5, True),
    ]
    assert lin[301] == [(300, "click", 0, 1.0, True)]
    for sentinel in (200, 400, 501):
        assert lin[sentinel] == [(-1, "none", -1, 0.0, False)]
    # SUM(credit) over everything = number of attributed conversions
    assert sum(c for rows in lin.values() for (_, _, _, c, _) in rows) == 2.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="position or time_decay"):
        ev_ops.attribute_conversions(ev, model="w_shaped")
    # time_decay: conv 102's touches at gaps 15 (view) and 10 (click),
    # half-life 5 -> weights 2^-3 and 2^-2: credits 1/3 and 2/3
    td = {}
    for r in ev_ops.attribute_conversions(
        ev, window_us=50, model="time_decay", half_life_us=5
    ).collect():
        td.setdefault(r["event_id"], []).append((r["touch_event_id"], r["credit"]))
    assert sorted(td[102]) == [
        (100, pytest.approx(1 / 3)),
        (101, pytest.approx(2 / 3)),
    ]
    assert td[301] == [(300, 1.0)] and td[200] == [(-1, 0.0)]
    with _pytest.raises(ValueError, match="half_life_us"):
        ev_ops.attribute_conversions(ev, model="time_decay", half_life_us=0)
    # position (U-shaped): user 6 has 3 in-window touches for conv 603 —
    # 0.4 first, 0.2 middle, 0.4 last; 2-touch journeys split 50/50
    ev6 = ev.union(
        spark.createDataFrame(
            [(6, 10, "view", 600), (6, 20, "click", 601), (6, 30, "view", 602),
             (6, 40, "purchase", 603)],
            "user_id bigint, us bigint, event_type string, event_id bigint",
        )
    )
    pos = {}
    for r in ev_ops.attribute_conversions(ev6, window_us=50, model="position").collect():
        pos.setdefault(r["event_id"], []).append((r["touch_event_id"], r["credit"]))
    assert sorted(pos[603]) == [(600, 0.4), (601, pytest.approx(0.2)), (602, 0.4)]
    assert sorted(pos[102]) == [(100, 0.5), (101, 0.5)]
    assert pos[301] == [(300, 1.0)]
    assert pos[200] == [(-1, 0.0)]
    for model in ("last_touch", "first_touch", "linear", "position"):
        kinds = {
            f.kind
            for f in plans.audit(ev_ops.attribute_conversions(ev, model=model))
        }
        assert kinds <= {"unfiltered-scan"}, (model, kinds)


def test_group_centroids(spark):
    from alphastats_spark.functions import similarity

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<double>",
    )
    out = {(r["label"], r["pos"]): r for r in similarity.group_centroids(df).collect()}
    assert out[(0, 0)]["c"] == pytest.approx(2.0)
    assert out[(0, 1)]["c"] == pytest.approx(3.0)
    assert out[(1, 0)]["c"] == pytest.approx(10.0)
    assert out[(0, 0)]["n_vecs"] == 2 and out[(1, 1)]["n_vecs"] == 1
    # one shuffle, no row UDF, no funnel
    from alphastats_spark import plans

    kinds = {f.kind for f in plans.audit(similarity.group_centroids(df))}
    assert kinds <= {"unfiltered-scan"}, kinds


def test_hash_embed_chains_into_ann(spark):
    """hash_embed output must be directly consumable by the embedding
    operators: near-identical texts land close in cosine, unrelated texts
    far; empty docs get the zero vector."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completamente distinto texto sobre motores y datos grandes"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    emb = text.hash_embed(df, dim=32)
    got = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    assert len(got[0]) == 32

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num  # vectors are L2-normalized already

    assert abs(sum(x * x for x in got[0]) - 1.0) < 1e-9
    assert cos(got[0], got[1]) > 0.9
    assert cos(got[0], got[2]) < 0.3
    assert all(x == 0.0 for x in got[3])

    # end-to-end: corpus -> hashed vectors -> kNN self-join
    from alphastats_spark.functions import similarity

    knn = similarity.knn_join(
        emb.select(F.col("doc_id").alias("vec_id"), "embedding"),
        k=1, n_planes=2, n_tables=4, dim=32,
    )
    top = {r["vec_id"]: r["neighbor_id"] for r in knn.collect() if r["vec_id"] in (0, 1)}
    # docs 0 and 1 are each other's nearest neighbor when retrieved
    for q, v in top.items():
        assert {q, v} == {0, 1}


def test_hourly_uniques_sketch_close_to_exact(spark):
    """The HLL approx_count_distinct variant (mergeable constant-size
    state — the beyond-billions path the exact gate query can't take)
    stays within 5% of exact per-hour distincts on the driver events."""
    import os

    path = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    ev = spark.read.parquet(path)
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h")
    exact = {
        r["h"]: r["n"]
        for r in ev.groupBy(hour).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["h"]: r["n"]
        for r in ev.groupBy(hour)
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for h, n in exact.items():
        assert abs(approx[h] - n) <= max(1, 0.05 * n), (h, n, approx[h])


# ---------------------------------------------------------------------------
# round 7: containment cap default, knn_join auto planes, pass-cache scope


def test_containment_cap_noop_below_df(spark):
    """The default max_shingle_df cap must be a strict no-op when every
    shingle's document frequency is below the cap — capped (default) and
    uncapped (None) runs return identical pairs."""
    from alphastats_spark.functions import dedup

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 19}" for j in range(10))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    capped = sorted(
        map(tuple, dedup.containment_pairs(df, threshold=0.3).collect())
    )
    exact = sorted(
        map(
            tuple,
            dedup.containment_pairs(df, threshold=0.3, max_shingle_df=None).collect(),
        )
    )
    assert capped == exact and len(capped) > 0


def test_containment_cap_drops_hot_shingle_pairs(spark):
    """Above the cap, hot-shingle contributions disappear from the common
    count: with a boilerplate shingle shared by ALL docs and a cap of 1,
    pairs supported only by that shingle vanish."""
    from alphastats_spark.functions import dedup

    # every doc = same 3-token boilerplate + one unique token
    rows = [(i, f"the common header u{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    uncapped = dedup.containment_pairs(df, threshold=0.1, max_shingle_df=None).count()
    capped = dedup.containment_pairs(df, threshold=0.1, max_shingle_df=1).count()
    assert uncapped > 0 and capped == 0


def test_lsh_band_bucket_cap(spark):
    """The LSH band self-join drops (band, sig) buckets over
    MAX_BAND_BUCKET: a mega-bucket of D docs contributes D² candidate
    pairs and D grows with the corpus on boilerplate-heavy data (the
    round-8 500k-doc deep probe spilled >79 GB without this guard). A
    small explicit cap kills the candidates of an engineered mega-bucket;
    None restores the exact uncapped join."""
    from alphastats_spark.functions import dedup

    # 12 identical docs -> identical signatures -> one size-12 bucket in
    # EVERY band; plus 2 unrelated docs
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(12)]
    rows += [(100, "one two three four five six"), (101, "seven eight nine ten up down")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = dedup.minhash_signatures(docs)
    capped = dedup._candidates_from_sigs(sigs, "doc_id", 8, 2, max_band_bucket=5)
    assert capped.count() == 0, "size-12 buckets must drop under cap=5"
    uncapped = dedup._candidates_from_sigs(sigs, "doc_id", 8, 2, max_band_bucket=None)
    assert uncapped.where("id_a < 12 and id_b < 12").count() == 66  # C(12,2)
    # the shipped default is far above honest cluster sizes: identical
    default = dedup._candidates_from_sigs(sigs, "doc_id", 8, 2)
    assert sorted(map(tuple, default.collect())) == sorted(map(tuple, uncapped.collect()))


def test_admit_band_bucket_cap(spark):
    """The admit path's corpus-side twin of the mega-bucket guard: a
    boilerplate corpus bucket of D docs hands every probing batch doc D
    candidates (D grows with the corpus — the admit-time quadratic). A
    small explicit cap suppresses the mega-bucket's matches; None
    restores them."""
    from alphastats_spark.functions import dedup

    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(12)],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id bigint, text string"
    )

    def run(cap):
        sh_n = dedup._exploded_shingles(batch, "doc_id", "text", 3, out_id="new_id")
        sh_o = dedup._exploded_shingles(corpus, "doc_id", "text", 3, out_id="match_id")
        bn = dedup._band_table(
            sh_n.groupBy("new_id").agg(*dedup.minhash_signature_cols(8)), "new_id", 8, 2
        )
        bo = dedup._band_table(
            sh_o.groupBy("match_id").agg(*dedup.minhash_signature_cols(8)), "match_id", 8, 2
        )
        return dedup._verified_matches(bn, bo, sh_n, sh_o, 0.5, max_band_bucket=cap).count()

    assert run(5) == 0, "size-12 corpus buckets must drop under cap=5"
    assert run(None) == 12
    assert run(dedup.MAX_BAND_BUCKET) == 12  # shipped default far above honest clusters


def test_banding_parameterization(spark):
    """(k, rows_per_band) threads end-to-end: a non-default family's
    verified pairs are a SUBSET of the exact Jaccard pairs with identical
    scores (verification is exact regardless of banding), deduplicate()
    forwards the family, and _band_table fails loudly on a k that doesn't
    divide into whole bands (silently dropping trailing hashes would make
    writer and admitter disagree on which hashes are live)."""
    import pytest

    from alphastats_spark.functions import dedup

    rows = [(i, f"alpha beta gamma delta epsilon zeta u{i % 4}") for i in range(8)]
    rows += [(100 + i, f"totally unrelated text number {i} for padding") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    for k, r in ((12, 3), (16, 4)):
        got = {
            (row["id_a"], row["id_b"]): row["jaccard"]
            for row in dedup.lsh_verified_pairs(
                docs, k=k, rows_per_band=r, threshold=0.5
            ).collect()
        }
        assert got, f"({k},{r}) found no pairs on near-identical docs"
        for pair, j in got.items():
            assert exact[pair] == j, f"({k},{r}) jaccard mismatch on {pair}"

    lin = dedup.deduplicate(docs, lineage=True, k=12, rows_per_band=3)
    reasons = {r["reason"] for r in lin.collect()}
    assert "near_dup_dropped" in reasons and "representative" in reasons

    with pytest.raises(ValueError, match="multiple of rows_per_band"):
        dedup._band_table(
            dedup.minhash_signatures(docs, k=8), "doc_id", 8, 3
        )


def test_recommend_banding(spark):
    """The advisor returns the measured round-12 default at t=0.5, picks
    a steeper family as the threshold tightens (r monotone in t), and
    every returned family satisfies its own eligibility rule. A
    threshold with NO qualifying family (tiny budget) is OMITTED, per
    the documented contract — not padded with an under-powered row."""
    from alphastats_spark.functions import dedup

    rows = {
        r["threshold"]: r
        for r in dedup.recommend_banding(spark, [0.3, 0.5, 0.7, 0.9]).collect()
    }
    assert (rows[0.5]["k"], rows[0.5]["rows_per_band"], rows[0.5]["n_bands"]) == (24, 3, 8)
    rs = [rows[t]["rows_per_band"] for t in (0.3, 0.5, 0.7, 0.9)]
    assert rs == sorted(rs) and rs[0] < rs[-1], rs
    for t, r in rows.items():
        s_mid = (1 + t) / 2
        p = 1 - (1 - s_mid ** r["rows_per_band"]) ** r["n_bands"]
        assert round(p, 7) >= 0.95 and r["k"] == r["rows_per_band"] * r["n_bands"]
        assert abs(round(p, 7) - r["hit_prob"]) < 1e-9
    # budget 4, t=0.01: even r=1 gives 1-(1-0.505)^4 ≈ 0.94 < 0.95 — the
    # threshold disappears rather than returning a family that misses the
    # advisor's own recall floor; a satisfiable sibling still comes back
    small = dedup.recommend_banding(spark, [0.01, 0.9], k_budget=4).collect()
    assert [r["threshold"] for r in small] == [0.9]


def test_affine_table_frozen_values():
    """The affine coefficient table is a FROZEN source literal — stored
    affine31 indexes bake these exact values into their on-disk band
    signatures, so any drift (an edit, a re-derivation through a
    different RNG) silently zeroes every band collision. Pin the table's
    invariants and spot-pin the first/last pairs byte-for-byte; the full
    table's digest is what write_dedup_index stamps into index meta."""
    from alphastats_spark.functions import dedup

    t = dedup._AFFINE_TABLE
    assert len(t) == 64 and len(set(t)) == 64
    assert all(
        1 <= a < dedup.MINHASH_PRIME and 0 <= b < dedup.MINHASH_PRIME
        for a, b in t
    )
    # byte-for-byte spot pins (original CPython 3.11 derivation,
    # random.Random(0x5EED_1DEA).randrange — now authoritative as source)
    assert t[0] == (727858806, 232035372)
    assert t[23] == (2030727395, 115791238)
    assert t[63] == (104539677, 1539026434)
    # the checksum readers validate: k-prefix digest, stable across runs
    assert dedup._affine_checksum(24) == dedup._affine_checksum(24)
    assert dedup._affine_checksum(8) != dedup._affine_checksum(24)
    with pytest.raises(ValueError, match="frozen at 64"):
        dedup._affine_coeffs(65)


def test_minhash_affine_family(spark):
    """The r13 affine family: coefficients are deterministic with the
    k-prefix property (k=12's coeffs are k=24's first 12, so banding
    subsets stay consistent), signature values are BIGINTs below the
    prime, the structural one-md5 helper matches the inline expression
    path, and the legacy md5 family still produces the pre-r13 hex
    strings."""
    from alphastats_spark.functions import dedup

    c24, c12 = dedup._affine_coeffs(24), dedup._affine_coeffs(12)
    assert c12 == c24[:12] and len(set(c24)) == 24
    assert all(1 <= a < dedup.MINHASH_PRIME and 0 <= b < dedup.MINHASH_PRIME
               for a, b in c24)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine")],
        "doc_id bigint, text string",
    )
    sigs = dedup.minhash_signatures(docs, k=6)
    assert all(f.dataType.typeName() == "long" for f in sigs.schema.fields[1:])
    rows = {r["doc_id"]: tuple(r)[1:] for r in sigs.collect()}
    assert all(0 <= v < dedup.MINHASH_PRIME for v in rows[1] + rows[2])

    # inline (non-prehashed) expression path agrees with the structural one
    sh = dedup._exploded_shingles(docs, "doc_id", "text")
    inline = {
        r["doc_id"]: tuple(r)[1:]
        for r in sh.groupBy("doc_id").agg(*dedup.minhash_signature_cols(6)).collect()
    }
    assert inline == rows

    # legacy family: md5 hex strings, unchanged by the flip
    legacy = dedup._sigs_over_shingles(sh, "doc_id", 4, family="md5")
    assert all(f.dataType.typeName() == "string" for f in legacy.schema.fields[1:])
    lrow = legacy.where("doc_id = 1").collect()[0]
    assert all(len(v) == 32 and int(v, 16) >= 0 for v in tuple(lrow)[1:])

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown MinHash signature family"):
        dedup.minhash_signature_cols(4, family="sha9000")


def test_streaming_dedup_defaults_follow_module(spark, monkeypatch):
    """streaming_dedup_candidates' k/rows_per_band default to the batch
    module constants, so a default stream and the default batch pass
    agree on which pairs can band-collide even after the defaults move."""
    from alphastats_spark.functions import dedup
    from alphastats_spark.streaming import metrics as sm

    seen = {}
    real = sm._stream_banded

    def spy(df, id_col, text_col, k, rows_per_band, n=3):
        seen["k"], seen["r"] = k, rows_per_band
        return real(df, id_col, text_col, k, rows_per_band, n)

    monkeypatch.setattr(sm, "_stream_banded", spy)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id bigint, text string"
    )
    sm.streaming_dedup_candidates(df)
    assert (seen["k"], seen["r"]) == (dedup.MINHASH_K, dedup.ROWS_PER_BAND)


def test_tfidf_similarity_pairs(spark):
    """Identical documents score rounded cosine 1.0; disjoint-vocabulary
    documents produce NO pair (df=1 postings never join); a shared
    ubiquitous term that exceeds max_term_df leaves the join but stays
    in the norms, so the pair's cosine DROPS rather than the denominator
    shrinking to compensate."""
    from alphastats_spark.functions import text

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
            (4, "completely different words here entirely"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in text.tfidf_similarity_pairs(docs, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert all(k == (1, 2) for k in pairs), pairs

    # shared term in EVERY doc: df=4; with cap 3 it leaves the join, so
    # docs sharing only it never pair, while 1-2 (still sharing their
    # distinctive terms) drop below 1.0 because the norms keep the
    # capped term's weight
    shared = spark.createDataFrame(
        [
            (1, "common alpha beta"),
            (2, "common alpha beta"),
            (3, "common zeta eta"),
            (4, "common mu nu"),
        ],
        "doc_id bigint, text string",
    )
    capped = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in text.tfidf_similarity_pairs(
            shared, threshold=0.01, max_term_df=3
        ).collect()
    }
    assert set(capped) == {(1, 2)} and 0 < capped[(1, 2)] < 1.0
    uncapped = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in text.tfidf_similarity_pairs(
            shared, threshold=0.01, max_term_df=None
        ).collect()
    }
    assert uncapped[(1, 2)] == 1.0 and len(uncapped) == 6


def test_bm25_topk(spark):
    """BM25 against a hand-computed expectation (Robertson-Zaragoza form,
    positive Lucene idf), plus contract edges: repeated query terms
    collapse to distinct, normalization reaches the query (casing and
    punctuation), non-matching docs never appear, ties break id-asc, and
    an all-stopword-ish empty query raises."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "spark window merge spark"),   # dl 4, tf(spark)=2
            (2, "spark table scan row"),        # dl 4, tf(spark)=1
            (3, "table scan row filter"),       # dl 4, no match
            (4, "window"),                      # dl 1, tf(window)=1
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in text.bm25_topk(docs, "Spark, window!", k=10).collect()}
    assert set(out) == {1, 2, 4}

    def idf(df_t, n=4):
        return math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))

    k1, b, avgdl = 1.2, 0.75, 13 / 4
    def contrib(tf, dl, df_t):
        return idf(df_t) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = contrib(2, 4, 2) + contrib(1, 4, 2)           # spark + window
    exp2 = contrib(1, 4, 2)                               # spark only
    exp4 = contrib(1, 1, 2)                               # window only
    assert out[1]["bm25"] == pytest.approx(exp1, abs=2e-7)
    assert out[2]["bm25"] == pytest.approx(exp2, abs=2e-7)
    assert out[4]["bm25"] == pytest.approx(exp4, abs=2e-7)
    ranks = {r["doc_id"]: r["rank"] for r in out.values()}
    assert ranks[1] == 1  # highest score first

    # k cuts deterministically (score desc, id asc)
    top1 = text.bm25_topk(docs, "spark window", k=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == 1

    with pytest.raises(ValueError, match="zero terms"):
        text.bm25_topk(docs, "?!,.")


def test_bm25_plan_zero_shuffle_scoring(spark):
    """bm25_topk's 100-TB shape: per-doc term counts are pure array
    expressions over the scan (no explode, no (doc, term) shuffle), the
    top-k cut is a TakeOrderedAndProject (no global sort), and the plan
    contains NO join — corpus statistics arrive as literals, not a
    posting join."""
    from alphastats_spark.plans.audit import explain_string

    docs = spark.createDataFrame(
        [(i, f"alpha beta spark token{i}") for i in range(50)],
        "doc_id bigint, text string",
    )
    plan = explain_string(text.bm25_topk(docs, "spark alpha", k=5), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan  # no explode


def test_classifier_score_paths_and_prior(spark, monkeypatch):
    """classifier_score's two physical paths (in-plan weight array vs
    explode + broadcast-join) produce IDENTICAL values; featureless
    documents (null/empty text) score the model's empty-input prior
    sigmoid(bias); word_ngrams=2 counts unigrams + bigrams."""
    import math

    from alphastats_spark.functions import pipeline

    w = [((b * 7) % 32) / 32.0 - 0.5 for b in range(64)]
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "one two"), (3, None), (4, "")],
        "doc_id bigint, text string",
    )
    plan = {
        r["doc_id"]: (r["n_features"], r["score"])
        for r in pipeline.classifier_score(docs, w, bias=0.3, word_ngrams=2).collect()
    }
    # force the join path by shrinking the switch threshold
    monkeypatch.setattr(pipeline, "CLASSIFIER_PLAN_WEIGHTS_MAX", 2)
    joined = {
        r["doc_id"]: (r["n_features"], r["score"])
        for r in pipeline.classifier_score(docs, w, bias=0.3, word_ngrams=2).collect()
    }
    assert plan == joined
    # unigrams + bigrams: 4 toks -> 4 + 3; 2 toks -> 2 + 1
    assert plan[1][0] == 7 and plan[2][0] == 3
    prior = round(1.0 / (1.0 + math.exp(-0.3)), 7)
    assert plan[3] == (0, prior) and plan[4] == (0, prior)
    with pytest.raises(ValueError, match="word_ngrams"):
        pipeline.classifier_score(docs, w, word_ngrams=0)
    with pytest.raises(ValueError, match="non-empty"):
        pipeline.classifier_score(docs, [])


def test_knn_join_auto_planes(spark):
    """n_planes=None auto-sizes ∝ log₂(n/TARGET): the plane count grows
    with the corpus and the auto path returns exactly the explicit path's
    rows."""
    from alphastats_spark.functions import similarity as S

    assert S.knn_join_planes(5_000) == 8
    assert S.knn_join_planes(50_000) == 11
    assert S.knn_join_planes(10**9) == 25
    assert S.knn_join_planes(10) == 3  # floor

    n, dim = 300, 8
    rows = [
        (i, [((i * 31 + j * 7) % 97) / 97.0 - 0.5 for j in range(dim)])
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    from alphastats_spark.operators import ordered

    mark = ordered.pass_cache_mark()
    auto = sorted(map(tuple, S.knn_join(emb, k=3).collect()))
    # the sizing count's persist must be released inside knn_join — an
    # unscoped default call must leave nothing in the pass-cache registry
    # (the long-lived-session leak pattern)
    assert ordered.pass_cache_mark() == mark
    explicit = sorted(
        map(tuple, S.knn_join(emb, k=3, n_planes=S.knn_join_planes(n)).collect())
    )
    assert auto == explicit and len(auto) > 0


def test_knn_join_mega_bucket_guard(spark):
    """The per-table bucket cap: a duplicate-heavy hub (every copy lands
    in the same bucket in every table) is the quadratic pathology the
    guard bounds. cap=None recovers the exact join; the shipped default
    (far above honest buckets at this size) changes nothing."""
    from alphastats_spark.functions import similarity as S

    dim = 8
    hub = [0.3] * dim  # 40 exact copies -> one 40-member bucket per table
    rows = [(i, hub) for i in range(40)] + [
        (100 + i, [((i * 13 + j * 5) % 89) / 89.0 - 0.5 for j in range(dim)])
        for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    exact = S.knn_join(emb, k=3, n_planes=4, max_bucket=None)
    dflt = S.knn_join(emb, k=3, n_planes=4)  # cap 1024 >> any bucket here
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, dflt.collect()))
    # cap=20 drops the 40-copy hub bucket in every table: hub vectors get
    # no candidates, the 20 spread vectors keep theirs
    capped = S.knn_join(emb, k=3, n_planes=4, max_bucket=20)
    got_ids = {r["vec_id"] for r in capped.collect()}
    assert all(i >= 100 for i in got_ids)
    assert len(got_ids) > 0
    # the guard rides the join's own partitioning: window on __b, no
    # broadcast anti-join stage
    plan = dflt._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(__b" in plan, plan[:3000]
    assert "LeftAnti" not in plan, plan[:3000]


def test_pass_cache_scope_releases(spark):
    from alphastats_spark.functions import dedup
    from alphastats_spark.operators import ordered

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i}") for i in range(20)],
        "doc_id bigint, text string",
    )
    before = ordered.pass_cache_mark()
    with ordered.pass_cache_scope():
        dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()
        assert ordered.pass_cache_mark() > before
    assert ordered.pass_cache_mark() == before


def test_cap_per_group_skewed(spark):
    """Under-cap groups pass through untouched; over-cap groups keep
    exactly `cap` deterministic md5-keyed survivors; reruns identical."""
    from alphastats_spark.functions import pipeline

    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = pipeline.cap_per_group(df, cap=5, group_col="source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert by_src["small"] == {100, 101, 102}  # under cap: all kept
    assert len(by_src["big"]) == 5
    again = pipeline.cap_per_group(df, cap=5, group_col="source").collect()
    assert sorted((r["doc_id"], r["source"]) for r in out) == sorted(
        (r["doc_id"], r["source"]) for r in again
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        pipeline.cap_per_group(df, cap=0)


def test_cap_per_group_under_cap_no_rank_shuffle(spark):
    """When NO group exceeds the cap, the kept set is the input and the
    pass-through branch carries every row (the anti-join against an empty
    over-cap list)."""
    from alphastats_spark.functions import pipeline

    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(12)], "doc_id bigint, source string"
    )
    out = pipeline.cap_per_group(df, cap=10, group_col="source")
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(12))


def test_group_split_no_leakage(spark):
    """Every row of a group lands in one split — the leakage invariant —
    and the assignment is stable across calls."""
    from alphastats_spark.functions import pipeline

    df = spark.createDataFrame(
        [(i, f"src{i % 7}") for i in range(70)], "doc_id bigint, source string"
    )
    out = pipeline.group_split(
        df, group_col="source", weights={"train": 0.5, "val": 0.25, "test": 0.25}
    )
    per_group = (
        out.groupBy("source").agg(F.countDistinct("split").alias("k")).collect()
    )
    assert all(r["k"] == 1 for r in per_group)
    assert out.select("split").distinct().count() >= 2  # non-vacuous split


def test_edit_distance_join_matches_bruteforce(spark):
    """Deletion-neighborhood blocking finds EXACTLY the brute-force pair
    set at d=1 and d=2 (random small-alphabet strings force collisions,
    including insert/delete pairs of different lengths)."""
    import itertools
    import random

    from alphastats_spark.functions import dedup
    from alphastats_spark.operators import ordered

    rng = random.Random(7)
    strs = [
        "".join(rng.choice("ab") for _ in range(rng.randint(2, 5)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        list(enumerate(strs)), "doc_id bigint, text string"
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for d in (1, 2):
        with ordered.pass_cache_scope():
            got = sorted(
                (r["id_a"], r["id_b"], r["distance"])
                for r in dedup.edit_distance_join(df, max_distance=d).collect()
            )
        want = sorted(
            (i, j, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(enumerate(strs), 2)
            if lev(a, b) <= d
        )
        assert got == want and len(want) > 0


def test_quantize_embeddings_roundtrip_bound(spark):
    """|q_i*scale - v_i| <= scale/2 for every element, codes are in
    [-127, 127], and the zero vector quantizes to zeros with scale 0."""
    from alphastats_spark.functions import similarity

    rows = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [1e-5, -3e-5, 2e-5, 5e-6]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings(emb).collect()}
    for vid, (_, vec) in zip([0, 1, 2], rows):
        r = out[vid]
        assert r["n_dims"] == 4
        assert all(-127 <= q <= 127 for q in r["q"])
        if all(x == 0.0 for x in vec):
            assert r["scale"] == 0.0 and r["q"] == [0, 0, 0, 0]
        else:
            assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
            for q, v in zip(r["q"], vec):
                assert abs(q * r["scale"] - v) <= r["scale"] / 2 + 1e-9
    assert out[0]["q"][1] == -127  # max-magnitude element pins the scale


def test_decontaminate_hashed_equals_exact(spark):
    """The xxhash64-prefiltered path is bit-equal to the exact broadcast
    path (candidates are re-verified against the raw eval grams)."""
    from alphastats_spark.functions import pipeline

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox eats a dozen liquor jugs"),
            (4, "completely unrelated words here only"),
        ],
        "doc_id bigint, text string",
    )
    ev = docs.where("doc_id = 1")
    exact = sorted(map(tuple, pipeline.decontaminate(docs, ev, n=3).collect()))
    hashed = sorted(
        map(tuple, pipeline.decontaminate(docs, ev, n=3, hashed=True).collect())
    )
    assert exact == hashed
    flagged = {r[0]: r[4] for r in exact}
    assert flagged[1] and not flagged[4]  # non-vacuous: eval doc flags itself


def test_cap_per_group_order_by(spark):
    """order_by turns the quota into best-k-per-group: smallest values
    survive, negate for top-k; default md5 path unchanged."""
    from alphastats_spark.functions import pipeline

    rows = [(i, "g", float(i % 7)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, q double")
    top = pipeline.cap_per_group(
        df, cap=3, group_col="source", order_by=-F.col("q")
    ).collect()
    want = sorted(rows, key=lambda r: (-r[2], r[0]))[:3]
    assert sorted((r["doc_id"]) for r in top) == sorted(r[0] for r in want)


def test_cap_per_group_order_by_nulls_lose(spark):
    """Rows whose order expression is NULL must sort LAST: an unscored row
    never wins a quota slot over a scored one (Spark's asc default is
    nulls-first, which would hand nulls the quota)."""
    from alphastats_spark.functions import pipeline

    rows = [(i, "g", None if i < 10 else float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, q double")
    kept = pipeline.cap_per_group(
        df, cap=5, group_col="source", order_by=F.col("q")
    ).collect()
    ids = sorted(r["doc_id"] for r in kept)
    # scored rows are ids 10..19; smallest 5 scores = ids 10..14
    assert ids == [10, 11, 12, 13, 14], f"null-scored rows won quota: {ids}"


def test_cap_per_group_no_resident_cache(spark):
    """The over-cap sizing count's persist is scoped inside cap_per_group:
    an unscoped caller leaves nothing in the pass-cache registry."""
    from alphastats_spark.functions import pipeline
    from alphastats_spark.operators import ordered

    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    mark = ordered.pass_cache_mark()
    pipeline.cap_per_group(df, cap=5, group_col="source").collect()
    assert ordered.pass_cache_mark() == mark


def test_ivf_append_equals_fresh_build(spark, tmp_path):
    """append_to_ivf_index: base index + appended batch reads back
    identical (rows and list assignment) to one from-scratch build of the
    union with the SAME centroids — ingest is O(batch), no rewrite."""
    from alphastats_spark.functions import similarity

    n, dim = 120, 8
    rows = [
        (i, [((i * 37 + j * 11) % 101) / 101.0 - 0.5 for j in range(dim)])
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    base = emb.where("vec_id % 4 != 0")
    batch = emb.where("vec_id % 4 = 0")
    cents = similarity.ivf_centroids(base, n_centroids=4, seed=7)

    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    similarity.write_ivf_index(base, cents, inc)
    similarity.append_to_ivf_index(batch, cents, inc)
    similarity.write_ivf_index(emb, cents, full)

    key = lambda r: (r["ivf_list"], r["vec_id"])
    a = sorted(spark.read.parquet(inc).select("vec_id", "ivf_list").collect(), key=key)
    b = sorted(spark.read.parquet(full).select("vec_id", "ivf_list").collect(), key=key)
    assert a == b and len(a) == n


def test_source_overlap_matrix_cap_drops_ubiquitous_gram(spark):
    """A gram present in more sources than max_gram_df is excluded from
    the overlap counts AND from each side's gram universe, so the
    (n_common, sizes, jaccard) triple stays consistent; with the cap off
    the ubiquitous gram counts everywhere."""
    from alphastats_spark.functions import pipeline
    from alphastats_spark.operators import ordered

    rows = [
        (1, "s1", "common boiler phrase alpha one two"),
        (2, "s2", "common boiler phrase beta three four"),
        (3, "s3", "common boiler phrase gamma five six"),
        (4, "s1", "unique to s1 only seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    with ordered.pass_cache_scope():
        uncapped = {
            (r["src_a"], r["src_b"]): r["n_common"]
            for r in pipeline.source_overlap_matrix(df, n=3, max_gram_df=None).collect()
        }
        capped_rows = pipeline.source_overlap_matrix(df, n=3, max_gram_df=2).collect()
    # 'common boiler phrase' hits all 3 sources -> dropped at cap 2
    assert uncapped[("s1", "s2")] >= 1
    capped = {(r["src_a"], r["src_b"]): r["n_common"] for r in capped_rows}
    assert ("s1", "s2") not in capped or capped[("s1", "s2")] < uncapped[("s1", "s2")]
    for r in capped_rows:  # triple consistency under the cap
        assert r["n_common"] <= min(r["n_grams_a"], r["n_grams_b"])


def test_percentile_normalize_matches_pandas(spark):
    """percent_rank per group equals pandas' (rank-1)/(n-1) with the same
    ascending (value, id) order; singleton group ranks 0."""
    import pandas as pd

    from alphastats_spark.functions import pipeline

    rows = [(1, "a", 5.0), (2, "a", 1.0), (3, "a", 5.0), (4, "a", 2.0), (9, "b", 7.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, q double")
    got = {
        r["doc_id"]: r["pr"]
        for r in pipeline.percentile_normalize(df, "q", out_col="pr").collect()
    }
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "q"]).sort_values(
        ["source", "q", "doc_id"]
    )
    for src, grp in pdf.groupby("source"):
        n = len(grp)
        for pos, doc in enumerate(grp["doc_id"]):
            want = 0.0 if n == 1 else pos / (n - 1)
            assert got[doc] == want, (doc, got[doc], want)


def test_admit_rank_string_ids(spark):
    """best_match_id survives non-numeric ids (the struct-max negation
    trick would cast 'web-00042' to a null double)."""
    from alphastats_spark.functions.dedup import _admit_rank

    new_df = spark.createDataFrame([("n1",), ("n2",)], "doc_id string")
    matches = spark.createDataFrame(
        [("n1", "web-00042", 0.9), ("n1", "web-00007", 0.9), ("n1", "web-00099", 0.5)],
        "new_id string, match_id string, jaccard double",
    )
    out = {r["doc_id"]: r for r in _admit_rank(new_df, matches, "doc_id").collect()}
    assert out["n1"]["best_match_id"] == "web-00007"  # tie -> lowest id
    assert out["n1"]["n_matches"] == 3 and not out["n1"]["admitted"]
    assert out["n2"]["best_match_id"] == "-1" and out["n2"]["admitted"]


def test_read_index_meta_corrupt_raises(spark, tmp_path):
    """A corrupt/empty meta file raises instead of silently resolving to
    default hash parameters (which would admit every near-duplicate)."""
    import os

    import pytest as _pt

    p = str(tmp_path / "idx")
    os.makedirs(f"{p}/meta")
    with open(f"{p}/meta/part-00000.json", "w") as f:
        f.write('{"k": 16, "rows_per_ban')  # truncated mid-write
    from alphastats_spark.functions import dedup

    with _pt.raises(Exception):
        dedup.read_index_meta(spark, p)
    # missing path still maps to None (pre-metadata index)
    assert dedup.read_index_meta(spark, str(tmp_path / "nope")) is None


def test_duplicate_clusters_nonconvergence_raises(spark):
    """A chain whose diameter exceeds max_iters fails loudly instead of
    returning non-fixpoint labels (silent under-deduplication)."""
    import pytest as _pt

    from alphastats_spark.functions import dedup

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a bigint, id_b bigint"
    )
    with _pt.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(chain, max_iters=3)
    ok = dedup.duplicate_clusters(chain, max_iters=15)
    assert ok.select("cluster_id").distinct().count() == 1


def test_funnel_step_name_with_quote(spark):
    from alphastats_spark.functions import events

    df = spark.createDataFrame(
        [(1, 10, "view"), (1, 20, "o'reilly_click")],
        "user_id bigint, us bigint, event_type string",
    )
    out = {r["event_type"]: r["n_users"] for r in
           events.funnel(df, ["view", "o'reilly_click"]).collect()}
    assert out == {"view": 1, "o'reilly_click": 1}


def test_normalize_expr_zero_vector(spark):
    from alphastats_spark.functions import similarity

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [3.0, 4.0])], "vec_id bigint, embedding array<float>"
    )
    out = {r["vec_id"]: r["n"] for r in df.select(
        "vec_id", similarity.normalize_expr(F.col("embedding")).alias("n")
    ).collect()}
    assert out[0] == [0.0, 0.0]
    assert abs(out[1][0] - 0.6) < 1e-9 and abs(out[1][1] - 0.8) < 1e-9


def test_path_transition_matrix(spark):
    from alphastats_spark.functions import events as ev_ops

    m = 60_000_000  # one minute in microseconds
    rows = [
        # user 1, session 1: a>b>c ; session 2 (gap > 30 min): a>b
        (1, 0 * m, 1, "a"), (1, 1 * m, 2, "b"), (1, 2 * m, 3, "c"),
        (1, 60 * m, 4, "a"), (1, 61 * m, 5, "b"),
        # user 2, one session: a>b>c
        (2, 0 * m, 6, "a"), (2, 5 * m, 7, "b"), (2, 6 * m, 8, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, us bigint, event_id bigint, event_type string"
    )
    out = {(r["src"], r["dst"]): (r["n_transitions"], r["prob"])
           for r in ev_ops.path_transition_matrix(df).collect()}
    assert out[("__start__", "a")] == (3, 1.0)
    assert out[("a", "b")] == (3, 1.0)
    assert out[("b", "c")][0] == 2 and abs(out[("b", "c")][1] - 2 / 3) < 1e-6
    assert out[("b", "__end__")][0] == 1
    assert out[("c", "__end__")] == (2, 1.0)
    assert len(out) == 5
    # rows of the matrix are stochastic: per-src probs sum to 1
    from collections import defaultdict

    sums = defaultdict(float)
    for (src, _), (_, p) in out.items():
        sums[src] += p
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_top_terms_per_source(spark):
    from alphastats_spark.functions import text

    rows = [
        (1, "alpha alpha beta", "s1"),
        (2, "beta Alpha", "s1"),       # normalize lowercases
        (3, "gamma gamma gamma", "s2"),
        (4, "delta", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = [(r["source"], r["term"], r["n_occurrences"], r["rank"])
           for r in text.top_terms_per_source(df, k=2).orderBy("source", "rank").collect()]
    # s1: alpha x3, beta x2; s2: gamma x3, delta x1
    assert out == [
        ("s1", "alpha", 3, 1), ("s1", "beta", 2, 2),
        ("s2", "gamma", 3, 1), ("s2", "delta", 1, 2),
    ]
    # min_count prunes the tail before ranking
    pruned = text.top_terms_per_source(df, k=2, min_count=2)
    assert ("delta",) not in [tuple([r["term"]]) for r in pruned.collect()]


def test_check_constraints(spark):
    import pytest as _pt

    from alphastats_spark.functions import checks

    rows = [
        (1, "ok", 10.0, "en"),
        (1, " ", 200.0, "en"),     # dup id, blank text, out of range hi
        (None, None, -5.0, "xx"),  # null id/text, out of range lo, bad lang
        (3, "fine", None, "de"),
    ]
    df = spark.createDataFrame(rows, "id bigint, txt string, v double, lang string")
    report = checks.check_constraints(df, [
        checks.not_null("id"),
        checks.unique("id"),
        checks.non_empty("txt"),
        checks.in_range("v", lo=0.0, hi=100.0),
        checks.in_set("lang", ["en", "de"]),
        checks.matches("lang", "[a-z]{2}"),
    ])
    got = {r["rule"]: r for r in report.collect()}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["not_null(id)"]["violations"] == 1
    assert got["unique(id)"]["violations"] == 1      # 3 non-null, 2 distinct
    assert got["non_empty(txt)"]["violations"] == 2  # null + blank
    assert got["in_range(v)"]["violations"] == 2     # 200 and -5; null exempt
    assert got["in_set(lang)"]["violations"] == 1    # xx
    assert got["matches(lang)"]["violations"] == 0 and got["matches(lang)"]["passed"]
    assert not got["unique(id)"]["passed"]
    # declaration order is preserved in the report
    assert [r["rule"] for r in report.collect()][0] == "not_null(id)"

    with _pt.raises(ValueError, match="at least one rule"):
        checks.check_constraints(df, [])
    with _pt.raises(ValueError, match="unknown rule kind"):
        checks.check_constraints(df, [{"kind": "nope", "column": "id", "name": "x"}])
    with _pt.raises(ValueError, match="lo/hi"):
        checks.in_range("v")
    with _pt.raises(ValueError, match="non-empty"):
        checks.in_set("lang", [])

    # empty input: every rule reports 0 violations / passed=true (row-level
    # rules must coalesce the NULL that SUM yields over zero rows, matching
    # the unique rule and COUNT(*) FILTER semantics)
    empty = df.limit(0)
    erep = checks.check_constraints(empty, [
        checks.not_null("id"),
        checks.unique("id"),
        checks.in_range("v", lo=0.0),
        checks.non_empty("txt"),
    ]).collect()
    assert len(erep) == 4
    for r in erep:
        assert r["violations"] == 0 and r["n_rows"] == 0 and r["passed"] is True


def test_canonical_url_and_url_dedup(spark):
    from pyspark.sql import functions as F

    from alphastats_spark.functions import dedup, text

    cases = [
        # (input, expected canonical)
        ("https://site.example/p/1", "https://site.example/p/1"),
        ("HTTPS://WWW.Site.Example:443/p/1#frag", "https://site.example/p/1"),
        ("https://site.example/p/1/?utm_source=x&gclid=1",
         "https://site.example/p/1"),
        ("http://site.example:80/p/1?id=2&utm_campaign=z&fbclid=q",
         "http://site.example/p/1?id=2"),
        ("https://site.example/", "https://site.example"),
        ("https://site.example", "https://site.example"),
        # kept params keep their relative order, no re-sorting
        ("https://s.example/a?b=2&a=1", "https://s.example/a?b=2&a=1"),
        # :8080 is not a default port; path case is preserved
        ("https://Site.example:8080/P/Q", "https://site.example:8080/P/Q"),
        # id=utm is not a tracking param (anchored name match)
        ("https://s.example/a?id=utm_x", "https://s.example/a?id=utm_x"),
        ("not a url", None),
        (None, None),
        # full-pattern guard: scheme/host parse but the whitespace path
        # fails the anchored tail — must go NULL, never truncate to the
        # bare host (two distinct malformed URLs must not collide)
        ("https://h.example/a b", None),
        ("https://h.example/c d?x=1", None),
        # whitespace only in the fragment is stripped first, still valid
        ("https://h.example/ok#a b", "https://h.example/ok"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i bigint, url string"
    )
    got = {r["i"]: r["c"] for r in
           df.select("i", text.canonical_url(F.col("url")).alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: got {got[i]!r}, want {want!r}"

    # url_dedup: min id keeps; null/unparseable keep themselves
    docs = spark.createDataFrame(
        [(1, "https://site.example/p/1"),
         (2, "HTTPS://WWW.Site.Example:443/p/1#frag"),
         (3, "https://other.example/x"),
         (4, None),
         (5, None),
         # identical MALFORMED urls: unparseable -> null canonical ->
         # keep-self, they must NOT dedup against each other
         (6, "https://mal.example/a b"),
         (7, "https://mal.example/a b")],
        "doc_id bigint, url string",
    )
    out = {r["doc_id"]: r for r in dedup.url_dedup(docs).collect()}
    assert len(out) == 7
    assert out[1]["kept_id"] == 1 and not out[1]["is_dup"]
    assert out[2]["kept_id"] == 1 and out[2]["is_dup"]
    assert out[3]["kept_id"] == 3 and not out[3]["is_dup"]
    for d in (4, 5, 6, 7):  # nulls never collide, not even with each other
        assert out[d]["canonical_url"] is None
        assert out[d]["kept_id"] == d and not out[d]["is_dup"]


def test_check_constraints_approx_unique(spark):
    """The 100-TB uniqueness path: approx=True swaps exact count-distinct
    for the HLL sketch. Pin its error envelope at a known duplicate count
    (default rsd 5%: distinct-count error within ±3 rsd ≈ ±15% here) and
    that the exact rule on the same data is exactly right."""
    from pyspark.sql import functions as F

    from alphastats_spark.functions import checks

    # 1000 rows, 900 distinct ids (ids 0-99 appear twice) -> 100 violations
    df = spark.range(1000).select(F.pmod(F.col("id"), F.lit(900)).alias("id"))
    exact = checks.check_constraints(df, [checks.unique("id")]).first()
    assert exact["violations"] == 100 and not exact["passed"]
    approx = checks.check_constraints(
        df, [checks.unique("id", approx=True)]
    ).first()
    # HLL distinct estimate on 900 truths, rsd=0.05 -> 3σ ≈ 135
    assert abs(approx["violations"] - 100) <= 135
    assert approx["n_rows"] == 1000


def test_benchmark_leakage(spark):
    from alphastats_spark.functions import dedup

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [(10, boiler), (11, boiler + " extra tail"), (12, "completely different corpus text about spark plans and shuffles")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(1, boiler), (2, "held out evaluation item that shares nothing with training data")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.benchmark_leakage(train, bench, threshold=0.5).collect()}
    assert out[1]["leaked"] and out[1]["n_train_matches"] >= 1
    assert out[1]["max_jaccard"] == 1.0  # exact copy present in train
    assert not out[2]["leaked"]
    assert out[2]["n_train_matches"] == 0 and out[2]["max_jaccard"] == 0.0


def test_decontaminate_fuzzy(spark):
    from alphastats_spark.functions import dedup

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [(10, boiler), (11, boiler + " extra tail"),
         (12, "completely different corpus text about spark plans and shuffles")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(1, boiler),
         (2, "held out evaluation item that shares nothing with training data")],
        "doc_id bigint, text string",
    )
    # drop mode: leaked train docs removed, schema unchanged
    kept = dedup.decontaminate_fuzzy(train, bench, threshold=0.5)
    assert kept.columns == train.columns
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert 10 not in kept_ids  # exact copy of bench item 1
    assert 12 in kept_ids      # unrelated doc survives
    # lineage mode: one row per train doc, best bench match + reason
    lin = {r["doc_id"]: r for r in
           dedup.decontaminate_fuzzy(train, bench, threshold=0.5,
                                     lineage=True).collect()}
    assert len(lin) == 3
    assert lin[10]["reason"] == "leaked_dropped"
    assert lin[10]["bench_id"] == 1 and lin[10]["jaccard"] == 1.0
    assert lin[12]["reason"] == "clean"
    assert lin[12]["bench_id"] == -1 and lin[12]["jaccard"] == 0.0
    # drop mode output == lineage 'clean' rows
    assert kept_ids == {d for d, r in lin.items() if r["reason"] == "clean"}


def test_curate_corpus_lineage(spark):
    """End-to-end curation composition: one row per input doc, first-drop
    stage attribution in pipeline order, survivors carry a consistent
    split + pack assignment (functions/pipeline.py curate_corpus)."""
    from pyspark.sql import functions as F

    from alphastats_spark.functions import checks, pipeline
    from alphastats_spark.operators import ordered

    good = ("the quick brown fox jumps over the lazy dog while many other "
            "animals watch quietly from their hidden places in the deep "
            "green forest during those long warm summer afternoons and "
            "evenings near the river bank watching everything")
    rows = [
        (1, good + " one", "src0", "https://a.example/1"),
        (2, None, "src0", "https://a.example/2"),          # constraints
        (3, "tiny text", "src0", "https://a.example/3"),   # quality
        (4, good + " four", "src0", "https://a.example/1"),  # url dup of 1
        (5, good + " one", "src1", "https://a.example/5"),   # exact dup of 1
        (6, good + " one extension marker", "src1", None),   # near dup of 1
        (7, ("several curious travelers wandered slowly across the ancient "
             "stone bridge carrying heavy baskets filled with fresh bread "
             "ripe fruit and small wooden toys for the children waiting "
             "patiently beside the old market square fountain"),
         "src1", "https://a.example/7"),
        (8, ("modern engineers designed the tall glass tower with careful "
             "attention to wind loads solar gain and the daily movement of "
             "thousands of busy office workers through its bright open "
             "lobbies and quiet upper floors every single day"),
         "src2", "https://a.example/8"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string, url string")
    bench = spark.createDataFrame(
        [(100, rows[6][1])], "doc_id bigint, text string"
    )  # contaminates doc 7 (verbatim bench copy)
    with ordered.pass_cache_scope():
        out = {r["doc_id"]: r for r in pipeline.curate_corpus(
            df, bench, url_col="url",
            quality_kwargs={"min_tokens": 20, "min_mean_word_len": 3.0},
            fuzzy_threshold=0.5, decontam_threshold=0.5,
            split_weights={"train": 0.6, "val": 0.2, "test": 0.2},
            pack_budget=16,
        ).collect()}
    assert len(out) == 8
    assert out[2]["stage"] == "constraints" and not out[2]["kept"]
    assert out[3]["stage"] == "quality"
    assert out[4]["stage"] == "url_dup"
    assert out[5]["stage"] == "exact_dup"
    assert out[6]["stage"] == "near_dup"
    assert out[7]["stage"] == "contaminated"
    # dropped rows carry the sentinels
    for d in (2, 3, 4, 5, 6, 7):
        assert out[d]["split"] is None and out[d]["pack_id"] == -1
    # survivors (1, 8): packed in id order with budget 16
    for d in (1, 8):
        assert out[d]["kept"] and out[d]["stage"] == "packed"
        assert out[d]["split"] in ("train", "val", "test")
    assert out[1]["pack_id"] == 0 and out[1]["pack_offset"] == 0
    n1 = len((good + " one").split())
    assert out[8]["pack_id"] == n1 // 16 and out[8]["pack_offset"] == n1 % 16

    # unique rules are rejected (aggregate, not row-expressible)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exact_dup stage"):
        pipeline.curate_corpus(df, bench, rules=[checks.unique("doc_id")])


def test_rrf_fuse(spark):
    """Reciprocal-rank fusion against hand-computed 1/(c+rank) sums:
    docs in both lists outrank single-list docs, the fused score is the
    exact two-term sum, ties break id-asc, and k cuts the fused list."""
    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id bigint, rank int"
    )
    b = spark.createDataFrame(
        [(12, 1), (13, 2), (10, 3)], "vec_id bigint, rank int"
    )
    out = {
        r["id"]: r
        for r in similarity.rrf_fuse(
            [a, b], k=10, c=60, id_cols=["doc_id", "vec_id"]
        ).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    assert out[10]["rrf"] == pytest.approx(1 / 61 + 1 / 63, abs=2e-7)
    assert out[12]["rrf"] == pytest.approx(1 / 63 + 1 / 61, abs=2e-7)
    assert out[11]["rrf"] == pytest.approx(1 / 62, abs=2e-7)
    assert out[13]["rrf"] == pytest.approx(1 / 62, abs=2e-7)
    # 10 and 12 share the (commutative) two-term score — id-asc tiebreak
    assert out[10]["rank"] == 1 and out[12]["rank"] == 2
    # 11 and 13 tie on 1/62 — id-asc again
    assert out[11]["rank"] == 3 and out[13]["rank"] == 4

    top2 = similarity.rrf_fuse(
        [a, b], k=2, c=60, id_cols=["doc_id", "vec_id"]
    ).collect()
    assert [r["id"] for r in top2] == [10, 12]

    with pytest.raises(ValueError, match="at least one"):
        similarity.rrf_fuse([], k=2)
    with pytest.raises(ValueError, match="names for"):
        similarity.rrf_fuse([a, b], id_cols=["doc_id"])


def test_hybrid_topk(spark):
    """hybrid_topk composes bm25_topk + cosine_topk + rrf_fuse with
    hand-traced ranks. Lexical order (query "spark window merge"):
    doc 1 > doc 2 > doc 4 (doc 3 matches no term, so only three BM25
    rows even at depth 3). Dense order (query [1, 0]): vec 3 (cos 1.0)
    > vec 2 (0.9938) > vec 1 (0.0); vec 4 (-1.0) falls outside
    depth 3. Fused 1/(60+rank) sums follow exactly."""
    docs = spark.createDataFrame(
        [
            (1, "spark window merge spark window"),  # lexical winner
            (2, "spark window merge"),               # good in both
            (3, "table scan filter"),                # dense only
            (4, "window"),                           # lexical only
        ],
        "doc_id bigint, text string",
    )
    embs = spark.createDataFrame(
        [
            (1, [0.0, 1.0]),    # orthogonal to query — still dense rank 3
            (2, [0.9, 0.1]),    # near query
            (3, [1.0, 0.0]),    # dense winner
            (4, [-1.0, 0.0]),   # anti-parallel — outside depth 3
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = similarity.hybrid_topk(
        docs, embs, "spark window merge", [1.0, 0.0], k=4, depth=3
    ).collect()
    assert list(out[0].asDict()) == ["id", "rrf", "rank"]
    got = {r["id"]: r for r in out}
    assert got[1]["rrf"] == pytest.approx(1 / 61 + 1 / 63, abs=2e-7)
    assert got[2]["rrf"] == pytest.approx(1 / 62 + 1 / 62, abs=2e-7)
    assert got[3]["rrf"] == pytest.approx(1 / 61, abs=2e-7)
    assert got[4]["rrf"] == pytest.approx(1 / 63, abs=2e-7)
    # two-list docs beat single-list docs; 1/61+1/63 edges out 2/62
    assert [got[i]["rank"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]


def test_rrf_fuse_plan_no_corpus_shuffle(spark):
    """rrf_fuse's plan: the fused cut is a TakeOrderedAndProject (no
    global sort) and the score is a join of the (tiny) ranked lists —
    no aggregate, whose float accumulation order Spark leaves
    engine-defined."""
    from alphastats_spark.plans.audit import explain_string

    a = spark.createDataFrame([(1, 1), (2, 2)], "id bigint, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "id bigint, rank int")
    plan = explain_string(similarity.rrf_fuse([a, b], k=5), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "HashAggregate" not in plan, plan


def test_corpus_divergence(spark):
    """KL/JS against a hand-replicated smoothed computation on a tiny
    pair of slices, plus contracts: identical slices diverge by ~0,
    the argument swap mirrors kl_ab/kl_ba and preserves js, and js is
    bounded by ln 2."""
    a = spark.createDataFrame([(1, "a a b")], "doc_id bigint, text string")
    b = spark.createDataFrame([(2, "a c")], "doc_id bigint, text string")
    row = text.corpus_divergence(a, b).first()

    ca, cb = {"a": 2, "b": 1, "c": 0}, {"a": 1, "b": 0, "c": 1}
    ta, tb, v, al = 3, 2, 3, 0.5
    p = {t: (ca[t] + al) / (ta + al * v) for t in ca}
    q = {t: (cb[t] + al) / (tb + al * v) for t in cb}
    kl_ab = sum(p[t] * math.log(p[t] / q[t]) for t in ca)
    kl_ba = sum(q[t] * math.log(q[t] / p[t]) for t in ca)
    js = 0.5 * sum(p[t] * math.log(p[t] / ((p[t] + q[t]) / 2)) for t in ca) \
        + 0.5 * sum(q[t] * math.log(q[t] / ((p[t] + q[t]) / 2)) for t in ca)
    assert row["kl_ab"] == pytest.approx(kl_ab, abs=2e-7)
    assert row["kl_ba"] == pytest.approx(kl_ba, abs=2e-7)
    assert row["js_divergence"] == pytest.approx(js, abs=2e-7)
    assert 0 < row["js_divergence"] < math.log(2)
    assert (row["vocab_union"], row["tokens_a"], row["tokens_b"]) == (3, 3, 2)

    swapped = text.corpus_divergence(b, a).first()
    assert swapped["kl_ab"] == row["kl_ba"]
    assert swapped["kl_ba"] == row["kl_ab"]
    assert swapped["js_divergence"] == row["js_divergence"]

    same = text.corpus_divergence(a, a).first()
    assert same["kl_ab"] == 0.0 and same["js_divergence"] == 0.0


def test_corpus_divergence_plan_no_broadcast_hint(spark):
    """The term full-outer join is vocabulary-sized on BOTH sides — the
    optimized logical plan must carry no forced broadcast hint (the r13
    TF-IDF lesson: vocabulary grows with the corpus; AQE may still pick
    a broadcast at runtime when a side fits)."""
    a = spark.createDataFrame(
        [(i, f"tok{i} shared") for i in range(40)], "doc_id bigint, text string"
    )
    b = spark.createDataFrame(
        [(i, f"tok{i + 20} shared") for i in range(40)], "doc_id bigint, text string"
    )
    logical = (
        text.corpus_divergence(a, b)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "broadcast" not in logical.lower(), logical


def test_mmr_rerank(spark):
    """MMR greedy against a hand-traced 3-candidate case: the
    redundant near-copy of the first pick loses to a less-relevant but
    orthogonal candidate; scores equal the rounded selection-time
    lambda*rel - (1-lambda)*maxsim; k caps and k>n degrades to n."""
    lam = 0.7
    cand = spark.createDataFrame(
        [
            (1, 0.9, [1.0, 0.0]),     # most relevant
            (2, 0.85, [0.999, 0.01]),  # near-copy of 1
            (3, 0.5, [0.0, 1.0]),     # orthogonal
        ],
        "vec_id bigint, rel double, embedding array<double>",
    )
    out = similarity.mmr_rerank(cand, k=3, lam=lam, id_col="vec_id").collect()
    assert [r["vec_id"] for r in out] == [1, 3, 2]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["mmr"] == pytest.approx(lam * 0.9, abs=2e-7)
    assert out[1]["mmr"] == pytest.approx(lam * 0.5, abs=2e-7)  # maxsim 0
    cos12 = 0.999 / math.sqrt(0.999**2 + 0.01**2)
    assert out[2]["mmr"] == pytest.approx(
        lam * 0.85 - (1 - lam) * round(cos12, 7), abs=2e-7
    )

    top1 = similarity.mmr_rerank(cand, k=1, lam=lam, id_col="vec_id").collect()
    assert len(top1) == 1 and top1[0]["vec_id"] == 1
    all_rows = similarity.mmr_rerank(cand, k=9, lam=lam, id_col="vec_id").collect()
    assert len(all_rows) == 3  # degrades to n when k > candidates

    with pytest.raises(ValueError, match="max_candidates"):
        similarity.mmr_rerank(cand, k=2, id_col="vec_id", max_candidates=2)


def test_mmr_rerank_ties_and_zero_norm(spark):
    """Equal scores break id-ascending (iteration is over sorted ids
    with a strict > improvement), and zero-norm vectors take cosine 0
    rather than dividing by zero."""
    cand = spark.createDataFrame(
        [
            (7, 0.8, [1.0, 0.0]),
            (4, 0.8, [1.0, 0.0]),   # identical to 7 — id 4 picked first
            (9, 0.3, [0.0, 0.0]),   # zero vector: sim 0 to anything
        ],
        "vec_id bigint, rel double, embedding array<double>",
    )
    out = similarity.mmr_rerank(cand, k=3, lam=0.7, id_col="vec_id").collect()
    assert [r["vec_id"] for r in out] == [4, 7, 9]
    # 7 second despite duplicating 4: 0.7*0.8 - 0.3*1.0 = 0.26 > 9's 0.21
    assert out[1]["mmr"] == pytest.approx(0.7 * 0.8 - 0.3 * 1.0, abs=2e-7)
    # zero-norm 9 last, with sim pinned to 0 (no division error)
    assert out[2]["mmr"] == pytest.approx(0.7 * 0.3, abs=2e-7)


def test_winnow_fingerprints(spark):
    """Winnowing against exact hashlib-computed 60-bit gram hashes on a
    6-token doc (3 grams, 1 window -> the single global minimum), plus
    the scheme's contracts: sub-k docs yield nothing, exactly-k docs
    yield their one gram hash, and two docs sharing a k+window-1 token
    run share at least one fingerprint."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),     # 3 grams, window covers all -> 1 fp
            (2, "a b c"),           # < k tokens -> no rows
            (3, "p q r s"),         # exactly k -> its single gram hash
        ],
        "doc_id bigint, text string",
    )
    out = dedup.winnow_fingerprints(docs, k=4, window=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    exp1 = min(h60("a b c d"), h60("b c d e"), h60("c d e f"))
    assert got[1] == {exp1}
    assert 2 not in got
    assert got[3] == {h60("p q r s")}

    # shared-run guarantee: k + window - 1 = 6 common tokens
    run = "u v w x y z"
    pair = spark.createDataFrame(
        [(10, f"one two three {run}"), (11, f"{run} four five six")],
        "doc_id bigint, text string",
    )
    rows = dedup.winnow_fingerprints(pair, k=4, window=3).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[10] & fps[11], "shared 6-token run must share a fingerprint"

    # winnowing compresses: a long doc keeps fewer fingerprints than grams
    long_doc = spark.createDataFrame(
        [(20, " ".join(f"t{i}" for i in range(60)))],
        "doc_id bigint, text string",
    )
    n_grams = 60 - 4 + 1
    n_fps = dedup.winnow_fingerprints(long_doc, k=4, window=3).count()
    assert 0 < n_fps < n_grams


def test_winnow_fingerprints_plan_no_shuffle(spark):
    """Three array projections + explode over the scan — the plan must
    contain no Exchange and no Join (fingerprinting is a pure map; the
    shuffle belongs to whatever joins/aggregates the output)."""
    from alphastats_spark.plans.audit import explain_string

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)],
        "doc_id bigint, text string",
    )
    plan = explain_string(dedup.winnow_fingerprints(docs), "simple")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_knn_join_matches_directed_reference(spark):
    """The round-14 score-once-and-mirror knn_join must reproduce the
    directed reference shape exactly: per table score EVERY directed
    bucket collision, union, collapse duplicates, rank. Random vectors,
    multiprobe on and off, including zero-norm rows (cosine 0.0 both
    directions by the _safe_cos convention)."""
    import numpy as np
    from pyspark.sql import Window

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(60)]
    rows.append((60, [0.0] * 8))  # zero-norm vector
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def directed_reference(k, n_planes, n_tables, multiprobe, max_bucket):
        norm = similarity._norm(similarity._as_double(F.col("embedding")))
        base = df.select(
            F.col("vec_id").alias("__id"),
            similarity._as_double(F.col("embedding")).alias("__v"),
            norm.alias("__nrm"),
        )
        pair_tables = []
        for t in range(n_tables):
            planes = similarity.hyperplanes(8, n_planes, 42 + t)
            with_b = base.withColumn(
                "__b", similarity.bucket_expr(F.col("__v"), planes)
            )
            if max_bucket is not None:
                wb = Window.partitionBy("__b")
                with_b = (
                    with_b.withColumn("__bn", F.count(F.lit(1)).over(wb))
                    .where(F.col("__bn") <= int(max_bucket))
                    .drop("__bn")
                )
            if multiprobe:
                probes = F.array(
                    F.col("__b"),
                    *[F.col("__b").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
                )
                left = with_b.select(
                    F.explode(probes).alias("__b"),
                    F.col("__id").alias("qid"),
                    F.col("__v").alias("qv"),
                    F.col("__nrm").alias("qn"),
                )
            else:
                left = with_b.select(
                    F.col("__b"), F.col("__id").alias("qid"),
                    F.col("__v").alias("qv"), F.col("__nrm").alias("qn"),
                )
            right = with_b.select(
                F.col("__b"), F.col("__id").alias("nid"),
                F.col("__v").alias("nv"), F.col("__nrm").alias("nn"),
            )
            pairs = left.join(right, "__b").where(F.col("qid") != F.col("nid"))
            pair_tables.append(
                pairs.select(
                    "qid", "nid",
                    F.round(
                        similarity._safe_cos(
                            similarity._dot(F.col("qv"), F.col("nv")),
                            F.col("qn") * F.col("nn"),
                        ), 7,
                    ).alias("cosine"),
                )
            )
        allp = pair_tables[0]
        for p in pair_tables[1:]:
            allp = allp.unionByName(p)
        dd = allp.groupBy("qid", "nid").agg(F.first("cosine").alias("cosine"))
        w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
        return (
            dd.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                F.col("qid").alias("vec_id"), F.col("nid").alias("neighbor_id"),
                "cosine", "rank",
            )
        )

    for mp, mb in ((1, 1024), (0, None)):
        got = similarity.knn_join(
            df, k=3, n_planes=3, dim=8, n_tables=2, multiprobe=mp, max_bucket=mb
        ).collect()
        want = directed_reference(
            k=3, n_planes=3, n_tables=2, multiprobe=mp, max_bucket=mb
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), (mp, mb)


def test_emb_lsh_pairs_match_per_table_reference(spark):
    """The round-14 single-join LSH near-dup (one exploded (table, bucket)
    candidate join, score each distinct pair once) must reproduce the
    per-table reference exactly: n_tables separate bucketed pairwise
    passes unioned and deduped."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(80)]
    # a few exact duplicates so real near-dup pairs exist
    rows += [(80 + j, list(rows[j][1])) for j in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    got = dedup.embedding_near_dup_pairs_lsh(
        df, threshold=0.3, n_planes=3, n_tables=4, dim=8
    ).collect()

    vecs = dedup._prepared_vectors(df, "vec_id", "embedding")
    tables = []
    for t in range(4):
        planes = similarity.hyperplanes(8, 3, 42 + t)
        bucketed = vecs.withColumn(
            "lsh_bucket", similarity.bucket_expr(F.col("v"), planes)
        )
        tables.append(
            dedup._pairwise_cosine(bucketed, "vec_id", 0.3, join_extra=["lsh_bucket"])
        )
    want = tables[0]
    for t in tables[1:]:
        want = want.unionByName(t)
    want = want.dropDuplicates(["id_a", "id_b"]).collect()

    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_sql_text_builders_identical(spark):
    """The SQL-text fast paths of bucket_expr / _centroid_id_expr /
    pq_encode_expr (one parse instead of eager per-lambda py4j round
    trips) must produce values identical to the Column-DSL forms on the
    same data — including a column name needing backtick quoting."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    planes = similarity.hyperplanes(8, 4, 9)
    cents = [[float(x) for x in rng.standard_normal(8)] for _ in range(5)]
    books = [
        [[float(x) for x in rng.standard_normal(4)] for _ in range(3)]
        for _ in range(2)
    ]

    for col_form, sql_form in (
        (
            similarity.bucket_expr(F.col("embedding"), planes),
            similarity.bucket_expr("embedding", planes),
        ),
        (
            similarity._centroid_id_expr(F.col("embedding"), cents),
            similarity._centroid_id_expr("embedding", cents),
        ),
        (
            similarity.pq_encode_expr(F.col("embedding"), books),
            similarity.pq_encode_expr("embedding", books),
        ),
    ):
        bad = (
            df.select((~col_form.eqNullSafe(sql_form)).alias("m"))
            .where("m")
            .count()
        )
        assert bad == 0

    # weird column name round-trips through _quote
    odd = df.withColumnRenamed("embedding", "emb ed`ding")
    got = odd.select(
        similarity.bucket_expr("emb ed`ding", planes).alias("b")
    ).collect()
    want = odd.select(
        similarity.bucket_expr(F.col("`emb ed``ding`"), planes).alias("b")
    ).collect()
    assert [r["b"] for r in got] == [r["b"] for r in want]

    # non-finite literals fall back to the Column path instead of breaking
    nf = similarity._centroid_id_expr("embedding", [[float("nan")] * 8, [0.0] * 8])
    assert nf is not None


def test_lit_double_array_value_exact(spark):
    """The one-round-trip SQL literal array must be bit-identical to the
    per-element F.lit path for every representable double, including
    shortest-repr edge cases; non-finite values fall back per-element."""
    from pyspark.sql import functions as F

    vals = [
        0.1 + 0.2, 1e-17, -3.9999999999999996, 123456789.123456789,
        5e-324, 1.7976931348623157e308, -0.0, 0.0, 2.0,
    ]
    df = spark.range(1)
    row = df.select(
        similarity.lit_double_array(vals).alias("fast"),
        F.array(*[F.lit(float(v)) for v in vals]).alias("slow"),
    ).first()
    import struct
    bits = lambda x: struct.pack("<d", x)  # noqa: E731 — -0.0 == 0.0 hides sign
    assert [bits(v) for v in row["fast"]] == [bits(v) for v in row["slow"]]

    nan_inf = [float("nan"), float("inf"), 1.0]
    row2 = df.select(similarity.lit_double_array(nan_inf).alias("a")).first()
    assert math.isnan(row2["a"][0]) and math.isinf(row2["a"][1])
    assert row2["a"][2] == 1.0

    assert df.select(similarity.lit_double_array([]).alias("e")).first()["e"] == []
