"""text / dedup / similarity / multimodal / spatial library tests."""

import math

import pytest
from pyspark.sql import functions as F

from stdb_spark.functions import dedup, similarity, text
from stdb_spark.functions.multimodal import (
    extract_image_features,
    make_fake_media,
    sample_video_frames,
)
from stdb_spark.operators import spatial


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "src0"),
        (1, "the quick brown fox jumps over the lazy cat", "src0"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog", "src0"),  # exact dup of 0
        (3, "completely different words entirely unrelated text", "src1"),
        (4, "der hund ist nicht der beste und das ist gut", "src1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0].dup_count == 2 and out[0].keep_id == 0


def test_ngram_jaccard_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()
    got = {(r.a, r.b): r.jaccard for r in pairs}
    assert (0, 2) in got and got[(0, 2)] == 1.0  # exact dup
    assert (0, 1) in got and 0.5 <= got[(0, 1)] < 1.0  # near dup
    assert (0, 3) not in got


def test_minhash_lsh_finds_near_dups(docs):
    sigs = dedup.minhash_signatures(docs, num_hashes=32, shingle_n=2)
    cands = dedup.minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
    got = {(r.a, r.b) for r in cands.collect()}
    assert (0, 2) in got  # identical docs always collide
    est = dedup.minhash_jaccard_estimate(sigs, cands).collect()
    by_pair = {(r.a, r.b): r.est_jaccard for r in est}
    assert by_pair[(0, 2)] == 1.0


def test_simhash_and_hamming(docs):
    sigs = dedup.simhash(docs)
    vals = {r.doc_id: r.simhash for r in sigs.collect()}
    assert vals[0] == vals[2]  # identical text -> identical signature
    pairs = dedup.hamming_pairs(sigs, max_distance=3).collect()
    d = {(r.a, r.b): r.hamming for r in pairs if (r.a, r.b) == (0, 2)}
    assert d.get((0, 2)) == 0


def test_hamming_full_recall_high_bits(spark):
    """A distance<=3 pair differing ONLY in the high 16 bits must be
    found (the single-block scheme missed exactly this case)."""
    rows = [
        (1, 0x0123_4567_89AB_CDEF),
        (2, 0x0123_4567_89AB_CDEF ^ (0b11 << 60)),  # 2 flipped bits in block 3
        (3, 0x7FFF_0000_0000_0001),
    ]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {(r.a, r.b): r.hamming for r in dedup.hamming_pairs(sigs).collect()}
    assert got == {(1, 2): 2}
    import pytest

    with pytest.raises(ValueError):
        dedup.hamming_pairs(sigs, max_distance=8, blocks=4)


def test_jaccard_df_cap_bounds_stop_shingle_blowup(spark):
    """A planted stop-shingle shared by every doc must not contribute
    pairs when df_cap is below its document frequency — and must when
    the cap is lifted."""
    common = "of the and"  # one trigram shared by all docs
    rows = [(i, f"{common} unique{i} word{i} tail{i}", "s") for i in range(20)]
    # plus one genuine near-dup pair sharing distinctive trigrams
    rows += [
        (100, "alpha beta gamma delta epsilon zeta", "s"),
        (101, "alpha beta gamma delta epsilon eta", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    capped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.05, df_cap=10)
    got = {(r.a, r.b) for r in capped.collect()}
    # the 20 stop-shingle-only docs produced no pairs (df=20 > cap=10)
    assert all(a >= 100 for a, b in got), got
    assert (100, 101) in got
    uncapped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.05)
    n_un = uncapped.count()
    assert n_un >= 20 * 19 // 2  # quadratic blowup without the cap


def test_minhash_bucket_cap_bounds_exact_dup_class(spark):
    """An exact-dup class collides in EVERY band; bucket_cap drops those
    quadratic groups while distinct near-dups still pair."""
    rows = [(i, "the quick brown fox jumps over the lazy dog", "s") for i in range(15)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta", "s"),
        (101, "alpha beta gamma delta epsilon zeta eta iota", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sigs = dedup.minhash_signatures(docs)
    capped = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_candidates(sigs, bucket_cap=10).collect()
    }
    # the 15-copy class produced nothing (every band bucket has 15 > 10)
    assert all(a >= 100 for a, b in capped), capped
    uncapped = {
        (r.a, r.b) for r in dedup.minhash_lsh_candidates(sigs).collect()
    }
    assert len({p for p in uncapped if p[0] < 100}) == 15 * 14 // 2


def test_hamming_group_cap_bounds_degenerate_block(spark):
    """Signatures all sharing a degenerate all-zeros low block form a
    quadratic postings group; group_cap bounds it while pairs that
    agree on a surviving block are still found."""
    # 30 docs: distinct high halves, all-zero low 32 bits (blocks 0+1)
    rows = [(i, (i + 1) << 40) for i in range(30)]
    # one real near-dup pair agreeing on blocks 2..3 (distance 1 in block 0)
    rows += [(100, 0x0123_4567_89AB_CDEF), (101, 0x0123_4567_89AB_CDEE)]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    capped = dedup.hamming_pairs(sigs, max_distance=3, group_cap=10)
    got = {(r.a, r.b) for r in capped.collect()}
    # only the pair that agrees on a small (uncapped) group survives
    assert got == {(100, 101)}
    uncapped = {
        (r.a, r.b) for r in dedup.hamming_pairs(sigs, max_distance=3).collect()
    }
    assert (100, 101) in uncapped and len(uncapped) > 1


def test_knn_classify_majority_vote(spark):
    import math

    def vec(theta):
        return [math.cos(theta), math.sin(theta)] + [0.0] * 2

    # corpus: 3 vectors near 0 rad labeled 1, 2 vectors near pi/2 labeled 2
    rows = [(10, vec(0.00), 1), (11, vec(0.05), 1), (12, vec(-0.05), 1),
            (13, vec(1.55), 2), (14, vec(1.60), 2)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = spark.createDataFrame(
        [(0, vec(0.02)), (1, vec(1.57))], "query_id long, embedding array<float>"
    )
    out = {r.query_id: (r.pred_label, r.votes)
           for r in similarity.knn_classify(corpus, queries, k=3).collect()}
    assert out[0] == (1, 3)   # all three label-1 vectors are nearest
    assert out[1] == (2, 2)   # both label-2 vectors in top-3, beats 1 vote...
    # tie impossible here: k=3 -> votes are (2,1); label 2 wins on count


def test_tfidf_top_terms(spark):
    rows = [
        (0, "apple banana banana cherry", "s"),
        (1, "apple cherry cherry cherry", "s"),
        (2, "apple durian", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = text.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rk, r.term, r.score))
    # 'apple' appears in all 3 docs -> idf = ln(1) = 0, never ranks first
    import math

    for d, terms in by_doc.items():
        terms.sort()
        assert terms[0][1] != "apple", terms
        assert len(terms) <= 2
    # doc 0's top term: banana (tf=2, df=1 -> 2*ln(3))
    assert by_doc[0][0][1] == "banana"
    assert by_doc[0][0][2] == pytest.approx(2 * round(math.log(3), 6), abs=1e-9)
    # doc 2: durian (tf=1, df=1) beats apple (idf 0)
    assert by_doc[2][0][1] == "durian"


def test_lang_id(docs):
    out = {r.doc_id: r.lang_pred for r in text.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[4] == "de"


def test_token_count_and_quality(docs):
    out = text.quality_score(docs).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].n_tokens == 9
    assert 0 < by_id[0].quality_score <= 1.0


def test_brute_force_topk(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.brute_force_top_k(df, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert out[0].vec_id == 0 and abs(out[0].cosine - 1.0) < 1e-12


def test_lsh_topk_contains_exact_hit(spark):
    rows = [(i, [math.sin(i * 7 + j) for j in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [math.sin(21 + j) for j in range(8)]  # == vec 3
    out = similarity.lsh_top_k(df, q, k=5, n_planes=6, n_tables=4).collect()
    assert out and out[0].vec_id == 3  # its own bucket always probes


def test_centroid_per_label(spark):
    rows = [(0, 0, [2.0, 0.0]), (1, 0, [0.0, 2.0]), (2, 1, [4.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = {r.label: r.centroid for r in similarity.centroid_per_label(df).collect()}
    assert out[0] == [1.0, 1.0] and out[1] == [4.0, 4.0]


def test_multimodal_features(spark):
    media = make_fake_media(spark, n=8)
    feats = extract_image_features(media).collect()
    assert len(feats) == 8
    for r in feats:
        assert r.n_px == 32 * 24
        assert 0 <= r.mean_px <= 255


def test_video_frame_sampling(spark):
    media = make_fake_media(spark, n=3, kind="video")
    frames = sample_video_frames(media, every_ms=500)
    counts = frames.groupBy("media_id").count().collect()
    # duration 1000+i ms -> 3 ticks (0,500,1000) for all three
    assert all(r["count"] == 3 for r in counts)


def test_spatial_range_and_knn(spark):
    pts = spark.createDataFrame(
        [(i * 10 + j, 120.0 + i * 0.001, 30.0 + j * 0.001) for i in range(10) for j in range(10)],
        "id long, lon double, lat double",
    )
    box = spatial.range_query(pts, 120.0, 120.002, 30.0, 30.002).collect()
    assert len(box) == 9  # 3x3 inclusive grid
    nn = spatial.knn(pts, 120.0, 30.0, 3, tie_break="id").collect()
    assert nn[0].id == 0 and nn[0]._dist == 0.0


def test_fingerprint_deterministic(docs):
    a = {r.doc_id: r.fingerprint for r in text.fingerprint(docs).collect()}
    b = {r.doc_id: r.fingerprint for r in text.fingerprint(docs).collect()}
    assert a == b
    assert a[0] == a[2]  # identical text
    assert a[0] != a[3]


def test_ivf_exact_within_probed_cells(spark):
    """ivf_top_k == brute force restricted to the probed cells, and the
    probe actually prunes (candidates < table size)."""
    from stdb_spark import model
    from stdb_spark.functions import similarity
    from stdb_spark.workloads.docsuite import _QVEC

    emb = model.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = similarity.ivf_top_k(emb, _QVEC, k=10, n_probe=2)
    rows = got.collect()
    assert len(rows) == 10
    labels = {
        r.label
        for r in emb.join(got.select("vec_id"), "vec_id").select("label").collect()
    }
    assert len(labels) <= 2  # results come only from probed cells
    brute = similarity.brute_force_top_k(
        emb.filter(emb.label.isin(list(labels))), _QVEC, k=10
    ).collect()
    assert [r.vec_id for r in rows] == [r.vec_id for r in brute]


def test_knn_grid_equals_bruteforce_random(spark):
    """Grid-pruned KNN is exact for arbitrary query points/cell sizes."""
    from stdb_spark.operators.spatial import knn, knn_grid

    pts = spark.createDataFrame(
        [(i, 116.0 + (i % 40) * 0.01, 39.0 + (i // 40) * 0.01) for i in range(400)],
        "user_id long, lon double, lat double",
    )
    for q, cell in [((116.21, 39.033), 0.03), ((115.9, 38.9), 0.1), ((116.5, 39.2), 0.02)]:
        g = knn_grid(pts, q[0], q[1], 7, cell_deg=cell, tie_break="user_id").collect()
        b = knn(pts, q[0], q[1], 7, tie_break="user_id").collect()
        assert [r.user_id for r in g] == [r.user_id for r in b], (q, cell)


def test_embedding_neardup_guard(spark):
    """Unblocked near-dup = cartesian product; the API must refuse it
    unless explicitly opted in."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    import pytest

    with pytest.raises(ValueError):
        dedup.embedding_near_duplicates(df)
    out = dedup.embedding_near_duplicates(df, allow_full_cross=True, threshold=0.9)
    assert out.count() == 1


def test_audio_features(spark):
    """Features run on GENUINE decoded PCM: make_fake_media emits real
    RIFF/WAV payloads and the extractor's numbers must equal a direct
    numpy computation over decode_wav's samples."""
    import numpy as np

    from stdb_spark.functions.multimodal import (
        decode_wav,
        extract_audio_features,
        make_fake_media,
    )

    media = make_fake_media(spark, n=4, kind="audio")
    out = extract_audio_features(media).collect()
    assert len(out) == 4
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for r in out:
        pcm, rate = decode_wav(payloads[r.media_id])
        assert rate == 8000 and r.n_samples == pcm.size == 400
        assert r.rms == float(np.sqrt(np.mean(pcm.astype("f8") ** 2))) > 0
        assert r.zero_crossings == int(
            np.count_nonzero(np.diff(np.signbit(pcm)))
        )
    # deterministic across runs (seeded payloads)
    again = {r.media_id: r.rms for r in extract_audio_features(media).collect()}
    assert again == {r.media_id: r.rms for r in out}


def test_audio_features_opaque_fallback(spark):
    """Non-WAV payloads still flow through the plan via the documented
    byte-reinterpretation fallback (the compressed-codec boundary)."""
    from stdb_spark.functions.multimodal import MEDIA_SCHEMA, extract_audio_features

    media = spark.createDataFrame(
        [(0, "audio", "audio/mpeg", 0, 0, 1000, bytes(range(256)))],
        MEDIA_SCHEMA,
    )
    r = extract_audio_features(media).collect()[0]
    assert r.n_samples == 256 and r.rms > 0


def test_connected_components_transitive(spark):
    # chain 1-2-3 (1~3 never paired) + island 10-11 + long path 20..24:
    # transitivity must collapse chains; disjoint components stay apart
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "a long, b long",
    )
    got = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20), (24, 20),
    }


def test_connected_components_matches_union_find(spark):
    import random

    rng = random.Random(7)
    ids = list(range(60))
    pairs = [
        (rng.choice(ids), rng.choice(ids))
        for _ in range(45)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    # union-find ground truth
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = {}
    for a, b in pairs:
        for x in (a, b):
            members.setdefault(find(x), set()).add(x)
    want = {
        (x, min(ms)) for root, ms in members.items() for x in ms
    }
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(df).collect()
    }
    assert got == want


def test_hash_sample_deterministic_and_nested(spark):
    from stdb_spark.functions import sampling

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s10 = {r.doc_id for r in sampling.hash_sample(df, fraction=0.1).collect()}
    s30 = {r.doc_id for r in sampling.hash_sample(df, fraction=0.3).collect()}
    again = {r.doc_id for r in sampling.hash_sample(df, fraction=0.1).collect()}
    assert s10 == again  # rerun-stable
    assert s10 <= s30  # nested: a smaller fraction is a subset
    assert 0.05 < len(s10) / 2000 < 0.15  # roughly the asked fraction
    other = {
        r.doc_id for r in sampling.hash_sample(df, fraction=0.1, salt="s1").collect()
    }
    assert other != s10  # independent draw under a new salt


def test_stratified_quota_exact_n(spark):
    from stdb_spark.functions import sampling

    rows = [(i, f"src{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.stratified_quota(df, "source", n=7).collect()
    per = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + 1
    assert per == {"src0": 7, "src1": 7, "src2": 7}
    again = {(r.doc_id, r.source) for r in sampling.stratified_quota(df, "source", n=7).collect()}
    assert again == {(r.doc_id, r.source) for r in out}


def test_ngram_contamination_planted(spark):
    from stdb_spark.functions import sampling

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains an 8-token window copied from the benchmark
            (1, "intro words then the quick brown fox jumps over the lazy trailing"),
            (2, "completely unrelated text with no overlap at all whatsoever here"),
        ],
        "doc_id long, text string",
    )
    out = sampling.ngram_contamination(corpus, bench, n=8).collect()
    assert {(r.doc_id, r.bench_id) for r in out} == {(1, 100)}
    assert out[0].shared_ngrams == 1


def test_kmeans_deterministic_and_ivf_full_probe_exact(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = similarity.kmeans_fit(df, k=4, iters=3)
    c2 = similarity.kmeans_fit(df, k=4, iters=3)
    assert c1 == c2  # hash-seeded init + exact algebra -> reproducible
    q = [1.0] * 8
    exact = [r.vec_id for r in similarity.brute_force_top_k(df, q, k=5).collect()]
    # probing every cell must equal brute force
    full = [
        r.vec_id
        for r in similarity.ivf_top_k_trained(df, c1, q, k=5, n_probe=4).collect()
    ]
    assert full == exact
    # probing 2/4 cells: results are a subset of the table, ranked by cosine
    part = similarity.ivf_top_k_trained(df, c1, q, k=5, n_probe=2).collect()
    assert len(part) == 5
    cos = [r.cosine for r in part]
    assert cos == sorted(cos, reverse=True)


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a\nline two\nline two"),
            (2, "all tokens unique here\nsolo line"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.repetition_stats(df).collect()}
    # doc 1: 3 lines, "line two" duplicated once -> 1/3; tokens span
    # lines: [a b a b a line two line two] -> 9 tokens, 4 distinct ->
    # 5/9 dup; top token 'a' appears 3/9
    assert abs(out[1].dup_line_ratio - 1 / 3) < 1e-12
    assert abs(out[1].dup_token_ratio - 5 / 9) < 1e-12
    assert abs(out[1].top_token_share - 3 / 9) < 1e-12
    assert out[2].dup_line_ratio == 0.0
    assert out[2].dup_token_ratio == 0.0
    assert abs(out[2].top_token_share - 1 / 6) < 1e-12


def test_unigram_logprob_ranks_rare_docs_lower(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "rare1 rare2 rare3 rare4"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.mean_logprob for r in text.unigram_logprob(df).collect()}
    # 'common' has corpus probability 4/8; each rare token 1/8
    import math

    assert abs(out[1] - math.log(0.5)) < 1e-9
    assert abs(out[2] - math.log(1 / 8)) < 1e-9
    assert out[2] < out[1]


def test_bigram_logprob_laplace_smoothed_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b"),   # bigrams: "a b", "b a", "a b"
            (2, "a b c"),     # bigrams: "a b", "b c"
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.mean_bigram_logprob, r.n_bigrams)
        for r in text.bigram_logprob(df).collect()
    }
    # corpus: C(a b)=3, C(b a)=1, C(b c)=1; context counts are bigram
    # starts: C(a·)=3, C(b·)=2; V=3 (a,b,c).
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    exp1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1][1] == 3 and out[2][1] == 2
    assert abs(out[1][0] - exp1) < 1e-9
    assert abs(out[2][0] - exp2) < 1e-9


def test_bigram_logprob_skips_single_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens")], "doc_id long, text string"
    )
    out = text.bigram_logprob(df).collect()
    assert {r.doc_id for r in out} == {2}


def test_train_val_test_split_deterministic_and_partitioning(spark):
    from stdb_spark.functions import sampling

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    out = sampling.train_val_test_split(df)
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in out.collect()}
    assert a == b  # deterministic across runs
    assert set(a.values()) == {"train", "val", "test"}  # all splits populated
    # every doc lands in exactly one split and train dominates at 80%
    from collections import Counter

    c = Counter(a.values())
    assert sum(c.values()) == 200
    assert c["train"] > c["val"] and c["train"] > c["test"]
    with pytest.raises(ValueError):
        sampling.train_val_test_split(df, weights=(0.5, 0.2, 0.2))


def test_importance_logratio_dsir_exact(spark):
    df = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "b c", "de")],
        "doc_id long, text string, lang string",
    )
    out = {
        r.doc_id: (r.mean_logratio, r.n_tokens)
        for r in text.importance_logratio(df, target=F.col("lang") == "en").collect()
    }
    # counts: a(bg 2, tgt 2) b(bg 2, tgt 1) c(bg 1, tgt 0); n_bg=5,
    # n_tgt=3, V=3 → p_t/p_b per token computed with add-one smoothing
    r_a = math.log((3 / 6) / (3 / 8))
    r_b = math.log((2 / 6) / (3 / 8))
    r_c = math.log((1 / 6) / (2 / 8))
    assert out[1][1] == 3 and out[2][1] == 2
    assert abs(out[1][0] - (2 * r_a + r_b) / 3) < 1e-9
    assert abs(out[2][0] - (r_b + r_c) / 2) < 1e-9
    assert out[1][0] > out[2][0]  # target-domain doc weighs higher


def test_containment_catches_embedded_doc(spark):
    long_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    short_text = "gamma delta epsilon zeta"  # fully contained in long
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    out = {
        (r.a, r.b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in dedup.containment_pairs(df, n=2, threshold=0.8).collect()
    }
    # doc 2's 3 bigrams are all inside doc 1's 9 → containment(2 in 1)=1.0
    assert (1, 2) in out
    assert out[(1, 2)][1] == 1.0          # b (short) fully inside a (long)
    assert abs(out[(1, 2)][0] - 3 / 9) < 1e-12  # asymmetry preserved
    assert not any(3 in p for p in out)


def test_containment_df_cap_drops_stop_shingles(spark):
    # shingle "x y" appears in every doc; with df_cap=2 it is dropped, so
    # the only surviving overlap between 1 and 2 disappears entirely
    df = spark.createDataFrame(
        [(1, "x y a"), (2, "x y b"), (3, "x y c")],
        "doc_id long, text string",
    )
    no_cap = dedup.containment_pairs(df, n=2, threshold=0.4).collect()
    capped = dedup.containment_pairs(df, n=2, threshold=0.4, df_cap=2).collect()
    assert len(no_cap) == 3 and len(capped) == 0


def test_image_phash_dedup_finds_planted_duplicates(spark):
    from stdb_spark.functions import multimodal

    media = multimodal.make_fake_media(spark, n=12, kind="image")
    dup = media.selectExpr(
        "media_id + 100 AS media_id", "kind", "mime", "width", "height",
        "duration_ms", "payload",
    ).limit(3)
    hashes = multimodal.image_phash(media.unionByName(dup))
    h = {r.media_id: r.phash for r in hashes.collect()}
    assert h[100] == h[0] and h[101] == h[1] and h[102] == h[2]
    pairs = {
        (r.a, r.b)
        for r in dedup.hamming_pairs(
            hashes, sig_col="phash", key="media_id", max_distance=3
        ).collect()
    }
    assert {(0, 100), (1, 101), (2, 102)} <= pairs


def test_weighted_sample_bounds_and_monotonicity(spark):
    from stdb_spark.functions import sampling

    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    zero = sampling.weighted_sample(
        df.withColumn("w", F.lit(0.0)), "w"
    ).count()
    allr = sampling.weighted_sample(
        df.withColumn("w", F.lit(1.0)), "w"
    ).count()
    assert zero == 0 and allr == 500
    # monotone: a row kept at weight p stays kept at weight q > p
    lo = {
        r.doc_id
        for r in sampling.weighted_sample(
            df.withColumn("w", F.lit(0.3)), "w"
        ).collect()
    }
    hi = {
        r.doc_id
        for r in sampling.weighted_sample(
            df.withColumn("w", F.lit(0.7)), "w"
        ).collect()
    }
    assert lo <= hi
    assert 0 < len(lo) < len(hi) < 500


def test_label_centroids_match_numpy(spark):
    import numpy as np

    from stdb_spark.functions import similarity

    vecs = {
        0: [[1.0, 2.0, 3.0], [3.0, 2.0, 1.0]],
        1: [[0.5, 0.5, 0.5]],
    }
    rows = [(lbl, v) for lbl, vs in vecs.items() for v in vs]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        (r.label, r.pos): r.centroid
        for r in similarity.label_centroids(df).collect()
    }
    for lbl, vs in vecs.items():
        mean = np.mean(np.array(vs), axis=0)
        for pos in range(3):
            assert abs(got[(lbl, pos)] - mean[pos]) < 1e-9, (lbl, pos)


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from stdb_spark.functions import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nboiler\nbeta"),
            (2, "boiler\ngamma"),   # 'boiler' already seen in doc 1
            (3, "delta\n\nboiler"),  # blank para survives; boiler dropped
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in dedup.paragraph_dedup(docs).collect()}
    assert got == {
        1: "alpha\nboiler\nbeta",
        2: "gamma",
        3: "delta\n",
    }


def test_shuffle_shards_is_total_permutation(spark):
    from stdb_spark.functions import packing

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = packing.shuffle_shards(df, n_shards=4, salt="t0").collect()
    assert len(out) == 200
    # every (shard, pos) cell is unique and pos is dense per shard
    cells = {(r.shard, r.pos) for r in out}
    assert len(cells) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # deterministic across recomputation
    again = {(r.doc_id, r.shard, r.pos) for r in
             packing.shuffle_shards(df, n_shards=4, salt="t0").collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in out}
    # a different salt draws a different permutation
    other = {(r.doc_id, r.shard, r.pos) for r in
             packing.shuffle_shards(df, n_shards=4, salt="t1").collect()}
    assert other != again


def test_pack_concat_chunks_layout(spark):
    from stdb_spark.functions import packing

    budget = 10
    df = spark.range(60).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
    )
    rows = packing.pack_concat_chunks(
        df, budget=budget, n_shards=3, salt="t0"
    ).collect()
    assert len(rows) == 60
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        # within a shard the layout is a gapless token stream: sorting
        # docs by (bin_id, offset) replays exact cumulative positions
        rs = sorted(rs, key=lambda r: (r.bin_id, r.offset))
        cum = 0
        for r in rs:
            assert r.bin_id == cum // budget
            assert r.offset == cum % budget
            cum += r.n_tokens


def test_semantic_dedup_finds_planted_duplicates(spark):
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(40):
        v = [rnd.gauss(0, 1) for _ in range(8)]
        rows.append((i, v))
    # plant two exact duplicates and one scaled copy (cosine == 1.0)
    rows.append((100, list(rows[3][1])))
    rows.append((101, [2.0 * x for x in rows[7][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_fit(df, k=4, iters=3)
    pairs = {
        (r.a, r.b)
        for r in similarity.semantic_dedup_pairs(
            df, cents, threshold=0.999
        ).collect()
    }
    # identical/scaled vectors share an argmin cell, so both planted
    # pairs must be discovered despite the cluster pruning
    assert (3, 100) in pairs
    assert (7, 101) in pairs


def test_pack_layout_invariant_under_repartition(spark):
    # the packing layout must be a pure function of content — any
    # dependence on physical partitioning breaks training-run
    # reproducibility (the whole point of hash-keyed packing)
    from stdb_spark.functions import packing

    df = spark.range(120).select(
        F.col("id").alias("doc_id"), (F.col("id") % 11 + 1).alias("n_tokens")
    )
    base = {
        (r.doc_id, r.shard, r.bin_id, r.offset)
        for r in packing.pack_concat_chunks(df, budget=16, n_shards=4).collect()
    }
    for parts in (1, 7):
        again = {
            (r.doc_id, r.shard, r.bin_id, r.offset)
            for r in packing.pack_concat_chunks(
                df.repartition(parts), budget=16, n_shards=4
            ).collect()
        }
        assert again == base


# ------------------------------------------------- corpus curation v3


def test_c4_line_filter_rules(spark):
    rows = [
        (0, "This line is long enough to keep.\nshort\nAnother good line stays here.\n"
            "no terminal punctuation on this line\n"
            "Enable javascript to view this page.\nFinal proper sentence ends well."),
        (1, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.c4_line_filter(
        df, min_words_per_line=3, require_terminal_punct=True,
        blacklist=("javascript",), min_kept_lines=1,
    ).collect()
    # doc 1 has no qualifying line at all -> dropped entirely
    assert [r.doc_id for r in out] == [0]
    kept = out[0].clean_text.split("\n")
    assert kept == [
        "This line is long enough to keep.",
        "Another good line stays here.",
        "Final proper sentence ends well.",
    ]
    assert out[0].n_kept_lines == 3


def test_c4_line_filter_min_kept_lines(spark):
    df = spark.createDataFrame(
        [(0, "Only one good line here.\njunk")], "doc_id long, text string"
    )
    assert (
        text.c4_line_filter(df, min_kept_lines=2, require_terminal_punct=True).count()
        == 0
    )


def test_source_mixture_epoch_counts(spark):
    from stdb_spark.functions import sampling

    rows = [(i, f"s{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"s0": 2.0, "s1": 0.5, "s2": 1.0}  # s3 dropped
    out = sampling.source_mixture(df, weights).groupBy("source").agg(
        F.count("*").alias("n"), F.countDistinct("doc_id").alias("d")
    ).collect()
    by = {r.source: r for r in out}
    assert set(by) == {"s0", "s1", "s2"}
    assert by["s0"].n == 200 and by["s0"].d == 100  # exactly 2 epochs each
    assert by["s2"].n == 100 and by["s2"].d == 100  # exactly 1 epoch
    assert 20 <= by["s1"].n <= 80 and by["s1"].n == by["s1"].d  # ~50% hash draw
    # determinism: the fractional draw is content-hashed, not RNG
    again = sampling.source_mixture(df, weights)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, sampling.source_mixture(df.repartition(7), weights).collect())
    )


def test_length_bucket_stats_hand_computed(spark):
    from stdb_spark.functions import packing

    df = spark.createDataFrame(
        [(1, 10), (2, 64), (3, 65), (4, 5000)], "doc_id long, n_tokens long"
    )
    out = {r.bucket: r for r in packing.length_bucket_stats(df).collect()}
    assert out[64].n_docs == 2 and out[64].padding_tokens == (64 - 10) + 0
    assert out[128].n_docs == 1 and out[128].padding_tokens == 63
    assert out[4096].n_docs == 1
    assert out[4096].truncated_tokens == 5000 - 4096
    assert out[4096].padding_tokens == 0  # clamped doc fills its rung


def test_int8_quantization_bounds_and_ann_agreement(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)
    ] + [(200, [0.0] * 16)]  # zero vector must not divide by zero
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [rng.uniform(-1, 1) for _ in range(16)]
    exact = [r.vec_id for r in similarity.brute_force_top_k(df, q, k=5).collect()]
    quant = [r.vec_id for r in similarity.ann_int8_top_k(df, q, k=5).collect()]
    # int8 keeps ~2 decimal digits: top-5 overlap should be near-total
    assert len(set(exact) & set(quant)) >= 4
    # per-element quantization error is bounded by scale/2
    sc, qv = similarity.quantize_query_int8(q)
    assert all(abs(qi * sc - xi) <= sc / 2 + 1e-12 for qi, xi in zip(qv, q))
    assert similarity.quantize_query_int8([0.0, 0.0]) == (0.0, [0, 0])


def test_ngram_novelty_planted(spark, docs):
    out = {r.doc_id: r for r in dedup.ngram_novelty(docs, n=3).collect()}
    # docs 0 and 2 are exact duplicates: no shingle is unique to either
    assert out[0].novelty == 0.0 and out[2].novelty == 0.0
    # docs 3 and 4 share no trigram with anything else: fully novel
    assert out[3].novelty == 1.0 and out[4].novelty == 1.0
    # doc 1 differs from 0/2 only in the final word: "the lazy cat" is
    # its only unique trigram
    assert 0.0 < out[1].novelty < 1.0
    assert out[1].novel_shingles == 1


def test_snapshot_diff_classes(spark):
    v1 = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "same  TEXT"), (2, "has changed"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in dedup.snapshot_diff(v1, v2).collect()}
    # doc 1: differs only in case/whitespace -> digest-identical
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_simplified_silhouette_separated_vs_mixed(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    # two tight, well-separated clusters
    for lab, center in ((0, (10.0, 0.0)), (1, (-10.0, 0.0))):
        for _ in range(20):
            v = [center[0] + rng.normal(0, 0.1), center[1] + rng.normal(0, 0.1)]
            rows.append((vid, [float(x) for x in v], lab))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in similarity.simplified_silhouette(df).collect()}
    assert out[0].n == 20 and out[1].n == 20
    assert out[0].mean_silhouette > 0.95 and out[1].mean_silhouette > 0.95
    # numpy cross-check of the exact definition on one label
    X = np.array([r[1] for r in rows])
    labs = np.array([r[2] for r in rows])
    c0, c1 = X[labs == 0].mean(0), X[labs == 1].mean(0)
    sils = []
    for x in X[labs == 0]:
        a = np.linalg.norm(x - c0)
        b = np.linalg.norm(x - c1)
        sils.append((b - a) / max(a, b))
    assert abs(out[0].mean_silhouette - float(np.mean(sils))) < 1e-6
    # random labels on one blob: silhouette collapses toward <= 0
    mixed = spark.createDataFrame(
        [(i, [float(rng.normal()), float(rng.normal())], i % 2) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    mo = {r.label: r.mean_silhouette for r in similarity.simplified_silhouette(mixed).collect()}
    assert all(v < 0.3 for v in mo.values())


def test_dedup_keep_longest_policy(spark):
    from stdb_spark.workloads.docsuite import QUERIES as DQ  # noqa

    rows = [
        (1, "same text", "s", 9),
        (2, "same  TEXT", "s", 10),   # same digest, longer -> keeper
        (3, "same text", "s", 9),
        (4, "unique", "s", 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    digest = F.md5(dedup.normalized_text())
    out = (
        df.select(digest.alias("digest"), "doc_id", "n_chars")
        .groupBy("digest")
        .agg(
            F.count("*").alias("dup_count"),
            F.max(F.struct(F.col("n_chars").alias("len"), (-F.col("doc_id")).alias("negid"))).alias("_b"),
        )
        .filter(F.col("dup_count") > 1)
        .select("dup_count", F.col("_b.len").alias("keep_len"), (-F.col("_b.negid")).alias("keep_id"))
        .collect()
    )
    assert len(out) == 1
    assert (out[0].dup_count, out[0].keep_len, out[0].keep_id) == (3, 10, 2)


# ------------------------------------------------- duplicate-span profile
def test_dup_span_profile_counts_planted_spans(spark):
    from stdb_spark.functions.dedup import dup_span_profile

    boiler = "the quick brown fox jumps over the lazy"  # exactly 8 tokens
    rows = [
        (1, boiler + " dog one two three"),       # 12 toks -> 5 spans
        (2, "intro words here " + boiler),        # 11 toks -> 4 spans
        (3, "entirely unrelated text with eight tokens set here now"),
        (4, "short doc"),                          # < 8 tokens -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dup_span_profile(df, width=8).collect()}
    # the boilerplate 8-gram appears once in doc 1 (at pos 1) and once
    # in doc 2 (at pos 4) -> exactly one dup span each
    assert got[1].n_spans == 5 and got[1].n_dup_spans == 1
    assert got[2].n_spans == 4 and got[2].n_dup_spans == 1
    assert got[1].dup_ratio == pytest.approx(0.2)
    assert got[3].n_dup_spans == 0
    assert 4 not in got


def test_grid_density_counts(spark):
    from pyspark.sql import functions as F

    from stdb_spark.operators.spatial import grid_density

    pts = spark.createDataFrame(
        [(0.1, 0.1), (0.2, 0.15), (1.4, 0.1), (1.2, 1.3)],
        "lon double, lat double",
    )
    cx = F.floor(F.col("lon")).cast("long")
    cy = F.floor(F.col("lat")).cast("long")
    got = {(r.cell_x, r.cell_y): r.n for r in grid_density(pts, cx, cy).collect()}
    assert got == {(0, 0): 2, (1, 0): 1, (1, 1): 1}


def test_winnowing_shared_run_guarantee(spark):
    from stdb_spark.functions.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = k+w-1
    rows = [
        (1, "one two three " + shared + " four five"),
        (2, shared + " completely different tail words here"),
        (3, "unrelated content with no overlap at all present"),
        (4, "tiny doc"),  # < k tokens -> zero fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # recompute selections to check the winnowing guarantee via digest
    # equality is too strong; instead re-derive the selected SETS
    from pyspark.sql import functions as F

    from stdb_spark.functions.text import tokens_col

    k, w = 5, 4
    # re-derive only for docs long enough to have grams (the library
    # guards short docs itself; this manual mirror does not)
    df_long = df.filter(F.size(tokens_col("text")) >= k)
    base = df_long.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col("text")) - F.lit(k - 1)),
            lambda i: F.md5(F.array_join(F.slice(tokens_col("text"), i, k), " ")),
        ).alias("hs"),
    )
    sel = base.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("hs") - F.lit(w - 1)),
                lambda j: F.array_min(F.slice("hs", j, w)),
            )
        ).alias("fps"),
    )
    fps = {r.doc_id: set(r.fps) for r in sel.filter(F.size("hs") >= 1).collect()}
    # a shared run of k+w-1 tokens must share >= 1 fingerprint
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3])
    out = {r.doc_id: r for r in winnowing_fingerprints(df, k=k, window=w).collect()}
    assert out[4].n_fingerprints == 0
    assert out[1].n_fingerprints == len(fps[1])
    # identical docs share the digest
    df2 = spark.createDataFrame(
        [(10, "same words here exactly five tokens more pad"),
         (11, "same words here exactly five tokens more pad")],
        "doc_id long, text string",
    )
    o2 = {r.doc_id: r.fp_digest for r in winnowing_fingerprints(df2).collect()}
    assert o2[10] == o2[11]


def test_pq_roundtrip_and_adc_self_match(spark):
    import random

    from stdb_spark.functions import similarity

    rnd = random.Random(3)
    dim, m, ks = 16, 4, 4
    # corpus drawn from ks distinct prototype vectors per subspace so
    # k-means can recover the codebook structure
    protos = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(ks)]
    rows = [
        (i, [x + rnd.gauss(0, 0.01) for x in protos[i % ks]]) for i in range(48)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.pq_train(df, dim=dim, m=m, ks=ks, iters=3)
    assert len(books) == m and all(len(b) == ks for b in books)
    codes = similarity.pq_codes(df, books)
    got = codes.collect()
    assert all(len(r.code) == m and all(0 <= c < ks for c in r.code) for r in got)
    # ADC with a corpus vector as the query ranks a same-prototype
    # vector first (quantization collapses the 0.01 jitter)
    q = rows[5][1]
    top = similarity.pq_adc_top_k(codes, books, q, k=5).collect()
    assert top[0].adc_dist2 == pytest.approx(0.0, abs=1e-6) or (
        top[0].vec_id % ks == 5 % ks
    )


def test_dup_span_scrub_removes_second_occurrence_only(spark):
    from stdb_spark.functions.dedup import dup_span_scrub

    boiler = "a b c d e f g h"  # exactly 8 tokens
    rows = [
        (1, boiler + " tail one"),
        (2, "head words " + boiler + " more after that"),
        (3, "no duplicate content in this doc at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dup_span_scrub(df, width=8).collect()}
    # doc 1 holds the FIRST occurrence -> untouched
    assert got[1].text_scrubbed == boiler + " tail one"
    assert got[1].n_tokens_removed == 0
    # doc 2's copy is scrubbed; surrounding tokens survive
    assert got[2].text_scrubbed == "head words more after that"
    assert got[2].n_tokens_removed == 8
    assert got[2].n_tokens == 13
    assert got[3].n_tokens_removed == 0
    # intra-doc duplicate: second copy inside the SAME doc is removed
    d2 = spark.createDataFrame(
        [(9, boiler + " x " + boiler)], "doc_id long, text string"
    )
    out = dup_span_scrub(d2, width=8).collect()[0]
    assert out.text_scrubbed == boiler + " x"
    assert out.n_tokens_removed == 8


def test_quality_classifier_score_orders_real_over_junk(spark):
    from stdb_spark.functions.text import quality_classifier_score

    rows = [
        (1, "the cat sat on the mat and it was good"),   # stopword-rich prose
        (2, "zxqj kkwpv mmtr qqqqzzzz xxyyzz aabbccdd"), # junk
        (3, "supercalifragilisticexpialidocious" * 3),   # one huge token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in quality_classifier_score(df).collect()}
    assert got[1].quality_lin > got[2].quality_lin > got[3].quality_lin
    assert got[1].keep


def test_inverted_index_postings(spark):
    from stdb_spark.functions.text import inverted_index, term_lookup

    rows = [(1, "The cat and the dog"), (2, "a dog barks")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = inverted_index(df)
    got = {(r.term, r.doc_id): r.tf for r in idx.collect()}
    assert got[("the", 1)] == 2  # case-folded
    assert got[("dog", 1)] == 1 and got[("dog", 2)] == 1
    hits = {(r.term, r.doc_id) for r in term_lookup(idx, ["dog"]).collect()}
    assert hits == {("dog", 1), ("dog", 2)}


def test_phrase_query_consecutive_positions(spark):
    from stdb_spark.functions.text import phrase_query, positional_index

    rows = [
        (1, "the big bad wolf and the big bad dog"),
        (2, "big the bad wolf"),          # terms present, order broken
        (3, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = positional_index(df)
    got = {r.doc_id: r.n_matches
           for r in phrase_query(idx, ["big", "bad"]).collect()}
    assert got == {1: 2}
    # three-term phrase
    g3 = {r.doc_id: r.n_matches
          for r in phrase_query(idx, ["the", "big", "bad"]).collect()}
    assert g3 == {1: 2}


def test_bm25_ranks_term_dense_doc_first(spark):
    from stdb_spark.functions.text import bm25_topk, inverted_index, tokens_col

    rows = [
        (1, "spark spark spark engine"),
        (2, "spark engine and lots of other padding words here now"),
        (3, "unrelated content entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = inverted_index(df)
    dl = df.select("doc_id", F.size(tokens_col("text")).cast("long").alias("dl"))
    got = bm25_topk(idx, dl, ["spark"], k=3).collect()
    assert [r.doc_id for r in got][0] == 1   # highest tf, shortest doc
    assert len(got) == 2                     # doc 3 never matches
    assert got[0].bm25 > got[1].bm25 > 0


def test_centroid_outliers_flags_planted_far_vector(spark):
    import random

    rnd = random.Random(2)
    rows = [(i, [rnd.gauss(0, 0.05) for _ in range(8)], 0) for i in range(30)]
    rows.append((99, [50.0] * 8, 0))  # far from the label-0 cloud
    rows += [(200 + i, [5 + rnd.gauss(0, 0.05) for _ in range(8)], 1)
             for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r.label: r for r in similarity.centroid_outliers(df).collect()}
    assert got[0].n == 31 and got[0].n_outliers == 1
    assert got[1].n_outliers == 0


def test_pca_spectrum_recovers_low_rank(spark):
    import random

    rnd = random.Random(4)
    # rank-2 cloud in 8 dims: two orthogonal directions + tiny noise
    rows = []
    for i in range(200):
        a, b = rnd.gauss(0, 3), rnd.gauss(0, 1)
        v = [a, b] + [rnd.gauss(0, 0.01) for _ in range(6)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.pca_spectrum(df, k=4).collect()
    shares = [r.explained_share for r in sorted(got, key=lambda r: r.component)]
    assert shares[0] > shares[1] > shares[2]
    assert shares[0] + shares[1] > 0.99  # rank-2 dominates
    # partition invariance: the Gram merge is exact up to float addition
    again = similarity.pca_spectrum(df.repartition(7), k=4).collect()
    for r1, r2 in zip(sorted(got, key=lambda r: r.component),
                      sorted(again, key=lambda r: r.component)):
        assert abs(r1.eigenvalue - r2.eigenvalue) < 1e-9


def test_dup_span_scrub_rejects_string_key(spark):
    # the (doc, pos) BIGINT pack silently corrupts on a string key —
    # the guard must refuse at plan time
    import pytest as _pytest

    from stdb_spark.functions.dedup import dup_span_scrub

    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], "doc_id string, text string"
    )
    with _pytest.raises(TypeError, match="integral"):
        dup_span_scrub(docs, width=2)


def test_assign_cells_matmul_matches_expr(spark):
    # the BLAS matmul assignment and the literal-fold expression must
    # pick the same cells on clearly-separated data (the documented
    # near-tie ulp caveat never applies at this separation)
    import numpy as np

    from stdb_spark.functions import similarity

    rng = np.random.default_rng(99)
    cents = [list(map(float, rng.normal(0, 1, 8))) for _ in range(40)]
    rows = []
    for i, c in enumerate(cents):
        for j in range(5):
            v = np.asarray(c) + rng.normal(0, 0.01, 8)
            rows.append((i * 5 + j, [float(x) for x in v], i))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, want int"
    )
    got = similarity.with_ivf_cells(df, cents)  # k=40 -> matmul path
    assert got.filter(F.col("cell") != F.col("want")).count() == 0
    from stdb_spark.functions.similarity import _assign_cells_expr

    expr_cells = df.withColumn("cell", _assign_cells_expr("embedding", cents))
    assert expr_cells.filter(F.col("cell") != F.col("want")).count() == 0


def test_point_in_polygon_ray_casting(spark):
    from pyspark.sql import functions as F

    from stdb_spark.operators.spatial import point_in_polygon_sql

    square = [(0.0, 0.0), (2.0, 0.0001), (2.0, 2.0), (0.0001, 2.0)]
    pts = spark.createDataFrame(
        [
            (1, 1.0, 1.0),     # inside
            (2, 3.0, 1.0),     # right of polygon
            (3, -1.0, 1.0),    # left
            (4, 1.0, 2.5),     # above
            (5, 1.0, -0.5),    # below
            (6, 1.9999, 1.9999),  # inside, near corner
        ],
        "id long, lon double, lat double",
    )
    got = sorted(
        r.id
        for r in pts.filter(F.expr(point_in_polygon_sql(square))).collect()
    )
    assert got == [1, 6]
    # concave polygon: the notch is outside despite bbox containment
    concave = [(0.0, 0.0), (4.0, 0.0001), (4.0, 3.0), (2.0, 1.0), (0.0001, 3.0)]
    pts2 = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 1.0, 1.0), (3, 3.0, 1.0)],
        "id long, lon double, lat double",
    )
    got2 = sorted(
        r.id
        for r in pts2.filter(F.expr(point_in_polygon_sql(concave))).collect()
    )
    assert got2 == [2, 3]  # the notch point (2,2) is excluded


def test_paragraph_dedup_keeps_fully_deduped_docs(spark):
    from stdb_spark.functions import dedup

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in dedup.paragraph_dedup(docs).collect()}
    # doc 2's only paragraph loses the keeper race: it must come back
    # with EMPTY text, not vanish from the output
    assert out == {1: "hello world", 2: "", 3: "other text"}


def test_kmeans_exact_matches_pure_python(spark):
    """Integer fixed-point Lloyd's: the distributed implementation must
    equal a from-scratch driver-side replica bit-for-bit (the property
    the unrolled-CTE oracle then certifies cross-engine)."""
    import hashlib
    import math

    from stdb_spark.functions import similarity as sim

    rows = [(i, [math.sin(i * 7 + d) * 0.5 for d in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sim.kmeans_fit_exact(df, k=4, iters=3, qscale=1000)

    # pure-python replica of the spec
    QS = 1000
    # quantize exactly as the engines do: float32 storage first
    import numpy as np

    qrows = {
        i: [math.floor(float(np.float32(x)) * QS) for x in v] for i, v in rows
    }
    hs = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i)
        for i in qrows
    )
    cents = [list(qrows[i]) for _, i in hs[:4]]
    for _ in range(3):
        assign = {}
        for i, q in qrows.items():
            dists = [sum((a - b) ** 2 for a, b in zip(q, c)) for c in cents]
            assign[i] = dists.index(min(dists))
        new = []
        for ci in range(4):
            members = [qrows[i] for i in assign if assign[i] == ci]
            if not members:
                new.append(cents[ci])
                continue
            n = len(members)
            comp = []
            for d in range(8):
                s = sum(m[d] for m in members)
                # truncating division toward zero (Spark div / DuckDB //)
                comp.append(int(s / n) if s * n >= 0 else -(-s // n if s < 0 else s // -n))
            new.append(comp)
        cents = new
    assert got == cents


def test_ivf_exact_nprobe_all_equals_bruteforce(spark):
    """n_probe == k cells probes everything -> must equal brute force."""
    from stdb_spark.functions import similarity as sim
    from stdb_spark import model

    emb = model.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    cents = sim.kmeans_fit_exact(emb, k=4, iters=2)
    got = sim.ivf_top_k_exact(emb, cents, q, k=5, n_probe=4).collect()
    want = sim.brute_force_top_k(emb, q, k=5).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [
        (r.vec_id, r.cosine) for r in want
    ]


def test_pq_exact_self_query_ranks_self_first(spark):
    """Querying with a corpus vector must rank that vector first (its
    ADC distance is the quantization floor — minimal by construction)."""
    from stdb_spark.functions import similarity as sim
    from stdb_spark import model

    emb = model.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    target = emb.filter(F.col("vec_id") == 7).first()
    books = sim.pq_train_exact(emb, dim=64, m=4, ks=8, iters=2)
    codes = sim.pq_codes_exact(emb, books)
    top = sim.pq_adc_top_k_exact(
        codes, books, [float(x) for x in target.embedding], k=3
    ).collect()
    assert top[0].vec_id == 7


def test_png_pnm_codec_roundtrip_and_filters():
    """Pure-Python image codec (VERDICT r4 #3): encode/decode roundtrips
    for PNG gray/RGB/RGBA and PNM P5/P6, plus a hand-filtered PNG
    exercising every spec filter type (Sub/Up/Average/Paeth/None)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from stdb_spark.functions import multimodal as mm

    rng = np.random.default_rng(1)
    for shape in [(24, 32), (24, 32, 3), (24, 32, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(mm.decode_image(mm.encode_png(img)), img)
    for shape in [(24, 32), (24, 32, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(mm.decode_image(mm.encode_ppm(img)), img)

    # one scanline per filter type, hand-filtered per the spec
    img = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    h, w, bpp = 5, 7, 1

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    lines, prev = b"", np.zeros(w, np.int32)
    for y, f in enumerate([1, 2, 3, 4, 0]):
        row = img[y].astype(np.int32)
        out = bytearray([f])
        for x in range(w):
            a = int(row[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            out.append((int(row[x]) - pred) & 0xFF)
        lines += bytes(out)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        mm._PNG_MAGIC
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(lines))
        + mm._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_image(png), img)

    # the codec boundary still raises for containers we can't decode
    with pytest.raises(mm.DecodeUnavailable):
        mm.decode_image(b"\xff\xd8\xff\xe0JFIF")


def test_portable_hll_accuracy_vs_exact(spark):
    """The deterministic portable HLL (ts_distinct_users_hll_portable):
    raw harmonic estimate within 12% of the exact distinct count at
    n/m >= 2 (no small-range correction by spec — v_zero is exposed
    for consumers who want it)."""
    from stdb_spark import model
    from stdb_spark.workloads import QUERIES

    sf = "/root/testdata/sf0.01"
    est = {
        r.metric: r.distinct_users_est
        for r in QUERIES["ts_distinct_users_hll_portable"](spark, sf).collect()
    }
    ev = model.events_raw_ns(spark, sf)
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for m, e in est.items():
        assert abs(e - exact[m]) <= 0.12 * exact[m], (m, e, exact[m])


def test_assign_q_expr_equals_pandas_path(spark):
    """The expression-form integer argmin (the executable spec) and the
    Arrow int64-matmul path must agree exactly — including ties, which
    both resolve to the first index."""
    from stdb_spark.functions import similarity as sim

    rows = [(i, [((i * 13 + d * 7) % 21 - 10) / 10.0 for d in range(6)])
            for i in range(40)]
    # duplicate a vector so at least one assignment involves a tie
    rows.append((100, rows[3][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = sim.kmeans_fit_exact(df, k=3, iters=2, qscale=1000)
    got_pd = df.select(
        "vec_id", sim._assign_q_pandas("embedding", cents, 1000).alias("c")
    ).collect()
    got_ex = df.select(
        "vec_id",
        sim._assign_q_expr(
            sim.quantize_vec_expr("embedding", 1000), cents
        ).alias("c"),
    ).collect()
    assert sorted(map(tuple, got_pd)) == sorted(map(tuple, got_ex))


def test_connected_components_kernel_and_distributed_bit_equal(spark):
    """The size-dispatched regimes (single-task numpy hash-min kernel
    vs the distributed propagation loop) must emit identical
    (id, cluster_id) labelings — min member id per component either
    way."""
    from stdb_spark.functions import dedup

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24),
         (3, 24)],
        "a long, b long",
    )
    kernel = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(pairs).collect()
    }
    dist = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(
            pairs, single_task_max_edges=0
        ).collect()
    }
    assert kernel == dist
    # the 3-24 bridge merges the chain and the long path into one
    # component labeled by its smallest member
    assert {(24, 1), (20, 1), (10, 10), (11, 10)} <= kernel
    # string ids take the lexicographic min
    spairs = spark.createDataFrame([("b", "c"), ("c", "a")], "a string, b string")
    got = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(spairs).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a")}


def test_chunk_windows_coverage_and_overlap(spark):
    from stdb_spark.functions import text as t

    docs = spark.createDataFrame(
        [(0, "a" * 553), (1, "b" * 200), (2, "c" * 10), (3, "d" * 201)],
        "doc_id long, text string",
    )
    out = t.chunk_windows(docs, width=200, stride=150).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 553 chars: ceil((553-200)/150)=3 strides -> 4 chunks; last chunk
    # starts at 451 and runs 103 chars to the end
    assert [len(c.chunk_text) for c in sorted(by_doc[0], key=lambda c: c.chunk_idx)] == [200, 200, 200, 103]
    # exactly-width doc: one chunk; tiny doc: one chunk; width+1: two
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_chars == 200
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_chars == 10
    assert len(by_doc[3]) == 2
    # overlap: consecutive chunks share width - stride = 50 chars
    c0, c1 = sorted(by_doc[0], key=lambda c: c.chunk_idx)[:2]
    assert c0.chunk_text[150:] == c1.chunk_text[:50]
    # full coverage: concatenating stride-prefixes + last chunk
    # reconstructs the document
    chunks = sorted(by_doc[0], key=lambda c: c.chunk_idx)
    rebuilt = "".join(c.chunk_text[:150] for c in chunks[:-1]) + chunks[-1].chunk_text
    assert rebuilt == "a" * 553


def test_image_features_decode_jpeg_payload(spark):
    """A baseline-JPEG payload flows through the Spark feature extractor
    on genuinely decoded pixels (not the byte-tiling fallback): the
    extracted mean matches a local decode of the same payload."""
    import numpy as np

    from stdb_spark.functions import jpeg
    from stdb_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        extract_image_features,
    )

    img = np.add.outer(np.arange(24) * 4, np.arange(32) * 3).astype(np.uint8)
    payload = jpeg.encode_jpeg(img, quality=92)
    media = spark.createDataFrame(
        [(0, "image", "image/jpeg", 32, 24, 0, payload)], MEDIA_SCHEMA
    )
    r = extract_image_features(media).collect()[0]
    local = decode_image(payload)
    assert r.n_px == local.size == 24 * 32
    assert abs(r.mean_px - float(local.mean())) < 1e-9
    assert abs(r.std_px - float(local.std())) < 1e-9


def test_video_frame_sampling_real_mjpeg(spark):
    """Video frame sampling decodes REAL MJPEG-AVI frames: each sampled
    tick maps to the frame nearest its timestamp and the emitted stats
    equal a local decode; opaque payloads still flow via the fallback
    (frame_idx = -1)."""
    import numpy as np

    from stdb_spark.functions import multimodal as mm

    media = mm.make_fake_media(spark, n=3, kind="video")
    out = mm.sample_video_frames(media, every_ms=250).collect()
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert all(r.frame_idx >= 0 for r in out)
    for r in out:
        frames, uspf = mm.decode_avi_frames(payloads[r.media_id])
        idx = min(len(frames) - 1, (r.frame_ms * 1000) // uspf)
        assert r.frame_idx == idx
        assert abs(r.mean_px - float(frames[idx].mean())) < 1e-9
    # ticks cover [0, duration] at the sampling cadence
    per = {}
    for r in out:
        per.setdefault(r.media_id, []).append(r.frame_ms)
    for mid, ticks in per.items():
        dur = 1000 + mid
        assert sorted(ticks) == list(range(0, dur + 1, 250))
    # opaque payload -> fallback marker
    opaque = spark.createDataFrame(
        [(9, "video", "video/h264", 0, 0, 500, bytes(range(64)))],
        mm.MEDIA_SCHEMA,
    )
    fb = mm.sample_video_frames(opaque, every_ms=250).collect()
    assert fb and all(r.frame_idx == -1 for r in fb)


def test_corrupt_media_payloads_fall_back_not_crash(spark):
    """Truncated/corrupt JPEG and AVI payloads raise DecodeUnavailable
    (not raw struct/Index/Value errors), so the Spark extractors'
    documented fallback engages instead of killing the task."""
    import pytest

    from stdb_spark.functions import multimodal as mm
    from stdb_spark.functions.jpeg import decode_jpeg

    for bad in (
        b"\xff\xd8\xff\xc0\x00\x04\x08",          # truncated SOF
        b"\xff\xd8\xff\xda\x00\x02",              # empty SOS body
        b"\xff\xd8\xff\xdb\x00\x05\x00\x01\x02",  # short DQT
    ):
        with pytest.raises(mm.DecodeUnavailable):
            decode_jpeg(bad)
    with pytest.raises(mm.DecodeUnavailable):
        mm.decode_avi_frames(b"RIFF\x20\x00\x00\x00AVI LIST\xff\xff\xff\xff")
    # end-to-end: a corrupt JPEG row flows through the image extractor
    # via the byte-tiling fallback
    media = spark.createDataFrame(
        [(0, "image", "image/jpeg", 8, 8, 0, b"\xff\xd8\xff\xc0\x00\x04\x08")],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.extract_image_features(media).collect()
    assert len(rows) == 1 and rows[0].n_px > 0


def test_lttb_exact_int_endpoint_modes(spark):
    from stdb_spark.operators import downsample

    df = spark.createDataFrame(
        [("s", i, float(i % 7)) for i in range(30)],
        "series string, ts long, value double",
    )
    two = downsample.lttb_exact_int(df, 2).collect()
    assert sorted(r.ts for r in two) == [0, 29]
    import pytest

    with pytest.raises(ValueError):
        downsample.lttb_exact_int(df, 1)


def test_connected_components_kernel_drops_null_edges(spark):
    """ADVICE r6: null endpoints factorize to code -1 and would corrupt
    labels via negative indexing; the kernel must drop them like the
    distributed joins do."""
    from stdb_spark.functions import dedup

    pairs = spark.createDataFrame(
        [(2, 1), (None, 5), (7, None), (2, 3)], "a long, b long"
    )
    kernel = {
        (r.id, r.cluster_id) for r in dedup.connected_components(pairs).collect()
    }
    dist = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(pairs, single_task_max_edges=0).collect()
    }
    assert kernel == dist
    assert kernel == {(1, 1), (2, 1), (3, 1)}


def test_jpeg_bitreader_accumulator_stays_bounded():
    """ADVICE r6: the MSB-first bit accumulator must mask off consumed
    high bits — without the mask it grows 8 bits per byte scanned and
    entropy decode turns O(n^2) on large images."""
    from stdb_spark.functions.jpeg import _BitReader

    r = _BitReader(b"\xaa" * 4096, 0)
    for _ in range(4096 * 8):
        r.read_bit()
    assert r.bitbuf.bit_length() <= 64


# ---------------------------------------------------------------- ADVICE r7


def test_quality_score_tolerates_preexisting_working_names(spark):
    """ADVICE r7: the internal token column is collision-proof — an
    input that already carries ``_t`` (e.g. a frame mid-way through the
    shingle pipeline) must pass through untouched, not raise on an
    ambiguous select."""
    df = spark.createDataFrame(
        [("hello world again", 7)], "text string, _t int"
    )
    row = text.quality_score(df).collect()[0]
    assert row.n_tokens == 3
    assert row["_t"] == 7  # user column survives verbatim


def test_with_shingles_rejects_reserved_keep_columns(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="reserved"):
        dedup.with_shingles(df.withColumnRenamed("doc_id", "_sh"), ["_sh"])


def test_hll_oracle_sql_out_col_is_a_parameter():
    """ADVICE r7: renaming the estimate column is a parameter, not a
    whole-SQL string replace (which rewrote every occurrence of the
    substring)."""
    from stdb_spark.operators import sketch

    sql = sketch.hll_oracle_sql("x", ["g"], "t", m=256, out_col="my_est")
    assert "AS my_est" in sql
    assert "AS distinct_est" not in sql
    # default name unchanged for existing callers
    assert "AS distinct_est" in sketch.hll_oracle_sql("x", ["g"], "t", m=256)


def test_hll_rollup_cache_name_encodes_sketch_spec():
    """ADVICE r7: the materialized register artifact's name carries the
    register spec tag and m, so changing either recomputes instead of
    reading a stale layout built under the old derivation."""
    import inspect

    from stdb_spark.operators import sketch
    from stdb_spark.workloads import tssuite

    src = inspect.getsource(tssuite._ts_hll_rollup)
    assert "_sketch.HLL_SPEC" in src and "_HLL_ROLLUP_M" in src
    assert sketch.HLL_SPEC  # tag exists and is non-empty


def test_plan_audit_counts_hof_aggregate_not_operator_names():
    """ADVICE r7: physical operator headers (HashAggregate( etc.) must
    not count as the HOF aggregate( expression."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "plan_audit.py"
    )
    spec = importlib.util.spec_from_file_location("_plan_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    plan = (
        "*(3) HashAggregate(keys=[k], functions=[sum(v)])\n"
        "+- ObjectHashAggregate(buf)\n"
        "+- SortAggregate(key)\n"
        "+- Project [aggregate(arr, 0, lambdafunction(...)) AS s]\n"
    )
    assert mod._count(plan, "aggregate(") == 1
    assert mod._count(plan, "md5(") == 0


def test_bloom_probe_bitmap_and_join_paths_agree(spark):
    """The broadcast-bitmap probe and the position-join probe are the
    same filter (size dispatch must never change answers), and the
    filter has no false negatives: every true duplicate is a hit."""
    docs = spark.createDataFrame(
        [(i, f"document body number {i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    dg = F.md5(dedup.normalized_text())
    prior = docs.filter(F.col("doc_id") % 4 != 0).select(dg.alias("dg"))
    inc = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", dg.alias("dg"))
    pos = dedup.bloom_position_set(prior, "dg", 1 << 12, 4)
    bitmap = {
        (r.doc_id, r.bloom_hit)
        for r in dedup.bloom_probe(inc, "dg", pos, 1 << 12, 4).collect()
    }
    joined = {
        (r.doc_id, r.bloom_hit)
        for r in dedup.bloom_probe(
            inc, "dg", pos, 1 << 12, 4, broadcast_max_bits=0
        ).collect()
    }
    assert bitmap == joined
    true_dups = {
        r.doc_id
        for r in inc.join(prior.distinct(), "dg", "left_semi").collect()
    }
    hits = {d for d, h in bitmap if h}
    assert true_dups <= hits  # no false negatives, ever


def test_dominant_eigen_matches_numpy(spark):
    """The integer power-iteration spec converges to LAPACK's dominant
    covariance eigenvalue (the quantization + 10-iteration error is
    well under 0.1% on a non-degenerate cloud)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(80, 6) @ np.diag([3.0, 2.0, 1.0, 0.5, 0.2, 0.1])
    rows = [(int(i), [float(v) for v in base[i]], 0) for i in range(80)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.dominant_eigen_portable(df).collect()
    assert len(out) == 1 and out[0].n_vecs == 80
    X = np.asarray([np.asarray(r[1], dtype=np.float32) for r in rows], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    lam_np = float(np.linalg.eigvalsh(C)[-1])
    assert abs(out[0].lambda1 - lam_np) / lam_np < 1e-3


def test_dominant_eigen_gram_paths_bit_equal(spark):
    """The Arrow int64-matmul Gram and the JVM explode Gram are the
    same exact integer sums — the speed dispatch can never change the
    eigenvalue bit pattern."""
    import math as _math

    rows = [
        (int(i), [float(_math.sin(i * 3 + j)) for j in range(8)], int(i % 3))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    a = sorted(
        (r.label, r.n_vecs, r.lambda1)
        for r in similarity.dominant_eigen_portable(df, gram_mode="arrow").collect()
    )
    b = sorted(
        (r.label, r.n_vecs, r.lambda1)
        for r in similarity.dominant_eigen_portable(df, gram_mode="explode").collect()
    )
    assert a == b  # bit-for-bit, including the float


def test_bpe_merges_hand_computed(spark):
    """Sennrich-style toy corpus, every round hand-verified including
    both tie-break axes (count tie -> lhs asc; lhs tie -> rhs asc)."""
    from stdb_spark.functions.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id long, text string",
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(docs, k_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == [
        (1, "l", "o", 5),   # (l,o) ties (o,w) at 5 -> lhs asc
        (2, "lo", "w", 5),
        (3, "e", "r", 2),   # (e,r) ties (low,e) at 2 -> lhs asc
        (4, "low", "er", 2),
        (5, "e", "s", 1),   # (e,w)/(e,s) tie at 1 -> rhs asc
        (6, "e", "w", 1),   # 'e' < 'es' < 'n' < 'w' -> lhs asc
    ]


def test_bpe_merges_exhausts_gracefully(spark):
    """Single-char words have no pairs: fewer rows than k_merges."""
    from stdb_spark.functions.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "ab")], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(docs, k_merges=4).collect()
    ]
    assert got == [(1, "a", "b", 1)]


def test_bpe_merges_checkpoint_boundary_matches_reference(spark):
    """k=40 crosses the _BPE_REPERSIST_EVERY=32 lineage cut (VERDICT r9
    directive #5): the checkpointed rounds must stay bit-identical to
    the module's written spec, pinned here by an independent
    pure-Python reference (word-freq vocab; per-round overlapping pair
    count; (count desc, lhs asc, rhs asc) argmax; single-pass
    left-to-right consuming literal replace — str.replace has exactly
    those semantics).  Also pins prefix stability: the k=6 table is the
    first 6 rows of the k=40 table."""
    from stdb_spark.functions import text as T

    corpus = "abcdefghijklmnopqrstuvwxyz0123456789 zyxwvutsrqponmlkjihgfedcba"
    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")

    def ref_bpe(words, k):
        segs = {w: " " + " ".join(w) + " " for w in words}
        out = []
        for r in range(1, k + 1):
            counts = {}
            for w, f in words.items():
                syms = segs[w].split()
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + f
            if not counts:
                break
            (l, rr), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((r, l, rr, c))
            segs = {
                w: s.replace(f" {l} {rr} ", f" {l}{rr} ")
                for w, s in segs.items()
            }
        return out

    words = {}
    for w in corpus.split():
        words[w] = words.get(w, 0) + 1
    expect = ref_bpe(words, 40)
    assert len(expect) == 40  # the corpus genuinely sustains 40 rounds

    assert T._BPE_REPERSIST_EVERY < 40  # the cut is actually exercised
    got40 = [
        (r.merge_rank, r.lhs, r.rhs, int(r.pair_count))
        for r in T.bpe_merges(docs, k_merges=40).orderBy("merge_rank").collect()
    ]
    assert got40 == expect
    got6 = [
        (r.merge_rank, r.lhs, r.rhs, int(r.pair_count))
        for r in T.bpe_merges(docs, k_merges=6).orderBy("merge_rank").collect()
    ]
    assert got6 == expect[:6]


def test_pr_eval_sample_is_deterministic_hash_topk(spark):
    """doc_minhash_precision_recall's eval corpus (r9 ADVICE + VERDICT
    directive #4): above the cap it is exactly the cap docs with the
    smallest md5(salt||doc_id) hash (mirrorable by the static oracle's
    ORDER BY hash LIMIT k); at-or-below the cap it is the whole corpus.
    No count() pre-scan either way."""
    import hashlib

    from stdb_spark.workloads import docsuite as D

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )

    def h(doc_id):
        return int(hashlib.md5(f"{D._PR_SALT}{doc_id}".encode()).hexdigest()[:15], 16)

    expect = sorted(range(20), key=lambda i: (h(i), i))[:7]
    got = [r.doc_id for r in D._pr_eval_sample(docs, cap=7).collect()]
    assert sorted(got) == sorted(expect)
    # below the cap: identity set
    assert (
        sorted(r.doc_id for r in D._pr_eval_sample(docs, cap=50).collect())
        == list(range(20))
    )


def test_char_entropy_kernel_matches_explode_form(spark):
    """r11 optimization: the map-side numpy bigram kernel must be
    bit-equal to the former explode + (doc_id, gram) aggregate on
    unicode text, repeated grams, and the len<2 / NULL drop rule."""
    from stdb_spark.workloads import docsuite as D

    rows = [
        (1, "aaaa"),            # single repeated gram, c=3
        (2, "abababab"),        # two grams, counts 4 and 3
        (3, "x"),               # len < 2 -> dropped
        (4, None),              # NULL -> dropped
        (5, "héllo wörld héllo"),  # non-ASCII code points
        (6, "ab"),              # single gram, c=1 -> entropy ln(1)=0
        (7, "".join(chr(0x4E00 + (i * 7) % 64) for i in range(300))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kernel = {
        r.doc_id: (r.bigram_entropy, r.n_distinct_bigrams)
        for r in docs.select("doc_id", "text")
        .mapInPandas(
            D._char_entropy_kernel(),
            "doc_id long, bigram_entropy double, n_distinct_bigrams long",
        )
        .collect()
    }
    grams = F.expr(
        "CASE WHEN length(text) >= 2 THEN"
        " transform(sequence(1, length(text) - 1),"
        "           i -> substring(text, i, 2)) END"
    )
    counts = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    ref = {
        r.doc_id: (r.bigram_entropy, r.n_distinct_bigrams)
        for r in counts.groupBy("doc_id")
        .agg(
            F.expr(
                "ln(CAST(sum(c) AS DOUBLE))"
                " - CAST(sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))"
                " AS DECIMAL(28,10))) AS DOUBLE) / CAST(sum(c) AS DOUBLE)"
            ).alias("bigram_entropy"),
            F.count("*").cast("long").alias("n_distinct_bigrams"),
        )
        .collect()
    }
    # entropy compares through round(9): the kernel's ln is glibc libm
    # (bit-equal to the DuckDB oracle, full value-hash pass at sf0.01
    # and sf0.1), the explode form's ln is Java Math.log — the two libms
    # differ by 1 ulp on some inputs (e.g. ln(3)), which is why this
    # query sits in the parity suite's LIBM_TOLERANT set and the
    # driver's value hash rounds floats to 6 digits.
    assert set(kernel) == {1, 2, 5, 6, 7}
    assert {k: (round(e, 9), n) for k, (e, n) in kernel.items()} == {
        k: (round(e, 9), n) for k, (e, n) in ref.items()
    }


def test_minhash_lsh_estimates_matches_two_step(spark):
    """r11 optimization: the fused banding+verify (signatures carried
    through the postings, no lookup joins) must produce the identical
    candidate set and bit-identical estimates as the two-step
    candidates -> estimate form, for both the plain and b-bit shapes."""
    rows = [
        (i, ("alpha beta gamma delta epsilon zeta " * 4) + (f"tail {i % 3} ") * 3)
        for i in range(24)
    ] + [(100 + i, f"unique document number {i} with words {i*7} {i*13}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs)
    cands = dedup.minhash_lsh_candidates(sigs)
    two_step = {
        (r.a, r.b): r.est_jaccard
        for r in dedup.minhash_jaccard_estimate(sigs, cands).collect()
    }
    fused = {
        (r.a, r.b): r.est_jaccard
        for r in dedup.minhash_lsh_estimates(sigs).collect()
    }
    assert fused == two_step and len(fused) > 0
    two_step_b = {
        (r.a, r.b): (r.est_full, r.est_bbit)
        for r in dedup.bbit_minhash_estimate(sigs, cands, b=2).collect()
    }
    fused_b = {
        (r.a, r.b): (r.est_full, r.est_bbit)
        for r in dedup.minhash_lsh_estimates(sigs, b=2).collect()
    }
    assert fused_b == two_step_b


def test_simhash_kernel_matches_aggregate_form(spark):
    """r11 optimization: the map-side numpy vote kernel must be
    bit-identical to the former 64-column sum() aggregate formulation
    (same md5 words, same 2*s_j > cnt vote rule, two's-complement bit
    63), including ties and single-shingle docs."""
    rows = [
        (1, "alpha beta gamma delta " * 6),
        (2, "alpha beta gamma delta " * 6 + "epsilon"),
        (3, "zz"),                      # single token -> one shingle
        (4, "one two three four five six seven eight nine ten"),
        (5, "ONE two THREE two one Two three " * 3),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kernel = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}

    ex = dedup.with_shingles(
        dedup._spread(docs.select("doc_id", "text"), "doc_id"),
        [F.col("doc_id")], "text",
    ).select("doc_id", F.explode("_sh").alias("_s"))
    hl = ex.select(
        "doc_id",
        F.conv(F.substring(F.md5("_s"), 1, 8), 16, 10).cast("long").alias("_h"),
        F.conv(F.substring(F.md5("_s"), 9, 8), 16, 10).cast("long").alias("_l"),
    )

    def bit(j):
        src = F.col("_h") if j < 32 else F.col("_l")
        return F.shiftright(src, j if j < 32 else j - 32).bitwiseAND(F.lit(1))

    votes = hl.groupBy("doc_id").agg(
        F.count("*").alias("_cnt"),
        *[F.sum(bit(j)).alias(f"_s{j}") for j in range(64)],
    )
    sig = None
    for j in range(64):
        bitval = F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
        term = F.when(F.lit(2) * F.col(f"_s{j}") > F.col("_cnt"), bitval).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig.bitwiseOR(term)
    ref = {
        r.doc_id: r.simhash
        for r in votes.select("doc_id", sig.alias("simhash")).collect()
    }
    assert kernel == ref and len(kernel) == 5
