"""Pipeline operators (dedup / similarity / text / image verify) vs local oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.pipelines import dedup, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()


def _shingles(s, n=3):
    t = s.split(" ")
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_jaccard_pairs_exact_vs_oracle(spark, docs, docs_pd):
    got = {
        (r.id_a, r.id_b): (r.inter, r.uni)
        for r in dedup.jaccard_dedup_pairs(docs, threshold_num=1, threshold_den=5).collect()
    }
    sh = {r.doc_id: _shingles(r.text) for _, r in docs_pd.iterrows()}
    ids = sorted(sh)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            uni = len(sh[a] | sh[b])
            if inter > 0 and inter * 5 >= uni:
                exp[(a, b)] = (inter, uni)
    assert got == exp and len(exp) > 0


def test_minhash_recall_against_exact(spark, docs, docs_pd):
    """LSH emits only true positives (exact verify) and finds a decent share
    of the exact pairs (recall is probabilistic, threshold well above the
    banding curve's midpoint)."""
    thr = 0.2
    got = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs, threshold=thr).collect()}
    sh = {r.doc_id: _shingles(r.text) for _, r in docs_pd.iterrows()}
    ids = sorted(sh)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= thr:
                exact.add((a, b))
    assert got <= exact  # no false positives (exact verification stage)
    if exact:
        assert len(got) / len(exact) >= 0.5


def test_simhash_pairs_are_close(spark, docs):
    pairs = dedup.simhash_pairs(docs, max_hamming=16).collect()
    for r in pairs:
        assert r.hamming <= 16
    # symmetric, deduped, ordered
    seen = {(r.id_a, r.id_b) for r in pairs}
    assert all(a < b for a, b in seen)
    assert len(seen) == len(pairs)


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "a b c"), (3, "c b a a"), (4, "x y z")], "doc_id long, text string"
    )
    rows = {r.doc_id: (r.canonical_id, r.group_size) for r in dedup.exact_dedup(df).collect()}
    assert rows[1] == (1, 3) and rows[2] == (1, 3) and rows[3] == (1, 3)
    assert rows[4] == (4, 1)


def test_cosine_topk_vs_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    k = 5
    qids = [0, 1, 2]
    got = {}
    for r in similarity.cosine_topk(emb, qids, k=k).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    m = np.array(t.embedding.tolist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in qids:
        scores = m @ m[q]
        order = sorted(zip(-scores, t.vec_id))
        exp = [int(v) for s, v in order if v != q][:k]
        assert [v for _, v in sorted(got[q])] == exp


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    k = 5
    qids = [0, 1, 2, 3, 4]
    exact = {(r.query_id, r.vec_id) for r in similarity.cosine_topk(emb, qids, k=k).collect()}
    # random 64-dim embeddings are near-orthogonal (top cosines ~0.3), the
    # hardest case for hyperplane LSH: short bucket codes + many tables
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_topk(emb, qids, k=k, n_planes=4, n_tables=16).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.4  # recall of the scale path


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame([(1, "the cat sat on the mat")], "doc_id long, text string")
    r = text.token_stats(df).first()
    assert r.n_tokens == 6 and r.n_distinct == 5
    assert r.n_chars == 22 and r.token_chars == 17
    q = text.quality_score(df).first()
    # len<20 → 0.0 + (5/6)*0.3 + (1/8 stopword types)*0.2
    assert q.quality == round(0.0 + (5 / 6) * 0.3 + (1 / 8) * 0.2, 6)


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "hello world"), (3, "x")], "doc_id long, text string")
    rows = {r.doc_id: r.fingerprint for r in text.doc_fingerprints(df).collect()}
    assert rows[1] == rows[2] != rows[3]


def test_image_verify_and_features(spark):
    from jena_geo_spark import datagen
    from jena_geo_spark.image.spark import decode_feature_stats, with_phash_verified

    d = datagen.ensure_dataset(0.001)
    imgs = spark.read.parquet(f"{d}/images.parquet").limit(200)
    v = with_phash_verified(imgs)
    assert v.filter(~F.col("phash_ok")).count() == 0  # invariant holds end-to-end
    stats = decode_feature_stats(imgs.limit(50))
    rows = stats.collect()
    assert len(rows) == 50
    assert all(0 <= r.mean_r <= 255 for r in rows)


def test_simhash_block_layout_partitions_all_bits():
    from jena_geo_spark.pipelines.dedup import simhash_block_layout

    for n_bits in (62, 64):
        for blocks in (4, 9, 7):
            layout = simhash_block_layout(n_bits, blocks)
            assert len(layout) == blocks
            assert all(w >= 1 for _, w in layout)  # pigeonhole needs non-empty
            flat = sorted(b for off, w in layout for b in range(off, off + w))
            assert flat == list(range(n_bits))  # exact partition, no gaps


def test_simhash_pairs_exact_recall_at_radius(spark):
    """Pigeonhole guarantee: a pair at EXACTLY max_hamming must be found
    even when the diffs spread one-per-block (the r1 64//blocks layout
    missed pairs differing in the uncovered top bits)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from jena_geo_spark.pipelines.dedup import simhash_block_layout, simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # brute force the real hamming distances vs the operator's output
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, base + " extra words here now"), (3, "totally different text corpus")],
        "doc_id long, text string",
    )
    out = simhash_pairs(docs, max_hamming=8, hash_fn="arith")
    got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    from jena_geo_spark.pipelines.dedup import simhash_df

    sh = {r.doc_id: r.sh for r in simhash_df(docs, hash_fn="arith").collect()}
    for a in sh:
        for b in sh:
            if a < b:
                ham = bin(sh[a] ^ sh[b]).count("1")
                if ham <= 8:
                    assert (a, b) in got and got[(a, b)] == ham
                else:
                    assert (a, b) not in got


def test_jaccard_max_df_cap_keeps_exact_pairs(spark):
    from jena_geo_spark.pipelines.dedup import jaccard_dedup_pairs

    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g z"),  # near-dup of 0
        (2, "p q r s t u v w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r.id_a, r.id_b): (r.inter, r.uni) for r in
            jaccard_dedup_pairs(docs, n=3, threshold_num=1, threshold_den=5).collect()}
    capped = {(r.id_a, r.id_b): (r.inter, r.uni) for r in
              jaccard_dedup_pairs(docs, n=3, threshold_num=1, threshold_den=5, max_df=10).collect()}
    # cap above every df → identical output, and inter/uni stay EXACT
    assert capped == full and (0, 1) in capped


def test_ivf_topk_recall_and_exact_scores(spark):
    from jena_geo_spark.pipelines import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = list(range(10))
    k = 10
    exact = similarity.cosine_topk(emb, qids, k=k)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    def recall(nprobe):
        got_sets = {}
        rows = similarity.ivf_topk(
            emb, qids, k=k, n_centroids=16, nprobe=nprobe
        ).collect()
        for r in rows:
            got_sets.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got_sets.get(q, set()) & exact_sets[q]) for q in exact_sets)
        total = sum(len(s) for s in exact_sets.values())
        return hits / total, rows

    r2, _ = recall(2)
    r8, rows = recall(8)
    assert r8 >= 0.7, f"IVF recall {r8:.2f} too low at nprobe=8"
    assert r8 > r2, "recall must grow with nprobe (probe fraction)"
    # every emitted score must be the exact cosine (re-rank is exact)
    import numpy as np

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        a = a / np.linalg.norm(a)
        b = b / np.linalg.norm(b)
        return float((a * b).sum())

    for r in rows[:100]:
        assert abs(r.score - cos(vecs[r.query_id], vecs[r.vec_id])) < 1e-12

    # determinism: same seed, same result
    again = similarity.ivf_topk(emb, qids, k=k, n_centroids=16, nprobe=8)
    assert sorted((r.query_id, r.vec_id, r.rank) for r in again.collect()) == sorted(
        (r.query_id, r.vec_id, r.rank) for r in rows
    )


def test_ivf_pq_topk_recall_rerank_and_exact_gate(spark):
    """IVF-PQ (pipelines/similarity.ivf_pq_topk): the ADC shortlist is
    lossy, the re-rank exact.  Gates: (a) probing every list with a
    table-sized shortlist reproduces brute force exactly (the emb_pq_exact
    contract shape); (b) recall at lossy settings clears a floor and the
    emitted scores are exact cosines; (c) widening the shortlist cannot
    lower recall on the same trained index; (d) codes are m_sub ints in
    [0, n_codes)."""
    import numpy as np

    from jena_geo_spark.pipelines import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = list(range(10))
    k = 10
    exact = similarity.cosine_topk(emb, qids, k=k)
    exact_keys = sorted((r.query_id, r.vec_id, r.rank) for r in exact.collect())
    exact_sets = {}
    for q, v, _ in exact_keys:
        exact_sets.setdefault(q, set()).add(v)

    cents = similarity.train_ivf_centroids(emb, n_centroids=16)
    books = similarity.train_pq_codebooks(emb, cents, m_sub=8, n_codes=16)

    # (a) full probe + oversized shortlist == brute force, rank for rank
    full = similarity.ivf_pq_topk(
        emb, qids, k=k, nprobe=16, rerank=1000, centroids=cents, codebooks=books
    )
    assert sorted((r.query_id, r.vec_id, r.rank) for r in full.collect()) == exact_keys

    # (d) the compressed index shape
    enc = similarity.pq_encode(emb, cents, books).limit(50).collect()
    for r in enc:
        assert len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes)

    def run(rerank):
        rows = similarity.ivf_pq_topk(
            emb, qids, k=k, nprobe=8, rerank=rerank,
            centroids=cents, codebooks=books,
        ).collect()
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got.get(q, set()) & exact_sets[q]) for q in exact_sets)
        return hits / sum(len(s) for s in exact_sets.values()), rows

    r_narrow, _ = run(2)
    r_wide, rows = run(8)
    assert r_wide >= 0.6, f"IVF-PQ recall {r_wide:.2f} too low at rerank=8k"
    # (c) a wider ADC shortlist can only add true neighbours
    assert r_wide >= r_narrow

    # (b) re-rank scores are exact cosines
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        return float((a / np.linalg.norm(a) * (b / np.linalg.norm(b))).sum())

    for r in rows[:100]:
        assert abs(r.score - cos(vecs[r.query_id], vecs[r.vec_id])) < 1e-12


def test_boilerplate_ngrams_hand_case(spark):
    from jena_geo_spark.pipelines.dedup import boilerplate_ngrams

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c x"), (2, "a b c d")],
        "doc_id long, text string",
    )
    got = {(r.shingle, r.df) for r in boilerplate_ngrams(docs, n=3, min_df=2).collect()}
    # df counts DOCUMENTS (shingles are distinct per doc), not occurrences
    assert got == {("a b c", 3), ("b c d", 2)}


def test_dup_spans_hand_case(spark):
    from jena_geo_spark.pipelines.dedup import dup_spans

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "x a b c"), (2, "a b c")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.pos, r.shingle) for r in dup_spans(docs, n=3, min_df=3).collect()}
    # "a b c" appears in all 3 docs: at pos 0, 1, 0 — positions count
    # token offsets, and NON-distinct occurrences all surface
    assert got == {(0, 0, "a b c"), (1, 1, "a b c"), (2, 0, "a b c")}


def test_subword_token_stats_punctuation(spark):
    from jena_geo_spark.pipelines.text import subword_token_stats

    docs = spark.createDataFrame(
        [(0, "hello, world!!"), (1, "a1b2"), (2, "x y")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.n_subword, r.n_whitespace)
           for r in subword_token_stats(docs).collect()}
    # "hello" "," " world" "!!" = 4 subword vs 2 whitespace tokens;
    # "a1b2" splits letter/digit runs: "a" "1" "b" "2"
    assert got == {(0, 4, 2), (1, 4, 1), (2, 2, 2)}


def test_strip_boilerplate_hand_case(spark):
    from jena_geo_spark.pipelines.dedup import strip_boilerplate

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x a b c"), (2, "a b c"), (3, "p q r s")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.text_clean, r.n_removed)
           for r in strip_boilerplate(docs, n=3, min_df=3).collect()}
    # "a b c" is hot (df=3): covered spans strip tokens 0-2 / 1-3 / 0-2
    # ("x" in doc 1 survives — "x a b" has df 1); doc 3 has no hot span
    # and passes through verbatim
    assert got == {(0, "d e", 3), (1, "x", 3), (2, "", 3), (3, "p q r s", 0)}


def test_scrub_pii_hand_case(spark):
    from jena_geo_spark.pipelines.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (0, "write a.b+c%d@mail-host.example.org or bob@x.io today"),
            (1, "tel +49-555-123-4567 backup 555-123-4567 done"),
            (2, "hosts 10.0.0.1 and 192.168.255.3; version 1.2 is not an ip"),
            (3, "clean text"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {tuple(r) for r in scrub_pii(docs).collect()}
    assert got == {
        (0, "write <EMAIL> or <EMAIL> today", 2, 0, 0),
        # "+49-..." matches with the optional +CC, bare "555-123-4567" too
        (1, "tel <PHONE> backup <PHONE> done", 0, 2, 0),
        (2, "hosts <IP> and <IP>; version 1.2 is not an ip", 0, 0, 2),
        (3, "clean text", 0, 0, 0),
        (4, "", 0, 0, 0),
    }


def test_repetition_stats_hand_case(spark):
    from jena_geo_spark.pipelines.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),  # bigrams ababab: 3x"a b" 2x"b a" -> 3/5
            (1, "u v w x y z"),  # all unique -> top 1/5, dup3 0
            (2, "t"),            # too short for any gram
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {tuple(r) for r in repetition_stats(docs).collect()}
    # doc0 trigrams: "a b a","b a b","a b a","b a b" -> all repeated -> 1.0
    assert got == {
        (0, 0.6, 1.0),
        (1, 0.2, 0.0),
        (2, 0.0, 0.0),
        (3, 0.0, 0.0),
    }


def test_phash_near_dup_exact_vs_bruteforce(spark):
    """Pigeonhole phash join must emit EXACTLY the brute-force pair set
    (recall is structural, precision via the popcount verify)."""
    import itertools
    import random

    from jena_geo_spark.image.spark import phash_near_dup

    rng = random.Random(7)
    base = [rng.getrandbits(64) for _ in range(40)]
    hashes = list(base)
    for i, h in enumerate(base[:15]):
        flipped = h
        for b in rng.sample(range(64), rng.randint(0, 6)):
            flipped ^= 1 << b
        hashes.append(flipped)
    rows = [(i, h - (1 << 64) if h >= 1 << 63 else h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "image_id long, phash long")

    r = 6
    got = {(a, b, hm) for a, b, hm in phash_near_dup(df, max_hamming=r).collect()}
    want = set()
    for (ia, ha), (ib, hb) in itertools.combinations(enumerate(hashes), 2):
        hm = bin(ha ^ hb).count("1")
        if hm <= r:
            want.add((min(ia, ib), max(ia, ib), hm))
    assert got == want and len(want) >= 10


def test_phash_dedup_groups_matches_bruteforce_components(spark):
    from jena_geo_spark.image.spark import phash_dedup_groups

    # three perceptual clusters + one isolate, with heavy duplication
    h = {
        "a0": 0x0123456789ABCDEF,
        "a1": 0x0123456789ABCDEC,  # hamming 2 from a0
        "b0": 0x7FFFFFFF00000000,
        "b1": 0x7FFFFFFF00000003,  # hamming 2 from b0
        "c0": -0x5000000000000000,
    }
    rows = []
    for i in range(60):
        key = ["a0", "a1", "b0", "b1", "c0"][i % 5]
        rows.append((i, h[key]))
    df = spark.createDataFrame(rows, "image_id long, phash long")
    got = {(r.image_id, r.group_id) for r in phash_dedup_groups(df, max_hamming=3).collect()}
    # group label = min phash of the cluster (signed long ordering)
    ga = min(h["a0"], h["a1"]); gb = min(h["b0"], h["b1"])
    want = set()
    for i in range(60):
        key = ["a0", "a1", "b0", "b1", "c0"][i % 5]
        want.add((i, {"a0": ga, "a1": ga, "b0": gb, "b1": gb, "c0": h["c0"]}[key]))
    assert got == want


def test_curate_documents_hand_case(spark):
    from jena_geo_spark.pipelines.curate import curate_documents

    good = "the quick brown fox jumps over a lazy dog and then runs far " \
           "away to find some more of those things it likes to chase daily"
    docs = spark.createDataFrame(
        [
            (0, good),                      # long, diverse, stopwords -> kept
            (1, good),                      # exact dup of 0 -> not canonical
            (2, " ".join(reversed(good.split()))),  # same token SET, shuffled
            (3, "spam spam spam spam spam spam spam spam spam spam spam spam "
                "spam spam spam spam spam spam spam spam spam"),  # repetitive
            (4, "short text"),              # fails length band
            (5, "mail me at bob@x.io " + good),  # PII scrubbed, still kept
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curate_documents(docs).collect()}
    assert rows[0].kept and rows[0].is_canonical
    assert not rows[1].kept and not rows[1].is_canonical
    assert rows[1].quality == rows[0].quality
    assert not rows[3].kept  # top_bigram_frac == 1.0 > ceiling
    assert rows[3].top_bigram_frac == 1.0 and rows[3].dup_trigram_frac == 1.0
    assert not rows[4].kept and rows[4].quality < 0.5
    assert rows[5].n_pii == 1 and "<EMAIL>" in rows[5].text_clean and rows[5].kept
    # doc 2 shares doc 0's normalized token set -> same group, not canonical
    assert not rows[2].is_canonical


def test_mixture_sample_deterministic_and_nested(spark):
    from jena_geo_spark.pipelines.curate import mixture_sample

    docs = spark.createDataFrame(
        [(i, ["en", "fr", "zh"][i % 3]) for i in range(900)],
        "doc_id long, lang string",
    )
    lo = mixture_sample(docs, {"en": 0.3, "fr": 0.1}, key_col="lang")
    hi = mixture_sample(docs, {"en": 0.6, "fr": 0.4, "zh": 0.2}, key_col="lang")
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    # determinism: identical on re-evaluation
    assert lo_ids == {r.doc_id for r in lo.collect()}
    # nesting: raising every rate yields a superset
    assert lo_ids <= hi_ids
    # unlisted key drops entirely at the low setting
    assert not any(i % 3 == 2 for i in lo_ids)
    # rates land in the right ballpark (hash uniformity, 300 docs/lang)
    n_en = sum(1 for i in lo_ids if i % 3 == 0)
    assert 60 <= n_en <= 120  # 0.3 of 300 ± generous tolerance


def test_phash_groups_null_hash_passthrough(spark):
    from jena_geo_spark.image.spark import phash_dedup_groups

    df = spark.createDataFrame(
        [(0, 100), (1, 100), (2, None)], "image_id long, phash long"
    )
    rows = {r.image_id: r.group_id for r in phash_dedup_groups(df).collect()}
    assert rows[0] == 100 and rows[1] == 100
    assert 2 in rows and rows[2] is None  # undecodable row visible, ungrouped


def test_repetition_frame_two_token_doc_has_zero_dup3(spark):
    from jena_geo_spark.pipelines.text import repetition_frame

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    r = repetition_frame(df).first()
    assert r.top_bigram_frac == 1.0 and r.dup_trigram_frac == 0.0


def test_curate_and_mixture_on_empty_input(spark):
    from jena_geo_spark.pipelines.curate import curate_documents, mixture_sample

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert curate_documents(empty).count() == 0
    assert mixture_sample(empty, {"en": 1.0}).count() == 0


def test_phash_groups_no_near_dups_all_singletons(spark):
    """No pairs within radius → every image labels itself (exercises the
    empty-edge-frame path through the small-graph components branch)."""
    from jena_geo_spark.image.spark import phash_dedup_groups

    # pairwise hamming 4/8/4 — nothing within radius 1
    df = spark.createDataFrame(
        [(0, 0), (1, 15), (2, 255)], "image_id long, phash long"
    )
    rows = {r.image_id: r.group_id for r in phash_dedup_groups(df, max_hamming=1).collect()}
    assert rows == {0: 0, 1: 15, 2: 255}
