"""Quality tests for the dedup family: MinHash-LSH candidate recall vs
exact n-gram Jaccard, SimHash similarity behavior, fingerprint stability."""

from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.textstats import (
    fingerprint,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _near_dup_corpus(spark):
    """documents plus near-duplicates: copies with one word appended."""
    d = _docs(spark).filter(F.col("doc_id") < 100)
    dups = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" tailword")).alias("text"),
        "lang", "source", "n_chars")
    return d.unionByName(dups)


def test_minhash_lsh_recall_on_near_dups(spark):
    corpus = _near_dup_corpus(spark)
    cands = {(r.doc_a, r.doc_b)
             for r in minhash_lsh_candidates(corpus, n=3, k=16,
                                             bands=8).collect()}
    # every planted near-dup pair (jaccard ~0.95) must be a candidate
    planted = {(i, i + 100000) for i in range(100)}
    recall = len(planted & cands) / len(planted)
    assert recall >= 0.95, f"recall {recall}"


def test_lsh_candidates_superset_of_high_jaccard(spark):
    docs = _docs(spark)
    exact = {(r.doc_a, r.doc_b)
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.7,
                                          max_docs=200).collect()}
    cands = {(r.doc_a, r.doc_b)
             for r in minhash_lsh_candidates(
                 docs.filter(F.col("doc_id") < 200), n=3, k=16,
                 bands=8).collect()}
    missed = exact - cands
    assert not missed, f"high-jaccard pairs missed by LSH: {missed}"


def test_simhash_near_dups_have_small_hamming(spark):
    # the driver corpus shares one tiny vocabulary (every doc simhashes
    # alike by construction), so build docs with per-doc vocabularies:
    # near pairs differ by one word, far pairs share nothing
    import random
    rng = random.Random(7)
    rows = []
    for i in range(60):
        words = [f"w{i}_{rng.randrange(10**6)}" for _ in range(80)]
        text = " ".join(words)
        rows.append((i, text))
        rows.append((i + 1000, text + " tailword"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r.doc_id: r.simhash for r in simhash(corpus).collect()}
    near = [bin((sh[i] ^ sh[i + 1000]) & ((1 << 64) - 1)).count("1")
            for i in range(60)]
    far = [bin((sh[i] ^ sh[(i + 1) % 60]) & ((1 << 64) - 1)).count("1")
           for i in range(60)]
    assert max(near) <= 16
    assert sum(near) / len(near) < sum(far) / len(far) - 10


def test_fingerprint_deterministic(spark):
    f1 = {r.doc_id: (r.fp_min, r.fp_max)
          for r in fingerprint(_docs(spark)).collect()}
    f2 = {r.doc_id: (r.fp_min, r.fp_max)
          for r in fingerprint(_docs(spark)).collect()}
    assert f1 == f2 and len(f1) == 500
