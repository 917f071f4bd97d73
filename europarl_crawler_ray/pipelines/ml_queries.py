"""Rows-only query library: dedup sketches, similarity search, language-ID,
multimodal plumbing, crawl simulation, link rewriting.

These ops are not expressible in ANSI SQL (the driver records a weaker
rows-only check) but are first-class engine components; their correctness
is pinned by unit tests with planted near-duplicates (tests/test_dedup.py).

Scale shapes:
- MinHash-LSH: signature+banding inside ``map_batches`` → ONE
  ``groupby(band_key)`` shuffle of narrow rows → per-bucket pair emission →
  pair dedup via a second small groupby. No pairwise all-to-all.
- SimHash: same banding shape with 16-bit chunks.
- ANN: brute-force per-batch matmul vs broadcast queries (baseline) and an
  LSH-bucketed variant that only scores the query's bucket (scale path).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..functions.dedup import (
    N_BANDS,
    est_jaccard,
    hamming64,
    minhash_bands,
    minhash_signature,
    simhash64,
    simhash_band_keys,
    word_shingles,
)
from ..functions.textstats import predict_lang


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ------------------------------------------------------------ minhash-LSH


def q_dedup_minhash(sf_dir: str, threshold_pct: int = 20):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        band_keys, doc_ids, sigs = [], [], []
        for did, text in zip(ids, texts):
            sig = minhash_signature(word_shingles(text))
            bk = minhash_bands(sig)
            band_keys.extend(bk.view(np.int64).tolist())
            doc_ids.extend([did] * N_BANDS)
            sigs.extend([sig.tobytes()] * N_BANDS)
        return pa.table(
            {
                "band_key": pa.array(band_keys, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_pct": []}).astype(
                {"doc_a": np.int64, "doc_b": np.int64, "est_pct": np.int64}
            )
        ids = g["doc_id"].to_numpy()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        rows = []
        for i in range(n):
            for j in range(i + 1, n):
                est = int(round(est_jaccard(sigs[i], sigs[j]) * 100))
                rows.append((int(ids[i]), int(ids[j]), est))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_pct"]).astype(np.int64)

    pairs = (
        docs.map_batches(sig_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    out = (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Max("est_pct", alias_name="est_jaccard_pct"))
        .filter(expr=f"est_jaccard_pct >= {threshold_pct}")
    )
    return out


# --------------------------------------------------------------- simhash


def q_dedup_simhash(sf_dir: str, max_hamming: int = 6):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def sh_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        band_keys, doc_ids, hashes = [], [], []
        for did, text in zip(ids, texts):
            h = simhash64(text)
            for bk in simhash_band_keys(h):
                band_keys.append(bk)
                doc_ids.append(did)
                hashes.append(int(np.uint64(h).view(np.int64)))
        return pa.table(
            {
                "band_key": pa.array(band_keys, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(np.int64)
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().view(np.uint64)
        rows = []
        for i in range(n):
            d = hamming64(np.full(n - i - 1, hs[i]), hs[i + 1 :])
            for j, dist in enumerate(d, start=i + 1):
                rows.append((int(ids[i]), int(ids[j]), int(dist)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(np.int64)

    pairs = (
        docs.map_batches(sh_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming_min"))
        .filter(expr=f"hamming_min <= {max_hamming}")
    )


# ---------------------------------------------------------------- lang id


def q_langid(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def pred(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang_pred": [predict_lang(t) for t in df["text"]],
                "lang_actual": df["lang"],
            }
        )

    return docs.map_batches(pred, batch_format="pandas")


# ----------------------------------------------------- LSH-bucketed ANN


def q_ann_lsh(sf_dir: str, n_planes: int = 8, k: int = 10, n_queries: int = 5):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, 64))
    qdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qids = qdf["vec_id"].to_numpy()
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qbuckets = ((qmat @ planes.T) > 0) @ (1 << np.arange(n_planes))
    ref = ray.put((qids, qnorm, qbuckets, planes))

    def score_bucketed(df: pd.DataFrame) -> pd.DataFrame:
        ids_, qn, qb, pl = ray.get(ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        buckets = ((mat @ pl.T) > 0) @ (1 << np.arange(pl.shape[0]))
        out = []
        mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        vec_ids = df["vec_id"].to_numpy()
        for qi, q, qbk in zip(ids_, qn, qb):
            mask = buckets == qbk  # only the query's bucket is scored
            if not mask.any():
                continue
            sims = mat_n[mask] @ q
            out.append(
                pd.DataFrame(
                    {"query_id": qi, "vec_id": vec_ids[mask], "sim_1e6": (sims * 1e6).astype(np.int64)}
                )
            )
        if not out:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim_1e6": []}).astype(np.int64)
        return pd.concat(out, ignore_index=True)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return _topk_frame(g, k)

    return (
        emb.map_batches(score_bucketed, batch_format="pandas")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )


def _topk_frame(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Shared rank-assignment for the ANN variants (ties broken by vec_id)."""
    g = g.sort_values(["sim_1e6", "vec_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["query_id", "vec_id", "rank"]]


# --------------------------------------------------------- IVF-style ANN


def q_ann_ivf(sf_dir: str, n_centroids: int = 16, n_probe: int = 4, k: int = 10,
              n_queries: int = 5):
    """IVF (inverted-file) ANN: k-means centroids partition the vectors;
    a query scores only its ``n_probe`` nearest cells. Centroids are
    trained driver-side on a sample (at scale: minibatch k-means on
    ``ds.random_sample``), assignment + scoring are per-batch matmuls."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # deterministic random subset: seeded shuffle picks WHICH rows train
    # the centroids (block-order limit alone would grab an arbitrary,
    # run-varying prefix once the table exceeds the limit), and the sort
    # fixes the order k-means init indexes into
    sample = emb.random_shuffle(seed=42).limit(2000).to_pandas().sort_values("vec_id")
    mat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(42)
    n_centroids = min(n_centroids, len(mat))  # tiny tables: one cell per row
    cent = mat[rng.choice(len(mat), size=n_centroids, replace=False)].copy()
    for _ in range(10):  # Lloyd iterations on the sample
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            pts = mat[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                cent[c] = v / np.linalg.norm(v)

    qdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qids = qdf["vec_id"].to_numpy()
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qcells = np.argsort(-(qnorm @ cent.T), axis=1)[:, :n_probe]  # probed cells
    ref = ray.put((qids, qnorm, qcells, cent))

    def score_cells(df: pd.DataFrame) -> pd.DataFrame:
        ids_, qn, qc, ct = ray.get(ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cells = (m @ ct.T).argmax(axis=1)
        vec_ids = df["vec_id"].to_numpy()
        out = []
        for qi, q, probed in zip(ids_, qn, qc):
            mask = np.isin(cells, probed)
            if not mask.any():
                continue
            sims = m[mask] @ q
            out.append(pd.DataFrame({
                "query_id": qi, "vec_id": vec_ids[mask],
                "sim_1e6": (sims * 1e6).astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim_1e6": []}).astype(np.int64)
        return pd.concat(out, ignore_index=True)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return _topk_frame(g, k)

    return (
        emb.map_batches(score_cells, batch_format="pandas")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )


# ------------------------------------------------- cosine nearest neighbor


def q_cosine_nn(sf_dir: str, n_queries: int = 100):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qids = qdf["vec_id"].to_numpy()
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    ref = ray.put((qids, qnorm))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ids_, qn = ray.get(ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qn @ mat.T
        vec_ids = df["vec_id"].to_numpy()
        # per-batch partial top-1 (excluding self) → tiny shuffle
        out = []
        for row, qi in enumerate(ids_):
            s = sims[row].copy()
            s[vec_ids == qi] = -2.0
            j = int(np.argmax(s))
            out.append((int(qi), int(vec_ids[j]), int(s[j] * 1e6)))
        return pd.DataFrame(out, columns=["query_id", "cand_id", "sim_1e6"]).astype(np.int64)

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim_1e6", "cand_id"], ascending=[False, True]).head(1)
        return g.rename(columns={"cand_id": "nn_id"})[["query_id", "nn_id"]]

    return (
        emb.map_batches(score, batch_format="pandas")
        .groupby("query_id")
        .map_groups(best, batch_format="pandas")
    )


# ------------------------------------------------------ multimodal plumbing


def q_multimodal_meta(sf_dir: str):
    from ..stages.multimodal import DecodeImageMeta, make_fake_image

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def attach(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return t.append_column(
            "image", pa.array([make_fake_image(str(i)) for i in ids], pa.binary())
        )

    return docs.map_batches(attach, batch_format="pyarrow").map_batches(
        DecodeImageMeta,
        fn_constructor_kwargs={"use_stub": True},
        batch_format="pyarrow",
        batch_size=64,  # wide binary rows → small batches
        concurrency=2,
        num_cpus=1,
    )


# ------------------------------------------------------------- crawl sim


def q_crawl_sim(sf_dir: str):
    from datetime import date
    import shutil

    from .crawl import CrawlConfig, CrawlDriver

    out_dir = "/tmp/europarl_crawl_sim"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(
        output_dir=out_dir,
        start_date=date(2021, 2, 1),
        today=date(2021, 3, 10),
        offset_days=5,
        discovery_limit=10,
        expansion_limit=50,
        num_seen_shards=2,
        fetch_concurrency=2,
    )
    drv = CrawlDriver(cfg, resume=False)
    drv.run()
    rows = drv.metrics
    drv.shutdown()
    return pa.table(
        {
            "wave": pa.array([m["wave"] for m in rows], pa.int64()),
            "dates_probed": pa.array([m["dates_probed"] for m in rows], pa.int64()),
            "confirmed_new": pa.array([m["confirmed_new"] for m in rows], pa.int64()),
            "urls_new": pa.array([m["urls_new"] for m in rows], pa.int64()),
            "pages": pa.array([m["pages"] for m in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------- link rewriting


def q_rewrite_links(sf_dir: str):
    from datetime import date

    from ..functions.rewrite import rewrite_links
    from ..functions.rules import RULES_BY_NAME
    from ..sources.synth import render_html

    rule = RULES_BY_NAME["protocol_en_html"]
    days = [date(2021, 2, 1), date(2021, 2, 2), date(2021, 2, 3), date(2021, 2, 4)]
    urls = [rule.url(d) for d in days]
    t = pa.table({"url": pa.array(urls), "day": pa.array(days, pa.date32())})

    def rw(batch: pa.Table) -> pa.Table:
        n_rewritten = []
        for url, d in zip(batch.column("url").to_pylist(), batch.column("day").to_pylist()):
            html = render_html(url, "protocol_en_html", d, "EN").decode()
            out = rewrite_links(html, "https://europarl.europa.eu/doceo/document/")
            n_rewritten.append(
                out.count("https://europarl.europa.eu/doceo/document/")
                - html.count("https://europarl.europa.eu/doceo/document/")
            )
        return batch.append_column("n_links_rewritten", pa.array(n_rewritten, pa.int64()))

    return ray.data.from_arrow(t).map_batches(rw, batch_format="pyarrow")


# ------------------------------------------------- CC skew fetch demo


def q_cc_skew_fetch(sf_dir: str):
    """Zipf-skewed multi-host frontier → hot-host salting → one
    groupby(part_key) shuffle → politeness-partitioned fetch. Returns the
    per-host outcome summary (deterministic)."""
    import pyarrow.compute as pc

    from ..sources.synth import cc_urls
    from ..state.politeness import PolitenessCoordinator
    from .frontier_tools import politeness_partitioned_fetch, salt_hot_hosts

    urls = cc_urls(4000, n_hosts=40, zipf_a=1.3)
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls.tolist(), pa.string())}))
    coord = PolitenessCoordinator.options(num_cpus=0).remote(simulated=True)
    ds = salt_hot_hosts(ds, hot_threshold=400, k_host=4)
    fetched = politeness_partitioned_fetch(ds, coord)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.canonical import hosts_vec

        df = df.assign(host=hosts_vec(df["url"].tolist()), ok=(df["status_code"] == 200).astype(np.int64))
        g = df.groupby("host", as_index=False).agg(n_urls=("url", "size"), n_ok=("ok", "sum"))
        return g

    return (
        fetched.map_batches(summarize, batch_format="pandas")
        .groupby("host")
        .aggregate(Sum("n_urls", alias_name="n_urls"), Sum("n_ok", alias_name="n_ok"))
    )


# ----------------------------------------------- A3: content analytics


def q_content_stats(sf_dir: str):
    """Reference exploration.ipynb analytics: extracted-content length per
    rulename per session date, over a small deterministic crawl output."""
    import os
    import shutil
    from datetime import date as _date

    from .crawl import CrawlConfig, CrawlDriver

    out_dir = "/tmp/europarl_content_stats"
    if not os.path.exists(os.path.join(out_dir, "manifest.json")):
        shutil.rmtree(out_dir, ignore_errors=True)
        cfg = CrawlConfig(
            output_dir=out_dir,
            start_date=_date(2021, 2, 1),
            today=_date(2021, 3, 10),
            offset_days=5,
            discovery_limit=40,
            expansion_limit=2000,
            num_seen_shards=2,
            fetch_concurrency=2,
        )
        d = CrawlDriver(cfg, resume=False)
        d.run()
        d.shutdown()
    pages = ray.data.read_parquet(
        os.path.join(out_dir, "pages"), columns=["rulename", "date", "status_code", "text"]
    )

    def lengths(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["status_code"] == 200) & df["text"].notna()]
        df = df.assign(content_len=df["text"].str.len().astype(np.int64))
        return df.groupby(["rulename", "date"], as_index=False).agg(
            content_len=("content_len", "sum"), n=("text", "size")
        )

    return (
        pages.map_batches(lengths, batch_format="pandas")
        .groupby(["rulename", "date"])
        .aggregate(Sum("content_len", alias_name="total_len"), Sum("n", alias_name="n_docs"))
    )


# -------------------------------------------------------------- backfill


def q_backfill(sf_dir: str):
    """Ledger-driven backfill (spaced recrawl schedule + link rewriting +
    date-layout blob store) over a scratch dir; returns stored-file rows."""
    import shutil
    from datetime import date as _date

    from .backfill import backfill

    basedir = "/tmp/europarl_backfill_q"
    shutil.rmtree(basedir, ignore_errors=True)
    out = backfill(basedir, anchor=_date(2021, 3, 1), spaced=True, limit=30)
    import os

    rows = []
    for day_dir in sorted(os.listdir(basedir)):
        full = os.path.join(basedir, day_dir)
        if os.path.isdir(full):
            for fn in sorted(os.listdir(full)):
                rows.append((day_dir, fn, os.path.getsize(os.path.join(full, fn))))
    return pa.table(
        {
            "day": pa.array([r[0] for r in rows], pa.string()),
            "filename": pa.array([r[1] for r in rows], pa.string()),
            "filesize": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ML_QUERIES: dict = {
    "dedup_minhash": q_dedup_minhash,
    "cc_skew_fetch": q_cc_skew_fetch,
    "backfill": q_backfill,
    "content_stats": q_content_stats,
    "dedup_simhash": q_dedup_simhash,
    "langid_predict": q_langid,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "cosine_nn": q_cosine_nn,
    "multimodal_meta": q_multimodal_meta,
    "crawl_sim": q_crawl_sim,
    "rewrite_links": q_rewrite_links,
}
