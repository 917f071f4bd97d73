"""Storage / distributed-IR audit operators (round-5 batch 28): b-bit
minwise collision base rate (Li & König 2010), dictionary-encoding
gain estimation for low-cardinality columns, and term-based shard
pruning effectiveness for a range-sharded inverted index.

Scale idioms: the b-bit audit is a bounded (b, slot, value) histogram
over the oracle-exact mod-p MinHash signatures
(functions/dedup.batch_minhash_sigs_p — the same arithmetic
dedup_minhash's SQL evaluates); dictionary gain reduces to the
value-domain-bounded (column, value) census; shard pruning is a
(term, shard) presence census over a fixed term list.

Reference parity: the reference has no storage or IR planning
analytics; these extend the brief's dedup / training-prep families.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Max, Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


# ================================================== bbit_collision_rate
#
# b-bit minwise hashing (Li & König 2010) stores only the lowest b
# bits of each MinHash slot; its Jaccard estimator must subtract the
# base rate at which UNRELATED documents collide on those b bits. The
# audit measures that base rate empirically from the corpus signature
# distribution: per slot j, the collision probability of two random
# docs is Σ_v (c_jv/n)², averaged over slots — reported per b against
# the ideal 2^−b. A skewed signature distribution (base rate ≫ ideal)
# means b-bit compression costs more accuracy than the formula
# predicts.
#
# Scale shape: per-batch signature computation (the oracle-exact mod-p
# arithmetic) → (b, slot, value) count partials over the FIXED
# Σ_b N_PERM·2^b ≈ 36k-cell domain → bounded groupby → Python-int
# driver math (c² sums exceed int64 at corpus scale).

BBIT_BS = (1, 2, 4, 8)


def q_bbit_collision_rate(sf_dir: str):
    from ..functions.dedup import N_PERM, minhash_sigs_from_hashes
    from .ml_queries import _shingle_sets

    # signatures derive from the SHARED shingle scratch (one corpus
    # hash pass per sweep, VERDICT r3 #7) instead of re-hashing text —
    # the 52 s cold pass this op used to pay alone drops to the
    # scratch-streaming cost every other dedup-family op pays.
    d = _shingle_sets(sf_dir)
    empty = pd.DataFrame(
        {
            "b": pd.Series(dtype=np.int64),
            "n_docs": pd.Series(dtype=np.int64),
            "collision_ppm": pd.Series(dtype=np.int64),
            "ideal_ppm": pd.Series(dtype=np.int64),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "b": np.int64,
            "j": np.int64,
            "v": np.int64,
            "c_part": np.int64,
        }
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in cols.items()}
            )
        sigs = minhash_sigs_from_hashes(
            [np.frombuffer(x, dtype=np.uint64) for x in df["hs"]]
        )  # (n, N_PERM) uint64
        n_texts = len(sigs)
        frames = []
        for b in BBIT_BS:
            bv = (sigs % np.uint64(1 << b)).astype(np.int64)
            j = np.tile(np.arange(N_PERM, dtype=np.int64), n_texts)
            flat = bv.reshape(-1)
            t = (
                pd.DataFrame({"j": j, "v": flat})
                .groupby(["j", "v"], as_index=False)
                .size()
                .rename(columns={"size": "c_part"})
            )
            t.insert(0, "b", np.int64(b))
            frames.append(t)
        return pd.concat(frames, ignore_index=True).astype(cols)

    # the cell domain is ~35k keys: a per-key Ray groupby pays the
    # measured ~0.1 ms/group Python cost (81 s here) — exchange on a
    # COARSE hash of the packed cell key and sum vectorized in-task
    # (the grouping.py rule), leaving ≤ domain rows for the driver.
    from .grouping import with_coarse_group as _wcg2

    def pack_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["key"] = (
            (out["b"].to_numpy(np.int64) << np.int64(16))
            | (out["j"].to_numpy(np.int64) << np.int64(8))
            | out["v"].to_numpy(np.int64)
        )
        return out

    def cell_sum(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        s = t.groupby(["b", "j", "v"], as_index=False)["c_part"].sum()
        return s.rename(columns={"c_part": "c"})

    c = (
        _wcg2(
            d.map_batches(partial, batch_format="pandas").map_batches(
                pack_key, batch_format="pandas"
            ),
            "key",
        )
        .groupby("_g")
        .map_groups(cell_sum, batch_format="pandas")
        .to_pandas()  # fixed <= sum_b N_PERM*2^b cells
    )
    if not len(c):
        return empty
    c = c.astype(np.int64)
    rows = []
    for b, g in c.groupby("b"):
        n = int(g[g["j"] == 0]["c"].sum())  # docs counted once per slot
        sq = sum(int(x) * int(x) for x in g["c"])
        coll = sq * 1_000_000 // (N_PERM * n * n) if n else 0
        rows.append((int(b), n, coll, 1_000_000 // (1 << int(b))))
    return (
        pd.DataFrame(
            rows, columns=["b", "n_docs", "collision_ppm", "ideal_ppm"]
        )
        .astype(np.int64)
        .sort_values("b")
        .reset_index(drop=True)
    )


def _bbit_sql() -> str:
    from ..functions.dedup import N_PERM
    from .ml_queries import _perms_values

    bvals = ", ".join(f"({b})" for b in BBIT_BS)
    return rf"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\r\f]+') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    END) AS s
  FROM w WHERE len(ws) > 0
),
hh AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT) % 2147483647 AS h
  FROM sh
),
perms(j, a, b) AS (VALUES {_perms_values()}),
sig AS (
  SELECT doc_id, j, MIN((CAST(a AS UBIGINT) * h + CAST(b AS UBIGINT)) % 2147483647) AS m
  FROM hh CROSS JOIN perms GROUP BY doc_id, j
),
bs(bb) AS (VALUES {bvals}),
cells AS (
  SELECT bs.bb AS b, sig.j, CAST(sig.m % (1 << bs.bb) AS BIGINT) AS v,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM sig CROSS JOIN bs
  GROUP BY 1, 2, 3
),
agg AS (
  SELECT b, CAST(SUM(CASE WHEN j = 0 THEN c ELSE 0 END) AS HUGEINT) AS n,
         CAST(SUM(c * c) AS HUGEINT) AS sq
  FROM cells GROUP BY 1)
SELECT CAST(b AS BIGINT) AS b,
       CAST(n AS BIGINT) AS n_docs,
       CAST(sq * 1000000 // ({N_PERM} * n * n) AS BIGINT) AS collision_ppm,
       CAST(1000000 // (1 << b) AS BIGINT) AS ideal_ppm
FROM agg
"""


# ==================================================== dict_encoding_gain
#
# Dictionary-encoding gain estimate for the low-cardinality string
# columns (source, lang): raw bytes = Σ octet_length(value); dictionary
# layout = Σ_distinct octet_length(value) + n · code_bytes with
# code_bytes = ceil(bit_length(n_distinct − 1) / 8) whole-byte codes —
# the storage-planner arithmetic that decides which columns get
# dictionary pages before a 100 TB rewrite. saved_bp clamped at 0
# (floor/truncate rule).
#
# Scale shape: per-batch (column, value) count+len partials — the
# value domain IS the dictionary, bounded by construction for
# dictionary-worthy columns → tiny groupby → driver integer math.

DICT_COLS = ("source", "lang")


def q_dict_encoding_gain(sf_dir: str):
    d = _read(sf_dir, "documents", columns=list(DICT_COLS))
    empty = pd.DataFrame(
        {
            "column": pd.Series(dtype=str),
            "n_rows": pd.Series(dtype=np.int64),
            "n_distinct": pd.Series(dtype=np.int64),
            "raw_bytes": pd.Series(dtype=np.int64),
            "dict_bytes": pd.Series(dtype=np.int64),
            "saved_bp": pd.Series(dtype=np.int64),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in DICT_COLS:
            t = (
                df.groupby(col, as_index=False)
                .size()
                .rename(columns={col: "value", "size": "c_part"})
            )
            t.insert(0, "column", col)
            frames.append(t)
        out = pd.concat(frames, ignore_index=True)
        out["c_part"] = out["c_part"].astype(np.int64)
        return out

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["column", "value"])
        .aggregate(Sum("c_part", alias_name="c"))
        .to_pandas()  # value-domain bounded
    )
    if not len(c):
        return empty
    rows = []
    for col, g in c.groupby("column"):
        n = int(g["c"].sum())
        d_ = len(g)
        raw = sum(
            len(str(v).encode("utf-8")) * int(cc)
            for v, cc in zip(g["value"], g["c"])
        )
        dict_store = sum(len(str(v).encode("utf-8")) for v in g["value"])
        code_bytes = ((d_ - 1).bit_length() + 7) // 8 if d_ > 1 else 0
        dict_total = dict_store + n * code_bytes
        saved = max(raw - dict_total, 0)
        rows.append(
            (col, n, d_, raw, dict_total, saved * 10000 // raw if raw else 0)
        )
    return (
        pd.DataFrame(
            rows,
            columns=[
                "column",
                "n_rows",
                "n_distinct",
                "raw_bytes",
                "dict_bytes",
                "saved_bp",
            ],
        )
        .astype(
            {
                "n_rows": np.int64,
                "n_distinct": np.int64,
                "raw_bytes": np.int64,
                "dict_bytes": np.int64,
                "saved_bp": np.int64,
            }
        )
        .sort_values("column")
        .reset_index(drop=True)
    )


def _dict_gain_sql() -> str:
    parts = []
    for col in DICT_COLS:
        parts.append(
            f"""
SELECT '{col}' AS column_name, {col} AS value,
       CAST(COUNT(*) AS BIGINT) AS c,
       CAST(octet_length(encode({col})) AS BIGINT) AS vbytes
FROM documents GROUP BY {col}"""
        )
    union = " UNION ALL ".join(parts)
    return f"""
WITH cells AS ({union}),
agg AS (
  SELECT column_name,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(vbytes * c) AS BIGINT) AS raw_bytes,
         CAST(SUM(vbytes) AS BIGINT) AS dict_store
  FROM cells GROUP BY 1),
m AS (
  SELECT column_name, n_rows, n_distinct, raw_bytes,
         dict_store + n_rows * (CASE WHEN n_distinct > 1
           THEN (length(bin(n_distinct - 1)) + 7) // 8 ELSE 0 END)
           AS dict_bytes
  FROM agg)
SELECT column_name AS "column", n_rows, n_distinct, raw_bytes,
       CAST(dict_bytes AS BIGINT) AS dict_bytes,
       CAST(CASE WHEN raw_bytes > 0
            THEN GREATEST(raw_bytes - dict_bytes, 0) * 10000 // raw_bytes
            ELSE 0 END AS BIGINT) AS saved_bp
FROM m
"""


# ======================================================== shard_pruning
#
# Term-based shard pruning for a range-sharded inverted index: with
# docs range-partitioned into SP_SHARDS shards (shard = doc_id ·
# S // n, the layout corpus_to_shards writes), a query term only has
# to open the shards whose term dictionary contains it. The census
# reports, per probe term, how many shards hit and the skippable
# share — near-10000 bp means the posting for that term is localized
# and the routing table pays for itself.
#
# Scale shape: per-batch (term, shard) presence partials (fixed
# |terms| × S domain) → Max-combine groupby → driver share math.

SP_SHARDS = 16
SP_TERMS = ("merge", "window", "theory", "quantum")


def q_shard_pruning(sf_dir: str):
    n_docs = _n_docs(sf_dir)
    empty = pd.DataFrame(
        {
            "term": pd.Series(dtype=str),
            "n_shards_hit": pd.Series(dtype=np.int64),
            "skippable_bp": pd.Series(dtype=np.int64),
        }
    )
    if n_docs == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        shard = ids * SP_SHARDS // n_docs
        rec = set()
        for s, t in zip(shard, df["text"]):
            toks = set(str(t).split(" "))
            for term in SP_TERMS:
                if term in toks:
                    rec.add((term, int(s)))
        if not rec:
            return pd.DataFrame(
                {
                    "term": pd.Series(dtype=object),
                    "shard": pd.Series(dtype=np.int64),
                    "hit": pd.Series(dtype=np.int64),
                }
            )
        out = pd.DataFrame(list(rec), columns=["term", "shard"])
        out["shard"] = out["shard"].astype(np.int64)
        out["hit"] = np.ones(len(out), np.int64)
        return out

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["term", "shard"])
        .aggregate(Max("hit", alias_name="hit"))
        .to_pandas()  # <= |terms| * SP_SHARDS rows
    )
    hits = {t: 0 for t in SP_TERMS}
    for _, r in c.iterrows():
        hits[r["term"]] += 1
    rows = [
        (t, h, (SP_SHARDS - h) * 10000 // SP_SHARDS)
        for t, h in hits.items()
    ]
    return (
        pd.DataFrame(rows, columns=["term", "n_shards_hit", "skippable_bp"])
        .astype({"n_shards_hit": np.int64, "skippable_bp": np.int64})
        .sort_values("term")
        .reset_index(drop=True)
    )


def _shard_pruning_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in SP_TERMS)
    return f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
probe(term) AS (VALUES {terms}),
hit AS (
  SELECT DISTINCT probe.term,
         d.doc_id * {SP_SHARDS} // n.cnt AS shard
  FROM documents d, n, probe
  WHERE len(list_filter(string_split(d.text, ' '), w -> w = probe.term)) > 0)
SELECT probe.term,
       CAST(COUNT(hit.shard) AS BIGINT) AS n_shards_hit,
       CAST(({SP_SHARDS} - COUNT(hit.shard)) * 10000 // {SP_SHARDS}
            AS BIGINT) AS skippable_bp
FROM probe LEFT JOIN hit ON hit.term = probe.term
GROUP BY probe.term
"""


STORAGEIR_SQL_QUERIES: dict[str, tuple] = {
    "bbit_collision_rate": (q_bbit_collision_rate, _bbit_sql()),
    "dict_encoding_gain": (q_dict_encoding_gain, _dict_gain_sql()),
    "shard_pruning": (q_shard_pruning, _shard_pruning_sql()),
}
