"""Columnar-codec planning operators (round-5 batch 30): exact
delta+zigzag varint size estimation, RLE run census of the source
column, and the frame-of-reference bit-pack width histogram — the
three numbers a 100-TB lake uses to pick per-column Parquet encodings
(DELTA_BINARY_PACKED vs RLE_DICTIONARY vs plain) before a rewrite.

Scale idioms: the delta/run passes are range-block partitions with a
one-row-per-block-edge boundary hand-off (the seam pattern shared
with length_lag1_corr); the width histogram is ONE coarse exchange
keyed on the 128-value frame id with a 65-cell output domain. All
byte/width math is exact integer threshold comparisons — identical
formulas on both engines, no log2 floats near power-of-two edges.

Reference parity: the reference stores blobs on disk and rows in
Postgres with no layout planning surface (europarl/db/documents.py);
these extend the brief's storage/IO family (zonemap_selectivity,
dict_encoding_gain, compaction_plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


# the shared varint length rule: LEB128 bytes of a nonnegative value,
# 1 + one byte per extra 7-bit group — expressed as exact integer
# threshold comparisons so numpy and SQL cannot disagree
_VARINT_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]


def _varint_bytes(v: np.ndarray) -> np.ndarray:
    """LEB128 byte count per nonnegative int64/object value."""
    out = np.ones(len(v), dtype=np.int64)
    for t in _VARINT_THRESHOLDS:
        out += (v >= t).astype(np.int64)
    return out


def _zigzag(d: np.ndarray) -> np.ndarray:
    return np.where(d >= 0, 2 * d, -2 * d - 1)


def _varint_sql(expr: str) -> str:
    terms = " + ".join(
        f"CAST(({expr}) >= {t} AS BIGINT)" for t in _VARINT_THRESHOLDS
    )
    return f"(1 + {terms})"


# ==================================================== delta_varint_gain
#
# Exact encoded size of each integer column under delta + zigzag +
# LEB128 varint (the DELTA_BINARY_PACKED / streaming-varint family):
# first value as varint(zigzag(v0)), every subsequent value as
# varint(zigzag(v_i − v_{i−1})) along doc_id order. Output per column:
# raw int64 bytes (8n), encoded bytes, and the basis-point saving —
# the decision number for re-encoding a sorted lake column.
#
# Scale shape: DVG_BLOCKS range blocks on the dense doc_id (block =
# doc_id·B // n); each block sorts in-task, emits its intra-block
# varint byte sum plus its first/last values — the ≤ B boundary rows
# stitch the cross-block deltas exactly on the driver (the seam
# pattern). The column data crosses the wire zero times.

DVG_BLOCKS = 16
_DVG_COLUMNS = ["doc_id", "n_chars"]


def q_delta_varint_gain(sf_dir: str):
    n_docs = _n_docs(sf_dir)
    empty = pd.DataFrame(
        {
            "col_name": pd.Series(dtype=object),
            "n_values": pd.Series(dtype=np.int64),
            "raw_bytes": pd.Series(dtype=np.int64),
            "varint_bytes": pd.Series(dtype=np.int64),
            "saved_bp": pd.Series(dtype=np.int64),
        }
    )
    if n_docs == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def with_blk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["blk"] = out["doc_id"].to_numpy(np.int64) * DVG_BLOCKS // n_docs
        return out

    def block_stats(g: pd.DataFrame) -> pd.DataFrame:
        t = g.sort_values("doc_id", kind="mergesort")
        rows = []
        for col in _DVG_COLUMNS:
            v = t[col].to_numpy(np.int64)
            intra = (
                int(_varint_bytes(_zigzag(np.diff(v))).sum())
                if len(v) > 1
                else 0
            )
            rows.append(
                {
                    "blk": int(t["blk"].iloc[0]),
                    "col_name": col,
                    "n_rows": len(v),
                    "intra_bytes": intra,
                    "first_v": int(v[0]),
                    "last_v": int(v[-1]),
                }
            )
        return pd.DataFrame(rows)

    parts = (
        d.map_batches(with_blk, batch_format="pandas")
        .groupby("blk")
        .map_groups(block_stats, batch_format="pandas")
        .to_pandas()  # <= DVG_BLOCKS x |columns| rows
    )
    out_rows = []
    for col in _DVG_COLUMNS:
        p = (
            parts[parts["col_name"] == col]
            .sort_values("blk")
            .reset_index(drop=True)
        )
        n = int(p["n_rows"].sum())
        enc = int(p["intra_bytes"].sum())
        # dense doc_ids (TESTDATA.md): every lag pair is in-block or the
        # (last of blk, first of blk+1) seam
        for i in range(len(p) - 1):
            dlt = np.array(
                [int(p["first_v"].iloc[i + 1]) - int(p["last_v"].iloc[i])],
                dtype=np.int64,
            )
            enc += int(_varint_bytes(_zigzag(dlt))[0])
        first = np.array([int(p["first_v"].iloc[0])], dtype=np.int64)
        enc += int(_varint_bytes(_zigzag(first))[0])
        raw = 8 * n
        out_rows.append(
            {
                "col_name": col,
                "n_values": n,
                "raw_bytes": raw,
                "varint_bytes": enc,
                "saved_bp": (raw - enc) * 10000 // raw if raw else 0,
            }
        )
    out = pd.DataFrame(out_rows)
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


def _dvg_col_sql(col: str) -> str:
    zz = "CASE WHEN d >= 0 THEN 2 * d ELSE -2 * d - 1 END"
    return f"""
SELECT '{col}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes,
       CAST(SUM({_varint_sql("zz")}) AS BIGINT) AS varint_bytes,
       CAST((8 * COUNT(*) - SUM({_varint_sql("zz")})) * 10000
            // (8 * COUNT(*)) AS BIGINT) AS saved_bp
FROM (
  SELECT {zz} AS zz
  FROM (
    SELECT COALESCE(
             CAST({col} AS HUGEINT)
               - LAG(CAST({col} AS HUGEINT)) OVER (ORDER BY doc_id),
             CAST({col} AS HUGEINT)) AS d
    FROM documents))
"""


DELTA_VARINT_GAIN_SQL = " UNION ALL ".join(
    _dvg_col_sql(c) for c in _DVG_COLUMNS
)


# ======================================================= rle_run_census
#
# Run-length census of the source column along doc_id order: per
# source value, its occurrence count, its number of maximal runs, and
# the exact mean run length (×100 floor) — the number that decides
# whether RLE beats dictionary codes for a low-cardinality column, and
# a crawl-order diagnostic (long single-source runs mean the frontier
# drained one host at a time).
#
# Scale shape: the same RRC_BLOCKS range blocks; each block counts its
# in-block run STARTS per source (first row of a block provisionally
# starts a run) and emits its edge values; the driver cancels one
# start per seam whose neighbouring blocks share a value — ≤ B − 1
# integer corrections over a |sources|-bounded table.

RRC_BLOCKS = 16


def q_rle_run_census(sf_dir: str):
    n_docs = _n_docs(sf_dir)
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype=object),
            "n_occ": pd.Series(dtype=np.int64),
            "n_runs": pd.Series(dtype=np.int64),
            "mean_run_len_x100": pd.Series(dtype=np.int64),
        }
    )
    if n_docs == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def with_blk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["blk"] = out["doc_id"].to_numpy(np.int64) * RRC_BLOCKS // n_docs
        return out

    def block_stats(g: pd.DataFrame) -> pd.DataFrame:
        t = g.sort_values("doc_id", kind="mergesort")
        vals = t["source"].to_numpy(object)
        starts = np.ones(len(vals), dtype=bool)
        starts[1:] = vals[1:] != vals[:-1]
        occ = pd.Series(vals).groupby(vals).size()
        st = pd.Series(vals[starts]).groupby(vals[starts]).size()
        out = pd.DataFrame(
            {
                "blk": int(t["blk"].iloc[0]),
                "source": occ.index.astype(object),
                "n_occ": occ.to_numpy(np.int64),
                "n_starts": st.reindex(occ.index, fill_value=0).to_numpy(
                    np.int64
                ),
                "first_v": str(vals[0]),
                "last_v": str(vals[-1]),
            }
        )
        return out

    parts = (
        d.map_batches(with_blk, batch_format="pandas")
        .groupby("blk")
        .map_groups(block_stats, batch_format="pandas")
        .to_pandas()  # <= RRC_BLOCKS x |sources| rows
    )
    if not len(parts):
        return empty
    agg = parts.groupby("source", as_index=False)[["n_occ", "n_starts"]].sum()
    runs = dict(zip(agg["source"], agg["n_starts"].astype(int)))
    # seam corrections: a run spanning the block edge was double-started
    edges = (
        parts[["blk", "first_v", "last_v"]]
        .drop_duplicates("blk")
        .sort_values("blk")
        .reset_index(drop=True)
    )
    for i in range(len(edges) - 1):
        if edges["last_v"].iloc[i] == edges["first_v"].iloc[i + 1]:
            runs[edges["first_v"].iloc[i + 1]] -= 1
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(object),
            "n_occ": agg["n_occ"].astype(np.int64),
            "n_runs": np.array(
                [runs[s] for s in agg["source"]], dtype=np.int64
            ),
        }
    )
    out["mean_run_len_x100"] = (
        out["n_occ"].to_numpy(np.int64) * 100
        // np.maximum(out["n_runs"].to_numpy(np.int64), 1)
    )
    return out.sort_values("source").reset_index(drop=True)


RLE_RUN_CENSUS_SQL = """
WITH o AS (
  SELECT source,
         CASE WHEN LAG(source) OVER (ORDER BY doc_id) IS DISTINCT
                   FROM source THEN 1 ELSE 0 END AS is_start
  FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(SUM(is_start) AS BIGINT) AS n_runs,
       CAST(COUNT(*) * 100 // GREATEST(SUM(is_start), 1) AS BIGINT)
         AS mean_run_len_x100
FROM o GROUP BY source
"""


# =================================================== bitpack_width_hist
#
# Frame-of-reference bit-width histogram: n_chars is split into frames
# of FOR_FRAME consecutive doc_ids; each frame needs
# bit_length(max − min) bits per value once the frame minimum is
# subtracted (the FOR + bit-packing layout). The width histogram is
# the exact size model for the packed column AND a dispersion profile
# (wide frames = heavy-tailed lengths).
#
# Scale shape: frame id = doc_id // FOR_FRAME — one coarse exchange
# keyed on the frame co-locates each frame's ≤ FOR_FRAME values; the
# per-frame min/max and the width are vectorized in-task; the output
# domain is 65 cells. Widths use exact integer searchsorted against
# powers of two — never a float log2.

FOR_FRAME = 128
_POW2 = np.array([1 << k for k in range(63)], dtype=np.int64)


def q_bitpack_width_hist(sf_dir: str):
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    empty = pd.DataFrame(
        {
            "width": pd.Series(dtype=np.int64),
            "n_frames": pd.Series(dtype=np.int64),
            "n_values": pd.Series(dtype=np.int64),
        }
    )

    def with_frame(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "frame": df["doc_id"].to_numpy(np.int64) // FOR_FRAME,
                "n_chars": df["n_chars"].to_numpy(np.int64),
            }
        )

    def frame_stats(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        s = t.groupby("frame")["n_chars"].agg(["min", "max", "count"])
        r = (s["max"] - s["min"]).to_numpy(np.int64)
        width = np.searchsorted(_POW2, r, side="right")
        out = pd.DataFrame(
            {
                "width": width.astype(np.int64),
                "n_frames_part": np.ones(len(s), dtype=np.int64),
                "n_values_part": s["count"].to_numpy(np.int64),
            }
        )
        return out.groupby("width", as_index=False)[
            ["n_frames_part", "n_values_part"]
        ].sum()

    c = (
        _with_coarse_group(
            d.map_batches(with_frame, batch_format="pandas"), "frame"
        )
        .groupby("_g")
        .map_groups(frame_stats, batch_format="pandas")
        .groupby("width")
        .aggregate(
            Sum("n_frames_part", alias_name="n_frames"),
            Sum("n_values_part", alias_name="n_values"),
        )
        .to_pandas()  # <= 65 cells
    )
    if not len(c):
        return empty
    return (
        c.astype(np.int64).sort_values("width").reset_index(drop=True)
    )


BITPACK_WIDTH_HIST_SQL = f"""
WITH f AS (
  SELECT doc_id // {FOR_FRAME} AS frame,
         MAX(n_chars) - MIN(n_chars) AS r,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1),
w AS (
  SELECT CASE WHEN r = 0 THEN 0
              ELSE CAST(length(bin(CAST(r AS BIGINT))) AS BIGINT) END
           AS width,
         cnt
  FROM f)
SELECT width,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(cnt) AS BIGINT) AS n_values
FROM w GROUP BY 1
"""


COLCODEC_SQL_QUERIES: dict[str, tuple] = {
    "delta_varint_gain": (q_delta_varint_gain, DELTA_VARINT_GAIN_SQL),
    "rle_run_census": (q_rle_run_census, RLE_RUN_CENSUS_SQL),
    "bitpack_width_hist": (q_bitpack_width_hist, BITPACK_WIDTH_HIST_SQL),
}
