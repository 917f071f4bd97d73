"""Sketch semantics on planted fixtures: exact bit-length kernel (the
float64-rounding trap), HLL register parity with a brute-force single
pass, CMS conservation + upper-bound guarantee. Oracle parity is
covered by the gate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from europarl_crawler_ray.functions.dedup import _WORD_RE, md5_hash64
from europarl_crawler_ray.pipelines.sketch_ops import (
    CMS_DEPTH,
    CMS_WIDTH,
    _bitlen_u58,
    hll_partial,
    q_cms_sketch,
    q_hll_distinct,
)


def _write_docs(path, rows):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[0] for r in rows]),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, path / "documents.parquet")


def test_bitlen_exact_incl_float_rounding_trap():
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 1 << 58, size=5000, dtype=np.uint64)
    # the trap cases: values just below powers of two above 2^53 round
    # UP when cast to float64 — naive log2 overstates bit_length
    edges = []
    for k in [33, 53, 54, 55, 57, 58]:
        edges += [(1 << k) - 1, (1 << k) - 2]
    edges += [0, 1, 2, (1 << 32) - 1, 1 << 32, (1 << 57)]
    xs = np.concatenate([xs, np.array([e for e in edges if e < 1 << 58], dtype=np.uint64)])
    want = np.array([int(x).bit_length() for x in xs], dtype=np.int64)
    got = _bitlen_u58(xs)
    assert (got == want).all()


def test_hll_registers_match_bruteforce(ray_session, tmp_path):
    rows = [
        ("en", "the quick brown fox jumps over the lazy dog"),
        ("en", "the quick red fox"),
        ("de", "der schnelle braune fuchs"),
        ("de", ""),
    ]
    _write_docs(tmp_path, rows)
    df = q_hll_distinct(str(tmp_path)).to_pandas()
    # brute force: one flat pass per lang
    for lang in ("en", "de"):
        words = set()
        for lg, t in rows:
            if lg == lang:
                words.update(_WORD_RE.findall(t.lower()))
        reg, rho = hll_partial(md5_hash64(sorted(words)))
        want = {}
        for r, q in zip(reg, rho):
            want[int(r)] = max(want.get(int(r), 0), int(q))
        got = (
            df[df["lang"] == lang].set_index("reg")["max_rho"].astype(int).to_dict()
        )
        assert got == want
    assert (df["max_rho"] >= 1).all() and (df["max_rho"] <= 59).all()


def test_cms_conservation_and_upper_bound(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    vocab = ["tok%d" % i for i in range(50)]
    rows = [
        ("en", " ".join(vocab[rng.randint(0, 50)] for _ in range(rng.randint(1, 60))))
        for _ in range(30)
    ]
    _write_docs(tmp_path, rows)
    df = q_cms_sketch(str(tmp_path)).to_pandas()
    true = {}
    for _, t in rows:
        for w in _WORD_RE.findall(t.lower()):
            true[w] = true.get(w, 0) + 1
    total = sum(true.values())
    # conservation: every hash row sums to the total occurrence count
    sums = df.groupby("row_id")["n_count"].sum()
    assert len(sums) == CMS_DEPTH and (sums == total).all()
    # point estimates (min over rows) upper-bound the true count
    cells = {(int(r), int(b)): int(n) for r, b, n in df.to_numpy()}
    for w, n in true.items():
        est = min(
            cells.get(
                (j, int(md5_hash64([f"{j}:{w}"])[0] % np.uint64(CMS_WIDTH))), 0
            )
            for j in range(CMS_DEPTH)
        )
        assert est >= n
