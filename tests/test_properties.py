"""Property-based tests (hypothesis): the extractor never crashes and is
deterministic on arbitrary input; canonicalization is idempotent; minhash
estimates are bounded; the seen-set never false-negatives."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from europarl_crawler_ray.functions.canonical import canonicalize_url, hash_urls
from europarl_crawler_ray.functions.dedup import (
    est_jaccard,
    minhash_signature,
    word_shingles,
)
from europarl_crawler_ray.functions.extract import get_text, html_to_text
from europarl_crawler_ray.state.seen import BloomSet

html_fragments = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(html_fragments)
@settings(max_examples=150, deadline=None)
def test_get_text_total_and_deterministic(s):
    out1 = get_text(s)
    out2 = get_text(s)
    assert out1 == out2
    assert isinstance(out1, str)


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_html_to_text_total_on_bytes(b):
    out = html_to_text(b)
    assert out is None or isinstance(out, str)


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_canonicalize_idempotent(u):
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


@given(st.text(max_size=300), st.text(max_size=300))
@settings(max_examples=50, deadline=None)
def test_minhash_estimate_bounded_and_reflexive(a, b):
    sa, sb = word_shingles(a), word_shingles(b)
    est = est_jaccard(minhash_signature(sa), minhash_signature(sb))
    assert 0.0 <= est <= 1.0
    assert est_jaccard(minhash_signature(sa), minhash_signature(sa)) == 1.0


@given(st.lists(st.text(min_size=1, max_size=50), min_size=1, max_size=100))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(urls):
    b = BloomSet(m_bits=1 << 14, exact=False)
    h1, h2 = hash_urls(urls)
    b.check_and_add(h1, h2)
    assert b.contains(h1, h2).all()


@given(st.text(max_size=400))
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_arbitrary_text(text):
    """render→extract recovers ANY text after the pdf_roundtrip query's
    structural-char normalization (\\n and \\x0c are the extractor's line/
    page separators); the renderer must never crash on any unicode."""
    from europarl_crawler_ray.functions.pdf import (
        pdf_to_text,
        render_pdf_text,
        unwrap_lines,
    )

    safe = text.replace("\x0c", " ").replace("\n", " ")
    out = pdf_to_text(render_pdf_text(safe))
    assert out is not None
    assert unwrap_lines(out) == safe


@given(st.text(max_size=300))
@settings(max_examples=60, deadline=None)
def test_rewrite_links_never_crashes_and_is_parseable(text):
    """The DOM rewriter must accept arbitrary (broken) markup without
    raising, and rewriting twice must be a no-op on its own output
    (reserialization fixed point)."""
    from europarl_crawler_ray.functions.rewrite import rewrite_links

    once = rewrite_links(text, "https://base.example")
    assert rewrite_links(once, "https://base.example") == once


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_bmp_roundtrip_property(h, w, seed):
    import numpy as np

    from europarl_crawler_ray.functions.imagecodec import (
        bmp_decode,
        bmp_encode,
        png_decode,
        png_encode,
    )

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(bmp_decode(bmp_encode(px)), px)
    for filters in ("none", "fast", "mixed"):
        np.testing.assert_array_equal(png_decode(png_encode(px, filters=filters)), px)


@given(st.text(alphabet="ab \n", max_size=250))
@settings(max_examples=80, deadline=None)
def test_pdf15_roundtrip_arbitrary_spacing(text):
    """xref-stream + objstm rendering round-trips space-heavy text (the
    wrap-boundary class that lost spaces in r2) identically to classic."""
    from europarl_crawler_ray.functions.pdf import (
        pdf_to_text,
        render_pdf_text,
        unwrap_lines,
    )

    safe = text.replace("\n", " ")
    assert unwrap_lines(pdf_to_text(render_pdf_text(safe, xref_stream=True, objstm=True))) == safe


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9), st.binary(max_size=300)),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_property(items):
    """Arbitrary binary payloads (incl. CRLF runs and fake WARC headers)
    survive the write→parse round trip byte-exactly."""
    from europarl_crawler_ray.sources.warc import parse_warc, write_warc_gz

    recs = [
        (f"https://ex.org/{i}", payload, "2021-01-01T00:00:00Z")
        for i, (_, payload) in enumerate(items)
    ]
    out = parse_warc(write_warc_gz(recs)) if recs else []
    assert [(r["uri"], r["payload"]) for r in out] == [(u, p) for u, p, _ in recs]
