"""Property tests: the kernel is total, deterministic, and seam-invariant
on arbitrary byte soup (the nil/garbage-guard discipline of the
reference suite, core_test.clj:12-83, done with hypothesis instead of
hand-written nil cases)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_lib_ray.config import ExtractConfig
from ocr_lib_ray.kernel import extract_document, tokenize, tokenize_chunked

html_soup = st.text(
    alphabet=st.sampled_from(list("<>/!-= \n\tabcdep&#;\"'%PDFBTjTm().0123456789\\")),
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(html_soup)
def test_extract_total_and_deterministic(s):
    a = extract_document(s.encode())
    b = extract_document(s.encode())
    assert a == b
    # spans point inside the document
    for sp in a.spans:
        assert 0 <= sp["start"] <= sp["end"] <= len(s)


@settings(max_examples=300, deadline=None)
@given(html_soup, st.integers(min_value=1, max_value=50))
def test_chunked_seam_invariance(s, chunk):
    assert tokenize(s).__dict__ == tokenize_chunked(s, chunk).__dict__


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_arbitrary_bytes_never_crash(b):
    r = extract_document(b)
    assert r.doc_kind in ("html", "pdf", "empty")


pdf_soup = st.text(
    alphabet=st.sampled_from(list("BT E()[]Tjdm*'\\0123456789.- \nTLf/F")),  # incl. Tf
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(pdf_soup)
def test_pdf_tokenizer_total(s):
    from ocr_lib_ray.kernel.pdf import extract_pdf, tokenize_pdf
    from ocr_lib_ray.config import DEFAULT_CONFIG

    runs = tokenize_pdf(s)
    text, spans, _res, _rt = extract_pdf(s, DEFAULT_CONFIG)
    assert isinstance(text, str)
    for r in runs:
        assert 0 <= r.start <= r.end <= len(s)


@settings(max_examples=100, deadline=None)
@given(html_soup)
def test_residual_cap_respected(s):
    cfg = ExtractConfig(residual_cap=2)
    assert len(extract_document(s.encode(), cfg).residuals) <= 2
