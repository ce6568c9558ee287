"""A realistic blog-shaped page: nav, hero, sidebar, comments, share
widgets, cookie banner — asserts actual boilerplate-removal quality,
not just the synthetic fixture patterns.  Also covers the base64 input
path and the reference-shaped ``read_document`` API."""

import base64

from ocr_lib_ray import read_document
from ocr_lib_ray.kernel import extract_document

PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
  <title>How We Scaled Our Data Pipeline | TechBlog</title>
  <meta charset="utf-8">
  <script>window.dataLayer = [];</script>
  <style>.nav { color: red; }</style>
</head>
<body>
  <div class="cookie-banner"><form><p>We use cookies to improve your experience.</p>
  <button>Accept</button><button>Decline</button></form></div>
  <header>
    <nav>
      <ul><li><a href="/">Home</a></li><li><a href="/blog">Blog</a></li>
      <li><a href="/about">About</a></li><li><a href="/contact">Contact</a></li></ul>
    </nav>
  </header>
  <main>
    <article>
      <h1>How We Scaled Our Data Pipeline</h1>
      <p>When our ingestion volume grew past a terabyte per day, the
      single-node batch job that had served us for two years finally hit
      its ceiling.</p>
      <p>We rebuilt the pipeline around streaming execution with
      backpressure, and the difference was immediate: p99 latency fell
      by an order of magnitude.</p>
      <h2>Lessons learned</h2>
      <ul>
        <li>Partition by a stable key, never by arrival order.</li>
        <li>Pre-aggregate before every shuffle boundary.</li>
      </ul>
      <figure><img src="/chart.png" alt=""/>
      <figcaption>Throughput before and after</figcaption></figure>
      <p>The full migration took six weeks end to end.</p>
    </article>
    <aside>
      <h3>Related posts</h3>
      <p><a href="/p/1">Why we left cron</a> <a href="/p/2">Zero-copy serialization</a>
      <a href="/p/3">Our on-call playbook</a></p>
    </aside>
  </main>
  <section class="comments">
    <div><p>Great write-up! <a href="/u/42">@sam</a></p></div>
  </section>
  <footer>
    <p>© 2026 TechBlog Inc. <a href="/terms">Terms</a> <a href="/privacy">Privacy</a>
    <a href="/rss">RSS</a></p>
  </footer>
</body>
</html>"""

EXPECTED = (
    "How We Scaled Our Data Pipeline\n"
    "When our ingestion volume grew past a terabyte per day, the single-node "
    "batch job that had served us for two years finally hit its ceiling.\n"
    "We rebuilt the pipeline around streaming execution with backpressure, "
    "and the difference was immediate: p99 latency fell by an order of magnitude.\n"
    "Lessons learned\n"
    "Partition by a stable key, never by arrival order.\n"
    "Pre-aggregate before every shuffle boundary.\n"
    "Throughput before and after\n"
    "The full migration took six weeks end to end.\n"
    "Great write-up! @sam"
)


def test_realistic_page_extraction():
    res = extract_document(PAGE.encode())
    assert res.text == EXPECTED
    assert res.title == "How We Scaled Our Data Pipeline"
    # boilerplate all rejected: cookie banner, nav, aside links, footer
    kinds = [s["kind"] for s in res.spans]
    # aside h3 "Related posts" is chrome (boilerplate ancestor) → rejected
    assert kinds.count("heading") == 2  # h1, h2
    assert "satellite" in kinds  # figcaption attached
    assert len(res.residuals) > 0


def test_base64_payload_roundtrip():
    b64 = base64.b64encode(PAGE.encode())
    res = extract_document(b64)
    assert res.doc_kind == "html"
    assert res.text == EXPECTED


def test_read_document_reference_api():
    text, residuals = read_document(PAGE.encode())
    assert text == EXPECTED
    assert any("cookies" in r for r in residuals)  # banner text in residuals
    # plain non-base64, non-html garbage stays garbage-safe
    text2, _ = read_document(b"just some plain words here")
    assert text2 == "just some plain words here"
