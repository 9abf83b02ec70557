"""Deterministic synthetic corpus of interleaved text+media documents.

Produces rows of the `docs` input table from BASELINE.json's input_hint:
    docs(doc_id string,
         spans array<struct<kind string, text string,
                            media_ref string, offset int>>)

A document's raw payload is the offset-ordered concatenation of its spans'
``text``; ``media`` spans are interleaved placeholders carrying the media URL
in ``media_ref`` (their text is the corresponding <img> markup so the
document reassembles exactly).

The fixture inventory mirrors FIXTURES.md §3 — synthetic equivalents of the
reference's test corpus (/root/reference/tests/fixtures/*.html and the inline
pages in tests/unit/scraper-pipeline.test.ts), NOT copies.

Everything is seeded (no wall-clock, no external data) so every run of every
process generates byte-identical corpora.
"""

from __future__ import annotations

import random
from typing import Iterator

BASE_URL_PREFIX = "https://fixtures.test/"


def base_url_for(doc_id: str) -> str:
    return BASE_URL_PREFIX + doc_id


def _span(kind: str, text: str, media_ref: str | None, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _html_doc(doc_id: str, html: str) -> dict:
    return {"doc_id": doc_id, "spans": [_span("html", html, None, 0)]}


def _interleaved_doc(doc_id: str, chunks: list[tuple[str, str, str | None]]) -> dict:
    spans = [
        _span(kind, text, media_ref, i)
        for i, (kind, text, media_ref) in enumerate(chunks)
    ]
    return {"doc_id": doc_id, "spans": spans}


# ---------------------------------------------------------------------------
# Fixture pages (synthetic; modeled on the reference's test corpus shapes)
# ---------------------------------------------------------------------------

SIMPLE_STATIC = """<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="utf-8">
  <title>Simple Fixture Page</title>
  <meta name="description" content="A synthetic static page for engine tests">
  <meta property="og:title" content="Simple Fixture OG">
  <meta property="og:description" content="Open Graph description text">
  <link rel="canonical" href="https://fixtures.test/simple-static">
</head>
<body>
  <header>
    <nav><a href="/">Home</a> | <a href="/about">About</a></nav>
  </header>
  <main>
    <article>
      <h1>Simple Fixture Page</h1>
      <p>This is a synthetic static page used for testing the extraction engine.</p>
      <p>It contains multiple paragraphs with <strong>bold text</strong> and <em>italic text</em>.</p>
      <h2>Section Two</h2>
      <p>More content in the second section. Here is a <a href="https://fixtures.test/other">link to another page</a>.</p>
      <ul>
        <li>First item</li>
        <li>Second item</li>
        <li>Third item</li>
      </ul>
    </article>
  </main>
  <footer>
    <p>&copy; 2026 Fixture Site</p>
  </footer>
</body>
</html>"""

EMPTY_PAGE = "<html><head><title></title></head><body></body></html>"

GENERIC_SAMPLE = """<html>
<head>
  <title>Generic Page Title</title>
  <meta name="description" content="A generic page for the content pipeline">
  <meta property="og:title" content="Generic OG Title">
  <meta property="og:image" content="https://fixtures.test/og.png">
  <meta name="twitter:card" content="summary_large_image">
</head>
<body>
  <nav><a href="/">Home</a><a href="/about">About</a></nav>
  <main>
    <h1>Welcome to Generic</h1>
    <p>This is a page with meaningful content that should pass quality checks.</p>
    <p>It has multiple paragraphs to ensure the content pipeline works correctly.</p>
    <a href="https://fixtures.test/link">A useful link</a>
  </main>
  <footer>© 2026 Generic Corp</footer>
</body>
</html>"""

WIKIPEDIA_LIKE = """<html>
<head><title>Data extraction - Encyclopedia</title></head>
<body class="mediawiki ltr uls-dialog-sticky-hide">
  <nav id="mw-navigation"><a href="/">Main Page</a></nav>
  <main id="content">
    <div id="bodyContent">
      <div id="mw-content-text">
        <h1>Data extraction</h1>
        <p><b>Data extraction</b> is the act of retrieving data out of data sources for further processing or storage.</p>
        <h2>Techniques</h2>
        <p>Manual copy-and-paste is the simplest form of data extraction.</p>
        <table class="wikitable">
          <tr><th>Method</th><th>Description</th></tr>
          <tr><td>HTTP</td><td>Direct request</td></tr>
          <tr><td>Browser</td><td>DOM parsing</td></tr>
        </table>
      </div>
    </div>
  </main>
</body>
</html>"""

SAAS_LANDING = """<html>
<head>
  <title>Zenith - Ship faster</title>
  <meta name="description" content="The modern platform for builders">
  <meta property="og:image" content="https://fixtures.test/zenith-og.png">
</head>
<body>
  <header>
    <nav><a href="/pricing">Pricing</a><a href="/docs">Docs</a></nav>
  </header>
  <main>
    <h1>Ship faster with Zenith</h1>
    <p>Zenith helps builders ship products much faster with a modern platform.</p>
    <section>
      <h2>Features</h2>
      <ul>
        <li>Instant deployments</li>
        <li>Edge functions</li>
        <li>Database included</li>
      </ul>
    </section>
  </main>
  <footer>
    <a href="/privacy">Privacy</a>
    <a href="/terms">Terms</a>
  </footer>
</body>
</html>"""

PROTECTED_CONTENT = """<html><body>
  <header>
    <div id="content"><p>This is the real content kept by protection.</p></div>
  </header>
</body></html>"""

DIALOG_CLASS_BODY = """<html><body class="skin uls-dialog-sticky-hide action-view">
  <div id="content">
    <p>This is the real article content that should survive cleaning and is long enough to matter for the fallback thresholds used by the pipeline.</p>
  </div>
</body></html>"""

JSON_PAYLOAD = '{"key": "value", "items": [1, 2, 3], "nested": {"ok": true}}'

SCRIPTS_ONLY = (
    "<html><head><script>alert(1)</script><style>body{color:red}</style></head>"
    "<body><script>track()</script></body></html>"
)

CLOUDFLARE_LIKE = """<html>
<head><title>Just a moment...</title></head>
<body>
  <h1>Just a moment...</h1>
  <p>Checking your browser before accessing fixtures.test.</p>
  <p>Please enable cookies and reload the page.</p>
</body>
</html>"""

# Synthetic bot-wall modeled on the shape of the reference's
# tests/fixtures/amazon-bot-page.html (short page, shop-bot phrasing).
SHOP_BOT_WALL = """<html lang="en-us">
<head><title>Shop Portal</title></head>
<body>
  <div class="box">
    <h4>Click the button below to continue shopping</h4>
    <p>To discuss automated access to this site, contact the owner.</p>
  </div>
</body>
</html>"""


# Models the shape of the reference's golden end-to-end output
# (/root/reference/result.md:4 — example.com): title, h1, one paragraph,
# one inline link.
EXAMPLE_DOMAIN = """<html lang="en">
<head><title>Example Domain</title></head>
<body>
<div>
  <h1>Example Domain</h1>
  <p>This domain is for use in documentation examples without needing permission. Avoid use in operations.</p>
  <p><a href="https://iana.org/domains/example">Learn more</a></p>
</div>
</body>
</html>"""

KITCHEN_SINK = """<html lang="en">
<head><title>Kitchen Sink</title></head>
<body>
  <main>
    <h1>Kitchen Sink</h1>
    <blockquote>A quoted insight worth keeping.</blockquote>
    <ol>
      <li>Step one</li>
      <li>Step two</li>
    </ol>
    <ul>
      <li>Parent item
        <ul><li>Child item</li></ul>
      </li>
      <li><input type="checkbox" checked>Shipped feature</li>
    </ul>
    <p>Inline <code>code()</code> and a bare link <a href="https://fixtures.test/auto">https://fixtures.test/auto</a>.</p>
    <hr>
    <pre><code>def f():
    return 42</code></pre>
    <table>
      <thead><tr><th>K</th><th>V</th></tr></thead>
      <tbody><tr><td>a</td><td>1</td></tr></tbody>
    </table>
    <figure>
      <img src="/fig.png" alt="A figure">
      <figcaption>Figure caption text.</figcaption>
    </figure>
    <dl><dt>Term</dt><dd>Definition of the term.</dd></dl>
  </main>
</body>
</html>"""


def _media_rich_chunks() -> list[tuple[str, str, str | None]]:
    """Interleaved text+media chunks exercising C5/C7/C8 and M2 passes 1-2."""
    return [
        (
            "html",
            """<html><head><title>Media Rich</title></head><body>
  <a href="#main-content">Skip to Content</a>
  <main id="main">
    <h1>Gallery</h1>
    <p>Intro paragraph before any media appears in the flow.</p>
    """,
            None,
        ),
        (
            "media",
            '<img src="/hero.jpg" srcset="/hero-small.jpg 200w, /hero-large.jpg 800w" alt="Hero image">',
            "https://fixtures.test/hero-large.jpg",
        ),
        ("html", "\n    <p>Between images there is prose content.</p>\n    ", None),
        (
            "media",
            '<a href="https://fixtures.test/photo.png"><img src="https://fixtures.test/photo.png" alt="Self linked"></a>',
            "https://fixtures.test/photo.png",
        ),
        ("html", "\n    <p>A paragraph after the self-linked image.</p>\n    ", None),
        (
            "media",
            '<img src="data:image/png;base64,AAAA" alt="inline junk">',
            None,
        ),
        (
            "html",
            """
    <p>Closing words with a <a href="/relative/page">relative link</a>.</p>
  </main>
</body></html>""",
            None,
        ),
    ]


_OVERSIZED_PARA = (
    "<p>Oversized filler paragraph with sufficiently long deterministic text "
    "content to stress the size guard and the skew handling path.</p>\n"
)


def make_oversized_html(target_bytes: int = 2_200_000) -> str:
    repeats = target_bytes // len(_OVERSIZED_PARA) + 1
    return (
        "<html><head><title>Oversized</title></head><body><main>\n"
        + _OVERSIZED_PARA * repeats
        + "</main></body></html>"
    )


PDF_TWO_COLUMN_BOXES = [
    # (page, x0, y0, x1, y1, text) — y grows downward; full-width header then
    # two columns that must be read left column top-to-bottom, then right.
    (1, 50, 40, 550, 60, "Two Column Paper Title"),
    (1, 50, 100, 280, 115, "Left column first line."),
    (1, 50, 120, 280, 135, "Left column second line."),
    (1, 50, 140, 280, 155, "Left column third line."),
    (1, 320, 100, 550, 115, "Right column first line."),
    (1, 320, 120, 550, 135, "Right column second line."),
    (2, 50, 40, 550, 60, "Second Page Heading"),
    (2, 50, 100, 550, 115, "Full width body line on page two."),
]


PDF_HYPHENATED_BOXES = [
    # Dehyphenation fixture (NOT in fixture_docs() — the HTML-span goldens
    # filter by doc_id and must stay stable): word breaks inside a column,
    # across the column boundary, a soft hyphen (U+00AD), and a compound
    # split that must KEEP its hyphen ('state-' + 'Machine').
    (1, 50, 40, 550, 60, "Hyphenation Test Title"),
    (1, 50, 100, 280, 115, "The quick deter-"),
    (1, 50, 120, 280, 135, "ministic corpus uses a state-"),
    (1, 50, 140, 280, 155, "Machine to reflow frag-"),
    (1, 320, 100, 550, 115, "mented lines with a soft­hyphen inside."),
    (1, 320, 120, 550, 135, "Trailing dash stays - intact."),
]


def pdf_boxes_payload(boxes: list[tuple]) -> str:
    """Serialize positioned text boxes one per line: page,x0,y0,x1,y1,text."""
    return "\n".join(
        f"{p}\t{x0}\t{y0}\t{x1}\t{y1}\t{t}" for (p, x0, y0, x1, y1, t) in boxes
    )


def pdf_fixture_doc(doc_id: str, boxes: list[tuple]) -> dict:
    """A single pdf_text document row for docs_from_rows."""
    return {
        "doc_id": doc_id,
        "spans": [_span("pdf_text", pdf_boxes_payload(boxes), None, 0)],
    }


def fixture_docs() -> list[dict]:
    """The canonical small corpus: one row per FIXTURES.md §3 class."""
    docs = [
        _html_doc("simple-static", SIMPLE_STATIC),
        _html_doc("empty-page", EMPTY_PAGE),
        _html_doc("generic-sample", GENERIC_SAMPLE),
        _html_doc("wikipedia-like", WIKIPEDIA_LIKE),
        _html_doc("saas-landing", SAAS_LANDING),
        _html_doc("protected-content", PROTECTED_CONTENT),
        _html_doc("dialog-class-body", DIALOG_CLASS_BODY),
        _interleaved_doc("media-rich", _media_rich_chunks()),
        {"doc_id": "json-payload", "spans": [_span("json", JSON_PAYLOAD, None, 0)]},
        _html_doc("oversized", make_oversized_html()),
        _html_doc("scripts-only", SCRIPTS_ONLY),
        _html_doc("cloudflare-challenge", CLOUDFLARE_LIKE),
        _html_doc("shop-bot-wall", SHOP_BOT_WALL),
        _html_doc("kitchen-sink", KITCHEN_SINK),
        _html_doc("example-domain", EXAMPLE_DOMAIN),
        {
            "doc_id": "pdf-two-column",
            "spans": [_span("pdf_text", pdf_boxes_payload(PDF_TWO_COLUMN_BOXES), None, 0)],
        },
    ]
    return docs


# ---------------------------------------------------------------------------
# Scale-up corpus for benchmarks (seeded parameterized replication)
# ---------------------------------------------------------------------------

_WORDS = (
    "data engine spark extract content page table column stream batch shuffle "
    "partition join scan filter window media image anchor heading paragraph "
    "section fixture deterministic vector arrow pandas schema lineage"
).split()


def _synth_article(rng: random.Random, doc_index: int) -> str:
    n_paras = rng.randint(2, 8)
    parts = [
        "<html><head>",
        f"<title>Article {doc_index}</title>",
        f'<meta name="description" content="Synthetic article number {doc_index}">',
        "</head><body>",
        '<nav><a href="/">Home</a><a href="/about">About</a></nav>',
        "<main><article>",
        f"<h1>Article {doc_index}</h1>",
    ]
    for p in range(n_paras):
        words = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(15, 60)))
        if rng.random() < 0.3:
            words += f' with <a href="/page-{rng.randint(0, 999)}">a link</a>'
        parts.append(f"<p>{words}.</p>")
        if rng.random() < 0.25:
            parts.append(
                f'<img src="/img-{doc_index}-{p}.png" alt="figure {p}">'
            )
    if rng.random() < 0.4:
        items = "".join(
            f"<li>{rng.choice(_WORDS)} {rng.choice(_WORDS)}</li>"
            for _ in range(rng.randint(2, 6))
        )
        parts.append(f"<ul>{items}</ul>")
    parts.append("</article></main><footer>Synthetic footer</footer></body></html>")
    return "\n".join(parts)


def scaled_docs(
    n_docs: int, seed: int = 42, oversized_fraction: float = 0.001
) -> Iterator[dict]:
    """Seeded replication of the inventory: ~n_docs articles with a heavy
    tail of oversized docs (~0.1%) to exercise skew handling."""
    rng = random.Random(seed)
    oversized_html = make_oversized_html()
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        if rng.random() < oversized_fraction:
            yield _html_doc(doc_id, oversized_html)
        else:
            yield _html_doc(doc_id, _synth_article(rng, i))


def synth_payload(index: int, seed: int = 42, oversized_fraction: float = 0.001) -> str:
    """Index-addressable deterministic page — same distribution as
    scaled_docs but computable independently per index, so corpus generation
    can run distributed (each executor synthesizes its own index range)."""
    rng = random.Random(seed * 1_000_003 + index)
    if rng.random() < oversized_fraction:
        return make_oversized_html()
    return _synth_article(rng, index)
