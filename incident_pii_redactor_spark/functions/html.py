"""HTML -> text extraction as pure Catalyst expressions.

Common-Crawl pipelines extract page text from raw HTML before any
quality/scrub stage (the reference consumes pre-extracted text; this
engine's input tables carry both ``html:binary`` and ``text``). This
module provides the extraction step itself so a pipeline can start from
``html`` alone: a deterministic regexp chain — whole-stage codegen, no
Python, no external parser — implementing the standard lightweight
recipe (drop script/style/comments, block-level tags to newlines, strip
tags, decode core entities, normalize whitespace).

It is intentionally NOT a browser-grade parser (no CSS visibility, no
JS): at 10^12 pages the extraction must be a streaming per-row
expression, and this recipe is the same fidelity class as the
fast-path extractors used for web-scale corpora. Every pattern is
RE2-safe (no lookaround, no backrefs in MATCH position) so the DuckDB
twin (:func:`extract_text_sql`) produces byte-identical output — the
north-rule invariant ("byte-identical extracted text per url") is then
testable engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: comments/script/style bodies go first (their content
# must never leak into text), then structure, then the generic tag strip
_BLOCK_CLOSE_RE = (
    "(?i)<(?:br|hr)[^>]*>|</(?:p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|"
    "table|blockquote|section|article|header|footer|pre|title|dt|dd|"
    "caption|nav|aside|main)[^>]*>"
)
_DROP_BODY_RES = (
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->",
)
_TAG_RE = "<[^>]+>"
# (entity, replacement) — applied after tag stripping so '&lt;b&gt;'
# renders as literal text, never as a tag
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: '&amp;lt;' must yield '&lt;', not '<'
)


def extract_text(html: str | Column = "html") -> Column:
    """Extracted page text from an ``html`` binary/string column.

    Steps: utf-8 decode -> drop script/style/comment bodies ->
    block-close tags to newlines -> strip remaining tags -> decode core
    entities -> collapse spaces/tabs, trim line edges, collapse blank
    lines, trim the document. Deterministic, pure Catalyst."""
    c = F.col(html) if isinstance(html, str) else html
    s = c.cast("string")
    for pat in _DROP_BODY_RES:
        s = F.regexp_replace(s, pat, "")
    s = F.regexp_replace(s, _BLOCK_CLOSE_RE, "\n")
    s = F.regexp_replace(s, _TAG_RE, "")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, "[ \\t]+", " ")     # collapse runs
    s = F.regexp_replace(s, " ?\\n ?", "\n")    # trim line edges
    s = F.regexp_replace(s, "\\n{2,}", "\n")    # collapse blank lines
    s = F.regexp_replace(s, "^\\n+|\\n+$", "")  # trim edge newlines
    return F.trim(s)


# link / robots-directive signals (round 4): crawl pipelines count
# outlinks (boilerplate/link-farm indicator, PageRank-ish host signals)
# and honor <meta name=robots content=noindex> before keeping a page.
# RE2-safe, shared verbatim with the DuckDB twins below.
# - href must be its OWN attribute (whitespace-preceded, '='-followed):
#   'data-href=' never counts; newlines between attributes do (review
#   round 4 — pretty-printed pages wrap attributes).
# - noindex counts only inside a meta tag whose NAME attribute is
#   robots (either attribute order), anchored as name\s*=\s*["']?robots
#   — ADVICE round 4: the old co-occurrence pattern flagged
#   <meta name="description" content="about robots and noindex"> and
#   matched '<metadata' custom tags; '<meta' now requires a following
#   whitespace character. A meta that merely MENTIONS both words in
#   prose content still slips only if it ALSO carries name=robots —
#   i.e. never for well-formed pages.
_LINK_RE = "(?i)<a[ \\t\\r\\n](?:[^>]*[ \\t\\r\\n])?href[ \\t\\r\\n]*="
_NAME_ROBOTS = "name[ \\t\\r\\n]*=[ \\t\\r\\n]*[\"']?robots"
_NOINDEX_RE = (f"(?i)<meta[ \\t\\r\\n](?:[^>]*{_NAME_ROBOTS}[^>]*noindex"
               f"|[^>]*noindex[^>]*{_NAME_ROBOTS})[^>]*>")


def count_links(html: str | Column = "html") -> Column:
    """Number of anchor-with-href tags in the raw HTML (bigint)."""
    c = F.col(html) if isinstance(html, str) else html
    return F.size(
        F.regexp_extract_all(c.cast("string"), F.lit(_LINK_RE), F.lit(0))
    ).cast("bigint")


def has_noindex(html: str | Column = "html") -> Column:
    """True when a meta robots noindex directive is present."""
    c = F.col(html) if isinstance(html, str) else html
    return c.cast("string").rlike(_NOINDEX_RE)


def count_links_sql(expr: str) -> str:
    """DuckDB twin of :func:`count_links` (same pattern constant)."""
    return (f"CAST(len(regexp_extract_all(decode({expr}::BLOB), "
            f"'{_LINK_RE}')) AS BIGINT)")


def has_noindex_sql(expr: str) -> str:
    """DuckDB twin of :func:`has_noindex` (same pattern constant; the
    quote class needs SQL-escaping for the string literal)."""
    return (f"regexp_matches(decode({expr}::BLOB), "
            f"'{_NOINDEX_RE.replace(chr(39), chr(39) * 2)}')")


def extract_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`extract_text` — same patterns in the same
    order; DuckDB needs explicit 'g' flags (Spark replaces all by
    default) and takes (?i)/(?s) inline flags like RE2."""
    # decode(), NOT CAST(... AS VARCHAR): DuckDB's blob->varchar cast
    # ESCAPES non-printable bytes into literal '\x09' text; decode()
    # does a real UTF-8 decode like Spark's cast("string")
    s = f"decode({expr}::BLOB)"
    for pat in _DROP_BODY_RES:
        s = f"regexp_replace({s}, '{pat}', '', 'g')"
    s = f"regexp_replace({s}, '{_BLOCK_CLOSE_RE}', chr(10), 'g')"
    s = f"regexp_replace({s}, '{_TAG_RE}', '', 'g')"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        s = f"replace({s}, '{ent}', '{lit}')"
    s = f"regexp_replace({s}, '[ \\t]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n ?', chr(10), 'g')"
    s = f"regexp_replace({s}, '\\n{{2,}}', chr(10), 'g')"
    s = f"regexp_replace({s}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({s})"
