"""HTML → text extraction (crawl-shaped ingestion, the first stage of
an LLM training-data pipeline).

A web-crawl corpus enters as raw HTML; before any quality gate or
dedup pass the pipeline must strip markup and boilerplate (scripts,
styles, navigation, footers) and decode entities, leaving running
text.  The extraction here is a single chain of column expressions —
map-side only, no shuffle, whole-stage-codegen'd — so the pass costs
one scan at any corpus size, the same plan shape as the PII redaction
guardrail (operators/privacy.py).

Patterns are deliberately RE2-compatible subsets (no backreferences,
no lookarounds; non-greedy ``.*?`` and the inline ``(?s)`` dotall
flag are in both engines) so the SAME regex text runs in Spark (Java
regex) and in the DuckDB oracle (RE2) with identical semantics —
the cross-engine-differential precedent set by privacy.py.

Reference analogue: none — the reference corpus (main.py) ingests a
clean CSV; this is one of the LLM-pipeline extensions the engine adds
on top of the reference's query surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Container elements whose CONTENT is boilerplate, removed wholesale
#: (order matters only for nesting, which the synthetic pages avoid).
#: ``(?s)`` because scripts/styles routinely span lines.
BLOCK_RES: tuple[str, ...] = (
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<nav[^>]*>.*?</nav>",
    r"(?s)<footer[^>]*>.*?</footer>",
)

#: Any remaining tag — dropped, content kept.
TAG_RE = r"<[^>]+>"

#: Whitespace runs collapse to one space after tag removal.  Spelled
#: as an explicit class, NOT ``\s``: Java's default ``\s`` is
#: ``[ \t\n\x0B\f\r]`` while RE2's is ``[ \t\n\f\r]`` — vertical tab
#: would diverge the two engines, so the class is pinned to the
#: common set.
WS_RE = r"[ \t\n\f\r]+"

#: Entity decode table, applied in order.  ``&amp;`` is decoded LAST
#: so double-escaped sequences (``&amp;lt;``) do not double-decode —
#: the standard single-pass unescape ordering.
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text(col: Column) -> Column:
    """Extracted running text of an HTML column: boilerplate blocks
    removed, tags stripped, entities decoded, whitespace collapsed."""
    out = col
    for pat in BLOCK_RES:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, TAG_RE, " ")
    for ent, rep in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, WS_RE, " "))


def extract_text_sql(expr: str) -> str:
    """The DuckDB form of :func:`extract_text` over SQL expression
    ``expr`` — same pattern/replacement text, RE2 needs the explicit
    ``'g'`` option (DuckDB replaces only the first match by default,
    Java regexp_replace is always global)."""
    out = expr
    for pat in BLOCK_RES:
        out = f"regexp_replace({out}, '{pat}', ' ', 'g')"
    out = f"regexp_replace({out}, '{TAG_RE}', ' ', 'g')"
    for ent, rep in ENTITIES:
        out = f"replace({out}, '{ent}', '{rep}')"
    return f"trim(regexp_replace({out}, '{WS_RE}', ' ', 'g'))"
