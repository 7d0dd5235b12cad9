"""N-Quads parser and canonical serializer.

From-scratch Python implementation of the grammar, escaping, and
per-graph set semantics the reference exhibits in
``/root/reference/lib/NQuads.js`` (grammar 17-81, parse 92-206,
serialize 233-288, escapes 322-444).  Semantics notes:

* parse errors raise ``NQuadsParseError('N-Quads parse error on line N.')``
* duplicate quads *within the same graph* are dropped, keeping the first
  occurrence (``lib/NQuads.js:185-202``; pinned by ``test/misc.js:382-396``)
* ``\\uXXXX`` literal unescapes are UTF-16 code units -- a surrogate pair
  written as two ``\\u`` escapes must combine into one astral character
  (``String.fromCharCode``, ``lib/NQuads.js:385-387``)
* serialization omits ``^^<xsd:string>`` and emits ``@lang`` only for
  ``rdf:langString`` with a non-empty language (``lib/NQuads.js:256-264``)
"""

from __future__ import annotations

import re

from .terms import (
    BLANK,
    DEFAULT_GRAPH_TERM,
    LITERAL,
    NAMED,
    RDF_LANGSTRING,
    XSD_STRING,
    utf16_sort_key,
)


class NQuadsParseError(ValueError):
    pass


# --- grammar (https://www.w3.org/TR/n-quads/#sec-grammar) --------------------
def _rng(a, b):
    return chr(a) + "-" + chr(b)


_PN_CHARS_BASE = (
    "A-Za-z"
    + _rng(0xC0, 0xD6)
    + _rng(0xD8, 0xF6)
    + _rng(0xF8, 0x2FF)
    + _rng(0x370, 0x37D)
    + _rng(0x37F, 0x1FFF)
    + _rng(0x200C, 0x200D)
    + _rng(0x2070, 0x218F)
    + _rng(0x2C00, 0x2FEF)
    + _rng(0x3001, 0xD7FF)
    + _rng(0xF900, 0xFDCF)
    + _rng(0xFDF0, 0xFFFD)
)
_PN_CHARS_U = _PN_CHARS_BASE + "_"
_PN_CHARS = (
    _PN_CHARS_U
    + "0-9"
    + chr(92) + "-"  # escaped hyphen
    + chr(0xB7)
    + _rng(0x300, 0x36F)
    + _rng(0x203F, 0x2040)
)
_BLANK_NODE_LABEL = (
    "_:("
    "(?:[" + _PN_CHARS_U + "0-9])"
    "(?:(?:[" + _PN_CHARS + ".])*(?:[" + _PN_CHARS + "]))?"
    ")"
)
_UCHAR4 = "\\\\u[0-9A-Fa-f]{4}"
_UCHAR8 = "\\\\U[0-9A-Fa-f]{8}"
_IRI = (
    "(?:<((?:"
    "[^" + _rng(0, 0x20) + '<>"{}|^`' + chr(92) * 2 + "]"
    "|" + _UCHAR4 + "|" + _UCHAR8 + ")*)>)"
)
_PLAIN = '"([^"\\\\]*(?:\\\\.[^"\\\\]*)*)"'
_DATATYPE = "(?:\\^\\^" + _IRI + ")"
_LANGUAGE = "(?:@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*))"
_LITERAL_RE = "(?:" + _PLAIN + "(?:" + _DATATYPE + "|" + _LANGUAGE + ")?)"
_WS = "[ \\t]+"
_WSO = "[ \\t]*"

_SUBJECT = "(?:" + _IRI + "|" + _BLANK_NODE_LABEL + ")" + _WS
_PROPERTY = _IRI + _WS
_OBJECT = (
    "(?:" + _IRI + "|" + _BLANK_NODE_LABEL + "|" + _LITERAL_RE + ")" + _WSO
)
_GRAPH_NAME = (
    "(?:\\.|(?:(?:" + _IRI + "|" + _BLANK_NODE_LABEL + ")" + _WSO + "\\.))"
)

_EOLN = re.compile("(?:\r\n)|(?:\n)|(?:\r)")
_EMPTY = re.compile("^" + _WSO + "$")
_QUAD = re.compile(
    "^" + _WSO + _SUBJECT + _PROPERTY + _OBJECT + _GRAPH_NAME + _WSO + "$"
)

# --- escaping ----------------------------------------------------------------
# literal ECHAR + UCHAR table (lib/NQuads.js:322-340)
_STRING_ESCAPE_RE = re.compile("[" + _rng(0, 0x1F) + chr(0x7F) + '"' + chr(92) * 2 + "]")
_STRING_ESCAPE_MAP = {
    n: "\\u%04X" % n
    for n in list(range(0x20)) + [0x7F]
}
_STRING_ESCAPE_MAP.update(
    {
        0x08: "\\b",
        0x09: "\\t",
        0x0A: "\\n",
        0x0C: "\\f",
        0x0D: "\\r",
        0x22: '\\"',
        0x5C: "\\\\",
    }
)

_IRI_ESCAPE_RE = re.compile("[" + _rng(0, 0x20) + '<>"{}|^`' + chr(92) * 2 + "]")
_IRI_ESCAPE_MAP = {n: "\\u%04X" % n for n in range(0x21)}
_IRI_ESCAPE_MAP.update(
    {ord(c): "\\u%04X" % ord(c) for c in '<>"{}|^`\\'}
)

_STRING_UNESCAPE_RE = re.compile(
    r"(?:\\([btnfr\"'\\]))|(?:\\u([0-9A-Fa-f]{4}))|(?:\\U([0-9A-Fa-f]{8}))"
)
_IRI_UNESCAPE_RE = re.compile(
    r"(?:\\u([0-9A-Fa-f]{4}))|(?:\\U([0-9A-Fa-f]{8}))"
)

_ECHAR_DECODE = {
    "b": "\b",
    "t": "\t",
    "n": "\n",
    "f": "\f",
    "r": "\r",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def string_literal_escape(s):
    if not _STRING_ESCAPE_RE.search(s):
        return s
    return s.translate(_STRING_ESCAPE_MAP)


def iri_escape(s):
    if not _IRI_ESCAPE_RE.search(s):
        return s
    return s.translate(_IRI_ESCAPE_MAP)


def _join_surrogates(s):
    """Combine adjacent surrogate pairs produced by code-unit unescaping
    into astral characters, matching JS string storage."""
    return s.encode("utf-16-le", "surrogatepass").decode(
        "utf-16-le", "surrogatepass"
    )


def string_literal_unescape(s):
    if not _STRING_UNESCAPE_RE.search(s):
        return s

    def repl(m):
        code, u, U = m.group(1), m.group(2), m.group(3)
        if code:
            return _ECHAR_DECODE[code]
        if u:
            return chr(int(u, 16))  # UTF-16 code unit (may be a surrogate)
        return chr(int(U, 16))  # code point

    return _join_surrogates(_STRING_UNESCAPE_RE.sub(repl, s))


def iri_unescape(s):
    if not _IRI_UNESCAPE_RE.search(s):
        return s

    def repl(m):
        u, U = m.group(1), m.group(2)
        if u:
            return chr(int(u, 16))
        return chr(int(U, 16))

    return _join_surrogates(_IRI_UNESCAPE_RE.sub(repl, s))


# --- parse -------------------------------------------------------------------
def parse(input_str):
    """Parse an N-Quads string into a list of quad tuples.

    Mirrors ``NQuads.parse`` (``lib/NQuads.js:92-206``): line-split on
    CRLF/LF/CR, skip blank lines, full-line grammar match, per-graph
    first-seen dedup.
    """
    if not isinstance(input_str, str):
        raise TypeError("N-Quads input must be a string.")
    dataset = []
    graphs = {}  # graph value -> set of triple keys already seen
    for line_number, line in enumerate(_EOLN.split(input_str), 1):
        if _EMPTY.match(line):
            continue
        m = _QUAD.match(line)
        if m is None:
            raise NQuadsParseError(
                "N-Quads parse error on line %d." % line_number
            )
        g = m.groups()
        # subject: IRI group 0 | bnode group 1
        if g[0] is not None:
            subject = (NAMED, iri_unescape(g[0]), None, None)
        else:
            subject = (BLANK, g[1], None, None)
        predicate = (NAMED, iri_unescape(g[2]), None, None)
        # object: IRI 3 | bnode 4 | literal 5 (^^IRI 6 | @lang 7)
        if g[3] is not None:
            obj = (NAMED, iri_unescape(g[3]), None, None)
        elif g[4] is not None:
            obj = (BLANK, g[4], None, None)
        else:
            if g[6] is not None:
                dt, lang = iri_unescape(g[6]), None
            elif g[7] is not None:
                dt, lang = RDF_LANGSTRING, g[7]
            else:
                dt, lang = XSD_STRING, None
            obj = (LITERAL, string_literal_unescape(g[5]), dt, lang)
        # graph: IRI 8 | bnode 9 | default
        if g[8] is not None:
            graph = (NAMED, iri_unescape(g[8]), None, None)
        elif g[9] is not None:
            graph = (BLANK, g[9], None, None)
        else:
            graph = DEFAULT_GRAPH_TERM

        # per-graph set semantics, first occurrence wins
        triple_key = (subject, predicate, obj)
        seen = graphs.get(graph[1])
        if seen is None:
            graphs[graph[1]] = {triple_key}
            dataset.append((subject, predicate, obj, graph))
        elif triple_key not in seen:
            seen.add(triple_key)
            dataset.append((subject, predicate, obj, graph))
    return dataset


# --- serialize ---------------------------------------------------------------
def serialize_quad_components(s, p, o, g):
    """Serialize one quad to its N-Quads line (``lib/NQuads.js:233-276``)."""
    parts = []
    # subject: NamedNode or BlankNode
    if s[0] == NAMED:
        parts.append("<" + iri_escape(s[1]) + ">")
    else:
        parts.append("_:" + s[1])
    # predicate: NamedNode (BlankNode allowed for generalized RDF)
    if p[0] == NAMED:
        parts.append(" <" + iri_escape(p[1]) + "> ")
    else:
        parts.append(" _:" + p[1] + " ")
    # object
    if o[0] == NAMED:
        parts.append("<" + iri_escape(o[1]) + ">")
    elif o[0] == BLANK:
        parts.append("_:" + o[1])
    else:
        parts.append('"' + string_literal_escape(o[1]) + '"')
        if o[2] == RDF_LANGSTRING:
            if o[3]:
                parts.append("@" + o[3])
        elif o[2] != XSD_STRING:
            parts.append("^^<" + iri_escape(o[2]) + ">")
    # graph (DefaultGraph adds nothing)
    if g[0] == NAMED:
        parts.append(" <" + iri_escape(g[1]) + ">")
    elif g[0] == BLANK:
        parts.append(" _:" + g[1])
    parts.append(" .\n")
    return "".join(parts)


def serialize_quad(quad):
    return serialize_quad_components(*quad)


def serialize(dataset):
    """Serialize a dataset, sorted in UTF-16 code-unit order
    (``lib/NQuads.js:215-221``)."""
    return "".join(
        sorted((serialize_quad(q) for q in dataset), key=utf16_sort_key)
    )
