"""Generate a W3C rdf-canon-format conformance suite (reconstruction).

The sandbox has no network access, so the official ``w3c/rdf-canon``
``tests/`` directory cannot be vendored verbatim.  This generator
writes a suite in the SAME layout and manifest vocabulary the official
suite uses (and that the reference walks in
/root/reference/test/test.js:160-202,312-384):

* ``tests/fixtures/w3c_rdfc10/manifest.jsonld`` -- mf:Manifest with
  ``entries`` of @type rdfc:RDFC10EvalTest / rdfc:RDFC10MapTest /
  rdfc:RDFC10NegativeEvalTest, ``action``/``result`` file paths,
  ``computationalComplexity`` (low/medium/high -> maxWorkFactor
  0/2/3 per test.js:368-384) and optional ``hashAlgorithm``.
* ``tests/fixtures/w3c_rdfc10/rdfc10/testNNN-in.nq`` inputs, with
  expected ``testNNN-rdfc10.nq`` / ``testNNN-rdfc10map.json`` results
  produced by RUNNING THE REFERENCE under node
  (tools/make_w3c_goldens.js) -- the same implementation that passes
  the official suite.

The case list reconstructs the official suite's documented categories
(simple ground/bnode cases, duplicate handling, literal forms, named
graphs, isomorphic bnode structures needing n-degree hashing, poison
graphs gated by complexity, non-default hash algorithms); it is
clearly labeled a reconstruction, NOT the official files.  The pytest
walker (tests/test_w3c_manifest.py) accepts a drop-in of the real
``w3c/rdf-canon/tests`` directory via $W3C_RDFC10_TESTS_DIR and runs
it unchanged.

Usage: PYTHONPATH=. python3 tools/gen_w3c_suite.py
       node tools/make_w3c_goldens.js
"""

from __future__ import annotations

import json
import os
import shutil

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests",
    "fixtures", "w3c_rdfc10",
)

ENTRIES = []
INPUTS = {}
_N = [0]


def case(test_type, name, data, complexity=None, hash_algorithm=None,
         with_map=False):
    """Register an eval/negative case; ``with_map`` adds a paired
    RDFC10MapTest over the same input (official suite pattern)."""
    _N[0] += 1
    n = _N[0]
    stem = "test%03d" % n
    INPUTS[stem] = data
    entry = {
        "@id": "#%sc" % stem,
        "@type": "rdfc:%s" % test_type,
        "approval": "rdft:Approved",
        "name": name,
        "action": "rdfc10/%s-in.nq" % stem,
    }
    if test_type == "RDFC10EvalTest":
        entry["result"] = "rdfc10/%s-rdfc10.nq" % stem
    if complexity:
        entry["computationalComplexity"] = complexity
    if hash_algorithm:
        entry["hashAlgorithm"] = hash_algorithm
    ENTRIES.append(entry)
    if with_map:
        m = dict(entry)
        m["@id"] = "#%sm" % stem
        m["@type"] = "rdfc:RDFC10MapTest"
        m["name"] = name + " (map)"
        m["result"] = "rdfc10/%s-rdfc10map.json" % stem
        ENTRIES.append(m)


def nq(*lines):
    return "".join(line + " .\n" for line in lines)


XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# --- simple ground + bnode cases (low) ---------------------------------------
case("RDFC10EvalTest", "simple id", nq(
    "<http://example.com/1> <http://example.com/label> \"test\""), "low")
case("RDFC10EvalTest", "duplicate ground quads collapse", nq(
    "<http://ex/s> <http://ex/p> <http://ex/o>",
    "<http://ex/s> <http://ex/p> <http://ex/o>"), "low")
case("RDFC10EvalTest", "single blank node subject", nq(
    "_:e0 <http://example.com/label> \"blank node\""), "low",
    with_map=True)
case("RDFC10EvalTest", "blank node chain relabels in order", nq(
    "_:e1 <http://ex/p> _:e0",
    "_:e0 <http://ex/p> \"leaf\""), "low", with_map=True)
case("RDFC10EvalTest", "duplicate bnode quads collapse", nq(
    "_:a <http://ex/p> _:b",
    "_:a <http://ex/p> _:b"), "low", with_map=True)
case("RDFC10EvalTest", "literal forms", nq(
    "<http://ex/s> <http://ex/p> \"plain\"",
    "<http://ex/s> <http://ex/p> \"typed\"^^<http://ex/dt>",
    "<http://ex/s> <http://ex/p> \"tagged\"@en-US",
    "<http://ex/s> <http://ex/p> \"1\"^^<" + XSD + "integer>"), "low")
case("RDFC10EvalTest", "explicit xsd:string normalizes away", nq(
    "<http://ex/s> <http://ex/p> \"v\"^^<" + XSD + "string>"), "low")
case("RDFC10EvalTest", "rdf:langString with tag round-trips", nq(
    "<http://ex/s> <http://ex/p> \"v\"@en"), "low")
case("RDFC10EvalTest", "escape sequences in literals", nq(
    "<http://ex/s> <http://ex/p> \"tab:" + chr(92) + "t nl:" + chr(92)
    + "n quote:" + chr(92) + chr(34) + " bs:" + chr(92) + chr(92)
    + "\""), "low")
case("RDFC10EvalTest", "unicode literal code points (BMP)", nq(
    "<http://ex/s> <http://ex/p> \"snowman " + chr(0x2603)
    + " accents " + chr(0xE9) + chr(0x1FF) + "\""), "low")
case("RDFC10EvalTest", "named graph IRI", nq(
    "<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g>"), "low")
case("RDFC10EvalTest", "blank node graph label", nq(
    "<http://ex/s> <http://ex/p> <http://ex/o> _:g0",
    "_:g0 <http://ex/meta> \"graph\""), "low", with_map=True)
case("RDFC10EvalTest", "same bnode across default and named graph", nq(
    "_:s <http://ex/p> \"in default\"",
    "_:s <http://ex/p> \"in named\" <http://ex/g>"), "low", with_map=True)
case("RDFC10EvalTest", "bnodes in subject, object, and graph position",
     nq("_:a <http://ex/p> _:b _:g",
        "_:b <http://ex/q> \"v\"",
        "_:g <http://ex/meta> \"g\""), "low", with_map=True)
case("RDFC10EvalTest", "empty dataset", "", "low")
case("RDFC10EvalTest", "shared structure, distinct first-degree", nq(
    "_:a <http://ex/p0> _:c",
    "_:b <http://ex/p1> _:c",
    "_:c <http://ex/p2> \"leaf\""), "low", with_map=True)

# --- isomorphic structures needing n-degree hashing (medium) -----------------
case("RDFC10EvalTest", "two isomorphic disconnected pairs (twins)", nq(
    "_:a0 <http://ex/p> _:a1",
    "_:b0 <http://ex/p> _:b1"), "medium", with_map=True)
case("RDFC10EvalTest", "double circle of 4", nq(
    "_:c0 <http://ex/n> _:c1", "_:c1 <http://ex/n> _:c2",
    "_:c2 <http://ex/n> _:c3", "_:c3 <http://ex/n> _:c0",
    "_:c0 <http://ex/m> _:c3", "_:c3 <http://ex/m> _:c2",
    "_:c2 <http://ex/m> _:c1", "_:c1 <http://ex/m> _:c0"),
    "medium", with_map=True)
case("RDFC10EvalTest", "two disconnected 3-cycles", nq(
    "_:x0 <http://ex/n> _:x1", "_:x1 <http://ex/n> _:x2",
    "_:x2 <http://ex/n> _:x0",
    "_:y0 <http://ex/n> _:y1", "_:y1 <http://ex/n> _:y2",
    "_:y2 <http://ex/n> _:y0"), "medium", with_map=True)
case("RDFC10EvalTest", "bipartite 3x3", nq(*[
    "_:u%d <http://ex/e> _:v%d" % (i, j)
    for i in range(3) for j in range(3)]), "high")
case("RDFC10EvalTest", "cycle of 8 (single orbit)", nq(*[
    "_:r%d <http://ex/n> _:r%d" % (i, (i + 1) % 8)
    for i in range(8)]), "medium", with_map=True)
case("RDFC10EvalTest", "grid 3x3 with grounding literal", nq(
    *(["_:g%d%d <http://ex/r> _:g%d%d" % (i, j, i, j + 1)
       for i in range(3) for j in range(2)]
      + ["_:g%d%d <http://ex/d> _:g%d%d" % (i, j, i + 1, j)
         for i in range(2) for j in range(3)]
      + ["_:g00 <http://ex/label> \"origin\""])), "medium", with_map=True)
case("RDFC10EvalTest", "isomorphic named-graph pairs", nq(
    "_:a <http://ex/p> _:b <http://ex/g1>",
    "_:b <http://ex/p> _:a <http://ex/g2>"), "medium", with_map=True)

case("RDFC10EvalTest", "input labels already in c14n form", nq(
    "_:c14n0 <http://ex/p> _:c14n1",
    "_:c14n1 <http://ex/p> \"leaf\""), "low", with_map=True)
case("RDFC10EvalTest", "c14n-labeled twins (prefix collision stress)",
     nq("_:c14n1 <http://ex/p> _:c14n0",
        "_:a <http://ex/p> _:b"), "medium", with_map=True)
case("RDFC10EvalTest", "star graph (hub + 5 leaves)", nq(*(
    ["_:hub <http://ex/spoke> _:leaf%d" % i for i in range(5)])),
    "medium", with_map=True)
case("RDFC10EvalTest", "binary tree depth 3", nq(*(
    ["_:t%d <http://ex/l> _:t%d" % (i, 2 * i + 1) for i in range(7)]
    + ["_:t%d <http://ex/r> _:t%d" % (i, 2 * i + 2) for i in range(7)])),
    "medium", with_map=True)
case("RDFC10EvalTest", "three disjoint isomorphic chains", nq(*(
    ["_:%s0 <http://ex/n> _:%s1" % (p, p) for p in ("a", "b", "c")]
    + ["_:%s1 <http://ex/n> _:%s2" % (p, p) for p in ("a", "b", "c")])),
    "medium", with_map=True)
case("RDFC10EvalTest", "same triple in default and two named graphs",
     nq("_:x <http://ex/p> _:y",
        "_:x <http://ex/p> _:y <http://ex/g1>",
        "_:x <http://ex/p> _:y <http://ex/g2>"), "medium", with_map=True)
case("RDFC10EvalTest", "literal-distinguished near-twins", nq(
    "_:a <http://ex/p> \"1\"",
    "_:b <http://ex/p> \"2\"",
    "_:a <http://ex/q> _:b"), "low", with_map=True)
case("RDFC10EvalTest", "predicate-only difference between bnodes", nq(
    "_:a <http://ex/p1> \"v\"",
    "_:b <http://ex/p2> \"v\""), "low")
case("RDFC10EvalTest", "empty-string literal and language tag", nq(
    "<http://ex/s> <http://ex/p> \"\"",
    "<http://ex/s> <http://ex/p> \"\"@en"), "low")
case("RDFC10EvalTest", "IRI with percent and UCHAR-escapable chars", nq(
    "<http://ex/path%20x?q=1&r=2#frag> <http://ex/p> \"v\""), "low")

# --- unicode / escape / datatype depth ---------------------------------------
case("RDFC10EvalTest", "astral characters in literal (UTF-16 units)", nq(
    "_:a <http://ex/p> \"astral " + chr(0x10400) + chr(0x1F600)
    + " mixed " + chr(0xE000) + chr(0xFFFD) + "\"",
    "_:b <http://ex/p> \"astral " + chr(0x10401) + "\""), "medium",
    with_map=True)
case("RDFC10EvalTest", "control characters via ECHAR and UCHAR", nq(
    "<http://ex/s> <http://ex/p> \"cr:" + chr(92) + "r ff:" + chr(92)
    + "u000C bell:" + chr(92) + "u0007\""), "low")
case("RDFC10EvalTest", "literal that looks like N-Quads syntax", nq(
    "<http://ex/s> <http://ex/p> \"<not-an-iri> " + chr(92)
    + chr(34) + "quoted" + chr(92) + chr(34) + " _:not-a-bnode .\""),
    "low")
case("RDFC10EvalTest", "UCHAR-escaped IRI normalizes to code points", nq(
    "<http://ex/" + chr(92) + "u00E9" + chr(92) + "U00010400> "
    "<http://ex/p> \"v\""), "low")
case("RDFC10EvalTest", "numeric and temporal datatypes pass through", nq(
    "<http://ex/s> <http://ex/p> \"3.14\"^^<" + XSD + "decimal>",
    "<http://ex/s> <http://ex/p> \"-0\"^^<" + XSD + "integer>",
    "<http://ex/s> <http://ex/p> \"2024-01-01\"^^<" + XSD + "date>",
    "<http://ex/s> <http://ex/p> \"true\"^^<" + XSD + "boolean>"), "low")
case("RDFC10EvalTest", "language tag case preserved", nq(
    "<http://ex/s> <http://ex/p> \"a\"@en-US",
    "<http://ex/s> <http://ex/p> \"a\"@en-us",
    "<http://ex/s> <http://ex/p> \"a\"@EN"), "low")
case("RDFC10EvalTest", "chain of 16 (deep linear relabel)", nq(*[
    "_:n%d <http://ex/next> _:n%d" % (i, i + 1) for i in range(16)]),
    "medium", with_map=True)
case("RDFC10EvalTest", "ground and bnode components side by side", nq(
    "<http://ex/g1> <http://ex/p> <http://ex/g2>",
    "_:x <http://ex/p> _:y",
    "_:y <http://ex/p> \"leaf\"",
    "<http://ex/g2> <http://ex/q> \"ground leaf\""), "low")
case("RDFC10EvalTest", "bnode referenced from many graphs", nq(
    "_:hub <http://ex/p> \"g0\"",
    "_:hub <http://ex/p> \"g1\" <http://ex/g1>",
    "_:hub <http://ex/p> \"g2\" <http://ex/g2>",
    "_:hub <http://ex/p> \"g3\" _:galt",
    "_:galt <http://ex/meta> \"alt graph\""), "medium", with_map=True)
case("RDFC10EvalTest", "tab and mixed whitespace between terms",
     "_:a" + chr(9) + "<http://ex/p>" + chr(9) + "\"v\" ." + chr(10)
     + "  _:a   <http://ex/q>   \"w\"   ." + chr(10), "low")
case("RDFC10EvalTest", "sha384 on an n-degree structure", nq(
    "_:a0 <http://ex/p> _:a1", "_:a1 <http://ex/p> _:a0",
    "_:b0 <http://ex/p> _:b1", "_:b1 <http://ex/p> _:b0"), "medium",
    hash_algorithm="SHA384", with_map=True)
case("RDFC10NegativeEvalTest", "malformed line is a parse error", nq(
    "<http://ex/s> <http://ex/p> \"unterminated"), "low")
case("RDFC10NegativeEvalTest", "bare subject token parse error",
     "not-an-iri <http://ex/p> \"v\" ." + chr(10), "low")

# --- non-default hash algorithms ---------------------------------------------
case("RDFC10EvalTest", "sha384 digest", nq(
    "_:a <http://ex/p> _:b",
    "_:b <http://ex/q> \"v\""), "low", hash_algorithm="SHA384",
    with_map=True)
case("RDFC10EvalTest", "sha512 digest twins", nq(
    "_:a0 <http://ex/p> _:a1",
    "_:b0 <http://ex/p> _:b1"), "medium", hash_algorithm="SHA512",
    with_map=True)

case("RDFC10EvalTest", "double circle of 4 with tails", nq(
    *(["_:d%d <http://ex/n> _:d%d" % (i, (i + 1) % 4) for i in range(4)]
      + ["_:d%d <http://ex/m> _:d%d" % ((i + 1) % 4, i) for i in range(4)]
      + ["_:d%d <http://ex/tail> _:t%d" % (i, i) for i in range(4)])),
    "medium", with_map=True)
case("RDFC10EvalTest", "wide fan-in (8 bnodes to one sink)", nq(
    *(["_:f%d <http://ex/to> _:sink" % i for i in range(8)]
      + ["_:sink <http://ex/label> \"sink\""])), "medium", with_map=True)
case("RDFC10EvalTest", "graph-position-only twins", nq(
    "<http://ex/s> <http://ex/p> \"a\" _:ga",
    "<http://ex/s> <http://ex/p> \"a\" _:gb"), "medium", with_map=True)
case("RDFC10EvalTest", "datatype IRI with escapable characters", nq(
    "<http://ex/s> <http://ex/p> \"v\"^^<http://ex/dt%20x" + chr(92)
    + "u00E9>"), "low")
case("RDFC10EvalTest", "self-loop bnode", nq(
    "_:self <http://ex/p> _:self",
    "_:self <http://ex/label> \"loop\""), "low", with_map=True)
case("RDFC10EvalTest", "two self-loop twins", nq(
    "_:s1 <http://ex/p> _:s1",
    "_:s2 <http://ex/p> _:s2"), "medium", with_map=True)
case("RDFC10EvalTest", "asymmetric weights on a symmetric cycle", nq(
    "_:w0 <http://ex/n> _:w1", "_:w1 <http://ex/n> _:w2",
    "_:w2 <http://ex/n> _:w3", "_:w3 <http://ex/n> _:w0",
    "_:w0 <http://ex/mark> \"x\""), "medium", with_map=True)

# --- poison / complexity-gated (negative: MUST abort at the manifest's
# complexity budget; test.js maps low->maxWorkFactor 0, medium->2) ------------
case("RDFC10NegativeEvalTest", "twins need deep iterations (wf0 aborts)",
     nq("_:a0 <http://ex/p> _:a1",
        "_:b0 <http://ex/p> _:b1"), "low")
case("RDFC10NegativeEvalTest", "clique K6 poison at medium budget", nq(*[
    "_:p%d <http://ex/e> _:p%d" % (i, j)
    for i in range(6) for j in range(6) if i != j]), "medium")
case("RDFC10NegativeEvalTest",
     "complete graph K4 poison even at high budget", nq(*[
         "_:k%d <http://ex/e> _:k%d" % (i, j)
         for i in range(4) for j in range(4) if i != j]), "high")
case("RDFC10NegativeEvalTest",
     "disconnected cycle pair poison at low budget", nq(*(
         ["_:m%d <http://ex/n> _:m%d" % (i, (i + 1) % 5)
          for i in range(5)]
         + ["_:w%d <http://ex/n> _:w%d" % (i, (i + 1) % 5)
            for i in range(5)])), "low")


# --- duplicate-quads map family (round-4 expansion: the official
# suite's duplicate tests exercise the map surface too) -----------------------
case("RDFC10EvalTest", "triple duplicates collapse before hashing", nq(
    "_:a <http://ex/p> _:b", "_:a <http://ex/p> _:b",
    "_:a <http://ex/p> _:b",
    "_:b <http://ex/leaf> \"v\""), "low", with_map=True)
case("RDFC10EvalTest", "duplicates collapse per graph, not across", nq(
    "_:a <http://ex/p> _:b",
    "_:a <http://ex/p> _:b <http://ex/g>",
    "_:a <http://ex/p> _:b <http://ex/g>"), "medium", with_map=True)
case("RDFC10EvalTest", "datatype-distinguished near-duplicates persist",
     nq("_:a <http://ex/p> \"1\"",
        "_:a <http://ex/p> \"1\"^^<" + XSD + "integer>",
        "_:a <http://ex/p> \"1\"@en"), "low", with_map=True)
case("RDFC10EvalTest", "duplicate quads in a blank-node graph collapse",
     nq("_:s <http://ex/p> \"v\" _:g", "_:s <http://ex/p> \"v\" _:g",
        "_:g <http://ex/meta> \"m\""), "low", with_map=True)

# --- hashAlgorithm variants across map tests (all reference alias
# spellings: bare-upper, dashed, lower) ---------------------------------------
case("RDFC10EvalTest", "explicit SHA256 alias equals the default", nq(
    "_:a <http://ex/p> _:b", "_:b <http://ex/q> _:a"), "medium",
    hash_algorithm="SHA256", with_map=True)
case("RDFC10EvalTest", "dashed SHA-384 alias on twins", nq(
    "_:a0 <http://ex/p> _:a1",
    "_:b0 <http://ex/p> _:b1"), "medium", hash_algorithm="SHA-384",
    with_map=True)
case("RDFC10EvalTest", "sha512 map over a named-graph 3-cycle", nq(
    "_:c0 <http://ex/n> _:c1 <http://ex/g>",
    "_:c1 <http://ex/n> _:c2 <http://ex/g>",
    "_:c2 <http://ex/n> _:c0 <http://ex/g>"), "medium",
    hash_algorithm="sha512", with_map=True)

# --- additional isomorphic structures ----------------------------------------
case("RDFC10EvalTest", "cube graph Q3 (3-regular, single orbit)", nq(*(
    ["_:q%d <http://ex/e> _:q%d" % (i, i ^ 1) for i in range(8)]
    + ["_:q%d <http://ex/e> _:q%d" % (i, i ^ 2) for i in range(8)]
    + ["_:q%d <http://ex/e> _:q%d" % (i, i ^ 4) for i in range(8)])),
    "high", with_map=True)
case("RDFC10EvalTest", "complete bipartite K2,3", nq(*[
    "_:u%d <http://ex/e> _:v%d" % (i, j)
    for i in range(2) for j in range(3)]), "high", with_map=True)
case("RDFC10EvalTest", "cycle of 12 with one chord", nq(*(
    ["_:r%02d <http://ex/n> _:r%02d" % (i, (i + 1) % 12)
     for i in range(12)]
    + ["_:r00 <http://ex/chord> _:r06"])), "medium", with_map=True)
case("RDFC10NegativeEvalTest", "bipartite 4x4 poison at medium budget",
     nq(*["_:u%d <http://ex/e> _:v%d" % (i, j)
          for i in range(4) for j in range(4)]), "medium")

# --- round-5 expansion: line handling, label scope, grammar-parity
# negatives, and hash-variant MAP divergence (the issued map itself
# depends on the digest, so each algorithm gets its own map golden) ----------
case("RDFC10EvalTest", "blank and whitespace-only lines are skipped",
     "_:a <http://ex/p> \"v\" ." + chr(10) + chr(10) + "   "
     + chr(10) + chr(9) + chr(10)
     + "_:a <http://ex/q> _:b ." + chr(10) + chr(10), "low",
     with_map=True)
case("RDFC10EvalTest", "CRLF and bare-CR line endings parse as EOLN",
     "_:a <http://ex/p> \"v\" ." + chr(13) + chr(10)
     + "_:a <http://ex/q> _:b ." + chr(13), "low", with_map=True)
case("RDFC10NegativeEvalTest", "comment lines are not N-Quads",
     "# not a quad" + chr(10)
     + "<http://ex/s> <http://ex/p> \"v\" ." + chr(10), "low")
case("RDFC10NegativeEvalTest", "language tag must start alphabetic",
     "_:a <http://ex/p> \"v\"@9x ." + chr(10), "low")
case("RDFC10NegativeEvalTest",
     "astral char in bnode label rejected (PN_CHARS gap parity)",
     "_:x" + chr(0x10400) + " <http://ex/p> \"v\" ." + chr(10), "low")
case("RDFC10EvalTest", "bnode label scope spans default and named graphs",
     nq("_:x <http://ex/p> \"in default\"",
        "_:x <http://ex/p> \"in g\" <http://ex/g>",
        "_:x <http://ex/p> \"in bg\" _:g",
        "_:g <http://ex/meta> \"named by bnode\""), "medium",
     with_map=True)
case("RDFC10EvalTest", "all ECHAR escapes in one literal",
     "<http://ex/s> <http://ex/p> \"t:" + chr(92) + "t b:" + chr(92)
     + "b n:" + chr(92) + "n r:" + chr(92) + "r f:" + chr(92)
     + "f q:" + chr(92) + chr(34) + " bs:" + chr(92) + chr(92)
     + "\" ." + chr(10), "low")
case("RDFC10EvalTest", "sha384 map over double circle of 4", nq(*(
    ["_:d%d <http://ex/n> _:d%d" % (i, (i + 1) % 4) for i in range(4)]
    + ["_:d%d <http://ex/m> _:d%d" % ((i + 1) % 4, i)
       for i in range(4)])), "high", hash_algorithm="SHA384",
    with_map=True)
case("RDFC10EvalTest", "sha512 map over wide fan-in", nq(*(
    ["_:f%d <http://ex/to> _:sink" % i for i in range(6)]
    + ["_:sink <http://ex/label> \"sink\""])), "medium",
    hash_algorithm="SHA512", with_map=True)
case("RDFC10EvalTest", "sha384 triple isomorphic twins", nq(
    "_:a0 <http://ex/p> _:a1", "_:b0 <http://ex/p> _:b1",
    "_:c0 <http://ex/p> _:c1"), "medium", hash_algorithm="SHA384",
    with_map=True)

# --- session-2 expansion: label-grammar edges, exotic schemes, long
# literals (families of the official suite not yet mirrored) ------------------
case("RDFC10EvalTest", "numeric-ish blank node labels are distinct strings",
     nq("_:0 <http://ex/p> _:00", "_:00 <http://ex/p> _:0a",
        "_:0a <http://ex/p> _:0"), "medium", with_map=True)
case("RDFC10EvalTest", "dots and hyphens inside blank node labels", nq(
    "_:a.b-c_d <http://ex/p> _:x.y", "_:x.y <http://ex/p> _:a.b-c_d"),
    "medium", with_map=True)
case("RDFC10EvalTest", "one bnode in subject, object, and graph of one quad",
     nq("_:a <http://ex/p> _:a _:a"), "low", with_map=True)
case("RDFC10EvalTest", "urn, tag, and file IRI schemes round-trip", nq(
    "<urn:uuid:6e8bc430-9c3a-11d9-9669-0800200c9a66> <tag:ex,2026:p> "
    "<file:///tmp/x>",
    "_:b <tag:ex,2026:p> <urn:isbn:0451450523>"), "low")
case("RDFC10EvalTest", "long literal (8 KB) digests correctly", nq(
    '<http://ex/s> <http://ex/p> "' + "x" * 8192 + '"',
    '_:a <http://ex/p> "' + "y" * 8192 + '"'), "low")
case("RDFC10EvalTest", "sha512 map over dotted-label twins", nq(
    "_:p.1 <http://ex/p> _:q.1", "_:p.2 <http://ex/p> _:q.2"),
    "medium", hash_algorithm="SHA512", with_map=True)


def main():
    rdfc10_dir = os.path.join(OUT, "rdfc10")
    if os.path.isdir(rdfc10_dir):
        shutil.rmtree(rdfc10_dir)
    os.makedirs(rdfc10_dir)
    for stem, data in INPUTS.items():
        with open(os.path.join(rdfc10_dir, stem + "-in.nq"), "w",
                  encoding="utf-8") as f:
            f.write(data)
    manifest = {
        "@context": [
            "context.jsonld",
            {"@base": "manifest"},
        ],
        "@id": "",
        "@type": "mf:Manifest",
        "label": "RDF Dataset Canonicalization (rdf-canon category "
                 "reconstruction; see tools/gen_w3c_suite.py)",
        "comment": "NOT the official w3c/rdf-canon files (no network in "
                   "this sandbox); same layout, vocabulary, and case "
                   "categories, expected results generated by the "
                   "reference implementation.  Point "
                   "$W3C_RDFC10_TESTS_DIR at a real rdf-canon tests/ "
                   "clone to run the official files unchanged.",
        "entries": ENTRIES,
    }
    with open(os.path.join(OUT, "manifest.jsonld"), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, ensure_ascii=True)
        f.write("\n")
    print("wrote %d entries (%d inputs) under %s" % (
        len(ENTRIES), len(INPUTS), OUT))


if __name__ == "__main__":
    main()
