"""Generate a deterministic corpus of N-Quads inputs for differential
testing against the reference implementation (goldens produced by
tools/make_goldens.js, committed under tests/fixtures/rdfc10/).

Inputs cover: literals (plain/typed/lang), escapes, IRIs with escapes,
named/blank graphs, duplicate quads, isomorphic bnode structures (cycles,
cliques, bipartite, layered), unicode, and poison graphs for budget tests.
"""

import io
import json
import os
import random

from rdf_canonize_spark.rdfc.graphs import make_data_a, make_data_b, make_data_c

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "rdfc10")

CASES = {}


def case(name, data, max_work_factor=1):
    CASES[name] = {"data": data, "maxWorkFactor": max_work_factor}


# --- simple ground cases ------------------------------------------------------
case("empty", "")
case("single-iri", "<http://ex/s> <http://ex/p> <http://ex/o> .\n")
case("single-bnode", "_:b0 <http://ex/p> \"v\" .\n")
case("chain", "_:b0 <urn:p0> _:b1 .\n_:b1 <urn:p1> \"v1\" .\n")
case("dup-quads", "_:b0 <ex:p> _:b1 .\n_:b0 <ex:p> _:b1 .\n")
case(
    "dup-across-graphs",
    "_:b0 <ex:p> _:b1 .\n_:b0 <ex:p> _:b1 <ex:g> .\n"
    "_:b0 <ex:p> _:b1 <ex:g> .\n",
)
case(
    "literals",
    '<http://ex/s> <http://ex/p> "plain" .\n'
    '<http://ex/s> <http://ex/p> "typed"^^<http://ex/dt> .\n'
    '<http://ex/s> <http://ex/p> "en"@en .\n'
    '<http://ex/s> <http://ex/p> "en-us"@en-US .\n'
    '<http://ex/s> <http://ex/p> '
    '"explicit-str"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
    '<http://ex/s> <http://ex/p> "1"^^'
    "<http://www.w3.org/2001/XMLSchema#integer> .\n",
)
esc = "".join(chr(92) + c for c in 'tbnrf"')
case(
    "literal-escapes",
    '<http://ex/s> <http://ex/p> "' + esc + chr(92) + chr(92) + '" .\n'
    '<http://ex/s> <http://ex/p> "u-esc:' + chr(92) + 'u0041'
    + chr(92) + 'u00e9" .\n'
    '<http://ex/s2> <http://ex/p> "x" .\n',
)
case(
    "uchar8-astral",
    '<http://ex/s> <http://ex/p> "' + chr(92) + 'U0001F600" .\n'
    '<http://ex/s> <http://ex/p> "pair:' + chr(92) + 'uD83D'
    + chr(92) + 'uDE00" .\n',
)
case(
    "iri-escapes",
    "<http://ex/s" + chr(92) + "u00e9> <http://ex/p> <http://ex/o> .\n",
)
case(
    "unicode-literals",
    '<http://ex/s> <http://ex/p> "caf' + chr(0xE9) + ' ' + chr(0x4E2D)
    + chr(0x6587) + '" .\n'
    '<http://ex/s> <http://ex/p> "' + chr(0x1F600) + '" .\n',
)
case(
    "graphs-mixed",
    "_:b0 <ex:p> _:b1 <ex:g1> .\n"
    "_:b1 <ex:p> _:b0 <ex:g2> .\n"
    "_:b0 <ex:p> \"v\" _:b2 .\n"
    "_:b2 <ex:q> _:b0 .\n",
)
case(
    "bnode-graph-name",
    "_:b0 <ex:p> <ex:o> _:g0 .\n_:g0 <ex:in> \"meta\" .\n",
)
case("whitespace", "  <http://ex/s>\t<http://ex/p>\t\"v\"  .  \n\n\n"
     "<http://ex/s2> <http://ex/p2> <http://ex/o2> .\n")

# --- isomorphic / symmetric structures ---------------------------------------
case("cycle-2", "_:a <ex:p> _:b .\n_:b <ex:p> _:a .\n")
case(
    "cycle-3",
    "_:a <ex:p> _:b .\n_:b <ex:p> _:c .\n_:c <ex:p> _:a .\n",
    max_work_factor=2,
)
case(
    "clique-3",
    make_data_b(3)[1],
    max_work_factor=3,
)
case("bipartite-2x2", make_data_a(2, 2)[1], max_work_factor=3)
case("bipartite-3x3", make_data_a(3, 3)[1], max_work_factor=3)
case("layered-2-2", make_data_c([2, 2])[1], max_work_factor=3)
case("layered-2-3-2", make_data_c([2, 3, 2])[1], max_work_factor=3)
case(
    "double-edges",
    "_:a <ex:p> _:b .\n_:a <ex:q> _:b .\n_:b <ex:p> _:a .\n"
    "_:b <ex:q> _:a .\n",
    max_work_factor=3,
)
case(
    "shared-literal-symmetric",
    '_:a <ex:p> "same" .\n_:b <ex:p> "same" .\n_:a <ex:r> _:b .\n'
    "_:b <ex:r> _:a .\n",
    max_work_factor=3,
)

# --- random graphs (seeded) ---------------------------------------------------
rng = random.Random(42)
for i in range(12):
    n_bn = rng.randint(2, 8)
    n_iri = rng.randint(0, 4)
    n_edges = rng.randint(n_bn, n_bn * 3)
    lines = []
    nodes = [f"_:n{j}" for j in range(n_bn)] + [
        f"<http://ex/r{j}>" for j in range(n_iri)
    ]
    preds = [f"<http://ex/p{j}>" for j in range(rng.randint(1, 3))]
    graphs_opt = ["", " <http://ex/g0>", " <http://ex/g1>"]
    seen = set()
    for _ in range(n_edges):
        s = rng.choice(nodes)
        if s.startswith("<http") and rng.random() < 0.5:
            s = rng.choice(nodes)
        p = rng.choice(preds)
        kind = rng.random()
        if kind < 0.6:
            o = rng.choice(nodes)
        elif kind < 0.8:
            o = f'"lit{rng.randint(0, 3)}"'
        else:
            o = f'"l{rng.randint(0, 2)}"@en'
        gph = rng.choice(graphs_opt)
        line = f"{s} {p} {o}{gph} .\n"
        if line not in seen:
            seen.add(line)
            lines.append(line)
    case(f"random-{i:02d}", "".join(lines), max_work_factor=3)

# random symmetric clusters: pairs of identical subgraph shapes
for i in range(6):
    rng2 = random.Random(1000 + i)
    k = rng2.randint(2, 4)
    lines = []
    for copy in range(2):
        for a in range(k):
            b = (a + 1) % k
            lines.append(f"_:c{copy}_{a} <ex:p> _:c{copy}_{b} .\n")
    if i % 2 == 0:
        lines.append(f"_:c0_0 <ex:link> _:c1_0 .\n")
    case(f"twins-{i:02d}", "".join(lines), max_work_factor=3)

# --- poison / budget cases (expected to throw at low work factors) -----------
case("poison-a-4x4-wf1", make_data_a(4, 4)[1], max_work_factor=1)
case("poison-b-4-wf1", make_data_b(4)[1], max_work_factor=1)
case("poison-b-3-wf0", make_data_b(3)[1], max_work_factor=0)
case("clique-5-wf2", make_data_b(5)[1], max_work_factor=2)

# --- batch 2: unicode/sort/digest/recursion stress ----------------------------
# UTF-16 vs code-point sort divergence: astral chars (U+1D306) sort
# BEFORE U+E000..U+FFFF in UTF-16 code units but AFTER in code points
case(
    "utf16-sort-stress",
    '<http://ex/s> <http://ex/p> "' + chr(0x1D306) + 'x" .\n'
    '<http://ex/s> <http://ex/p> "' + chr(0xE000) + 'x" .\n'
    '<http://ex/s> <http://ex/p> "' + chr(0xFB01) + 'x" .\n'
    '<http://ex/s> <http://ex/p> "' + chr(0x1F600) + '" .\n'
    '<http://ex/s> <http://ex/p> "' + chr(0xFFFD) + '" .\n',
)
case(
    "utf16-sort-bnode-hash",
    # same shape: the sort feeds first-degree hashing via serialized lines
    '_:a <http://ex/p> "' + chr(0x1D306) + '" .\n'
    '_:a <http://ex/p> "' + chr(0xE000) + '" .\n'
    '_:b <http://ex/p> "' + chr(0x1D306) + '" .\n'
    '_:b <http://ex/q> "' + chr(0xE000) + '" .\n',
    max_work_factor=3,
)
# Lone surrogates: \uD800 / \uDC00 unescape to unpaired surrogates
# (String.fromCharCode semantics); Node then hashes them through its
# lossy UTF-8 encoding -- our core mirrors this via surrogatepass +
# lossy replacement (SURVEY 7.3 item 2).  The bnode pair forces the
# surrogate content through first-degree hashing and issuance order.
case(
    "lone-surrogate-high",
    '_:b0 <http://p/1> "x' + chr(92) + 'uD800y" .\n'
    "_:b0 <http://p/2> _:b1 .\n"
    "_:b1 <http://p/2> _:b0 .\n",
    max_work_factor=3,
)
case(
    "lone-surrogate-sort",
    '_:x <http://p/1> "a' + chr(92) + 'uDC00" .\n'
    '_:x <http://p/1> "a' + chr(92) + 'uD800" .\n'
    '_:y <http://p/1> "a' + chr(92) + 'U0001F600" .\n'
    '_:y <http://p/2> "a' + chr(92) + 'uDC00" .\n',
    max_work_factor=3,
)
# --- batch 3: astral graph names / astral bnode labels ------------------------
# Astral chars in the GRAPH position: graph IRIs participate in quad
# serialization and the global sort, so the UTF-16-vs-code-point
# divergence must hold there too (U+1D306 graph sorts before U+E000
# graph in code units).
case(
    "astral-graph-iri",
    '_:b0 <http://p/1> "v" <http://g/' + chr(0x1D306) + '> .\n'
    '_:b0 <http://p/1> "v" <http://g/' + chr(0xE000) + '> .\n'
    '_:b0 <http://p/1> "v" <http://g/a> .\n'
    "_:b0 <http://p/2> _:b1 .\n"
    '_:b1 <http://p/1> "w" <http://g/' + chr(0x1F600) + '> .\n',
    max_work_factor=3,
)
# Lone-surrogate UCHAR escapes inside a graph IRI (same Node-lossy
# semantics as the literal cases, now on the graph term).
case(
    "lone-surrogate-graph-iri",
    '_:b0 <http://p/1> "v" <http://g/x' + chr(92) + 'uD800y> .\n'
    '_:b0 <http://p/1> "v" <http://g/x' + chr(92) + 'uDC00y> .\n'
    "_:b0 <http://p/2> _:b1 .\n"
    '_:b1 <http://p/1> "v" <http://g/x> .\n',
    max_work_factor=3,
)
case(
    "crlf-endings",
    "<http://ex/s> <http://ex/p> <http://ex/o> .\r\n"
    "_:b0 <http://ex/p> \"v\" .\r"
    "<http://ex/s2> <http://ex/p> \"w\" .\n",
)
case(
    "datatype-variants",
    '<http://ex/s> <http://ex/p> "1" .\n'
    '<http://ex/s> <http://ex/p> "1"^^<http://ex/dt1> .\n'
    '<http://ex/s> <http://ex/p> "1"^^<http://ex/dt2> .\n'
    '<http://ex/s> <http://ex/p> "1"@en .\n'
    '<http://ex/s> <http://ex/p> "1"@en-GB .\n'
    '<http://ex/s> <http://ex/p> "1"@EN .\n',
)
case("layered-2-2-2", make_data_c([2, 2, 2])[1], max_work_factor=3)
case(
    "isomorphic-components-bridge",
    "".join(
        f"_:x{c}_{a} <ex:p> _:x{c}_{(a + 1) % 4} .\n"
        for c in range(2) for a in range(4)
    )
    + "_:x0_0 <ex:bridge> _:x1_2 .\n",
    max_work_factor=3,
)
rng3 = random.Random(777)
for i in range(30):
    n = rng3.randint(3, 9)
    lines = set()
    for _ in range(rng3.randint(n, 4 * n)):
        s = f"_:v{rng3.randrange(n)}"
        p = f"<http://p/{rng3.randrange(4)}>"
        r = rng3.random()
        if r < 0.55:
            o = f"_:v{rng3.randrange(n)}"
        elif r < 0.7:
            o = f'"L{rng3.randrange(3)}"'
        elif r < 0.8:
            o = f'"l{rng3.randrange(2)}"@{"en" if r < 0.75 else "de"}'
        elif r < 0.9:
            o = f'"t{rng3.randrange(2)}"^^<http://dt/{rng3.randrange(2)}>'
        else:
            o = f"<http://o/{rng3.randrange(3)}>"
        g = rng3.choice(["", " <http://g/0>", " _:v1", " _:v0"])
        lines.add(f"{s} {p} {o}{g} .\n")
    case(f"random2-{i:02d}", "".join(sorted(lines)), max_work_factor=3)

# digest algorithm variants (same input, sha384/sha512)
DIGEST_CASES = {
    "digest-sha384": ("chain", "sha384"),
    "digest-sha512": ("chain", "sha512"),
    "digest-sha384-sym": ("cycle-3", "sha384"),
    "digest-sha512-sym": ("bipartite-2x2", "sha512"),
}
for name, (base, alg) in DIGEST_CASES.items():
    CASES[name] = {
        "data": CASES[base]["data"],
        "maxWorkFactor": 3,
        "digest": alg,
    }

# --- negative parse cases ------------------------------------------------------
NEGATIVE = {
    "bad-line": "this is not nquads\n",
    "bad-missing-dot": "<http://ex/s> <http://ex/p> <http://ex/o>\n",
    "bad-literal-subject": '"lit" <http://ex/p> <http://ex/o> .\n',
    "bad-second-line": "<http://ex/s> <http://ex/p> <http://ex/o> .\nnope\n",
    "bad-comment": "# comment lines are not in the reference grammar\n",
    # The reference grammar's PN_CHARS_BASE deliberately OMITS the
    # astral range U+10000-U+EFFFF (lib/NQuads.js:35-36 TODO), so
    # astral blank-node labels are negative parses in BOTH engines --
    # these pin that grammar-bug parity (a spec-complete parser would
    # accept them and silently diverge).
    "astral-bnode-label": (
        "_:b" + chr(0xF900) + " <http://p/1> _:b" + chr(0x10000)
        + " .\n"
    ),
    "astral-blank-graph-label": (
        '_:s <http://p/1> "v" _:g' + chr(0x10000) + " .\n"
    ),
}


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = []
    for name, spec in CASES.items():
        with io.open(
            os.path.join(OUT, name + "-in.nq"), "w", encoding="utf-8"
        ) as f:
            f.write(spec["data"])
        entry = {"name": name, "maxWorkFactor": spec["maxWorkFactor"]}
        if "digest" in spec:
            entry["digest"] = spec["digest"]
        manifest.append(entry)
    for name, data in NEGATIVE.items():
        with io.open(
            os.path.join(OUT, name + "-in.nq"), "w", encoding="utf-8"
        ) as f:
            f.write(data)
        manifest.append({"name": name, "negativeParse": True})
    with io.open(
        os.path.join(OUT, "manifest.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {len(manifest)} inputs to {OUT}")


if __name__ == "__main__":
    main()
