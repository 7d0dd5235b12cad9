"""Property-based tests (hypothesis) for the canonicalization core --
invariants the algorithm must satisfy for ANY input, beyond the
golden-fixture corpus (the reference itself has no property testing;
SURVEY.md section 5).
"""

import random
import string

from hypothesis import given, settings, strategies as st

from rdf_canonize_spark.rdfc import canonize, parse, serialize

MWF = 3


@st.composite
def nquads_graph(draw):
    """A random small N-Quads dataset over blank nodes and IRIs."""
    n_bn = draw(st.integers(2, 6))
    n_lines = draw(st.integers(1, 18))
    rng = random.Random(draw(st.integers(0, 2 ** 32)))
    lines = set()
    for _ in range(n_lines):
        s = f"_:b{rng.randrange(n_bn)}"
        p = f"<http://p/{rng.randrange(3)}>"
        r = rng.random()
        if r < 0.6:
            o = f"_:b{rng.randrange(n_bn)}"
        elif r < 0.8:
            o = '"v%d"' % rng.randrange(3)
        else:
            o = f"<http://o/{rng.randrange(2)}>"
        g = rng.choice(["", " <http://g/0>", " _:b0"])
        lines.add(f"{s} {p} {o}{g} .\n")
    return "".join(sorted(lines))


def _canon(nq):
    return canonize(
        nq,
        algorithm="RDFC-1.0",
        input_format="application/n-quads",
        max_work_factor=MWF,
    )


@settings(max_examples=60, deadline=None)
@given(nquads_graph(), st.integers(0, 2 ** 32))
def test_blank_node_renaming_invariance(nq, seed):
    """Canonical form is invariant under any bnode relabeling --
    THE defining property of the algorithm."""
    rng = random.Random(seed)
    labels = [f"b{i}" for i in range(8)]
    fresh = [
        "".join(rng.choice(string.ascii_letters) for _ in range(6))
        for _ in labels
    ]
    renamed = nq
    # two-phase rename to avoid collisions
    for old, tmp in zip(labels, fresh):
        renamed = renamed.replace(f"_:{old} ", f"_:TMP{tmp} ")
    renamed = renamed.replace("_:TMP", "_:")
    assert _canon(renamed) == _canon(nq)


@settings(max_examples=60, deadline=None)
@given(nquads_graph(), st.integers(0, 2 ** 32))
def test_line_order_invariance(nq, seed):
    lines = nq.splitlines(keepends=True)
    rng = random.Random(seed)
    rng.shuffle(lines)
    assert _canon("".join(lines)) == _canon(nq)


@settings(max_examples=60, deadline=None)
@given(nquads_graph())
def test_idempotence(nq):
    """The canonical form is a fixed point: canonizing it again (its
    labels already carry the c14n prefix) returns it unchanged."""
    once = _canon(nq)
    assert _canon(once) == once


@settings(max_examples=60, deadline=None)
@given(nquads_graph())
def test_serialize_parse_roundtrip(nq):
    """parse -> serialize -> parse preserves the quad set exactly
    (set semantics + escaping round-trip; serialize reorders)."""
    ds = parse(nq)
    again = parse(serialize(ds))
    assert set(ds) == set(again)
    assert len(again) == len(ds)
