"""API behavior tests, modeled on the reference's test/misc.js
(option validation 11-124, canonicalIdMap 126-148, URDNA2015 aliasing
150-169, work-factor behavior 171-321, duplicate quads 382-396, parse
errors 398-415)."""

import pytest

from rdf_canonize_spark.rdfc import (
    IdentifierIssuer,
    NQuadsParseError,
    Permuter,
    canonize,
)
from rdf_canonize_spark.rdfc.canonize import MaxDeepIterationsError
from rdf_canonize_spark.rdfc.graphs import make_data_b

SIMPLE = '_:b0 <urn:p0> _:b1 .\n_:b1 <urn:p1> "v1" .\n'
SIMPLE_OUT = '_:c14n0 <urn:p0> _:c14n1 .\n_:c14n1 <urn:p1> "v1" .\n'


def test_no_algorithm():
    with pytest.raises(ValueError, match="No RDF Dataset Canonicalization"):
        canonize(SIMPLE, input_format="application/n-quads")


def test_invalid_algorithm():
    with pytest.raises(
        ValueError, match="Invalid RDF Dataset Canonicalization"
    ):
        canonize(SIMPLE, algorithm="BOGUS",
                 input_format="application/n-quads")


def test_urdna2015_alias():
    assert (
        canonize(SIMPLE, algorithm="URDNA2015",
                 input_format="application/n-quads")
        == SIMPLE_OUT
    )


def test_urdna2015_trace_hook(monkeypatch, capsys):
    """RDF_CANONIZE_TRACE_URDNA2015 (lib/index.js:72-77): with the
    flag set, the deprecated alias path prints a console.trace-style
    message + call stack to stderr (NOT a DeprecationWarning, which
    default filters would swallow for library callers); without it
    (and for RDFC-1.0 regardless) it is silent."""
    monkeypatch.delenv("RDF_CANONIZE_TRACE_URDNA2015", raising=False)
    canonize(SIMPLE, algorithm="URDNA2015",
             input_format="application/n-quads")
    assert capsys.readouterr().err == ""

    monkeypatch.setenv("RDF_CANONIZE_TRACE_URDNA2015", "1")
    out = canonize(SIMPLE, algorithm="URDNA2015",
                   input_format="application/n-quads")
    err = capsys.readouterr().err
    assert "URDNA2015 is deprecated, use RDFC-1.0" in err
    assert "test_api.py" in err  # carries the caller's stack
    assert out == SIMPLE_OUT  # trace does not alter the output

    canonize(SIMPLE, algorithm="RDFC-1.0",
             input_format="application/n-quads")
    assert capsys.readouterr().err == ""


def test_webcrypto_digest_variant():
    """The accumulate-then-digest webcrypto twin
    (lib/MessageDigest-webcrypto.js): output-identical to the
    streaming node digest on well-formed input across algorithms and
    an n-degree-heavy structure, divergent exactly on lone surrogates
    (TextEncoder U+FFFD vs Node lossy utf8) -- the same pair of
    behaviors the reference's two classes exhibit."""
    from rdf_canonize_spark.rdfc.canonize import (
        MessageDigest,
        WebCryptoMessageDigest,
    )

    # single-orbit cycle: every bnode shares a first-degree hash, so
    # canonization goes through the n-degree recursion (tractable at
    # wf3, unlike the poison make_data_b graphs)
    hard = "".join(
        f"_:r{i} <ex:p> _:r{(i + 1) % 8} .\n" for i in range(8)
    )
    for alg in ("sha256", "SHA-384", "sha512"):
        base = canonize(
            hard, algorithm="RDFC-1.0", max_work_factor=3,
            input_format="application/n-quads",
            message_digest_algorithm=alg,
        )
        web = canonize(
            hard, algorithm="RDFC-1.0", max_work_factor=3,
            input_format="application/n-quads",
            create_message_digest=lambda a=alg: WebCryptoMessageDigest(a),
        )
        assert web == base

    with pytest.raises(ValueError, match="Unsupported algorithm"):
        WebCryptoMessageDigest("md5")

    # incremental updates accumulate (digest of the concatenation),
    # and whole-string inputs -- including a lone surrogate -- hash
    # identically to the streaming digest
    w = WebCryptoMessageDigest("sha256")
    w.update("ab")
    w.update("cd")
    one = WebCryptoMessageDigest("sha256")
    one.update("abcd")
    assert w.digest() == one.digest()
    lone = "x" + chr(0xD800)
    node = MessageDigest("sha256")
    node.update(lone)
    web = WebCryptoMessageDigest("sha256")
    web.update(lone)
    assert node.digest() == web.digest()

    # the REAL divergence dimension: a surrogate pair split across
    # update calls -- the streaming digest lossily encodes each half
    # (two U+FFFD), the accumulator recombines them into one astral
    # code point before encoding
    node2 = MessageDigest("sha256")
    node2.update(chr(0xD800))
    node2.update(chr(0xDC00))
    web2 = WebCryptoMessageDigest("sha256")
    web2.update(chr(0xD800))
    web2.update(chr(0xDC00))
    assert node2.digest() != web2.digest()
    whole = MessageDigest("sha256")
    whole.update(chr(0xD800) + chr(0xDC00))
    assert whole.digest() == web2.digest()


def test_reject_urdna2015():
    with pytest.raises(ValueError, match="Invalid RDF Dataset"):
        canonize(
            SIMPLE,
            algorithm="URDNA2015",
            input_format="application/n-quads",
            reject_urdna2015=True,
        )


def test_unknown_input_format():
    with pytest.raises(ValueError, match="Unknown canonicalization input"):
        canonize(SIMPLE, algorithm="RDFC-1.0", input_format="bogus/type")


def test_unknown_output_format():
    with pytest.raises(
        ValueError, match="Unknown canonicalization output format"
    ):
        canonize(
            SIMPLE,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            format="bogus/type",
        )


def test_nquads_output_format_accepted():
    assert (
        canonize(
            SIMPLE,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            format="application/n-quads",
        )
        == SIMPLE_OUT
    )


def test_non_string_nquads_input():
    with pytest.raises(TypeError, match="N-Quads input must be a string."):
        canonize(
            {"not": "a string"},
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
        )


def test_canonical_id_map():
    id_map = {}
    out = canonize(
        SIMPLE,
        algorithm="RDFC-1.0",
        input_format="application/n-quads",
        canonical_id_map=id_map,
    )
    assert out == SIMPLE_OUT
    assert id_map == {"b0": "c14n0", "b1": "c14n1"}


def test_dataset_input():
    """Entry point 2: RDF/JS dataset input skips parsing (and dedup)."""
    dataset = [
        {
            "subject": {"termType": "BlankNode", "value": "b0"},
            "predicate": {"termType": "NamedNode", "value": "urn:p0"},
            "object": {"termType": "BlankNode", "value": "b1"},
            "graph": {"termType": "DefaultGraph", "value": ""},
        },
        {
            "subject": {"termType": "BlankNode", "value": "b1"},
            "predicate": {"termType": "NamedNode", "value": "urn:p1"},
            "object": {
                "termType": "Literal",
                "value": "v1",
                "datatype": {
                    "termType": "NamedNode",
                    "value": "http://www.w3.org/2001/XMLSchema#string",
                },
            },
            "graph": {"termType": "DefaultGraph", "value": ""},
        },
    ]
    assert canonize(dataset, algorithm="RDFC-1.0") == SIMPLE_OUT


def test_duplicate_quads_nquads_path():
    out = canonize(
        "_:b0 <ex:p> _:b1 .\n_:b0 <ex:p> _:b1 .\n",
        algorithm="RDFC-1.0",
        input_format="application/n-quads",
    )
    assert out == "_:c14n1 <ex:p> _:c14n0 .\n"


def test_parse_error_line_number():
    with pytest.raises(NQuadsParseError, match="line 2"):
        canonize(
            "<ex:s> <ex:p> <ex:o> .\nbad\n",
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
        )


def test_work_factor_zero_rejects_nonunique():
    _, data = make_data_b(3)
    with pytest.raises(
        MaxDeepIterationsError, match=r"Maximum deep iterations exceeded \(0\)"
    ):
        canonize(
            data,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            max_work_factor=0,
        )


def test_work_factor_infinity():
    _, data = make_data_b(4)
    out = canonize(
        data,
        algorithm="RDFC-1.0",
        input_format="application/n-quads",
        max_work_factor=float("inf"),
    )
    assert out.count("\n") == 16


def test_explicit_max_deep_iterations_overrides():
    _, data = make_data_b(4)
    with pytest.raises(
        MaxDeepIterationsError, match=r"exceeded \(1\)"
    ):
        canonize(
            data,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            max_deep_iterations=1,
        )


def test_issuer_order_and_clone():
    iss = IdentifierIssuer("b")
    assert iss.get_id("x") == "b0"
    assert iss.get_id("y") == "b1"
    assert iss.get_id("x") == "b0"
    clone = iss.clone()
    assert clone.get_id("z") == "b2"
    assert not iss.has_id("z")
    assert iss.get_old_ids() == ["x", "y"]
    assert clone.get_old_ids() == ["x", "y", "z"]


def test_permuter_enumerates_all():
    p = Permuter(["c", "a", "b"])
    perms = []
    while p.has_next():
        perms.append(tuple(p.next()))
    assert len(perms) == 6
    assert perms[0] == ("a", "b", "c")
    assert len(set(perms)) == 6


def test_permuter_duplicates_collapse():
    # direction keyed by value: duplicates share state, matching the
    # reference (lib/Permuter.js:19-22)
    p = Permuter(["a", "a"])
    perms = []
    while p.has_next():
        perms.append(tuple(p.next()))
    assert perms == [("a", "a")]


def test_generalized_rdf_serialization():
    """Blank-node predicates serialize (generalized RDF), matching the
    reference (test/misc.js:363-380 behavior; golden from the
    reference's NQuads.serialize)."""
    from rdf_canonize_spark.rdfc import serialize
    from rdf_canonize_spark.rdfc.terms import (
        BLANK,
        DEFAULT_GRAPH_TERM,
        NAMED,
        literal,
    )

    ds = [
        ((BLANK, "s", None, None), (BLANK, "p", None, None),
         literal("v"), (BLANK, "g", None, None)),
        ((NAMED, "http://ex/s", None, None),
         (BLANK, "p2", None, None),
         (NAMED, "http://ex/o", None, None), DEFAULT_GRAPH_TERM),
    ]
    assert serialize(ds) == (
        '<http://ex/s> _:p2 <http://ex/o> .\n_:s _:p "v" _:g .\n'
    )


def test_canonize_timeout():
    """Wall-clock timeout, checked every 3 permutations
    (lib/RDFC10Sync.js:20,30-33,309-311); exact error text."""
    from rdf_canonize_spark.rdfc.canonize import CanonizeTimeoutError
    from rdf_canonize_spark.rdfc.graphs import make_data_b

    _, data = make_data_b(7)
    with pytest.raises(CanonizeTimeoutError, match="Canonize timeout."):
        canonize(
            data,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            max_work_factor=float("inf"),
            timeout=50,  # ms
        )


def test_dataset_duplicate_quad_set_semantics():
    """Reference parity for duplicate quads in DATASET input
    (lib/RDFC10Sync.js:483-494): the bnode->quads index is a JS Set of
    quad OBJECTS, so the SAME object aliased twice (non-adjacently) is
    indexed once, while a value-equal but DISTINCT object is indexed
    twice and shifts the first-degree hashes (and hence the issued
    ids).  The serialization, by contrast, always iterates the raw
    dataset, so an aliased line still appears twice in the output.
    Expected strings generated by running the reference under node
    with exactly these datasets (aliased vs fresh objects)."""
    from rdf_canonize_spark.rdfc.canonize import RDFC10

    def q(s, o):
        return ((1, s, None, None), (0, "urn:p", None, None),
                (1, o, None, None), (3, "", None, None))

    a, r = q("b0", "b1"), q("b1", "b2")
    assert RDFC10(max_work_factor=3).main([a, r]) == (
        "_:c14n0 <urn:p> _:c14n1 .\n_:c14n2 <urn:p> _:c14n0 .\n"
    )
    # same object, non-adjacent alias: index dedups, output keeps both
    assert RDFC10(max_work_factor=3).main([a, r, a]) == (
        "_:c14n0 <urn:p> _:c14n1 .\n"
        "_:c14n2 <urn:p> _:c14n0 .\n"
        "_:c14n2 <urn:p> _:c14n0 .\n"
    )
    # equal value, distinct object: indexed twice -> different hashes,
    # different issue order
    assert RDFC10(max_work_factor=3).main([a, r, q("b0", "b1")]) == (
        "_:c14n0 <urn:p> _:c14n2 .\n"
        "_:c14n0 <urn:p> _:c14n2 .\n"
        "_:c14n2 <urn:p> _:c14n1 .\n"
    )


def test_abort_signal():
    """Cooperative cancellation parity with the reference async
    variant's `signal` option (lib/RDFC10.js:19,29,310-312): checked
    every 3 permutations, exact error text 'Abort signal received:
    "<reason>".' (verified against node with an aborted
    AbortController; reason 'user-cancel' -> that exact message).
    Accepts an AbortSignal-duck (aborted/reason) or a callable."""
    from rdf_canonize_spark.rdfc.canonize import CanonizeAbortError

    # the same 5-clique used in the node verification run
    data = "".join(
        f"_:v{a} <http://p/0> _:v{b} .\n"
        for a in range(5) for b in range(5) if a != b
    )

    class Sig:
        aborted = True
        reason = "user-cancel"

    with pytest.raises(CanonizeAbortError) as exc:
        canonize(
            data,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            max_work_factor=3,
            signal=Sig(),
        )
    assert str(exc.value) == 'Abort signal received: "user-cancel".'

    # callable form; and a non-aborted signal leaves the result intact
    with pytest.raises(CanonizeAbortError):
        canonize(
            data,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            max_work_factor=3,
            signal=lambda: "stop",
        )

    class Live:
        aborted = False
        reason = None

    # a non-aborted signal leaves the result intact (twin-pairs graph
    # that completes within the wf=3 budget)
    twins = (
        "_:b0 <http://p/0> _:b1 .\n_:b1 <http://p/0> _:b0 .\n"
        "_:b2 <http://p/0> _:b3 .\n_:b3 <http://p/0> _:b2 .\n"
    )
    out = canonize(
        twins,
        algorithm="RDFC-1.0",
        input_format="application/n-quads",
        max_work_factor=3,
        signal=Live(),
    )
    assert out == canonize(
        twins,
        algorithm="RDFC-1.0",
        input_format="application/n-quads",
        max_work_factor=3,
    )


def test_api_error_texts_match_reference():
    """Exact error-string parity for every API validation path
    (messages captured from the reference under node in-session)."""
    cases = [
        ("x", dict(algorithm="RDFC-1.0", input_format="bogus"),
         'Unknown canonicalization input format: "bogus".'),
        ("", dict(algorithm="RDFC-1.0",
                  input_format="application/n-quads", format="bogus"),
         'Unknown canonicalization output format: "bogus".'),
        ("", dict(input_format="application/n-quads"),
         "No RDF Dataset Canonicalization algorithm specified."),
        ("", dict(algorithm="NOPE", input_format="application/n-quads"),
         "Invalid RDF Dataset Canonicalization algorithm: NOPE"),
        ("", dict(algorithm="URDNA2015",
                  input_format="application/n-quads",
                  reject_urdna2015=True),
         "Invalid RDF Dataset Canonicalization algorithm: URDNA2015"),
        ('_:b <u:p> "v" .',
         dict(algorithm="RDFC-1.0", input_format="application/n-quads",
              message_digest_algorithm="md5"),
         'Unsupported algorithm "md5".'),
    ]
    for data, kw, want in cases:
        with pytest.raises(Exception) as exc:
            canonize(data, **kw)
        assert str(exc.value) == want, kw
