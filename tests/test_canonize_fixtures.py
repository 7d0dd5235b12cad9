"""Differential conformance tests: pure-Python RDFC-1.0 core vs goldens
produced by the reference implementation (digitalbazaar/rdf-canonize)
over tests/fixtures/rdfc10/.  Byte-identical canonical N-Quads,
identical blank-node label maps, identical error messages.
"""

import io
import json
import os

import pytest

from rdf_canonize_spark.rdfc import NQuadsParseError, canonize
from rdf_canonize_spark.rdfc.canonize import MaxDeepIterationsError

DIR = os.path.join(os.path.dirname(__file__), "fixtures", "rdfc10")

with io.open(os.path.join(DIR, "manifest.json"), encoding="utf-8") as f:
    MANIFEST = json.load(f)


def _load(name, suffix):
    with io.open(
        os.path.join(DIR, name + suffix), encoding="utf-8"
    ) as f:
        return f.read()


POSITIVE = [e for e in MANIFEST if not e.get("negativeParse")]
NEGATIVE = [e for e in MANIFEST if e.get("negativeParse")]


@pytest.mark.parametrize("entry", POSITIVE, ids=lambda e: e["name"])
def test_eval_and_map(entry):
    name = entry["name"]
    golden = json.loads(_load(name, "-golden.json"))
    input_nq = _load(name, "-in.nq")
    id_map = {}
    kwargs = {}
    if entry.get("digest"):
        kwargs["message_digest_algorithm"] = entry["digest"]
    if "output" in golden:
        out = canonize(
            input_nq,
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            max_work_factor=entry["maxWorkFactor"],
            canonical_id_map=id_map,
            **kwargs,
        )
        assert out == golden["output"]
        assert id_map == golden["idMap"]
    else:
        with pytest.raises(MaxDeepIterationsError) as exc:
            canonize(
                input_nq,
                algorithm="RDFC-1.0",
                input_format="application/n-quads",
                max_work_factor=entry["maxWorkFactor"],
            )
        assert str(exc.value) == golden["error"]


@pytest.mark.parametrize("entry", NEGATIVE, ids=lambda e: e["name"])
def test_negative_parse(entry):
    name = entry["name"]
    golden = json.loads(_load(name, "-golden.json"))
    assert golden["error"], "reference unexpectedly parsed this input"
    with pytest.raises(NQuadsParseError) as exc:
        canonize(
            _load(name, "-in.nq"),
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
        )
    assert str(exc.value) == golden["error"]
