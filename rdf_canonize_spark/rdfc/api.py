"""Public canonize API.

Mirrors the option surface and dispatch/validation behavior of the
reference's ``lib/index.js:96-262`` (async and sync variants produce the
same output; this implementation is synchronous like
``lib/RDFC10Sync.js``, which is the right model for a per-document
Spark UDF).

``canonize(input, **options)``:

* ``input`` -- N-Quads string (with ``input_format='application/n-quads'``)
  or a dataset: list of quad tuples (see ``terms.py``) or RDF/JS-style
  dicts.
* ``algorithm`` -- ``'RDFC-1.0'`` (``'URDNA2015'`` aliases unless
  ``reject_urdna2015``).
* ``max_work_factor`` / ``max_deep_iterations`` / ``timeout`` /
  ``message_digest_algorithm`` / ``create_message_digest`` /
  ``canonical_id_map`` -- as in the reference.
"""

from __future__ import annotations

import os
import sys
import traceback

from .canonize import RDFC10
from .nquads import parse
from .terms import quad_from_rdfjs


def _trace_urdna2015():
    """Deprecation trace hook, mirroring ``lib/index.js:72-77``: the
    reference emits ``console.trace`` (message + call stack, always
    printed) when the global ``RDF_CANONIZE_TRACE_URDNA2015`` flag is
    truthy; the Python analogue of a global flag is the environment
    variable of the same name.  Written straight to stderr like
    console.trace -- a ``DeprecationWarning`` would be swallowed by
    the default warning filters outside ``__main__``, making the hook
    a silent no-op for exactly the library callers it exists for."""
    if os.environ.get("RDF_CANONIZE_TRACE_URDNA2015"):
        print(
            "Trace: [rdf-canonize] URDNA2015 is deprecated, "
            "use RDFC-1.0",
            file=sys.stderr,
        )
        traceback.print_stack(file=sys.stderr)


def _input_to_dataset(input_data, input_format=None):
    """Mirror ``lib/index.js:47-59``."""
    if input_format:
        if input_format == "application/n-quads":
            if not isinstance(input_data, str):
                raise TypeError("N-Quads input must be a string.")
            return parse(input_data)
        raise ValueError(
            'Unknown canonicalization input format: "%s".' % input_format
        )
    return _coerce_dataset(input_data)


def _coerce_dataset(dataset):
    """Accept quad tuples or RDF/JS dicts.  NOTE (parity with reference
    entry point 2, SURVEY.md 3.2): the per-graph dedup is skipped for
    dataset input -- duplicate quads survive into serialization."""
    out = []
    for q in dataset:
        if isinstance(q, dict):
            out.append(quad_from_rdfjs(q))
        else:
            out.append(tuple(q))
    return out


def _check_output_format(format=None):
    """Mirror ``lib/index.js:62-70``."""
    if format:
        if format == "application/n-quads":
            return
        raise ValueError(
            'Unknown canonicalization output format: "%s".' % format
        )


def canonize(
    input_data,
    algorithm=None,
    input_format=None,
    format=None,
    canonical_id_map=None,
    create_message_digest=None,
    message_digest_algorithm="sha256",
    max_work_factor=1,
    max_deep_iterations=-1,
    timeout=0,
    signal=None,
    reject_urdna2015=False,
):
    dataset = _input_to_dataset(input_data, input_format)
    _check_output_format(format)

    if algorithm is None:
        raise ValueError(
            "No RDF Dataset Canonicalization algorithm specified."
        )
    if algorithm not in ("RDFC-1.0", "URDNA2015") or (
        algorithm == "URDNA2015" and reject_urdna2015
    ):
        raise ValueError(
            "Invalid RDF Dataset Canonicalization algorithm: " + algorithm
        )
    if algorithm == "URDNA2015":
        # deprecated alias path (lib/index.js:170-174)
        _trace_urdna2015()
    return RDFC10(
        create_message_digest=create_message_digest,
        message_digest_algorithm=message_digest_algorithm,
        canonical_id_map=canonical_id_map,
        max_work_factor=max_work_factor,
        max_deep_iterations=max_deep_iterations,
        timeout=timeout,
        signal=signal,
    ).main(dataset)
