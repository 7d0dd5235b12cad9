"""EARL conformance report over the W3C-format manifest suite.

Mirrors the reference's EARL reporter surface
(/root/reference/test/EarlReport.js:80-160 -- doap:Project subject,
one earl:Assertion per test with earl:automatic mode and an
earl:TestResult outcome, dc:date, optional environment capture like
test/test.js:206-250's TEST_ENV fields): every manifest entry runs
through the pure-Python core and the outcome is recorded as
earl:passed / earl:failed.  The walker semantics are
tests/test_w3c_manifest.py's (complexity -> maxWorkFactor,
hashAlgorithm) and $W3C_RDFC10_TESTS_DIR points it at a real
w3c/rdf-canon tests/ clone, so the output is a drop-in analogue of
`EARL=report.jsonld npm t` in the reference.

Usage: PYTHONPATH=. python3 tools/earl_report.py [out.jsonld]
"""

from __future__ import annotations

import datetime
import json
import os
import platform
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_URL = "https://github.com/rdf-canonize-spark/rdf-canonize-spark"


def run_suite():
    from tests.test_w3c_manifest import ENTRIES, _read

    from rdf_canonize_spark.rdfc import canonize

    results = []
    for e in ENTRIES:
        action = _read(e["action"])
        id_map = {}
        kwargs = dict(
            algorithm="RDFC-1.0",
            input_format="application/n-quads",
            max_work_factor=e["wf"],
            message_digest_algorithm=e["hash"],
            canonical_id_map=id_map,
        )
        try:
            output = canonize(action, **kwargs)
            raised = False
        except Exception:
            output, raised = None, True
        if e["type"] == "RDFC10NegativeEvalTest":
            passed = raised
        elif raised:
            passed = False
        elif e["type"] == "RDFC10EvalTest":
            passed = output == _read(e["result"])
        else:  # map test
            passed = id_map == json.loads(_read(e["result"]))
        results.append((e["id"], passed))
    return results


def build_report(results):
    now = datetime.datetime.now(datetime.timezone.utc).replace(
        microsecond=0
    )
    today = now.date().isoformat()
    developer_id = REPO_URL + "#maintainers"
    report = {
        "@context": {
            "doap": "http://usefulinc.com/ns/doap#",
            "foaf": "http://xmlns.com/foaf/0.1/",
            "dc": "http://purl.org/dc/terms/",
            "earl": "http://www.w3.org/ns/earl#",
            "xsd": "http://www.w3.org/2001/XMLSchema#",
            "doap:homepage": {"@type": "@id"},
            "dc:creator": {"@type": "@id"},
            "subjectOf": {"@reverse": "earl:subject"},
            "earl:assertedBy": {"@type": "@id"},
            "earl:mode": {"@type": "@id"},
            "earl:test": {"@type": "@id"},
            "earl:outcome": {"@type": "@id"},
            "dc:date": {"@type": "xsd:date"},
            "doap:created": {"@type": "xsd:date"},
        },
        "@id": REPO_URL,
        "@type": ["doap:Project", "earl:TestSubject", "earl:Software"],
        "doap:name": "rdf-canonize-spark",
        "dc:title": "rdf-canonize-spark",
        "doap:homepage": REPO_URL,
        "doap:description": "A PySpark-native RDF Dataset "
                            "Canonicalization engine",
        "doap:programming-language": "Python",
        "doap:developer": {
            "@id": developer_id,
            "@type": ["foaf:Group", "earl:Assertor"],
            "foaf:name": "rdf-canonize-spark maintainers",
        },
        "doap:release": {"doap:revision": "round-3",
                         "doap:created": today},
        # environment capture analogue of test.js TEST_ENV fields
        "rdfs:comment": "arch=%s platform=%s runtime=Python/%s" % (
            platform.machine(), sys.platform, platform.python_version()
        ),
        "subjectOf": [
            {
                "@type": "earl:Assertion",
                "earl:assertedBy": developer_id,
                "earl:mode": "earl:automatic",
                "earl:test": test_id,
                "earl:result": {
                    "@type": "earl:TestResult",
                    "dc:date": now.isoformat(),
                    "earl:outcome":
                        "earl:passed" if passed else "earl:failed",
                },
            }
            for test_id, passed in results
        ],
    }
    return report


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "earl-report.jsonld"
    results = run_suite()
    report = build_report(results)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2, ensure_ascii=True)
        f.write("\n")
    n_pass = sum(1 for _, p in results if p)
    print(json.dumps({"tests": len(results), "passed": n_pass,
                      "failed": len(results) - n_pass,
                      "report": out_path}))
    sys.exit(0 if n_pass == len(results) else 1)


if __name__ == "__main__":
    main()
