"""Adversarial ("poison") graph generators for complexity-control tests.

Same shapes as the reference's ``test/graphs.js:5-50``.
"""

from __future__ import annotations


def make_data_a(subjects, objects):
    """Bipartite fully-connected S->O, no self refs."""
    n = 0
    lines = []
    for s in range(subjects):
        for o in range(objects):
            if s != o:
                n += 1
                lines.append(f"_:s_{s} <ex:p> _:o_{o} .\n")
    return n, "".join(lines)


def make_data_b(subjects):
    """Fully connected with self refs."""
    n = 0
    lines = []
    for s in range(subjects):
        for o in range(subjects):
            n += 1
            lines.append(f"_:s_{s} <ex:p> _:s_{o} .\n")
    return n, "".join(lines)


def make_data_c(counts):
    """Layered: each level fully connected to the next."""
    if len(counts) < 2:
        raise ValueError("Need more counts")
    n = 0
    lines = []
    for level in range(len(counts) - 1):
        for cur in range(counts[level]):
            for nxt in range(counts[level + 1]):
                n += 1
                lines.append(
                    f"_:s_{level}_{cur} <ex:p> _:s_{level + 1}_{nxt} .\n"
                )
    return n, "".join(lines)
