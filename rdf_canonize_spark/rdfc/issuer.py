"""Blank-node identifier issuer.

Semantics of the reference's ``lib/IdentifierIssuer.js``: an *ordered*
old->new label map with a counter.  Issue order is observable via
``get_old_ids()`` (``lib/IdentifierIssuer.js:78-80``) and drives canonical
id assignment (``lib/RDFC10Sync.js:154-164``), so an insertion-ordered
dict is required.  ``clone()`` is copy-on-branch for the permutation
search (``lib/IdentifierIssuer.js:26-29``).
"""

from __future__ import annotations


class IdentifierIssuer:
    __slots__ = ("prefix", "existing", "counter")

    def __init__(self, prefix, existing=None, counter=0):
        self.prefix = prefix
        self.existing = {} if existing is None else existing
        self.counter = counter

    def clone(self):
        return IdentifierIssuer(self.prefix, dict(self.existing), self.counter)

    def get_id(self, old=None):
        if old is not None:
            existing = self.existing.get(old)
            if existing is not None:
                return existing
        identifier = self.prefix + str(self.counter)
        self.counter += 1
        if old is not None:
            self.existing[old] = identifier
        return identifier

    def has_id(self, old):
        return old in self.existing

    def get_old_ids(self):
        return list(self.existing.keys())
