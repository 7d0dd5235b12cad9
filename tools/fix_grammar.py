"""One-shot patcher: rewrite Unicode-sensitive regex constants in
rdfc/nquads.py so the checked-in source is pure ASCII (ranges built
programmatically from numeric code points at import time)."""
import io

P = "rdf_canonize_spark/rdfc/nquads.py"
src = io.open(P, encoding="utf-8", errors="surrogateescape").read()

new_block = '''def _rng(a, b):
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
'''

start = src.index("_PN_CHARS_BASE")
end = src.index("_BLANK_NODE_LABEL")
src = src[:start] + new_block + src[end:]

BS2 = chr(92) * 2  # two backslashes in the .py source -> one in regex? no:
# here we WRITE source text; chr(92)*2 is a literal two-backslash sequence.

iri_class_line = (
    '    "[^" + _rng(0, 0x20) + \'<>"{}|^`\' + chr(92) * 2 + "]"'
)

lines = src.split("\n")
out = []
for line in lines:
    s = line.strip()
    if s.startswith("'[^") and "<>" in s:
        out.append(iri_class_line)
    elif s.startswith("# IRI body char class"):
        out.append("# IRI body char class (ctrl chars + separators excluded)")
    elif s.startswith("_STRING_ESCAPE_RE"):
        out.append(
            "_STRING_ESCAPE_RE = re.compile("
            '"[" + _rng(0, 0x1F) + chr(0x7F) + \'"\' + chr(92) * 2 + "]")'
        )
    elif s.startswith("_IRI_ESCAPE_RE = re.compile"):
        out.append(
            "_IRI_ESCAPE_RE = re.compile("
            '"[" + _rng(0, 0x20) + \'<>"{}|^`\' + chr(92) * 2 + "]")'
        )
    else:
        out.append(line)
src = "\n".join(out)

io.open(P, "w", encoding="utf-8").write(src)
print("patched ok")
