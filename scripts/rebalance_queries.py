#!/usr/bin/env python3
"""Rebalance the Queries trait files (r11 verdict task 4): move whole
`  // ---- qNNN` sections from their donor trait file into
QueriesGraph.scala, byte-preserving (latin-1 — QueriesCore carries a
deliberate NUL), cutting ONLY at section markers so no statement is
reordered WITHIN any file.

Init-order safety: the trait linearization in Queries.scala is
Core → Curation → Analytics → Exact → Graph → Registry, and trait vals
initialize in that order. Moving a section to Graph moves its vals'
initialization LATER, which is safe iff nothing initialized EARLIER
references them in a val initializer. The script enforces a stronger,
mechanically-checkable rule: every top-level identifier defined by a
moved section may be referenced only (a) inside the moved set itself or
(b) in QueriesRegistry.scala (the maps — always initialized last).
Any other reference aborts the move.

Usage: rebalance_queries.py   (the move list is inline — edit it)
Verification after running: sbt compile, full suite, PlanCheck
fingerprint equality on the moved queries, oracle check.
"""
import re
import sys
from pathlib import Path

D = Path("src/main/scala/graft")
SECTION = re.compile(r"^  // -{60,} q(\d+)\b")
TARGET = "QueriesGraph"

# (donor file, qnum) — section numbers as they appear in the marker.
# q174 (triangles), q184 (k-core) and q277 (SCC) are thematically graph
# queries but STAY put: their sections define the shared SQL-snippet
# vals BlockGraphSql / DirectedBlockGraphSql, interpolated by earlier-
# initialized oracle val initializers — moving them later in the
# linearization would null those oracles (the safety check below catches
# exactly this).
MOVES = [
    ("QueriesCuration", "96"), ("QueriesCuration", "106"), ("QueriesCuration", "107"),
    ("QueriesCore", "109"),
    ("QueriesAnalytics", "188"), ("QueriesAnalytics", "203"), ("QueriesAnalytics", "207"),
    ("QueriesExact", "265"), ("QueriesExact", "269"),
]

FILES = ["QueriesCore", "QueriesCuration", "QueriesAnalytics",
         "QueriesExact", "QueriesGraph", "QueriesRegistry"]

DEF_RE = re.compile(r"^  (?:private\[graft\] )?(?:lazy )?(?:val|def) (\w+)")


def sections(text):
    """[(qnum_or_None, start_line, end_line)] — None = preamble/trailer."""
    lines = text.split("\n")
    marks = [(i, SECTION.match(l).group(1))
             for i, l in enumerate(lines) if SECTION.match(l)]
    # the file ends with "}" (trait close) possibly + trailing newline;
    # last section runs to the line holding the closing brace
    close = max(i for i, l in enumerate(lines) if l == "}")
    out = []
    for k, (i, q) in enumerate(marks):
        end = marks[k + 1][0] if k + 1 < len(marks) else close
        out.append((q, i, end))
    return lines, out, close


def main():
    texts = {f: (D / f"{f}.scala").read_text(encoding="latin-1") for f in FILES}
    moved_chunks = []   # (qnum, [lines])
    defined = []        # identifiers defined by moved sections

    for donor, q in MOVES:
        lines, secs, _ = sections(texts[donor])
        hit = [s for s in secs if s[0] == q]
        if len(hit) != 1:
            sys.exit(f"ABORT: q{q} matched {len(hit)} sections in {donor}")
        _, a, b = hit[0]
        chunk = lines[a:b]
        moved_chunks.append((q, chunk))
        for l in chunk:
            m = DEF_RE.match(l)
            if m:
                defined.append(m.group(1))
        texts[donor] = "\n".join(lines[:a] + lines[b:])

    # safety check: moved identifiers must not be referenced outside the
    # moved set / Registry (word-boundary grep over remaining donor text
    # + current Graph text)
    moved_text = "\n".join("\n".join(c) for _, c in moved_chunks)

    def code_only(text):
        """Drop comment lines (scaladoc [[refs]] are not references)."""
        return "\n".join(l for l in text.split("\n")
                         if not l.lstrip().startswith(("*", "//", "/*")))

    bad = []
    for ident in defined:
        pat = re.compile(r"\b" + re.escape(ident) + r"\b")
        for f in FILES:
            if f == "QueriesRegistry":
                continue
            n = len(pat.findall(code_only(texts[f])))
            if n:
                bad.append((ident, f, n))
    if bad:
        for ident, f, n in bad:
            print(f"UNSAFE: {ident} referenced {n}x in {f} after move", file=sys.stderr)
        sys.exit(1)

    # append moved sections before QueriesGraph's closing brace
    glines = texts[TARGET].split("\n")
    close = max(i for i, l in enumerate(glines) if l == "}")
    inject = []
    for q, chunk in moved_chunks:
        inject.extend(chunk)
    texts[TARGET] = "\n".join(glines[:close] + inject + glines[close:])

    for f in FILES:
        (D / f"{f}.scala").write_text(texts[f], encoding="latin-1")
    for f in FILES:
        n = len(texts[f].split("\n"))
        print(f"{f}: {n} lines")
    print(f"moved {len(MOVES)} sections ({len(moved_text.splitlines())} lines), "
          f"{len(defined)} identifiers, all Registry-only referenced")


if __name__ == "__main__":
    main()
