#!/usr/bin/env python3
"""One-shot mechanical split of src/main/scala/graft/Queries.scala
(22.8k lines, 65% of the codebase — the r10 verdict's task 4) into
per-chunk trait files mixed back into `object Queries`.

Design invariants (why this is zero-risk):
  * cut ONLY at the `  // ---- qNNN` section markers (and the
    registry/dynamic-oracle region boundaries), so no statement is
    reordered — the trait linearization `T1 with T2 with ...` preserves
    the ORIGINAL file order, hence the original val-initialization
    order, exactly as the single object had it;
  * `private` members widen to `private[graft]` (trait-private would
    hide them from sibling traits; package-private is the narrowest
    visibility that preserves every existing reference);
  * the file is processed as latin-1 bytes: line 2406's deliberate NUL
    join separator must survive byte-for-byte.

Verification after running: sbt compile, full suite, PlanCheck
fingerprints unchanged (modulo the documented q285 Expand-gid
permutation), full-registry oracle check.
"""
import re
import sys
from pathlib import Path

SRC = Path("src/main/scala/graft/Queries.scala")
OUTDIR = SRC.parent

SECTION = re.compile(r"^  // -{64} q(\d+)\b")
REGISTRY = re.compile(r"^  // -{69}\s*$")          # before `val all`
DYNORA = re.compile(r"^  // -{55} dynamic oracles")

# (file suffix, short description). Chunks are CONTIGUOUS in the
# original file (file order within the q1–q140 era is not monotonic in
# query number, so position — not number — is the only safe cut key);
# names reflect the dominant content of each region (the registry grew
# family-wise by rounds, so contiguity ≈ family).
CHUNKS = [
    ("Core",      "core relational pipeline, dedup, text & ANN foundations"),
    ("Curation",  "corpus curation, export/shard planning, profiling"),
    ("Analytics", "windows, certificates, OLAP analytics"),
    ("Exact",     "exact-arithmetic laws, sketches, geometry"),
    ("Graph",     "graph algorithms & distributional statistics"),
]
MAX_CHUNK_LINES = 4700


def main():
    text = SRC.read_text(encoding="latin-1")
    lines = text.split("\n")

    obj_idx = next(i for i, l in enumerate(lines) if l.startswith("object Queries {"))
    # last non-empty line is the closing brace
    end_idx = max(i for i, l in enumerate(lines) if l.strip() == "}")

    header = lines[:obj_idx]          # package, imports, scaladoc
    body = lines[obj_idx + 1:end_idx]

    # segment the body at markers
    seg_starts = [0]
    seg_kinds = ["preamble"]
    for i, l in enumerate(body):
        m = SECTION.match(l)
        if m:
            seg_starts.append(i)
            seg_kinds.append(int(m.group(1)))
        elif REGISTRY.match(l):
            seg_starts.append(i)
            seg_kinds.append("registry")
        elif DYNORA.match(l):
            seg_starts.append(i)
            seg_kinds.append("dynora")
    seg_starts.append(len(body))

    segments = []
    for k in range(len(seg_starts) - 1):
        segments.append((seg_kinds[k], body[seg_starts[k]:seg_starts[k + 1]]))

    # assign segments to chunks GREEDILY IN FILE ORDER; registry +
    # dynamic oracles go to their own Registry trait regardless of
    # position (they sit mid-file; lifting them to the LAST trait in
    # the linearization only moves their init later, which is safe —
    # they consume the other traits' members, never vice versa: the
    # maps are the registry's leaves)
    chunk_lines = {name: [] for name, _ in CHUNKS}
    chunk_qs = {name: [] for name, _ in CHUNKS}
    registry_lines = []
    ci = 0
    for kind, seg in segments:
        if kind in ("registry", "dynora"):
            registry_lines.extend(seg)
            continue
        name = CHUNKS[ci][0]
        if (kind != "preamble" and chunk_lines[name]
                and len(chunk_lines[name]) + len(seg) > MAX_CHUNK_LINES
                and ci < len(CHUNKS) - 1):
            ci += 1
            name = CHUNKS[ci][0]
        chunk_lines[name].extend(seg)
        if kind != "preamble":
            chunk_qs[name].append(kind)
    for name, _ in CHUNKS:
        qs = chunk_qs[name]
        if qs:
            print(f"{name}: {len(chunk_lines[name])} lines, "
                  f"{len(qs)} sections (q{qs[0]}..q{qs[-1]})")

    priv = re.compile(r"^(\s+)private (?!\[)")

    def widen(ls):
        return [priv.sub(r"\1private[graft] ", l) for l in ls]

    imports = "\n".join(header[:header.index("")]) if "" in header else "\n".join(header[:5])
    # header: package + blank + imports...; rebuild explicitly
    pkg = header[0]
    imp = [l for l in header if l.startswith("import ")]

    def file_header(doc):
        return [pkg, ""] + imp + ["", "/** " + doc, "  *", "  * Mechanical split of the former single-object registry (r11):",
                "  * statement order across the trait linearization in Queries.scala",
                "  * is the original file order, so val-initialization semantics are",
                "  * unchanged. See object Queries for the assembly.", "  */"]

    all_traits = [f"Queries{name}" for name, _ in CHUNKS if chunk_lines[name]]
    # every chunk trait gets the FULL assembly as its self-type: shared
    # helpers (dsum, graph builders, oracle snippet vals) are referenced
    # unqualified across chunk boundaries, and scope — unlike access —
    # is not granted by private[graft] alone
    selftype = "  this: " + " with ".join(all_traits) + " =>"
    trait_names = []
    for name, desc in CHUNKS:
        ls = widen(chunk_lines[name])
        if not ls:
            continue
        tn = f"Queries{name}"
        trait_names.append(tn)
        out = file_header(desc) + [f"private[graft] trait {tn} {{", selftype] + ls + ["}", ""]
        (OUTDIR / f"{tn}.scala").write_text("\n".join(out), encoding="latin-1")
        print(f"wrote {tn}.scala: {len(ls)} body lines")

    reg = widen(registry_lines)
    out = file_header("the single registry map (`all`), the oracle map, and the dynamic (verify-time-generated) oracles") + \
        ["private[graft] trait QueriesRegistry {",
         "  this: " + " with ".join(trait_names) + " =>"] + reg + ["}", ""]
    (OUTDIR / "QueriesRegistry.scala").write_text("\n".join(out), encoding="latin-1")
    print(f"wrote QueriesRegistry.scala: {len(reg)} body lines")
    trait_names.append("QueriesRegistry")

    # the assembly object keeps the original scaladoc
    doc = header[obj_idx - 1:obj_idx]  # not robust; rebuild from original header block
    scaladoc = []
    in_doc = False
    for l in header:
        if l.startswith("/**"):
            in_doc = True
        if in_doc:
            scaladoc.append(l)
        if in_doc and l.rstrip().endswith("*/"):
            break
    assembly = [pkg, ""] + imp + [""] + scaladoc + [
        "object Queries extends " + "\n  with ".join(trait_names), ""]
    SRC.write_text("\n".join(assembly), encoding="latin-1")
    print(f"rewrote Queries.scala as the assembly object ({len(assembly)} lines)")


if __name__ == "__main__":
    main()
