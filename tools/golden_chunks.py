#!/usr/bin/env python3
"""Golden-file generator for the recursive character chunker (G1).

Independent Python implementation of the PUBLISHED LangChain
`RecursiveCharacterTextSplitter` semantics (keep_separator=True,
default separators ["\n\n", "\n", " ", ""]): try separators in order,
keep the separator attached to the piece that follows, greedily merge
pieces up to chunk_size, slide an overlap of up to `overlap` chars into
the next chunk, strip each emitted chunk and drop empties.

The langchain package itself is not installable in this offline
environment; this generator re-derives the algorithm from its public
documentation/behavior so the Scala Chunker has a cross-LANGUAGE golden
to be byte-identical against (same spec, two independent
implementations). Output: src/test/resources/chunker_golden.json.
"""
import json
from pathlib import Path


def split_keep_separator(text, sep):
    if sep == "":
        return list(text)
    out, start, first = [], 0, True
    idx = text.find(sep)
    while idx >= 0:
        lead = text[start:idx] if first else sep + text[start:idx]
        if lead:
            out.append(lead)
        first = False
        start = idx + len(sep)
        idx = text.find(sep, start)
    tail = text[start:] if first else sep + text[start:]
    if tail:
        out.append(tail)
    return out


def merge_pieces(pieces, chunk_size, overlap):
    docs, current, total = [], [], 0
    def emit():
        joined = "".join(current).strip()
        if joined:
            docs.append(joined)
    for p in pieces:
        plen = len(p)
        if total + plen > chunk_size and current:
            emit()
            while total > overlap or (total + plen > chunk_size and total > 0):
                total -= len(current[0])
                current = current[1:]
        current.append(p)
        total += plen
    emit()
    return docs


def split_rec(text, seps, chunk_size, overlap):
    separator, next_seps = seps[-1], []
    for i, s in enumerate(seps):
        if s == "":
            separator = s
            break
        if s in text:
            separator, next_seps = s, list(seps[i + 1:])
            break
    pieces = split_keep_separator(text, separator)
    out, good = [], []
    for p in pieces:
        if len(p) < chunk_size:
            good.append(p)
        else:
            if good:
                out.extend(merge_pieces(good, chunk_size, overlap))
                good = []
            if not next_seps:
                out.append(p)
            else:
                out.extend(split_rec(p, next_seps, chunk_size, overlap))
    if good:
        out.extend(merge_pieces(good, chunk_size, overlap))
    return out


def split(text, chunk_size=300, overlap=50):
    seps = ["\n\n", "\n", " ", ""]
    return split_rec(text, seps, chunk_size, overlap) if text else []


KO = ("데이터 파이프라인을 설계하고 운영합니다. 대규모 분산 처리 환경에서 "
      "스파크 작업을 최적화하며, 스트리밍 파이프라인의 지연 시간을 관리합니다. ")
KO_PARA = (KO * 4 + "\n\n") * 12  # multi-KB Korean with paragraph breaks
KO_SOLID = "가나다라마바사아자차카타파하" * 80  # no whitespace at all

CASES = [
    ("short_plain", "A short single piece of text."),
    ("paragraphs", "First paragraph with several words.\n\n"
                   "Second paragraph, a bit longer, still under limits.\n\n"
                   + "Third paragraph " * 30),
    ("newlines_only", "line one\nline two\nline three\n" + "long line " * 40),
    ("no_whitespace", "x" * 951),
    ("korean_multikb", KO_PARA),
    ("korean_solid", KO_SOLID),
    ("mixed_markdown", "# Title\n\nIntro sentence here.\n\n- item one\n"
                       "- item two\n\n" + "Body text sentence. " * 25),
    ("repeated_spaces", "word  " * 120),
    ("exact_300", "a" * 299 + "b"),
    ("boundary_301", "a" * 150 + " " + "b" * 150),
    ("empty", ""),
    ("ws_only", "  \n \n  "),
]


def main():
    out = []
    for name, text in CASES:
        for (size, ov) in [(300, 50), (120, 20)]:
            out.append({
                "name": f"{name}_{size}_{ov}",
                "chunk_size": size, "overlap": ov,
                "text": text, "chunks": split(text, size, ov),
            })
    path = Path(__file__).resolve().parent.parent / \
        "src/test/resources/chunker_golden.json"
    path.write_text(json.dumps(out, ensure_ascii=False, indent=1))
    n = sum(len(c["chunks"]) for c in out)
    print(f"wrote {len(out)} cases, {n} chunks -> {path}")


if __name__ == "__main__":
    main()
