#!/usr/bin/env python3
"""Doc-claims-vs-artifacts gate (r14 verdict Next-round #2).

Round 14's failure mode: a doc sentence asserting "artifacts/X is the
hash-match artifact" was committed five minutes after LAUNCHING the job
that produces X, and the job then failed. The docs must never lead the
evidence. This script greps the claim-bearing docs for every
repo-artifact path they cite and fails if any cited file does not
exist at HEAD's working tree.

Checked path shapes:
  - artifacts/<anything legal in a filename>
  - CORRECTNESS_*.json / BENCH_*.json / COPYCHECK.json / LEAKCHECK.json
    at the repo root
  - tools/<script> citations (a doc pointing at a recipe that was
    never committed is the same failure one level down)

Run from tools/close_board_*.sh; exits 1 on any missing citation so
the close protocol cannot ship a claim without its artifact.
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["SURVEY.md", "BASELINE.md", "TESTDATA.md", "tools/FIXTURES.md"]
PATTERNS = [
    re.compile(r"\bartifacts/[A-Za-z0-9._\-{},]+"),
    re.compile(r"\b(?:CORRECTNESS|BENCH)_[A-Za-z0-9._\-]*\.json\b"),
    re.compile(r"\b(?:COPYCHECK|LEAKCHECK)\.json\b"),
    re.compile(r"\btools/[A-Za-z0-9._\-]+\.(?:py|sh|md)\b"),
]
# Citations that are allowed to be absent: driver-written round files
# for FUTURE rounds ("…will land as CORRECTNESS_r16.json") are
# announced before they exist by design. A doc marks one deliberate
# forward reference by suffixing the sentence with "(pending)".
PENDING = re.compile(r"\(pending\)")


def expand_braces(path):
    """`bench_r11_sf{1,10}_x.json` → both concrete names."""
    m = re.search(r"\{([^{}]*)\}", path)
    if not m:
        return [path]
    out = []
    for alt in m.group(1).split(","):
        out += expand_braces(path[: m.start()] + alt + path[m.end():])
    return out


def exists(cited):
    full = os.path.join(REPO, cited)
    if os.path.exists(full):
        return True
    # A filename wrapped across a markdown line break loses its tail;
    # accept an extension-less citation if exactly this prefix extends
    # to a real file in the same directory.
    if "." not in os.path.basename(cited):
        d = os.path.dirname(full) or REPO
        base = os.path.basename(cited)
        if os.path.isdir(d) and any(f.startswith(base) for f in os.listdir(d)):
            return True
    return False


def main():
    missing = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        for lineno, line in enumerate(open(path, encoding="utf-8"), 1):
            if PENDING.search(line):
                continue
            for pat in PATTERNS:
                for m in pat.finditer(line):
                    for cited in expand_braces(m.group(0).rstrip(".,{")):
                        if not exists(cited):
                            missing.append((doc, lineno, cited))
    if missing:
        print("CLAIMS GATE FAIL — cited paths that do not exist:")
        for doc, lineno, cited in missing:
            print(f"  {doc}:{lineno}  {cited}")
        return 1
    print("CLAIMS GATE PASS — every cited artifact/tool path exists")
    return 0


if __name__ == "__main__":
    sys.exit(main())
