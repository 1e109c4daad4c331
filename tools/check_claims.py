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

Round 15 extension (r15 verdict #5): beyond existence, the headline
NUMBERS a claim block asserts are cross-checked against the cited
JSON where they can be parsed mechanically:
  - "N/N" board counts in a block citing a CORRECTNESS_*.json must
    match that artifact's {total entries, all-green entries};
  - "<float> s" wall-times in a block citing a bench JSON must match
    some numeric value in that artifact at the claimed precision
    (numbers prefixed with "~" are declared estimates and skipped);
  - "<N>-query exclusion list" / "exclusions…txt, N queries" must
    match the cited exclusion file's line count.
A block is a markdown bullet/paragraph (blank-line or new-bullet
delimited) — claims and their citation must share a block to bind.

Run from tools/close_board.sh; exits 1 on any missing citation or
number drift so the close protocol cannot ship a claim without (or
contradicting) its artifact.
"""
import json
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


def blocks(path):
    """(start_lineno, text) per markdown bullet/paragraph: a block ends
    at a blank line or where the next bullet / heading begins."""
    out, cur, start = [], [], 1
    for lineno, line in enumerate(open(path, encoding="utf-8"), 1):
        boundary = (not line.strip()
                    or re.match(r"\s*(?:[-*]\s+\*\*|[-*]\s+`|#{1,6}\s|\|)", line))
        if boundary and cur:
            out.append((start, "".join(cur)))
            cur = []
        if line.strip() and (not cur):
            start = lineno
        if line.strip():
            cur.append(line)
    if cur:
        out.append((start, "".join(cur)))
    return out


def numeric_leaves(obj, acc):
    if isinstance(obj, dict):
        for v in obj.values():
            numeric_leaves(v, acc)
    elif isinstance(obj, list):
        for v in obj:
            numeric_leaves(v, acc)
    elif isinstance(obj, (int, float)) and not isinstance(obj, bool):
        acc.append(float(obj))


def rounds_to(claimed_str, value):
    """Does `value` round to the claimed literal at its own precision?"""
    dec = len(claimed_str.split(".")[1]) if "." in claimed_str else 0
    try:
        return abs(round(value, dec) - float(claimed_str)) < 10 ** -(dec + 6)
    except (ValueError, OverflowError):
        return False


def check_numbers(doc, start, text, cited_paths):
    """Numeric claims in one block vs the JSON artifacts it cites."""
    bad = []
    corr = [p for p in cited_paths if os.path.basename(p).startswith("CORRECTNESS")
            and p.endswith(".json")]
    bench = [p for p in cited_paths if "bench" in os.path.basename(p).lower()
             and p.endswith(".json")]
    excl = [p for p in cited_paths if "exclusions" in os.path.basename(p)
            and p.endswith(".txt")]

    if corr:
        plausible = set()
        for p in corr:
            rows = json.load(open(os.path.join(REPO, p)))
            plausible.add(len(rows))
            plausible.add(sum(1 for v in rows.values()
                              if v.get("rows_match") and v.get("schema_match")
                              and v.get("hash_match")))
        for m in re.finditer(r"\b(\d+)/(\d+)\b", text):
            a, b = int(m.group(1)), int(m.group(2))
            # sbt-test tallies ("sbt test: 243/243 green") are not
            # board counts — skip N/N in a test-labeled context
            if "test" in text[max(0, m.start() - 40):m.start()].lower():
                continue
            if a == b and a not in plausible:
                bad.append((doc, start, f"{a}/{b} does not match any cited "
                            f"CORRECTNESS board (plausible: {sorted(plausible)})"))

    if bench:
        leaves = []
        for p in bench:
            numeric_leaves(json.load(open(os.path.join(REPO, p))), leaves)
        # Only LOAD-BEARING seconds literals bind to the cited bench
        # artifact: bold (**X s**) or labeled closing-board headline
        # forms. Plain in-prose numbers routinely reference OTHER
        # rounds' measurements inside the same block (the r1 anchor,
        # cross-SF comparisons) and must not bind here.
        num = r"(\d[\d,]*(?:\.\d+)?)"
        forms = [rf"\*\*{num}\s?s\*\*",
                 rf"\btotal {num}\s?s\b",
                 rf"\bbaseline subset {num}\s?s\b",
                 rf"\bshipping(?: tier)? {num}\s?s\b",
                 rf"\baudit(?: tier)? {num}\s?s\b"]
        for form in forms:
            for m in re.finditer(form, text):
                if text[max(0, m.start() - 1):m.start()] == "~":
                    continue  # declared estimate
                lit = m.group(1).replace(",", "")
                if not any(rounds_to(lit, v) for v in leaves):
                    bad.append((doc, start, f"'{m.group(1)} s' matches no "
                                f"value in {', '.join(bench)}"))

    if excl:
        for p in excl:
            n = sum(1 for l in open(os.path.join(REPO, p)) if l.strip())
            for m in re.finditer(r"(\d+)-query exclusion list", text):
                if int(m.group(1)) != n:
                    bad.append((doc, start, f"'{m.group(0)}' but {p} has {n} lines"))
            for m in re.finditer(re.escape(os.path.basename(p))
                                 + r"`?,\s+(\d+)\s+quer", text):
                if int(m.group(1)) != n:
                    bad.append((doc, start, f"'{m.group(1)} queries' but {p} "
                                f"has {n} lines"))
    return bad


def main():
    missing, drift = [], []
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
        for start, text in blocks(path):
            if PENDING.search(text):
                continue
            cited = set()
            for pat in PATTERNS:
                for m in pat.finditer(text):
                    for c in expand_braces(m.group(0).rstrip(".,{")):
                        if os.path.exists(os.path.join(REPO, c)):
                            cited.add(c)
            drift += check_numbers(doc, start, text, sorted(cited))
    if missing:
        print("CLAIMS GATE FAIL — cited paths that do not exist:")
        for doc, lineno, cited in missing:
            print(f"  {doc}:{lineno}  {cited}")
    if drift:
        print("CLAIMS GATE FAIL — numbers contradicting their cited artifact:")
        for doc, lineno, msg in drift:
            print(f"  {doc}:{lineno}  {msg}")
    if missing or drift:
        return 1
    print("CLAIMS GATE PASS — every cited artifact/tool path exists "
          "and every parsed headline number matches its artifact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
