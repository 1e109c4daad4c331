#!/usr/bin/env python3
"""Bench regression triage as a tool, not a ritual (round-12 verdict #6).

Three rounds in a row the closing-board movers were triaged by hand
with the same procedure (r10 json_extract_events, r11
wordcount_linefreq, r12 pagerank_trade_graph/index_retract): compare
min-of-reps per query between two bench JSONs — box load inflates
reps-3 medians, so `queries_min` is the honest comparator — and check
whether the mover's module was even touched this round. This script is
that procedure.

Usage:
  python3 tools/bench_diff.py OLD.json NEW.json [--threshold SECS]
      [--since GIT_REF]

- OLD/NEW: bench artifacts with a `queries_min` map (falls back to
  `queries` when a min map is absent — flagged in the output, since a
  single-rep compare is weaker evidence).
- --threshold: absolute per-query regression (seconds of min-vs-min)
  above which a mover is reported. Default 0.3.
- --since: git ref to diff against (default: the merge-base-less
  previous round, i.e. HEAD's history is searched for files changed
  since that ref). A mover whose query module was NOT touched since
  the ref is labeled `untouched` — the box-spread signature, not a
  real regression (three incidents of hand-running exactly this test).

Output: one line per mover (worst first) with old/new min, delta, and
touched/untouched status, then a common-min-sum summary line. Exit 0
always — this is a triage report, not a gate.
"""
import json
import subprocess
import sys

# query name -> source file fragments that implement it; movers are
# labeled `touched` when any changed path since --since matches one of
# its fragments (module granularity — a query is `touched` when its
# module changed, which is the conservative direction for triage)
MODULE_HINTS = {
    # prefix match on query name -> module file fragments
    "wordcount": ["operators/WordCount.scala"],
    "sql_": ["operators/SqlSurface.scala"],
    "minhash": ["dedup/Dedup.scala", "dedup/BandIndex.scala"],
    "neardup": ["dedup/Dedup.scala", "dedup/BandIndex.scala",
                "operators/ConnectedComponents.scala"],
    "shingle": ["dedup/Dedup.scala"],
    "dedup_": ["dedup/Dedup.scala"],
    "ngram": ["dedup/Dedup.scala", "text/TextAnalysis.scala"],
    "substring_dup": ["dedup/Dedup.scala"],
    "fuzzy": ["dedup/Dedup.scala"],
    "simhash": ["dedup/Dedup.scala"],
    "lsh_bucket": ["dedup/Dedup.scala"],
    "index_": ["dedup/BandIndex.scala", "streaming/IngestDedup.scala",
               "IndexStore.scala"],
    "ingest_": ["streaming/IngestDedup.scala"],
    "embedding": ["similarity/Similarity.scala"],
    "similar": ["similarity/Similarity.scala"],
    "knn": ["similarity/Similarity.scala"],
    "ann_": ["similarity/Similarity.scala"],
    "semdedup": ["similarity/Similarity.scala"],
    "mmr": ["similarity/Similarity.scala"],
    "multimodal": ["multimodal/Multimodal.scala"],
    "text_": ["text/TextAnalysis.scala"],
    "token": ["text/TextAnalysis.scala"],
    "bpe": ["text/TextAnalysis.scala"],
    "doc_": ["text/TextAnalysis.scala", "text/CorpusOps.scala"],
    "corpus": ["text/CorpusOps.scala"],
    "quality": ["text/CorpusOps.scala", "text/TextAnalysis.scala"],
    "gopher": ["text/TextAnalysis.scala"],
    "lm_": ["text/TextAnalysis.scala"],
    "vocab": ["text/TextAnalysis.scala"],
    "train": ["text/CorpusOps.scala"],
    "eval_": ["text/CorpusOps.scala"],
    "sequence": ["text/CorpusOps.scala"],
    "source_mixing": ["text/CorpusOps.scala"],
    "temperature": ["text/CorpusOps.scala"],
    "length_": ["text/CorpusOps.scala", "text/TextAnalysis.scala"],
    "winnow": ["text/TextAnalysis.scala"],
    "tfidf": ["text/TextAnalysis.scala"],
    "inverted": ["text/TextAnalysis.scala"],
    "cooccurrence": ["text/TextAnalysis.scala"],
    "langid": ["text/TextAnalysis.scala"],
    "merge_": ["operators/MergeUpsert.scala"],
    "snapshot": ["operators/MergeUpsert.scala"],
    "pagerank": ["operators/PageRank.scala"],
    "zorder": ["operators/ZOrder.scala"],
    "skew": ["operators/Skew.scala"],
    "bucketed": ["operators/Bucketed.scala"],
    "topk": ["plans/TopKPerKey.scala", "plans/TopKWindowRewrite.scala",
             "operators/Relational.scala"],
    "asof": ["operators/TemporalJoins.scala"],
    "range_join": ["operators/TemporalJoins.scala", "plans/RangeJoinRewrite.scala"],
    "partition": ["operators/Partitioning.scala"],
}


def min_map(path):
    with open(path) as f:
        d = json.load(f)
    if "queries_min" in d:
        return d["queries_min"], True
    return d.get("queries", {}), False


def changed_paths(since):
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", since, "HEAD"],
            capture_output=True, text=True, check=True).stdout
        return [l.strip() for l in out.splitlines() if l.strip()]
    except subprocess.CalledProcessError as e:
        print(f"[bench_diff] git diff failed ({e}); all movers will "
              "read as touched=? ", file=sys.stderr)
        return None


def touched(query, paths):
    if paths is None:
        return "?"
    frags = []
    for prefix, mods in MODULE_HINTS.items():
        if query.startswith(prefix):
            frags.extend(mods)
    if not frags:
        return "?"
    for p in paths:
        for f in frags:
            if f in p:
                return "touched"
    return "untouched"


def main():
    import argparse
    ap = argparse.ArgumentParser(
        description="min-vs-min bench mover triage (see module docstring)")
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="per-query min regression (s) to report")
    ap.add_argument("--since", default=None,
                    help="git ref; movers labeled touched/untouched vs it")
    ap.add_argument("--fail-on-movers", action="store_true",
                    help="exit 2 when any mover is reported — lets the "
                         "close protocol enforce 'movers must be "
                         "triaged or it doesn't ship' (r14 ADVICE)")
    ns = ap.parse_args()
    threshold, since = ns.threshold, ns.since
    old, old_is_min = min_map(ns.old)
    new, new_is_min = min_map(ns.new)
    if not (old_is_min and new_is_min):
        print("[bench_diff] WARNING: comparing single-rep `queries` "
              "values on at least one side — weaker evidence than "
              "queries_min", file=sys.stderr)
    paths = changed_paths(since) if since else None
    common = sorted(set(old) & set(new))
    movers = []
    for q in common:
        delta = new[q] - old[q]
        if delta > threshold:
            movers.append((delta, q))
    movers.sort(reverse=True)
    for delta, q in movers:
        status = touched(q, paths) if since else "?"
        print(f"MOVER {q}: {old[q]:.3f} -> {new[q]:.3f} "
              f"(+{delta:.3f} s) [{status}]")
    if not movers:
        print(f"no movers above {threshold:.2f} s over {len(common)} "
              "common queries")
    osum = sum(old[q] for q in common)
    nsum = sum(new[q] for q in common)
    print(f"common min-sum: {osum:.2f} -> {nsum:.2f} s "
          f"(ratio {nsum / osum:.3f}) over {len(common)} queries; "
          f"{len(set(new) - set(old))} new, {len(set(old) - set(new))} "
          "removed")
    if movers and ns.fail_on_movers:
        sys.exit(2)


if __name__ == "__main__":
    main()
