#!/usr/bin/env python
"""Cross-SF scaling comparison (VERDICT r10 #1): diff two bench
artifacts — e.g. the committed sf0.1 baseline vs a fresh sf1 run — and
emit the per-query / per-family wall-growth table for SCALING.md.

Rows grow 10x between sf0.1 and the tiled sf1 fixture, so the scaling
verdict per query is its wall ratio against that 10x row growth:

* ratio <= linear_bar (default 10x, the row growth)  -> ``ok``
* ratio <= 2x the bar                                 -> ``watch``
* above                                               -> ``WEAK``

Sub-floor queries (warm wall under ``--floor`` seconds at BOTH scales,
default 0.35 s — scheduler/artifact-read territory where ratios are
noise) are reported as ``floor`` and never flagged.

Usage:
  python scripts/scale_compare.py BASE.json NEW.json [--bar 10]
      [--floor 0.35] [--top 25]

Exit code 1 when any WEAK row exists (same spirit as the bench
regression gate: a super-linear query needs a plan fix or a documented
weak flag before the round closes).
"""

from __future__ import annotations

import json
import re
import sys


def _family(name: str) -> str:
    """Coarse operator family from the registry naming convention —
    good enough to aggregate the table; the per-query rows carry the
    detail."""
    n = name.split("_", 1)[1] if "_" in name else name
    for fam, pat in (
        ("streaming", r"stream|drift|sessionize"),
        ("dedup", r"dedup|minhash|simhash|winnow|substring|fingerprint"
                  r"|fuzzy|shingle"),
        ("similarity", r"ann|semdedup|mmr|similar|embed|cosine|ivf|pq_"
                       r"|kmeans|knn"),
        ("graph", r"pagerank|component|triangle|graph"),
        ("text", r"text|token|bpe|tfidf|lang|quality|pii"),
        ("multimodal", r"multimodal|binary|audio|image|media"),
        ("sketch", r"hll|sketch|cms|bitmap|quantile|sample"),
        ("sources", r"csv|orc|jsonl|source|roundtrip"),
        ("join", r"join|asof|range_"),
        ("window", r"window|topn|top_k"),
        ("packing", r"packing|prefix|chunk|shard"),
        ("maintenance", r"snapshot|compact|zorder|maintenance|card"),
    ):
        if re.search(pat, n):
            return fam
    return "core"


def main() -> None:
    args = [a for a in sys.argv[1:]]

    def opt(flag: str, default: float) -> float:
        if flag in args:
            i = args.index(flag)
            v = float(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    bar = opt("--bar", 10.0)
    floor = opt("--floor", 0.35)
    top = int(opt("--top", 25))
    if len(args) != 2:
        sys.exit(__doc__)
    with open(args[0]) as fh:
        base = json.load(fh)
    with open(args[1]) as fh:
        new = json.load(fh)
    bq, nq = base.get("queries", {}), new.get("queries", {})
    common = sorted(set(bq) & set(nq))
    if not common:
        sys.exit("no common queries between the two artifacts")

    rows = []
    for name in common:
        b, n = bq[name], nq[name]
        if b < floor and n < floor:
            verdict = "floor"
            ratio = None
        else:
            ratio = n / b if b > 0 else float("inf")
            verdict = ("ok" if ratio <= bar
                       else "watch" if ratio <= 2 * bar else "WEAK")
        rows.append((name, _family(name), b, n, ratio, verdict))

    fams: dict[str, list] = {}
    for name, fam, b, n, ratio, verdict in rows:
        fams.setdefault(fam, []).append((b, n, ratio, verdict))

    print(f"| family | n | sf{base.get('sf')} s | sf{new.get('sf')} s "
          f"| wall ratio | worst query ratio |")
    print("|---|---|---|---|---|---|")
    for fam in sorted(fams):
        fr = fams[fam]
        tb, tn = sum(r[0] for r in fr), sum(r[1] for r in fr)
        ratios = [r[2] for r in fr if r[2] is not None]
        worst = max(ratios) if ratios else None
        print(f"| {fam} | {len(fr)} | {tb:.1f} | {tn:.1f} "
              f"| {tn / tb:.1f}x | "
              f"{'—' if worst is None else f'{worst:.1f}x'} |")
    tb = sum(r[2] for r in rows)
    tn = sum(r[3] for r in rows)
    print(f"| **total** | {len(rows)} | {tb:.1f} | {tn:.1f} "
          f"| {tn / tb:.1f}x | |")

    flagged = [r for r in rows if r[5] in ("watch", "WEAK")]
    flagged.sort(key=lambda r: -(r[4] or 0))
    if flagged:
        print(f"\n# {len(flagged)} queries above the {bar:.0f}x bar "
              f"(top {top}):")
        for name, fam, b, n, ratio, verdict in flagged[:top]:
            print(f"#   {verdict:5s} {name} [{fam}]: "
                  f"{b:.2f}s -> {n:.2f}s ({ratio:.1f}x)")
    weak = [r for r in flagged if r[5] == "WEAK"]
    print(f"\n# verdict: {len(weak)} WEAK, "
          f"{len([r for r in flagged if r[5] == 'watch'])} watch, "
          f"{len(rows) - len(flagged)} ok/floor")
    sys.exit(1 if weak else 0)


if __name__ == "__main__":
    main()
