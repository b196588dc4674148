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
# of the literal-boundary slice id `__p`: <= spark.sql.shuffle.partitions
# rows by construction — config-sized model state. Auto-allowed, but ONLY in
# the idiom's full shape (r14 verdict #5 — a bare `__p#` prefix test would
# let any data-sized column *named* __p dodge the single-reducer check):
#   sum(__pc#N L| __pt#N L) windowspecdefinition(__p#N ASC NULLS FIRST,
#       specifiedwindowframe(RowFrame, unboundedpreceding$(), -1))
# i.e. a running sum of the per-slice count/total columns with the
# strictly-before row frame. The companion source lint (below) reserves the
# __p/__pc/__pt names to Layout.scala so the shape cannot be replicated
# outside the primitive without failing the lint run.
OFFSET_FRAME = re.compile(
    r"sum\(__p[ct]#\d+L?\) windowspecdefinition\(__p#\d+ ASC NULLS FIRST, "
    r"specifiedwindowframe\(RowFrame, unboundedpreceding\$\(\), -1\)\)")

# Main-source files allowed to create columns named __p/__pc/__pt (the
# two-phase offset idiom's reserved names).
RESERVED_NAME = re.compile(r'"__p[ct]?"')
RESERVED_OK = {"src/main/scala/graft/functions/Layout.scala"}


def source_lint(root: str = "src/main/scala") -> list:
    """Files outside RESERVED_OK that mint the reserved column names."""
    import os
    bad = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.endswith(".scala"):
                continue
            p = os.path.join(dirpath, f)
            if p in RESERVED_OK:
                continue
            if RESERVED_NAME.search(open(p).read()):
                bad.append(p)
    return bad

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


def scan(text: str):
    """(offenders, n_plans) over an EXPLAIN.md-shaped text."""
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
            if not unpartitioned:
                continue
            # Idiom allowance requires the FULL offset-frame shape around
            # this occurrence (producer function + order column + frame),
            # not just a column named __p.
            ctx = body[max(0, m.start() - 40): m.end() + 90]
            if OFFSET_FRAME.search(ctx):
                continue
            if name not in WHITELIST:
                offenders.setdefault(name, []).append(first)
    return offenders, (len(sections) - 1) // 2, sections[1::2]


def selftest() -> int:
    """The allowance must NOT be spoofable by naming a data column __p."""
    spoofs = [
        # row_number over a data-sized frame ordered by a column named __p.
        "## spoof_rownum\nArguments: [row_number() windowspecdefinition("
        "__p#12 ASC NULLS FIRST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), currentrow$())) AS rn#13]\n",
        # running sum of a NON-reserved column over __p order (wrong producer).
        "## spoof_sum\nArguments: [sum(revenue#7L) windowspecdefinition("
        "__p#12 ASC NULLS FIRST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), -1)) AS s#9L]\n",
        # right producer name but an unbounded-following frame (wrong frame).
        "## spoof_frame\nArguments: [sum(__pc#7L) windowspecdefinition("
        "__p#12 ASC NULLS FIRST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), unboundedfollowing$())) AS s#9L]\n",
    ]
    legit = ("## legit\nArguments: [sum(__pc#14276L) windowspecdefinition("
             "__p#14298 ASC NULLS FIRST, specifiedwindowframe(RowFrame, "
             "unboundedpreceding$(), -1)) AS _we0#14285L]\n")
    ok = True
    for s in spoofs:
        off, _, _ = scan(s + "## _end\nx\n")
        if not off:
            print(f"selftest FAIL: spoofed plan passed the lint:\n{s}")
            ok = False
    off, _, _ = scan(legit + "## _end\nx\n")
    if off:
        print(f"selftest FAIL: the legitimate offset frame was flagged: {off}")
        ok = False
    print("window_lint selftest:", "OK" if ok else "FAILED")
    return 0 if ok else 1


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        return selftest()
    path = sys.argv[1] if len(sys.argv) > 1 else "EXPLAIN.md"
    bad_sources = source_lint()
    if bad_sources:
        print("window_lint: the reserved two-phase offset column names "
              "(__p/__pc/__pt) are minted outside Layout.scala — rename "
              "them so the plan-side allowance stays sound:")
        for p in bad_sources:
            print(f"  {p}")
        return 1
    offenders, n_plans, names = scan(open(path).read())
    if offenders:
        print(f"window_lint: {len(offenders)} quer{'y' if len(offenders)==1 else 'ies'} "
              "plan an UNPARTITIONED window (single-task funnel) and are not "
              "on the documented whitelist:")
        for name, firsts in sorted(offenders.items()):
            print(f"  {name}: windowspecdefinition first arg(s) {firsts}")
        print("Fix with the two-phase global rank (Layout.twoPhaseRank / "
              "distributedPrefix) or add a whitelist entry NAMING the bound.")
        return 1
    stale = sorted(set(WHITELIST) - set(names))
    if stale:
        print(f"window_lint note: whitelist entries with no plan in {path}: {stale}")
    print(f"window_lint: OK ({n_plans} plans scanned)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
