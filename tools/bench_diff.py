#!/usr/bin/env python3
"""Bench trend diff: compare two Bench JSON outputs per query.

Flags movers whose ratio exceeds 1.5x in either direction AND whose
absolute movement exceeds 0.5s, so regressions are named in-round
instead of being re-adjudicated from raw JSON next round. The 0.5s
floor is the measured resolution of the single-JVM local[32] harness:
back-to-back identical-code benches show +/-0.3s swings on sub-second
queries (GC pauses, compile threads, page cache) in BOTH directions,
so a sub-0.5s movement is not adjudicable evidence regardless of
ratio, while every real plan regression observed to date moved >1s.

Usage:
    git show <prev-round-commit>:BENCH_LAST.json > /tmp/prev.json
    python3 tools/bench_diff.py /tmp/prev.json BENCH_LAST.json [out.md]

(The driver's BENCH_r{N}.json wrapper truncates the per-query tail —
the committed BENCH_LAST.json is the full-fidelity record.)

Writes a markdown report (default BENCH_DIFF.md) and prints it.
Exit 0 always — the diff is evidence, not a gate.
"""
import json
import sys


def main() -> None:
    prev_path, curr_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DIFF.md"
    prev = json.load(open(prev_path))
    curr = json.load(open(curr_path))
    pq, cq = prev.get("queries", {}), curr.get("queries", {})
    common = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    movers = []
    for name in common:
        a, b = pq[name], cq[name]
        if a <= 0:
            continue
        ratio = b / a
        if (ratio > 1.5 or ratio < 1 / 1.5) and abs(b - a) > 0.5:
            movers.append((name, a, b, ratio))
    movers.sort(key=lambda m: -m[3])

    lines = [f"# Bench diff: {prev_path} -> {curr_path}", ""]
    tp = sum(pq[n] for n in common)
    tc = sum(cq[n] for n in common)
    lines.append(f"- common queries: {len(common)}; "
                 f"total {tp:.1f}s -> {tc:.1f}s ({tc / tp:.2f}x)" if common
                 else "- no common queries")
    if curr.get("contended"):
        lines.append("- **CONTENDED RUN**: a foreign JVM was live during "
                     "the current bench; per-query ratios are not "
                     "trend-comparable")
    if added:
        lines.append(f"- added ({len(added)}): {', '.join(added)}")
    if removed:
        lines.append(f"- removed ({len(removed)}): {', '.join(removed)}")
    for key in ("stream_throughput",):
        sp, sc = prev.get(key), curr.get(key)
        if sp and sc:
            lines.append(f"- {key}: {sp['rows_per_sec']:.0f} -> "
                         f"{sc['rows_per_sec']:.0f} rows/s "
                         f"({sc['rows_per_sec'] / sp['rows_per_sec']:.2f}x)")
        elif sc:
            lines.append(f"- {key}: {sc['rows_per_sec']:.0f} rows/s (new)")
    lines.append("")
    if movers:
        lines.append(f"## Movers >1.5x and >0.5s ({len(movers)})")
        lines.append("")
        lines.append("| query | prev s | curr s | ratio |")
        lines.append("|---|---|---|---|")
        for name, a, b, r in movers:
            lines.append(f"| {name} | {a:.2f} | {b:.2f} | {r:.2f}x |")
    else:
        lines.append("## No movers: every common query within 1.5x (or 0.5s)")

    # Shuffle-byte movers: bytes are deterministic (no JIT/GC noise), so
    # the thresholds are tighter — ratio >1.25x AND >8 MB movement. A
    # byte-mover with a flat wall time is exactly the scale-shaped
    # regression wall time at sf0.1 cannot see.
    ps, cs = prev.get("shuffle_mb", {}), curr.get("shuffle_mb", {})
    bcommon = sorted(set(ps) & set(cs))
    bmovers = []
    for name in bcommon:
        a, b = ps[name], cs[name]
        base = max(a, 0.01)
        ratio = b / base
        if (ratio > 1.25 or ratio < 1 / 1.25) and abs(b - a) > 8.0:
            bmovers.append((name, a, b, ratio))
    bmovers.sort(key=lambda m: -m[3])
    lines.append("")
    if bmovers:
        lines.append(f"## Shuffle-byte movers >1.25x and >8 MB ({len(bmovers)})")
        lines.append("")
        lines.append("| query | prev MB | curr MB | ratio |")
        lines.append("|---|---|---|---|")
        for name, a, b, r in bmovers:
            lines.append(f"| {name} | {a:.1f} | {b:.1f} | {r:.2f}x |")
    elif bcommon:
        lines.append("## No shuffle-byte movers: every common query within "
                     "1.25x (or 8 MB)")
    else:
        lines.append("## No shuffle-byte data in one side (pre-r14 record)")

    # ---- Generated adjudication -------------------------------------
    # The drift-vs-code call every round used to hand-argue, mechanized:
    #  * MEDIAN per-query ratio over untouched queries — a uniform
    #    environmental shift moves the median; a code regression moves
    #    a family/tail and leaves the median ~1.0.
    #  * POSITIONAL-WINDOW scan — the bench runs queries in alphabetical
    #    order, so transient host pressure shows up as a CONTIGUOUS
    #    alphabetical block of inflated ratios (the r18 signature),
    #    which no code change produces (code tracks families, not
    #    adjacency in sort order).
    #  * AMBIENT stamps — BENCH's /proc-sampled per-query foreign-CPU
    #    shares (>10% of host capacity on the recorded min run), the
    #    self-load-immune signal loadavg can't give.
    #  * SHUFFLE BYTES — deterministic; zero byte regressions means no
    #    plan got worse, whatever wall clock did.
    lines.append("")
    lines.append("## Adjudication (generated)")
    lines.append("")
    stable = [(n, cq[n] / pq[n]) for n in common if pq[n] >= 0.10]
    med = sorted(r for _, r in stable)[len(stable) // 2] if stable else 1.0
    lines.append(f"- median per-query ratio over {len(stable)} queries "
                 f"with prev >= 0.1s: **{med:.3f}**")
    amb = curr.get("ambient")
    if amb is not None:
        flagged = amb.get("flagged", {})
        names = ", ".join(f"{k} ({v:.2f})"
                          for k, v in sorted(flagged.items())[:12])
        more = "" if len(flagged) <= 12 else f", +{len(flagged) - 12} more"
        lines.append(
            f"- ambient stamps: foreign_cpu {amb.get('foreign_cpu_sec', 0)}s, "
            f"steal {amb.get('steal_sec', 0)}s across all timed windows; "
            f"{len(flagged)} recorded run(s) >10% foreign"
            + (f": {names}{more}" if flagged else ""))
    else:
        lines.append("- ambient stamps: none in the current record "
                     "(pre-r19 bench)")
    # positional windows: >=6 consecutive alphabetical queries whose
    # rolling-median ratio exceeds 1.3 (sub-0.1s rows skipped — their
    # ratios are pure scheduler jitter and flag phantom windows)
    seq = [(n, cq[n] / pq[n]) for n in common if pq[n] >= 0.10]
    W, windows = 6, []
    i = 0
    while i + W <= len(seq):
        win = seq[i:i + W]
        wmed = sorted(r for _, r in win)[W // 2]
        if wmed > 1.3:
            j = i + W
            while j < len(seq):
                ext = seq[i:j + 1]
                if sorted(r for _, r in ext)[len(ext) // 2] > 1.3:
                    j += 1
                else:
                    break
            windows.append((seq[i][0], seq[j - 1][0], j - i))
            i = j
        else:
            i += 1
    for a, b, k in windows:
        lines.append(f"- positional window: {k} consecutive queries "
                     f"[{a} .. {b}] at rolling-median ratio >1.3")
    byte_regr = [m for m in bmovers if m[3] > 1.0]
    wall_regr = [m for m in movers if m[3] > 1.0]
    if not wall_regr:
        verdict = ("FLAT-OR-FASTER — no wall REGRESSIONS above the "
                   "adjudicable bar; nothing to call.")
    elif byte_regr:
        verdict = ("CODE-SHAPED — shuffle bytes (deterministic) "
                   "regressed on: "
                   + ", ".join(m[0] for m in byte_regr)
                   + ". Inspect those plans before blaming the host.")
    elif windows and med < 1.15:
        verdict = ("AMBIENT — wall regressions sit in contiguous "
                   "alphabetical window(s) with zero shuffle-byte "
                   f"regressions and a ~flat global median ({med:.3f}); "
                   "transient host pressure, not a plan property.")
    elif med >= 1.15:
        verdict = (f"UNIFORM SHIFT — global median {med:.3f} moved with "
                   "zero shuffle-byte regressions: environmental "
                   "(host-wide slowdown), not per-query code.")
    else:
        verdict = ("MIXED — isolated wall movers with flat bytes and no "
                   "positional window; likely the codegen-oscillation "
                   "class. A/B the named movers in isolation.")
    lines.append(f"- **verdict: {verdict}**")
    report = "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
