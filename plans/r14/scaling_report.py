"""Summarize the r14 scaling evidence (r13 verdict item 3).

Compares the sf1 32-core pass against (a) the r13-HEAD sf1 sweep
(BENCH_LOCAL_sf1.json) for round-over-round at 10x data, and (b) the
sf1 8-core pass for core-scaling ratios that sf0.1 cannot resolve
(floor-bound there). Prints per-family totals and the keys whose
8-core/32-core ratio marks them parallel (>=2x) vs floor-bound (~1x)
vs suspicious (<0.8).

Usage: python plans/r14/scaling_report.py
"""

from __future__ import annotations

import json
import math
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def fam(k: str) -> str:
    if k.startswith("stream_"):
        return "streaming"
    if k.startswith(("q", "agg_", "win_", "topk", "asof", "salted",
                     "cube", "rollup", "pivot", "distinct", "hll",
                     "dedup_", "connected", "enrich", "filter_by")):
        return "tpch/core"
    if ("roundtrip" in k or k.startswith(("iceberg", "kafka", "kinesis",
                                          "rabbitmq", "avro", "cassandra",
                                          "elasticsearch", "firehose",
                                          "hive", "jdbc"))):
        return "connectors"
    return "llm"


def load(name: str) -> dict:
    with open(os.path.join(REPO, name)) as f:
        return json.load(f)


def geomean(ratios: list[float]) -> float:
    ratios = [r for r in ratios if r > 0]
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def main() -> None:
    now = load("BENCH_LOCAL_r14_sf1.json")
    prev = load("BENCH_LOCAL_sf1.json")
    low = load("BENCH_LOCAL_r14_sf1_cpus8.json")

    print(f"sf1 32-core: {now['value']:.1f}s  (r13 HEAD: {prev['value']:.1f}s"
          f" -> total speedup {prev['value']/now['value']:.2f}x)")
    print(f"sf1  8-core: {low['value']:.1f}s  "
          f"(8c/32c total ratio {low['value']/now['value']:.2f})")
    for art, tag in ((now, "sf1_32c"), (low, "sf1_8c")):
        hs, he = art.get("host_start", {}), art.get("host_end", {})
        print(f"  [{tag}] cal {hs.get('cal_s')}->{he.get('cal_s')} "
              f"steal_d {he.get('steal_jiffies', 0) - hs.get('steal_jiffies', 0)}"
              f" (clk_tck {hs.get('clk_tck')})")

    qn, qp, ql = now["queries"], prev["queries"], low["queries"]
    common_prev = sorted(set(qn) & set(qp))
    fams: dict[str, list[float]] = {}
    for k in common_prev:
        fams.setdefault(fam(k), []).append(qp[k] / qn[k])
    print("\nround-over-round at sf1 (r13 HEAD / r14 HEAD, >1 = faster):")
    for f, rs in sorted(fams.items()):
        print(f"  {f:11s} geomean {geomean(rs):.2f}  (n={len(rs)})")

    print("\ncore-scaling (8-core sec / 32-core sec; ~4 = ideal, ~1 = floor-bound):")
    rows = sorted(((ql[k] / qn[k], k) for k in set(qn) & set(ql)),
                  reverse=True)
    for r, k in rows[:12]:
        print(f"  {r:5.2f}  {k}")
    print("  ...")
    for r, k in rows[-6:]:
        print(f"  {r:5.2f}  {k}")
    med = sorted(r for r, _ in rows)[len(rows) // 2]
    par = sum(1 for r, _ in rows if r >= 2)
    print(f"\nmedian ratio {med:.2f}; {par}/{len(rows)} keys >=2x "
          f"(parallel); {sum(1 for r,_ in rows if r < 0.8)} keys <0.8 "
          "(suspect window)")


if __name__ == "__main__":
    main()
