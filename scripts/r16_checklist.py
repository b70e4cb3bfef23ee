#!/usr/bin/env python
"""Render the OPTIMIZATION_r16 per-query checklist: round-start committed
BENCH_DETAIL (git 3f382e3) vs the current BENCH_DETAIL, as a markdown table
with the per-query status tag passed in STATUS below."""

from __future__ import annotations

import json
import subprocess

STATUS = {
    # touched this round (batch letter = OPTIMIZATION_r16.md section)
    "graph_label_propagation": "A (edge-build fold, skew gate, no per-round persist)",
    "graph_kcore_peel": "A (edge-build fold)",
    "analytics_rfm_segmentation": "B (one-window bounds; tied, fewer stages)",
    "text_unigram_logprob": "B (count job + token persist removed)",
    "agg_kmv_set_difference": "B (honest: leaked persists -> lazy checkpoints; old number was warm-cache)",
    "text_pmi_collocations": "B (tried, reverted; unchanged)",
    "sim_ann_join_ivf_raw": "C (checkpoint before global sort)",
    "sim_mips_via_ivf_raw": "C (checkpoint before global sort)",
    "sim_ann_join_ivf": "C (rides raw's checkpoint)",
    "sim_retrieval_ndcg_mrr": "C (rides mips arm) + D (LUT slice)",
    "sim_topk_ivf": "D (build 17.5->4.0s; warm probe unchanged)",
    "sim_ivfpq_upsert_raw": "D (marker/metadata writes)",
    "sim_rerank_eval_raw": "D (LUT slice)",
    "pipeline_rag_ingest_raw": "D (index build writes)",
    "sample_coreset_kcenter": "D (result frame one slice)",
    "graph_connected_components": "D (labels frame one slice)",
    "sim_neardup_pairs": "D (empty-frame slice; else untouched)",
}
DEFAULT = "F (session-wide: dataFrameDebugging off, fan_out_scan memo) / P (profiled, left alone)"


def main() -> int:
    old = json.loads(
        subprocess.check_output(["git", "show", "3f382e3:BENCH_DETAIL.json"])
    )
    new = json.load(open("BENCH_DETAIL.json"))
    oq, nq = old["queries"], new["queries"]
    oj, nj = old["canary"]["jvm_sec"], new["canary"]["jvm_sec"]
    print(f"(canary jvm {oj} -> {nj}; ratios below are raw seconds)")
    print("| query | start | final | ratio | status |")
    print("|---|---|---|---|---|")
    tot_o = tot_n = 0.0
    for name, s0 in oq.items():
        s1 = nq.get(name)
        if s1 is None:
            continue
        tot_o += s0
        tot_n += s1
        r = s1 / s0 if s0 else float("nan")
        print(f"| {name} | {s0:.2f} | {s1:.2f} | {r:.2f} | {STATUS.get(name, DEFAULT)} |")
    print(f"| **total (warm, common)** | **{tot_o:.1f}** | **{tot_n:.1f}** | "
          f"**{tot_n / tot_o:.2f}** | |")
    if new.get("index_cold_builds"):
        print("\ncold (scratch-cold build+probe, detail-only):",
              json.dumps(new["index_cold_builds"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
