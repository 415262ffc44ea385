"""Long-horizon throughput/memory audit of a full-scale run (VERDICT r4
stretch item): it/s by training segment (excluding artifact-render
boundaries), metrics.jsonl growth, and host-RSS drift from the campaign's
sampler files.

Usage: python benchmarks/audit_full_scale.py <expdir> [rss_file]
(expdir = .../logs/full_nerf_200k from benchmarks/run_full_scale_all.sh)
"""

import json
import os
import sys


def main():
    expdir = sys.argv[1]
    rss_file = sys.argv[2] if len(sys.argv) > 2 else None
    recs = [json.loads(l) for l in open(os.path.join(expdir, "metrics.jsonl"))]
    pts = sorted({(r["step"], r["t"]) for r in recs if "t" in r})

    # Per-interval it/s; drop artifact boundaries (i_video/i_testset render
    # minutes between two prints) by excluding intervals whose rate is < 1/3
    # of the running median — those measure rendering, not training.
    rates = []
    for (s0, t0), (s1, t1) in zip(pts, pts[1:]):
        if s1 > s0 and t1 > t0:
            rates.append((s1, (s1 - s0) / (t1 - t0)))
    if not rates:
        print(json.dumps({"error": "no intervals"}))
        return
    med = sorted(r for _, r in rates)[len(rates) // 2]
    train_rates = [(s, r) for s, r in rates if r > med / 3]
    dropped = len(rates) - len(train_rates)

    def seg(lo, hi):
        xs = [r for s, r in train_rates if lo < s <= hi]
        return round(sum(xs) / len(xs), 1) if xs else None

    last = pts[-1][0]
    out = {
        "expdir": expdir,
        "steps": last,
        "it_per_s_first_10pct": seg(0, last // 10),
        "it_per_s_mid": seg(int(last * 0.45), int(last * 0.55)),
        "it_per_s_last_10pct": seg(int(last * 0.9), last),
        "median_it_per_s": round(med, 1),
        "artifact_intervals_excluded": dropped,
        "metrics_jsonl_kb": round(
            os.path.getsize(os.path.join(expdir, "metrics.jsonl")) / 1024, 1),
    }
    if rss_file and os.path.exists(rss_file):
        rss = [int(l.split()[-1]) for l in open(rss_file)
               if l.strip().endswith(tuple("0123456789"))]
        if rss:
            out["rss_mb_start"] = round(rss[0] / 1024)
            out["rss_mb_peak"] = round(max(rss) / 1024)
            out["rss_mb_end"] = round(rss[-1] / 1024)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
