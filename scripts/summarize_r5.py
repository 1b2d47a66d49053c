"""Summarize the round-5 queue outputs (/tmp/q5) into a markdown
fragment for RESULTS_r05.md: per-fit best/final val PSNR/SSIM +
epoch-time stats from the train logs, full-frame eval numbers, stitch
and baseline-config JSONs."""
import json
import os
import re
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/q5"

EP = re.compile(
    r"epoch (\d+): train ([\d.eE+-]+) val ([\d.eE+-]+) lr_scale "
    r"([\d.]+) \((\d+)s\).*?psnr: [\d.]+ \(([\d.]+)\).*?ssim: [\d.]+ "
    r"\(([\d.]+)\)")


def fit_summary(path):
    if not os.path.exists(path):
        return None
    rows = []
    for line in open(path):
        m = EP.search(line)
        if m:
            rows.append({
                "epoch": int(m.group(1)), "val": float(m.group(3)),
                "s": int(m.group(5)), "psnr": float(m.group(6)),
                "ssim": float(m.group(7))})
    if not rows:
        return None
    best = max(rows, key=lambda r: r["psnr"])
    times = [r["s"] for r in rows[1:]] or [rows[0]["s"]]
    return {"epochs": len(rows), "best_epoch": best["epoch"],
            "best_psnr": best["psnr"], "best_ssim": best["ssim"],
            "final_psnr": rows[-1]["psnr"],
            "final_ssim": rows[-1]["ssim"],
            "s_per_epoch": round(sum(times) / len(times), 1)}


def main():
    out = {}
    for name in ("fit", "scene2", "ab_plain", "ab_ens", "scene10m"):
        s = fit_summary(os.path.join(LOG, f"{name}.log"))
        if s:
            out[name] = s
            print(f"| {name} | {s['epochs']} ep @ {s['s_per_epoch']}s "
                  f"| best ep{s['best_epoch']}: PSNR {s['best_psnr']:.2f}"
                  f" / SSIM {s['best_ssim']:.3f} | final "
                  f"{s['final_psnr']:.2f}/{s['final_ssim']:.3f} |")
    ev = os.path.join(LOG, "eval.log")
    if os.path.exists(ev):
        for line in open(ev):
            if "VAL LOSS" in line:
                print("eval:", line.strip())
    for j in ("stitch/stitch_results.json", "baseline_cfgs/results.json",
              "bench_clean.json", "bench_final.json"):
        p = os.path.join(LOG, j)
        if os.path.exists(p):
            txt = open(p).read().strip()
            try:
                txt = json.dumps(json.loads(txt.splitlines()[-1]))
            except Exception:
                txt = txt[-400:]
            print(f"{j}: {txt}")


if __name__ == "__main__":
    main()
