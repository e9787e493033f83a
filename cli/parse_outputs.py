#!/usr/bin/env python
"""Metrics aggregator — equivalent of the reference's `parse_outputs.py`
(SURVEY.md §2a row 2): walks the output tree, collects metrics.json into a
pandas table / CSV with columns `dataset variant session psnr ssim lpips time`.

Expected path shape (reference parse_outputs.py:14-19):
  OUTPUT/DATASET/VARIANT/SESSION/splatfacto/TIMESTAMP/metrics.json
"""
import argparse
import json
import sys
from pathlib import Path


def find_and_parse_directories_containing_splatting_metrics(root: Path) -> list[dict]:
    rows = []
    for metrics_path in sorted(root.rglob("*/splatfacto/*/metrics.json")):
        rel = metrics_path.relative_to(root)
        parts = rel.parts
        # DATASET/VARIANT/SESSION/splatfacto/TIMESTAMP/metrics.json
        if len(parts) < 6:
            continue
        dataset, variant, session = parts[0], parts[1], parts[2]
        try:
            m = json.loads(metrics_path.read_text())
        except json.JSONDecodeError:
            continue
        res = m.get("results", {})
        rows.append(
            {
                "dataset": dataset,
                "variant": variant,
                "session": session,
                "psnr": res.get("psnr"),
                "ssim": res.get("ssim"),
                "lpips": res.get("lpips"),
                # `time` is TRAINING time when the run separated compile from
                # train (fit.py writes both); total wall kept in its own column
                "time": m.get("train_time_seconds",
                              m.get("wall_clock_time_seconds")),
                "compile_time": m.get("compile_time_seconds"),
                "wall_time": m.get("wall_clock_time_seconds"),
            }
        )
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", default="data/outputs")
    ap.add_argument("--csv", default="", help="write CSV here")
    ap.add_argument("--by-variant", action="store_true", help="mean per variant")
    args = ap.parse_args(argv)

    rows = find_and_parse_directories_containing_splatting_metrics(Path(args.input_dir))
    if not rows:
        print("no metrics found")
        return
    import pandas as pd

    df = pd.DataFrame(rows, columns=["dataset", "variant", "session", "psnr",
                                     "ssim", "lpips", "time", "compile_time",
                                     "wall_time"])
    if args.by_variant:
        agg = df.groupby(["dataset", "variant"])[
            ["psnr", "ssim", "lpips", "time", "compile_time"]].mean()
        print(agg.to_string())
    else:
        print(df.to_string(index=False))
    if args.csv:
        df.to_csv(args.csv, index=False)
        print(f"wrote {args.csv}")
    return df


if __name__ == "__main__":
    main()
