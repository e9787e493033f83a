#!/usr/bin/env python
"""VIO processing driver — equivalent of the reference's `process_sai_inputs.py`
(SURVEY.md §2a row 6): runs `sai-cli process` (the closed-source Spectacular AI
VIO) on raw smartphone recordings to produce poses, per-frame velocities and
blur scores in the benchmark format.

sai-cli parameters mirror the reference (:7-15): png output, no undistortion,
key_frame_distance 0.1, internal maxKeypoints=2000 /
optimizerMaxIterations=50; `--no_blur_score_filter` emits the unfiltered
variant (:31-34). The binary is an external dependency; without it this script
reports what it would run (use --dry_run for the full plan).
"""
import argparse
import shutil
import subprocess
import sys
from pathlib import Path

SAI_PARAMS = [
    "--output_format", "png",
    "--no_undistort",
    "--key_frame_distance", "0.1",
    "--internal", "maxKeypoints:2000",
    "--internal", "optimizerMaxIterations:50",
]


def build_cmd(rec_dir: Path, out_dir: Path, blur_filter: bool) -> list[str]:
    cmd = ["sai-cli", "process", str(rec_dir), str(out_dir), *SAI_PARAMS]
    if not blur_filter:
        cmd += ["--no_blur_score_filter"]
    return cmd


def process_subfolders(input_root: Path, output_root: Path, args):
    recs = sorted(p for p in input_root.iterdir() if p.is_dir())
    for rec in recs:
        out = output_root / rec.name
        cmd = build_cmd(rec, out, blur_filter=not args.no_blur_score_filter)
        print(" ".join(cmd))
        if args.dry_run:
            continue
        if shutil.which("sai-cli") is None:
            raise SystemExit(
                "sai-cli not found on PATH — Spectacular AI SDK is a closed-"
                "source external dependency (reference scripts/install.sh:"
                " pip install spectacularAI[full])."
            )
        out.mkdir(parents=True, exist_ok=True)
        subprocess.check_call(cmd)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", default="data/inputs-raw/spectacular-rec")
    ap.add_argument("--output-dir", default="data/inputs-processed/sai-cli")
    ap.add_argument("--no_blur_score_filter", action="store_true")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)
    out = Path(args.output_dir + ("-no-blur-filter" if args.no_blur_score_filter else ""))
    process_subfolders(Path(args.input_dir), out, args)


if __name__ == "__main__":
    main()
