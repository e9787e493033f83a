#!/usr/bin/env python
"""Dataset downloader — equivalent of the reference's `download_data.py`
(SURVEY.md §2a row 11): fetches the benchmark artifacts from Zenodo
(processed synthetic 10847884; processed smartphone 10848124 in 3 intrinsics
variants; raw spectacular-rec recordings + manual calibrations; raw synthetic
renders) and unpacks them under data/.

This environment has no network egress — use --dry_run to see the plan, or
run on a connected machine.
"""
import argparse
import shutil
import subprocess
from pathlib import Path

ZENODO = {
    "processed-synthetic": [
        ("https://zenodo.org/records/10847884/files/synthetic-all.zip", "data/inputs-processed"),
    ],
    "processed-smartphone": [
        ("https://zenodo.org/records/10848124/files/colmap-sai-cli-vels-blur-scored.zip", "data/inputs-processed"),
        ("https://zenodo.org/records/10848124/files/colmap-sai-cli-orig-intrinsics-blur-scored.zip", "data/inputs-processed"),
        ("https://zenodo.org/records/10848124/files/colmap-sai-cli-calib-intrinsics-blur-scored.zip", "data/inputs-processed"),
    ],
    "raw-smartphone": [
        ("https://zenodo.org/records/10848124/files/spectacular-rec.zip", "data/inputs-raw"),
        ("https://zenodo.org/records/10848124/files/spectacular-rec-extras.zip", "data/inputs-raw"),
    ],
    "raw-synthetic": [
        ("https://zenodo.org/records/10847884/files/synthetic-raw.zip", "data/inputs-raw"),
    ],
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--subset", choices=[*ZENODO, "all"], default="processed-synthetic")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    subsets = list(ZENODO) if args.subset == "all" else [args.subset]
    for subset in subsets:
        for url, dest in ZENODO[subset]:
            dest_dir = Path(dest)
            name = url.rsplit("/", 1)[-1]
            print(f"wget {url} -> {dest_dir}/{name} && unzip")
            if args.dry_run:
                continue
            if shutil.which("wget") is None:
                raise SystemExit("wget not available")
            dest_dir.mkdir(parents=True, exist_ok=True)
            subprocess.check_call(["wget", "-c", url, "-O", str(dest_dir / name)])
            subprocess.check_call(["unzip", "-o", str(dest_dir / name), "-d", str(dest_dir)])


if __name__ == "__main__":
    main()
