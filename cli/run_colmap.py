#!/usr/bin/env python
"""COLMAP wrapper — equivalent of the reference's `run_colmap.py` (SURVEY.md
§2a row 8): runs SfM over a recording's images in a temp dir with a
retry-until-success loop (COLMAP is non-deterministic and occasionally fails;
reference run_colmap.py:38-56 sniffs success from its output).

Backend: prefers a native `colmap` binary; `ns-process-data` is not available
in this environment (no nerfstudio). Emits transforms.json + sparse_pc.ply in
the benchmark contract via our converter.
"""
import argparse
import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def colmap_available() -> bool:
    return shutil.which("colmap") is not None


def run_colmap_once(image_dir: Path, work_dir: Path, camera_model="SIMPLE_PINHOLE",
                    matching="exhaustive") -> bool:
    db = work_dir / "database.db"
    sparse = work_dir / "sparse"
    sparse.mkdir(parents=True, exist_ok=True)
    steps = [
        ["colmap", "feature_extractor", "--database_path", str(db),
         "--image_path", str(image_dir), "--ImageReader.camera_model", camera_model,
         "--ImageReader.single_camera", "1"],
        ["colmap", f"{matching}_matcher", "--database_path", str(db)],
        ["colmap", "mapper", "--database_path", str(db),
         "--image_path", str(image_dir), "--output_path", str(sparse)],
    ]
    for cmd in steps:
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stderr[-2000:])
            return False
    return (sparse / "0").exists()


def export_transforms(work_dir: Path, out_dir: Path) -> None:
    """COLMAP sparse model -> transforms.json (+ sparse_pc.ply)."""
    r = subprocess.run(
        ["colmap", "model_converter", "--input_path", str(work_dir / "sparse" / "0"),
         "--output_path", str(work_dir / "text"), "--output_type", "TXT"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(f"model_converter failed: {r.stderr[-500:]}")
    from splat_tpu.data.colmap_io import colmap_text_to_transforms

    colmap_text_to_transforms(work_dir / "text", out_dir)


def process(input_folder: Path, output_folder: Path, max_retries: int, dry_run: bool):
    image_dir = input_folder / "images"
    print(f"colmap: {image_dir} -> {output_folder}")
    if dry_run:
        return
    if not colmap_available():
        raise SystemExit(
            "colmap binary not found on PATH. Install COLMAP or run the "
            "pipeline on a machine that has it (external dependency, same as "
            "the reference's ns-process-data)."
        )
    for attempt in range(max_retries):
        with tempfile.TemporaryDirectory() as td:
            work = Path(td)
            if run_colmap_once(image_dir, work):
                export_transforms(work, output_folder)
                print("CONGRATS: colmap succeeded")
                return
        print(f"colmap attempt {attempt + 1}/{max_retries} failed, retrying")
    raise SystemExit(f"colmap failed after {max_retries} attempts")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_folder", nargs="?", default=None)
    ap.add_argument("--dataset", default="sai-cli")
    ap.add_argument("--processed-prefix", default="data/inputs-processed")
    ap.add_argument("--max_retries", type=int, default=10)
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--case_number", type=int, default=-1)
    args = ap.parse_args(argv)

    prefix = Path(args.processed_prefix)
    out_root = prefix / f"colmap-{args.dataset}-imgs"
    if args.input_folder in (None, "all"):
        cases = sorted((prefix / args.dataset).iterdir())
        selected = cases if args.input_folder == "all" or args.case_number == 0 else (
            [cases[args.case_number - 1]] if args.case_number > 0 else []
        )
        if not selected:
            for i, c in enumerate(cases):
                print(f"{i + 1}:\t{c}")
            return
    else:
        selected = [Path(args.input_folder)]
    for case in selected:
        process(case, out_root / case.name, args.max_retries, args.dry_run)


if __name__ == "__main__":
    main()
