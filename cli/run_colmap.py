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


def hloc_available() -> bool:
    """hloc (superpoint + lightglue) — the reference's learned-feature SfM
    backend (`ns-process-data --feature-type superpoint --matcher-type
    superpoint+lightglue`, reference process_deblur_nerf_inputs.py:87-101).
    External dependency, same class as the colmap binary."""
    try:
        import hloc  # noqa: F401

        return True
    except ImportError:
        return False


def run_hloc_once(image_dir: Path, work_dir: Path,
                  feature_type: str = "superpoint",
                  matcher_type: str = "superpoint+lightglue") -> bool:
    """SfM via hloc's python API: superpoint features + lightglue matching +
    pycolmap reconstruction. Produces the same sparse-model layout as
    run_colmap_once (sparse/0) so export_transforms works on either backend.

    Behavioral delta vs COLMAP-exhaustive (documented for the fallback):
    learned features register low-texture / blurry frames that SIFT misses —
    the reference uses this for the Deblur-NeRF benchmark conversions — but
    both backends emit the same transforms.json/sparse_pc.ply contract."""
    from hloc import (extract_features, match_features, pairs_from_exhaustive,
                      reconstruction)

    feats = {"superpoint": "superpoint_aachen"}.get(feature_type, feature_type)
    feature_conf = extract_features.confs[feats]
    matcher_conf = match_features.confs[matcher_type]

    sfm_pairs = work_dir / "pairs.txt"
    sfm_dir = work_dir / "sparse" / "0"
    features = extract_features.main(feature_conf, image_dir, work_dir)
    pairs_from_exhaustive.main(sfm_pairs, features=features)
    matches = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], work_dir
    )
    reconstruction.main(sfm_dir, image_dir, sfm_pairs, features, matches)
    return sfm_dir.exists()


def run_sfm_once(image_dir: Path, work_dir: Path, backend: str = "colmap",
                 **kw) -> bool:
    """Dispatch one SfM attempt to the selected backend."""
    if backend == "hloc":
        if not hloc_available():
            raise SystemExit(
                "--sfm-backend hloc requested but hloc is not installed. "
                "Install hloc (github.com/cvg/Hierarchical-Localization) or "
                "fall back to --sfm-backend colmap (exhaustive SIFT matching; "
                "fewer registrations on blurry/low-texture frames, same "
                "output contract)."
            )
        return run_hloc_once(image_dir, work_dir, **kw)
    return run_colmap_once(image_dir, work_dir)


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


def process(input_folder: Path, output_folder: Path, max_retries: int,
            dry_run: bool, sfm_backend: str = "colmap"):
    image_dir = input_folder / "images"
    print(f"{sfm_backend}: {image_dir} -> {output_folder}")
    if dry_run:
        return
    if sfm_backend == "colmap" and not colmap_available():
        raise SystemExit(
            "colmap binary not found on PATH. Install COLMAP or run the "
            "pipeline on a machine that has it (external dependency, same as "
            "the reference's ns-process-data)."
        )
    for attempt in range(max_retries):
        with tempfile.TemporaryDirectory() as td:
            work = Path(td)
            if run_sfm_once(image_dir, work, backend=sfm_backend):
                export_transforms(work, output_folder)
                print("CONGRATS: sfm succeeded")
                return
        print(f"{sfm_backend} attempt {attempt + 1}/{max_retries} failed, retrying")
    raise SystemExit(f"{sfm_backend} failed after {max_retries} attempts")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_folder", nargs="?", default=None)
    ap.add_argument("--dataset", default="sai-cli")
    ap.add_argument("--processed-prefix", default="data/inputs-processed")
    ap.add_argument("--max_retries", type=int, default=10)
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--case_number", type=int, default=-1)
    ap.add_argument(
        "--sfm-backend", default="colmap", choices=["colmap", "hloc"],
        help="colmap = exhaustive SIFT (binary on PATH); hloc = "
             "superpoint+lightglue (reference's Deblur-NeRF converter path)",
    )
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
        process(case, out_root / case.name, args.max_retries, args.dry_run,
                sfm_backend=args.sfm_backend)


if __name__ == "__main__":
    main()
