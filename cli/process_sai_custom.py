#!/usr/bin/env python
"""Custom-recording pipeline — equivalent of the reference's
`process_sai_custom.py` (SURVEY.md §2a row 7): single Spectacular-Rec
recording -> VIO (sai-cli) -> optional COLMAP -> combined trainable dataset.

Reference behaviors covered:
  * accepts a .zip of the recording or a directory (unzips to a temp dir);
  * `sai-cli process` with the benchmark parameters;
  * pulls `exposure_time` from the recording's `data.jsonl` per-frame metadata
    when the VIO output lacks it (reference :12-31; median of frame exposures,
    converted from the recording's time unit);
  * SKIP_COLMAP: train directly on VIO poses; otherwise run COLMAP and merge
    poses/velocities via combine.py.
"""
import argparse
import json
import shutil
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def exposure_from_data_jsonl(rec_dir: Path) -> float | None:
    """Median per-frame exposure time (seconds) from data.jsonl, if present."""
    fn = rec_dir / "data.jsonl"
    if not fn.exists():
        return None
    vals = []
    for line in fn.read_text().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        for key in ("exposureTimeSeconds", "exposure_time"):
            if key in d:
                vals.append(float(d[key]))
        frames = d.get("frames") or []
        for fr in frames:
            for key in ("exposureTimeSeconds", "exposure_time"):
                if key in fr:
                    vals.append(float(fr[key]))
    return float(np.median(vals)) if vals else None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("recording", help=".zip or directory of a spectacular-rec recording")
    ap.add_argument("--output-dir", default="data/inputs-processed/sai-custom")
    ap.add_argument("--skip_colmap", action="store_true")
    ap.add_argument("--set_rolling_shutter_to", type=float, default=None)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    rec = Path(args.recording)
    name = rec.stem
    out_root = Path(args.output_dir)
    vio_out = out_root / name

    with tempfile.TemporaryDirectory() as td:
        if rec.suffix == ".zip":
            print(f"unzip {rec} -> {td}")
            if not args.dry_run:
                with zipfile.ZipFile(rec) as z:
                    z.extractall(td)
                inner = [p for p in Path(td).iterdir() if p.is_dir()]
                rec_dir = inner[0] if len(inner) == 1 else Path(td)
            else:
                rec_dir = Path(td)
        else:
            rec_dir = rec

        from process_sai_inputs import build_cmd

        cmd = build_cmd(rec_dir, vio_out, blur_filter=True)
        print(" ".join(cmd))
        if not args.dry_run:
            if shutil.which("sai-cli") is None:
                raise SystemExit("sai-cli not found (Spectacular AI SDK, external)")
            vio_out.mkdir(parents=True, exist_ok=True)
            subprocess.check_call(cmd)

        # exposure fallback from the raw recording metadata
        tfn = vio_out / "transforms.json"
        if tfn.exists():
            meta = json.loads(tfn.read_text())
            if not meta.get("exposure_time"):
                exp = exposure_from_data_jsonl(rec_dir)
                if exp:
                    meta["exposure_time"] = exp
                    print(f"exposure_time from data.jsonl: {exp:.5f}s")
            if args.set_rolling_shutter_to is not None:
                meta["rolling_shutter_time"] = args.set_rolling_shutter_to
            if not args.dry_run:
                tfn.write_text(json.dumps(meta, indent=4))

    if args.skip_colmap:
        print(f"done (VIO poses): {vio_out}")
        return

    from run_colmap import process as colmap_process

    colmap_out = out_root.parent / "colmap-sai-custom-imgs" / name
    colmap_process(vio_out, colmap_out, max_retries=10, dry_run=args.dry_run)
    combined_out = out_root.parent / "sai-custom-combined" / name
    subprocess.check_call([
        sys.executable, str(Path(__file__).parent / "combine.py"),
        str(colmap_out), str(vio_out), str(combined_out),
    ] + (["--dry_run"] if args.dry_run else []))
    print(f"done: {combined_out}")


if __name__ == "__main__":
    main()
