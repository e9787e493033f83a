#!/usr/bin/env python
"""Gaussian-splat exporter — the `ns-export gaussian-splat` equivalent
(nerfstudio exporter family; the round-2 viewer parity gap noted "no
crop/export tooling", VERDICT §2b ns-viewer row).

Writes the de-facto-standard 3DGS PLY layout (INRIA training output /
antimatter15-style viewers): binary_little_endian vertices with properties
  x y z nx ny nz f_dc_0..2 f_rest_0..(3*(B-1)-1) opacity scale_0..2 rot_0..3
where f_rest is stored CHANNEL-MAJOR (all B-1 coeffs of R, then G, then B),
opacity is the pre-sigmoid logit, scales are log-scales and rot is the
(w, x, y, z) quaternion — exactly what viewers like supersplat/antimatter15
ingest. Dead (culled) gaussians are dropped; an optional axis-aligned crop
box restricts the export region.

Usage:
  python cli/export.py --load-config <run>/config.json --output model.splat.ply \
      [--crop xmin xmax ymin ymax zmin zmax] [--min-opacity 0.005]
"""
import argparse
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def export_ply(path, means, scales_log, quats, opacities_logit,
               features_dc, features_rest):
    """Write the standard 3DGS binary PLY (see module docstring)."""
    n, b_rest = features_rest.shape[0], features_rest.shape[1]
    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * b_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    # channel-major f_rest: (B-1, 3) per splat -> R-coeffs, G-coeffs, B-coeffs
    rest_cm = np.transpose(features_rest, (0, 2, 1)).reshape(n, 3 * b_rest)
    normals = np.zeros((n, 3), np.float32)
    rec = np.concatenate(
        [means, normals, features_dc, rest_cm,
         opacities_logit[:, None], scales_log, quats], axis=1
    ).astype("<f4")
    assert rec.shape[1] == len(props), (rec.shape, len(props))
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--load-config", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--crop", type=float, nargs=6, default=None,
                    metavar=("XMIN", "XMAX", "YMIN", "YMAX", "ZMIN", "ZMAX"),
                    help="axis-aligned crop box in scene units")
    ap.add_argument("--min-opacity", type=float, default=0.0,
                    help="drop splats below this (post-sigmoid) opacity")
    args = ap.parse_args(argv)

    from render_model import load_trainer_from_config

    _, trainer = load_trainer_from_config(Path(args.load_config))
    g = trainer.params.gaussians
    import jax

    keep = np.asarray(g.alive) > 0
    if args.min_opacity > 0:
        op = np.asarray(jax.nn.sigmoid(g.opacities_logit))
        keep &= op >= args.min_opacity
    means = np.asarray(g.means)
    if args.crop is not None:
        lo = np.array(args.crop[0::2])
        hi = np.array(args.crop[1::2])
        keep &= np.all((means >= lo) & (means <= hi), axis=1)

    export_ply(
        args.output,
        means[keep],
        np.asarray(g.scales_log)[keep],
        np.asarray(g.quats)[keep],
        np.asarray(g.opacities_logit)[keep],
        np.asarray(g.features_dc)[keep],
        np.asarray(g.features_rest)[keep],
    )
    print(f"exported {int(keep.sum())} splats -> {args.output}")


if __name__ == "__main__":
    main()
