"""Speed-of-light (roofline) analysis of the fused fwd+bwd bench pipeline.

Computes, for the bench scene (1024², 100k gaussians, S=5, tile 16, K=256):
  * workload statistics: total tile intersections L, per-tile chunk
    iterations (the kernels' actual trip counts), padding waste;
  * analytic per-stage lower bounds against TPU v5e peaks along all three
    resource axes — VPU issue, MXU flops, HBM bytes — from instruction
    counts of the kernels in ops/pallas/rasterize_kernels.py;
  * the resulting speed-of-light step time and Mrays/s, to be compared with
    the measured per-op table (scripts_dev/trace_fused.py + utils/trace_report).

v5e peaks used (public numbers, jax-ml.github.io/scaling-book):
  MXU 197 TFLOP/s bf16 (DEFAULT precision; HIGHEST f32 ~1/6, HIGH ~1/3),
  VPU 8x128 lanes x 4 ALUs @ 0.94 GHz ~ 3.85 Tops/s f32,
  HBM 819 GB/s.

Run on CPU (stats are data-dependent but deterministic):
  JAX_PLATFORMS=cpu python scripts_dev/roofline.py
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize force-selects the remote axon backend; env alone loses
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from splat_tpu.ops import projection, tiling

# ---- bench configuration (bench.py) ----
N, RES, TILE, MPT, MTPG, S = 100_000, 1024, 16, 256, int(os.environ.get("MTPG", "16")), 5
CHUNK = 128
NPARAM, NOUT = 13, 8

# ---- v5e peaks ----
MXU_BF16 = 197e12        # flop/s, DEFAULT precision (bf16 inputs, f32 acc)
MXU_F32_HIGHEST = MXU_BF16 / 6
VPU = 3.85e12            # f32 vector ops/s
HBM = 819e9              # bytes/s
# VPU cost model for transcendentals: XLA lowers exp/log1p to polynomial
# sequences on the VPU; measured-equivalent cost ~8-14 plain ops. Use 10.
TRANS_COST = 10.0


def scene_stats():
    rng = np.random.default_rng(0)
    means = jnp.asarray(
        rng.normal(size=(N, 3)) * np.array([0.7, 0.6, 1.2]) + np.array([0, 0, 4.0]),
        jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)) * 0.6) * 0.010, jnp.float32)
    q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    quats = jnp.asarray(q, jnp.float32)
    fx = RES * 0.9
    lv = jnp.array([0.4, -0.2, 0.1]); av = jnp.array([0.05, 0.1, -0.02])
    eps = jnp.linspace(-0.5, 0.5, S) * 0.06
    proj = projection.project_gaussians(
        means, scales, quats, jnp.eye(3), jnp.zeros(3), fx, fx, RES / 2, RES / 2,
        RES, RES, lin_vel=lv, ang_vel=av)
    rs = jnp.float32(0.03)
    t_max = jnp.max(jnp.abs(eps)) + 0.5 * rs
    pad = jnp.max(jnp.abs(proj.pix_vels), axis=-1) * t_max
    lists = tiling.build_tile_lists(
        proj.means2d, proj.extents, proj.depths, proj.valid, RES, RES, TILE,
        MPT, MTPG, radius_pad=pad)
    counts = np.asarray(lists.counts)
    return counts, int(np.asarray(lists.overflow)), np.asarray(proj.valid).sum()


def main():
    counts, overflow, n_valid = scene_stats()
    T = counts.size
    L = int(counts.sum())
    chunks = np.ceil(counts / CHUNK).astype(int)
    n_chunks = int(chunks.sum())
    npix = TILE * TILE
    K = MPT

    print(f"tiles T={T}  intersections L={L}  overflow={overflow}  "
          f"valid gaussians={n_valid}")
    print(f"chunk iterations (no early exit): {n_chunks}  "
          f"(avg {n_chunks/T:.2f}/tile; dense-K would be {T*K//CHUNK})")
    print(f"padded slots T*K = {T*K}  vs  chunk-padded {int((chunks*CHUNK).sum())} "
          f"vs raw L = {L}")

    # ---------------- forward kernel ----------------
    # per (S*npix, CHUNK) element, from _fwd_one_tile/_stacked_alpha:
    #   sigma 4, lo3 1, mask 3, alpha exp+min+where (2+1T), cumsum log1p (1+1T),
    #   t_exc exp+mul (1+1T), t_inc 2, active 1, w 2, new_T ~2
    fwd_plain = 16.0
    fwd_trans = 3.0
    el_fwd = n_chunks * S * npix * CHUNK
    fwd_vpu_ops = el_fwd * (fwd_plain + fwd_trans * TRANS_COST)
    # chunk-basis ops on (npix, CHUNK) (A/B: ~18 ops) once per chunk
    fwd_vpu_ops += n_chunks * npix * CHUNK * 18
    fwd_mxu = n_chunks * (2 * S * npix * CHUNK * CHUNK      # cumsum matmul
                          + 2 * 4 * S * npix * CHUNK)       # rgbd acc
    fwd_bytes = T * NPARAM * K * 4 + T * S * NOUT * npix * 4
    t_fwd = dict(vpu=fwd_vpu_ops / VPU, mxu=fwd_mxu / MXU_BF16, hbm=fwd_bytes / HBM)

    # ---------------- backward kernel ----------------
    # per sample per (npix, CHUNK) element (_bwd_one_tile body):
    #   alpha eval 8+1T, cumsum log1p+exp (1+2T), t_inc/active/w 5, contrib 1,
    #   suffix sub 1, live 3, ratio recip ~5, d_sigma 2, moments P0-2 5 -> ~31
    bwd_plain = 31.0
    bwd_trans = 3.0
    el_bwd = n_chunks * S * npix * CHUNK
    bwd_vpu_ops = el_bwd * (bwd_plain + bwd_trans * TRANS_COST)
    bwd_vpu_ops += n_chunks * npix * CHUNK * 18             # chunk basis
    bwd_vpu_ops += n_chunks * CHUNK * 60                    # epilogue row ops
    # matmuls: per sample: v (2*4*npix*CHUNK), cum (2*npix*CHUNK*CHUNK),
    # prefix (2*npix*CHUNK*CHUNK), g_cd (2*4*npix*CHUNK); epilogue moments
    # 3 matmuls (6+3+1 rows) at HIGHEST (x6 passes)
    bwd_mxu_bf16 = n_chunks * S * (2 * npix * CHUNK * CHUNK * 2 + 2 * 4 * npix * CHUNK * 2)
    bwd_mxu_f32 = n_chunks * (2 * 10 * npix * CHUNK)        # moment matmuls
    bwd_bytes = (2 * T * NPARAM * K * 4 + 2 * T * S * NOUT * npix * 4
                 + T * NPARAM * K * 4)
    t_bwd = dict(vpu=bwd_vpu_ops / VPU,
                 mxu=bwd_mxu_bf16 / MXU_BF16 + bwd_mxu_f32 / MXU_F32_HIGHEST,
                 hbm=bwd_bytes / HBM)

    # ---------------- gathers (HBM-granularity bound) ----------------
    # fwd: L-row take (64B rows) + (T,K_pad,16) slot slice + transpose
    # bwd: (N*M)-row take + (N, M, 16) reduce
    fwd_gather_bytes = L * 64 + T * K * 64 * 2              # read + write
    bwd_gather_bytes = N * MTPG * 64 * 2
    t_gather = dict(hbm=(fwd_gather_bytes + bwd_gather_bytes) / HBM)

    # ---------------- sort/binning ----------------
    sort_bytes = L * 12 * np.log2(max(L, 2)) / 8            # rough multi-pass
    t_sort = dict(hbm=sort_bytes / HBM)

    def show(name, t, measured=None):
        sol = max(t.values())
        bound = max(t, key=t.get)
        line = (f"{name:18s} SoL {sol*1e3:7.3f} ms  (bound: {bound}"
                + "".join(f", {k} {v*1e3:.3f}" for k, v in t.items()) + ")")
        if measured:
            line += f"  measured {measured:.1f} ms -> {100*sol/ (measured/1e3):.0f}% of SoL"
        print(line)
        return sol

    print("\n--- speed-of-light per stage (bench step) ---")
    s1 = show("rasterize fwd", t_fwd, measured=10.0)
    s2 = show("rasterize bwd", t_bwd, measured=18.0)
    s3 = show("param gathers", t_gather, measured=7.4)
    s4 = show("sort+binning", t_sort, measured=1.5)
    total_sol = s1 + s2 + s3 + s4
    rays = RES * RES * S
    print(f"\nkernel+gather SoL total: {total_sol*1e3:.2f} ms "
          f"-> {rays/total_sol/1e6:.0f} Mrays/s vs measured 47.9 ms (109.5)")
    print("NOTE: gathers/sorts are bound well below their measured times — "
          "XLA row-gather runs at ~10-20 ns/row, far from HBM BW; the kernel "
          "bounds are instruction-count models, dominated by VPU issue with "
          "a ~10-op transcendental cost (3 transcendentals per element).")


if __name__ == "__main__":
    main()
