#!/usr/bin/env python
"""Single training run — the `ns-train splatfacto` equivalent (SURVEY.md §2b).

Usage (mirrors the reference command contract, train.py:114-193):
  python cli/fit.py splatfacto --data <scene_dir> --output-dir data/outputs \
      --experiment-name synthetic-mb/cozyroom \
      --max-num-iterations 20000 \
      --pipeline.model.blur-samples 10 \
      --pipeline.model.camera-optimizer.mode SO3xR3 \
      --pipeline.model.camera-velocity-optimizer.enabled True \
      nerfstudio-data --eval-mode interval --eval-interval 8

Writes the reference's output-directory contract (SURVEY.md §5):
  OUTPUT_DIR/EXPERIMENT/splatfacto/TIMESTAMP/{config.json,
  dataparser_transforms.json, checkpoints/, metrics_train.jsonl}
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from splat_tpu.utils.env import respect_jax_platforms_env

    respect_jax_platforms_env()
    from splat_tpu.data import dataparser as dp
    from splat_tpu.engine import config as cfg_mod
    from splat_tpu.engine import trainer as tr

    cfg = cfg_mod.parse_cli(argv)
    if not cfg.data:
        raise SystemExit("--data is required")

    run_dir = cfg.run_dir()
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg_mod.save_config(cfg, run_dir / "config.json")

    scene = dp.parse_scene(cfg.data, cfg.dataparser)
    dp.save_dataparser_transforms(run_dir / "dataparser_transforms.json", scene)

    tc = cfg.trainer
    import dataclasses

    # --max-num-iterations (the reference's flag) and --trainer.max-steps are
    # aliases; whichever was changed from its default wins so neither is a
    # silent no-op.
    n_iter = cfg.max_num_iterations
    if n_iter == type(cfg)().max_num_iterations and tc.max_steps != type(tc)().max_steps:
        n_iter = tc.max_steps
    cfg = dataclasses.replace(cfg, max_num_iterations=n_iter)
    tc = dataclasses.replace(tc, max_steps=n_iter, seed=cfg.seed)
    if "viewer" in (cfg.vis or ""):
        # the live viewer thread reads trainer.params concurrently; donated
        # buffers would be invalidated mid-render
        tc = dataclasses.replace(tc, donate_buffers=False)
    mesh = None
    if cfg.mesh.enabled:
        import jax

        from splat_tpu.parallel import sharding

        img_h = scene.train_cameras.height
        mesh = sharding.resolve_mesh(cfg.mesh, cfg.model, img_h)
        print(
            "mesh: "
            + " x ".join(f"{k}={v}" for k, v in mesh.shape.items())
            + f"  ({len(mesh.devices.flat)} of {jax.device_count()} devices)",
            flush=True,
        )
    trainer = tr.Trainer(scene, cfg.model, tc, output_dir=run_dir, mesh=mesh)

    if "viewer" in (cfg.vis or ""):
        # live-training browser viewer (ns-train --vis viewer equivalent)
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        import viewer as viewer_mod

        state = viewer_mod.ViewerState.from_trainer(cfg, trainer, res=256)
        viewer_mod.serve(state, port=cfg.viewer_port)

    log_path = run_dir / "metrics_train.jsonl"
    t0 = time.time()

    tb_writer = None
    if "tensorboard" in (cfg.vis or ""):
        # standard-format scalar export (reference --vis=tensorboard,
        # train.py:140); zero-dep tfevents writer, consumable by any
        # tensorboard-compatible dashboard
        from splat_tpu.utils.tbevents import TBEventWriter

        tb_writer = TBEventWriter(run_dir / "tensorboard")

    def cb(rec):
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if tb_writer is not None:
            tb_writer.add_scalars(
                [(f"train/{k}", float(v)) for k, v in rec.items()
                 if k != "step" and isinstance(v, (int, float))],
                step=rec["step"],
            )
            tb_writer.flush()
        print(
            f"step {rec['step']:6d}  loss {rec['loss']:.4f}  "
            f"alive {rec['n_alive']}  {rec['wall_s']:.0f}s",
            flush=True,
        )

    steps_done = 0
    next_eval = cfg.steps_per_eval
    last_saved_model_cfg = cfg.model

    def persist_config_if_grown():
        # adaptive tile capacity may grow max_per_tile mid-run; the manifest
        # must track it IMMEDIATELY (not only at exit) so mid-run checkpoints
        # of a later-crashed run reload at the grown capacity instead of
        # silently re-dropping the deepest tile entries
        nonlocal cfg, last_saved_model_cfg
        if trainer.model_config != last_saved_model_cfg:
            cfg = dataclasses.replace(cfg, model=trainer.model_config)
            cfg_mod.save_config(cfg, run_dir / "config.json")
            last_saved_model_cfg = trainer.model_config

    while steps_done < cfg.max_num_iterations:
        chunk = min(
            cfg.steps_per_save,
            cfg.max_num_iterations - steps_done,
            max(next_eval - steps_done, 1) if cfg.steps_per_eval > 0 else 1 << 30,
        )
        trainer.run(chunk, progress_cb=cb)
        steps_done += chunk
        persist_config_if_grown()
        if cfg.steps_per_eval > 0 and steps_done >= next_eval:
            m = trainer.evaluate()
            rec = {"step": trainer.step, **{f"eval_{k}": v for k, v in m.items()}}
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if tb_writer is not None:
                tb_writer.add_scalars(
                    [(f"eval/{k}", float(v)) for k, v in m.items()],
                    step=trainer.step,
                )
                tb_writer.flush()
            print(f"eval @ {trainer.step}: {m}", flush=True)
            next_eval += cfg.steps_per_eval
        if steps_done % cfg.steps_per_save == 0 or steps_done >= cfg.max_num_iterations:
            trainer.save_checkpoint(run_dir / "checkpoints" / f"step_{trainer.step}")

    wall = time.time() - t0
    persist_config_if_grown()
    metrics = trainer.evaluate()
    compile_s = trainer.compile_overhead_seconds()
    out = {
        "experiment_name": cfg.experiment_name,
        "method_name": cfg.method_name,
        "checkpoint": str(run_dir / "checkpoints" / f"step_{trainer.step}"),
        "results": metrics,
        "wall_clock_time_seconds": wall,
        # compile vs training separated (the reference's wall_clock_time_seconds
        # is a training-time contract, train.py:192-196; on this backend cold
        # XLA compiles are minutes and would dominate the `time` column)
        "compile_time_seconds": compile_s,
        "train_time_seconds": wall - compile_s,
    }
    (run_dir / "metrics.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out["results"]))
    return run_dir


if __name__ == "__main__":
    main()
