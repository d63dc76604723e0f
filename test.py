#!/usr/bin/env python
"""Evaluation CLI (replaces the lineage's test_*.py scripts).

Loads the latest/best checkpoint from a training run dir and evaluates,
with optional vote ensembling for classification (--num_votes, the
reference's rotated-passes-averaged protocol, SURVEY.md §3.5).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.models import available
from mm3d_tpu.training.loop import TrainConfig, Trainer
from mm3d_tpu.training import steps


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mm3d_tpu evaluation")
    p.add_argument("--model", default="pointnet2_cls_ssg",
                   choices=sorted(available()))
    p.add_argument("--log_dir", required=True,
                   help="run dir created by train.py (contains checkpoints/)")
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--npoint", type=int, default=None)
    p.add_argument("--normal", action="store_true")
    p.add_argument("--num_class", type=int, default=40)
    p.add_argument("--seg_classes", type=int, default=13,
                   help="semseg/fusion_semseg head size (lineage S3DIS "
                        "default 13; custom trees with more label "
                        "classes must set this)")
    p.add_argument("--num_votes", type=int, default=1)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = bf16 serving eval (fused SA + "
                        "bilinear kernels); fp32 is the strict-parity "
                        "mode")
    p.add_argument("--impl", default="auto", choices=["auto", "jax", "pallas"],
                   help="geometry-op implementation")
    p.add_argument("--test_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--torch_ckpt", default=None, metavar="PATH",
                   help="evaluate a lineage PyTorch .pth checkpoint "
                        "(canonical state_dict layout) instead of the "
                        "run dir's orbax checkpoints")
    p.add_argument("--export", default=None, metavar="PATH",
                   help="instead of evaluating, freeze the eval forward "
                        "(weights embedded) into a serialized StableHLO "
                        "serving artifact at PATH (jax.export; reload "
                        "with mm3d_tpu.training.inference.load_serving)")
    p.add_argument("--export_platforms", default=None,
                   metavar="P1[,P2...]",
                   help="cross-lower the --export artifact for these "
                        "backends (e.g. 'tpu,cpu'); default: this "
                        "host's backend")
    p.add_argument("--export_batch", default="fixed",
                   choices=["fixed", "poly"],
                   help="poly: symbolic batch axis — one artifact "
                        "serves ANY batch size (pure-XLA op path only; "
                        "Pallas kernels need static shapes)")
    p.add_argument("--point_shard", type=int, default=0, metavar="MIN_N",
                   help="shard the point axis of big-N eval SA blocks "
                        "over all devices (blocks with >= MIN_N points; "
                        "0 = off).  SPMD sharded FPS + ball query + SA "
                        "tail, exact semantics — parallel/point_shard.py")
    p.add_argument("--scene", default=None, metavar="PATH|DIR|synthetic",
                   help="whole-scene room evaluation (the reference "
                        "test_semseg protocol; semseg/fusion_semseg "
                        "only): tile the room into overlapping blocks, "
                        "vote-accumulate per-point probabilities, report "
                        "point_acc/mIoU/coverage.  PATH = one room as "
                        ".npz (xyz [N,3] + optional rgb/labels) or .npy "
                        "([N,3|6|7]); DIR = a directory of rooms (e.g. "
                        "a preprocessed S3DIS test area) scored "
                        "area-wide over the summed confusion matrix; "
                        "'synthetic' = a generated room")
    p.add_argument("--scene_points", type=int, default=20000,
                   help="synthetic room size (--scene synthetic)")
    p.add_argument("--block_size", type=float, default=1.0,
                   help="scene tiling block edge (meters)")
    p.add_argument("--stride", type=float, default=0.5,
                   help="scene tiling stride (meters)")
    from train import add_dataset_args
    add_dataset_args(p)
    return p.parse_args(argv)


def _load_room(path):
    """One room from disk: .npz (xyz/rgb/labels keys) or bare .npy
    ([N,3] xyz, [N,6] +rgb, [N,4|7] +label column — the preprocessed
    S3DIS room layout)."""
    d = np.load(path)
    if hasattr(d, "files"):  # .npz
        xyz = d["xyz"]
        rgb = d["rgb"] if "rgb" in d.files else None
        labels = d["labels"] if "labels" in d.files else None
    else:
        xyz, rgb, labels = d[:, :3], None, None
        if d.shape[1] >= 6:
            rgb = d[:, 3:6]
        if d.shape[1] == 4:
            labels = d[:, 3].astype(np.int32)
        elif d.shape[1] >= 7:
            # [N,7] = xyz rgb label; [N,8+] = xyz rgb label instance...
            # — the semantic label is column 6 in every preprocessed
            # S3DIS layout (a `in (4, 7)` test silently dropped labels
            # for 8-column rooms; code-review r5)
            labels = d[:, 6].astype(np.int32)
    return xyz, rgb, labels


def _eval_scene(a, trainer, npoint):
    """test.py --scene: the reference's whole-room stitching protocol
    from the CLI (VERDICT r3 item 4; SURVEY.md test_semseg row).

    --scene may also be a DIRECTORY of rooms (.npy/.npz — e.g. a
    preprocessed S3DIS test area): every room is stitched and scored,
    and the area-wide metrics aggregate over the summed confusion
    matrix, matching the reference's whole-area protocol."""
    from mm3d_tpu.training import scene_eval
    from mm3d_tpu.training.steps import _split_variables
    if trainer.task not in ("semseg", "fusion_semseg"):
        raise SystemExit("--scene requires a semseg or fusion_semseg model")
    model = trainer.eval_model
    variables = _split_variables(trainer.state)
    common = dict(num_classes=trainer.cfg.seg_classes,
                  npoints=npoint,
                  block_size=a.block_size, stride=a.stride,
                  batch_size=a.batch_size, seed=a.seed,
                  num_votes=a.num_votes)
    if trainer.task == "semseg":
        predict = jax.jit(lambda p: model.apply(variables, p,
                                                train=False)[0])
        run = lambda xyz, rgb, labels: scene_eval.evaluate_scene(
            predict, xyz, labels=labels, rgb=rgb, **common)
    else:
        predict = jax.jit(
            lambda p, i, k, r, t: model.apply(variables, p, i, k, r, t,
                                              train=False)[0])
        # render block views at the run's training resolution — the
        # default hw=(64,64) would mismatch checkpoints trained at
        # other image sizes (intrinsics scale with hw)
        run = lambda xyz, rgb, labels: scene_eval.evaluate_scene_multimodal(
            predict, xyz, labels=labels, rgb=rgb,
            hw=trainer.cfg.image_hw, **common)

    if a.scene == "synthetic":
        from mm3d_tpu.data.synthetic import synthetic_room
        xyz, rgb, labels = synthetic_room(a.scene_points, seed=a.seed)
        _, metrics = run(xyz, rgb, labels)
        metrics.pop("_cm", None)
        return metrics
    scene_dir = a.scene
    room_filter = lambda f: f.endswith((".npy", ".npz"))
    # the 'area' KEYWORD only applies when no file/dir of that name
    # exists — a real directory called ./area stays reachable
    if a.scene == "area" and not os.path.exists(a.scene):
        # the reference test_semseg flow: score the HELD-OUT area's
        # rooms from the dataset tree (--data_root X --test_area N); a
        # bare directory would score train rooms too.  Only --data_root
        # is required — demanding --dataset s3dis made the mode
        # unreachable for fusion_semseg models (s3dis maps to the
        # semseg task only; code-review r5), and an area tree is
        # S3DIS-layout by definition
        if not a.data_root:
            raise SystemExit("--scene area requires --data_root "
                             "(the S3DIS-layout tree holding the "
                             "Area_N rooms)")
        from mm3d_tpu.data.loaders import s3dis_room_in_area
        scene_dir = a.data_root
        room_filter = (lambda f: f.endswith((".npy", ".npz"))
                       and s3dis_room_in_area(f, a.test_area))
    if os.path.isdir(scene_dir):
        rooms = sorted(filter(room_filter, os.listdir(scene_dir)))
        if not rooms:
            raise SystemExit(f"--scene {a.scene}: no matching rooms "
                             f"in {scene_dir}")
        nc = trainer.cfg.seg_classes
        cm = np.zeros((nc, nc), np.int64)
        cov_pts = total_pts = 0
        unlabeled = []
        for name in rooms:
            xyz, rgb, labels = _load_room(os.path.join(scene_dir, name))
            pred, m = run(xyz, rgb, labels)
            room_cm = m.pop("_cm", None)
            trainer.log.info("room %s (%d pts): %s", name, len(xyz), m)
            cov_pts += m["coverage"] * len(xyz)
            total_pts += len(xyz)
            if room_cm is None:
                unlabeled.append(name)
            else:
                cm += room_cm
        if unlabeled and len(unlabeled) < len(rooms):
            # a MIX of labeled and unlabeled rooms means the area
            # metrics would silently drop the labeled rooms' scores —
            # fail loudly naming the offenders (code-review r5)
            raise SystemExit(
                f"--scene {a.scene}: {len(unlabeled)} room(s) without a "
                f"label column alongside labeled ones: {unlabeled}")
        out = {"rooms": len(rooms),
               "coverage": cov_pts / max(total_pts, 1)}
        if not unlabeled:
            out.update(scene_eval.metrics_from_confusion(cm))
        return out
    xyz, rgb, labels = _load_room(a.scene)
    _, metrics = run(xyz, rgb, labels)
    metrics.pop("_cm", None)
    return metrics


def main(argv=None):
    a = parse_args(argv)
    from mm3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from mm3d_tpu import ops
    ops.set_impl(a.impl)
    from mm3d_tpu.models import get_model
    spec = get_model(a.model)
    cfg = TrainConfig(
        model=a.model, batch_size=a.batch_size,
        npoint=a.npoint or spec.default_npoint, normal_channel=a.normal,
        num_class=a.num_class, seg_classes=a.seg_classes,
        seed=a.seed, test_size=a.test_size,
        log_dir=os.path.join(a.log_dir, "eval"), checkpoint=False,
        eval_dtype=a.dtype)
    from train import build_cli_datasets
    ds_args = a
    if a.scene:
        # scene mode loads its rooms itself (from --scene / the
        # --data_root area tree); the trainer's test_ds only provides
        # init shapes here, so build it synthetic — otherwise
        # `--scene area --dataset s3dis` on a fusion_semseg model dies
        # in the dataset/task guard before _eval_scene runs
        # (code-review r5)
        import copy
        ds_args = copy.copy(a)
        ds_args.dataset = "synthetic"
    _, test_ds = build_cli_datasets(ds_args, spec.task,
                                    a.npoint or spec.default_npoint,
                                    test_only=True)
    trainer = Trainer(cfg, test_ds=test_ds)
    try:
        return _main_with_trainer(a, spec, trainer)
    finally:
        trainer.close()


def _main_with_trainer(a, spec, trainer):
    if a.torch_ckpt:
        # migrated lineage .pth instead of an orbax run dir
        from train import load_torch_into_trainer
        load_torch_into_trainer(trainer, a.torch_ckpt)
    else:
        # restore from the given run dir
        from mm3d_tpu.utils.checkpoint import CheckpointManager
        from mm3d_tpu.training.loop import BEST_METRIC
        best_metric = BEST_METRIC[trainer.task]
        # best_metric must be passed or orbax's best_step() silently
        # degrades to latest_step() (no best_fn -> no best tracking)
        ckpt = CheckpointManager(os.path.join(a.log_dir, "checkpoints"),
                                 best_metric=best_metric)
        step = ckpt.best_step()
        if step is None:
            step = ckpt.latest_step()
        from mm3d_tpu.parallel import replicated_sharding
        trainer.state = ckpt.restore(
            trainer.state, step, sharding=replicated_sharding(trainer.mesh))
        trainer.log.info("restored checkpoint step %s from %s",
                         step, a.log_dir)

    if a.export:
        result = _export_serving_cli(a, trainer)
        trainer.log.info("export: %s", result)
        print(result)
        return result

    import contextlib
    shard_ctx = contextlib.nullcontext()
    if a.point_shard:
        from mm3d_tpu import parallel
        # reuse the Trainer's data-mesh devices: Trainer takes
        # devices[:dp] with dp | batch_size, so a full-device mesh here
        # would put the SA shard_map on a different device set than the
        # committed eval batches ('incompatible devices' at runtime)
        devs = list(trainer.mesh.devices.flat)
        mesh = parallel.make_mesh(devs, data_parallel=len(devs))
        shard_ctx = parallel.point_shard(mesh, min_points=a.point_shard)
    # the context must stay open through the vote passes below: their
    # jitted steps trace lazily on first call, and closing it early
    # would silently re-trace big-N vote evals unsharded
    shard_ctx.__enter__()
    try:
        if a.scene:
            result = _eval_scene(a, trainer,
                                 a.npoint or spec.default_npoint)
        else:
            result = _eval_and_vote(a, trainer)
    finally:
        shard_ctx.__exit__(None, None, None)
    trainer.log.info("eval: %s", result)
    print(result)
    return result


def _export_serving_cli(a, trainer):
    """test.py --export: freeze the restored eval forward into one
    portable StableHLO file (weights embedded).  Input shapes come from
    a real test-pipeline batch, so the artifact serves exactly what
    `test.py` would evaluate (same batch/npoint/channel layout)."""
    from mm3d_tpu import ops
    from mm3d_tpu.training import inference
    from mm3d_tpu.training.steps import _split_variables
    variables = _split_variables(trainer.state)
    model = trainer.eval_model
    # shapes only — collate one host batch (same structure Trainer
    # inits from) instead of spinning the prefetch pipeline
    args = trainer._model_args(
        trainer._example_batch(trainer.test_pipe.dataset))
    predict = jax.jit(lambda *xs: model.apply(variables, *xs,
                                              train=False)[0])
    platforms = (a.export_platforms.split(",")
                 if a.export_platforms else None)
    if a.impl == "pallas":
        # explicit kernel-path export: Mosaic custom calls only serve
        # on TPU and need static shapes
        if platforms and set(platforms) != {"tpu"}:
            raise SystemExit("--impl pallas exports contain Mosaic "
                             "custom calls: --export_platforms must be "
                             "'tpu'")
        if jax.default_backend() not in ("tpu", "axon"):
            # the kernels trace in interpret mode off-TPU, so the
            # artifact would bake interpreter-emulation HLO REGARDLESS
            # of what --export_platforms declares (an explicit 'tpu'
            # label would be a lie; code-review r5)
            raise SystemExit(
                "--impl pallas export on a non-TPU host: the kernels "
                "would trace in interpret mode; run on TPU or drop "
                "--impl pallas")
        if a.export_batch == "poly":
            raise SystemExit("--export_batch poly needs the pure-XLA "
                             "op path; drop --impl pallas")
        exported = inference.export_serving(
            predict, args, platforms=platforms, allow_tpu_kernels=True)
        ops_path = "pallas"
    else:
        # portable artifact: pin the pure-XLA op path for the trace —
        # 'auto' on a TPU host (and bf16 serving in any mode) would
        # otherwise route Pallas kernels into the StableHLO
        with ops.use_impl("jax"):
            exported = inference.export_serving(
                predict, args, platforms=platforms,
                poly_batch=(a.export_batch == "poly"))
        ops_path = "xla"
    inference.save_serving(a.export, exported)
    return {"exported": a.export, "ops": ops_path,
            "platforms": list(exported.platforms),
            "batch": a.export_batch,
            "in_shapes": [list(map(int, jnp.shape(x))) for x in args]}


def _eval_and_vote(a, trainer):
    import numpy as np
    from mm3d_tpu.training import steps
    key = jax.random.PRNGKey(a.seed)
    result = trainer.evaluate()
    # Vote ensembling (the lineage's test-time protocol) for every task
    # family: cls rotated votes, partseg shuffle votes, fusion_cls rotated
    # votes with extrinsics compensation, fusion_semseg shuffle votes.
    # test_pipe pads the final batch; `valid` masks the padded rows.
    if a.num_votes > 1 and trainer.task == "classification":
        vote = steps.make_vote_eval_step(trainer.model, a.num_votes)
        correct = total = 0
        for i, ((pts, label), valid) in enumerate(trainer.test_pipe.epoch(0)):
            pred = vote(trainer.state, pts, jax.random.fold_in(key, i))
            keep = np.asarray(valid)
            hit = (np.asarray(pred) == np.asarray(label)) & keep
            correct += int(hit.sum())
            total += int(keep.sum())
        result["vote_instance_acc"] = correct / max(total, 1)
    elif a.num_votes > 1 and trainer.task == "partseg":
        from mm3d_tpu.data import synthetic as syn
        from mm3d_tpu.utils import metrics as M
        ranges = syn.shapenet_part_ranges()
        import jax.numpy as jnp
        start = jnp.array([ranges[c][0] for c in range(16)], jnp.int32)
        count = jnp.array([ranges[c][1] - ranges[c][0] for c in range(16)],
                          jnp.int32)
        vote = steps.make_vote_partseg_step(
            trainer.model, a.num_votes, 16, start, count)
        ious, cats = [], []
        for i, ((pts, cat, seg), valid) in enumerate(
                trainer.test_pipe.epoch(0)):
            pred = vote(trainer.state, pts, cat, jax.random.fold_in(key, i))
            sh = M.shape_ious(pred, jnp.asarray(seg), start[cat], count[cat],
                              int(count.max()))
            keep = np.asarray(valid)
            ious.append(np.asarray(sh)[keep]); cats.append(np.asarray(cat)[keep])
        agg = M.partseg_metrics_host(np.concatenate(ious),
                                     np.concatenate(cats), 16)
        result["vote_instance_miou"] = agg["instance_miou"]
        result["vote_class_miou"] = agg["class_miou"]
    elif a.num_votes > 1 and trainer.task == "fusion_cls":
        vote = steps.make_vote_fusion_cls_step(trainer.model, a.num_votes)
        correct = total = 0
        for i, (b, valid) in enumerate(trainer.test_pipe.epoch(0)):
            pred = vote(trainer.state, b["points"], b["image"], b["K"],
                        b["R"], b["t"], jax.random.fold_in(key, i))
            keep = np.asarray(valid)
            hit = (np.asarray(pred) == np.asarray(b["label"])) & keep
            correct += int(hit.sum())
            total += int(keep.sum())
        result["vote_instance_acc"] = correct / max(total, 1)
    elif a.num_votes > 1 and trainer.task == "fusion_semseg":
        from mm3d_tpu.utils import metrics as M
        vote = steps.make_vote_fusion_semseg_step(trainer.model, a.num_votes)
        cm = None
        for i, (b, valid) in enumerate(trainer.test_pipe.epoch(0)):
            pred = vote(trainer.state, b["points"], b["image"], b["K"],
                        b["R"], b["t"], jax.random.fold_in(key, i))
            import jax.numpy as jnp
            wm = jnp.asarray(valid).astype(jnp.int32)[:, None]
            c = M.confusion_matrix(pred, jnp.asarray(b["seg"]), 13,
                                   weights=wm)
            cm = c if cm is None else cm + c
        _, miou = M.iou_from_confusion(cm)
        result["vote_miou"] = float(miou)
    return result


if __name__ == "__main__":
    main()
