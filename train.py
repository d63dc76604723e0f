#!/usr/bin/env python
"""Unified training CLI (replaces the lineage's per-task train_*.py trio).

Examples:
  python train.py --model pointnet2_cls_ssg --epoch 10 --batch_size 24
  python train.py --model pointnet2_part_seg_msg --npoint 2048 --epoch 5
  python train.py --model pointnet2_sem_seg --npoint 4096 --epoch 5

Flags mirror the reference scripts (SURVEY.md §1 L3: --model, --batch_size,
--epoch, --learning_rate, --npoint, --log_dir, ...); the task is inferred
from the model registry.
"""

import argparse

from mm3d_tpu.models import available
from mm3d_tpu.training.loop import TrainConfig, Trainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mm3d_tpu training")
    p.add_argument("--model", default="pointnet2_cls_ssg",
                   choices=sorted(available()))
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--epoch", type=int, default=10)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--npoint", type=int, default=None,
                   help="points per cloud (default: model's canonical)")
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    p.add_argument("--decay_rate", type=float, default=1e-4,
                   help="weight decay")
    p.add_argument("--lr_step", type=int, default=20)
    p.add_argument("--lr_gamma", type=float, default=0.7)
    p.add_argument("--normal", action="store_true",
                   help="use normals as extra channels")
    p.add_argument("--num_class", type=int, default=40)
    p.add_argument("--seg_classes", type=int, default=13,
                   help="semseg/fusion_semseg head size (lineage S3DIS "
                        "default 13; custom trees with more label "
                        "classes must set this)")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--run_name", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_size", type=int, default=512)
    p.add_argument("--test_size", type=int, default=128)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--torch_ckpt", default=None, metavar="PATH",
                   help="initialize weights from a lineage PyTorch .pth "
                        "checkpoint (canonical state_dict layout; see "
                        "mm3d_tpu.utils.torch_import) before training")
    p.add_argument("--no_checkpoint", action="store_true")
    p.add_argument("--bn_momentum", type=float, default=0.1,
                   help="initial BN running-stat momentum (the schedule "
                        "halves it every 20 epochs). Short runs converge "
                        "eval-mode much faster with 0.5 — running vars "
                        "start at 1.0 and true activation variances are "
                        "~1e-3")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = mixed-precision training (bf16 "
                        "compute, f32 master weights); ~1.7x step "
                        "throughput on v5e")
    p.add_argument("--bn_refresh_steps", type=int, default=None,
                   help="forward-only BN-stat re-estimation passes "
                        "before each eval (default: 8 in bf16 mode, 0 "
                        "in fp32 — see TrainConfig.bn_refresh_steps)")
    p.add_argument("--impl", default="auto", choices=["auto", "jax", "pallas"],
                   help="geometry-op implementation")
    p.add_argument("--fps_random_start", action="store_true",
                   help="lineage-parity random FPS seed per train step "
                        "(torch seeds FPS with randint during training); "
                        "eval stays deterministic")
    add_dataset_args(p)
    return p.parse_args(argv)


def add_dataset_args(p):
    """--dataset/--data_root group shared by train.py and test.py."""
    from mm3d_tpu.data.loaders import REAL_DATASETS
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", *REAL_DATASETS],
                   help="'synthetic' generates data in memory; the rest "
                        "read the canonical on-disk formats from "
                        "--data_root (SURVEY.md §2.2)")
    p.add_argument("--data_root", default=None,
                   help="dataset directory (required unless --dataset "
                        "synthetic)")
    p.add_argument("--test_area", type=int, default=5,
                   help="S3DIS held-out area (the standard protocol "
                        "evaluates on Area 5)")
    p.add_argument("--uniform_sample", action="store_true",
                   help="ModelNet: FPS-downsample each shape at load "
                        "time instead of truncating (the reference's "
                        "--use_uniform_sample)")


def build_cli_datasets(a, task, npoint, test_only=False):
    """Map --dataset/--data_root to (train_ds, test_ds); (None, None)
    for synthetic (Trainer builds its own).  test_only skips the train
    split (test.py never touches it)."""
    if a.dataset == "synthetic":
        return None, None
    if not a.data_root:
        raise SystemExit(f"--dataset {a.dataset} requires --data_root")
    from mm3d_tpu.data.loaders import build_real_datasets
    train_ds, test_ds = build_real_datasets(
        a.dataset, a.data_root, task, npoints=npoint, normals=a.normal,
        test_area=a.test_area, uniform_sample=a.uniform_sample,
        splits=("test",) if test_only else ("train", "test"))
    # class-count guard: a tree with MORE classes than --num_class
    # would emit labels past the head and XLA's clamping gather turns
    # that into silently-wrong metrics rather than an error.  Fewer
    # classes than the head is legitimate (e.g. evaluating a 40-class
    # checkpoint on a subset tree) — warn, don't block.
    ds = train_ds if train_ds is not None else test_ds
    base = getattr(ds, "base", ds)  # multimodal wraps the point set
    classes = getattr(base, "classes", None)
    if classes is not None and len(classes) > a.num_class:
        raise SystemExit(
            f"--data_root has {len(classes)} classes but --num_class is "
            f"{a.num_class}; pass --num_class {len(classes)}")
    if classes is not None and len(classes) < a.num_class:
        print(f"[mm3d] note: tree has {len(classes)} classes, head has "
              f"{a.num_class} (extra logits unused)")
    return train_ds, test_ds


def load_torch_into_trainer(trainer, path):
    """Replace the trainer's params/batch_stats with a lineage ``.pth``
    (canonical torch state_dict), replicated over the trainer's mesh.
    Shared by train.py (fine-tune migrated weights) and test.py
    (evaluate a migrated checkpoint directly)."""
    import jax
    from mm3d_tpu.parallel import replicated_sharding
    from mm3d_tpu.training.steps import _split_variables
    from mm3d_tpu.utils.torch_import import load_torch_checkpoint
    v = load_torch_checkpoint(trainer.cfg.model,
                              _split_variables(trainer.state), path)
    v = jax.device_put(v, replicated_sharding(trainer.mesh))
    trainer.state = trainer.state.replace(
        params=v["params"], batch_stats=v["batch_stats"])
    trainer.log.info("imported lineage torch checkpoint %s", path)


def main(argv=None):
    a = parse_args(argv)
    if a.torch_ckpt and a.resume:
        raise SystemExit("--torch_ckpt and --resume are mutually "
                         "exclusive (one set of weights must win)")
    from mm3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from mm3d_tpu import ops
    ops.set_impl(a.impl)
    from mm3d_tpu.models import get_model
    spec = get_model(a.model)
    cfg = TrainConfig(
        model=a.model, epochs=a.epoch, batch_size=a.batch_size,
        npoint=a.npoint or spec.default_npoint,
        learning_rate=a.learning_rate, optimizer=a.optimizer,
        weight_decay=a.decay_rate, lr_step=a.lr_step, lr_gamma=a.lr_gamma,
        normal_channel=a.normal, num_class=a.num_class,
        seg_classes=a.seg_classes, seed=a.seed,
        log_dir=a.log_dir, run_name=a.run_name, train_size=a.train_size,
        test_size=a.test_size, resume=a.resume,
        checkpoint=not a.no_checkpoint, dtype=a.dtype,
        bn_init_momentum=a.bn_momentum,
        bn_refresh_steps=a.bn_refresh_steps,
        fps_random_start=a.fps_random_start)
    train_ds, test_ds = build_cli_datasets(a, spec.task,
                                           a.npoint or spec.default_npoint)
    trainer = Trainer(cfg, train_ds=train_ds, test_ds=test_ds)
    try:
        if a.torch_ckpt:
            load_torch_into_trainer(trainer, a.torch_ckpt)
        result = trainer.fit()
        trainer.log.info("final: %s", result)
        return result
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
