"""Jitted train/eval step factories (mesh-aware SPMD).

One compiled step per run: augmentation, forward, loss, backward,
optimizer update and metric reductions all live inside a single jit
(BASELINE.json:5 — no host round-trips in the hot loop).  With a mesh,
the batch axis is sharded over DATA_AXIS and params are replicated; XLA
inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from mm3d_tpu.data import augment as aug
from mm3d_tpu.training.state import TrainState, apply_updates
from mm3d_tpu.utils import metrics as M


def _split_variables(state: TrainState):
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def _apply_train(model, state, key, args, bn_momentum,
                 fps_random_start: bool = False):
    variables = _split_variables(state)
    # False, not []: flax returns (out, {}) for mutable=[] too, which
    # would mis-unpack in the no-batch-stats branch below
    mutable = ["batch_stats"] if state.batch_stats else False
    rngs = {"dropout": key}
    if fps_random_start:
        # lineage-parity random-start FPS: an extra "fps" RNG stream the
        # SA blocks consume per call (models/pointnet2.py _fps_start)
        rngs["dropout"], rngs["fps"] = jax.random.split(key)
    out = model.apply(variables, *args, train=True,
                      bn_momentum=bn_momentum,
                      rngs=rngs, mutable=mutable)
    if mutable:
        (log_probs, aux), mut = out
        return log_probs, aux, mut.get("batch_stats", state.batch_stats)
    log_probs, aux = out
    return log_probs, aux, state.batch_stats


def make_train_step(model, loss_fn, tx, task: str,
                    augment_names: Sequence[str] = (),
                    num_category: int = 16,
                    class_weights=None,
                    donate: bool = True,
                    fps_random_start: bool = False) -> Callable:
    """Returns jitted (state, batch, lr, bn_momentum, key) -> (state, metrics).

    Batch formats: classification (points, label);
    partseg (points, cat, seg); semseg (points, seg).
    """

    def step(state: TrainState, batch, lr, bn_momentum, key):
        k_aug, k_drop = jax.random.split(jax.random.fold_in(key, state.step))
        points = batch["points"] if isinstance(batch, dict) else batch[0]
        fusion = task in ("fusion_cls", "fusion_semseg")
        if augment_names and not fusion:
            points = aug.augment_batch(k_aug, points, tuple(augment_names))

        if task == "classification":
            target = batch[1]
            args = (points,)
        elif task == "partseg":
            cat, target = batch[1], batch[2]
            onehot = jax.nn.one_hot(cat, num_category, dtype=points.dtype)
            args = (points, onehot)
        elif task == "semseg":
            target = batch[1]
            args = (points,)
        elif fusion:
            target = batch["label"] if task == "fusion_cls" else batch["seg"]
            R = batch["R"]
            if augment_names:
                # calib-aware pipeline: rotations co-rotate the
                # extrinsics so the point→pixel projection is invariant
                points, R = aug.augment_fusion_batch(
                    k_aug, points, R, tuple(augment_names))
            args = (points, batch["image"], batch["K"], R, batch["t"])
        else:
            raise ValueError(task)

        def loss_of(params):
            st = state.replace(params=params)
            log_probs, aux, new_bs = _apply_train(
                model, st, k_drop, args, bn_momentum,
                fps_random_start=fps_random_start)
            loss = loss_fn(log_probs, target, aux, weight=class_weights)
            return loss, (log_probs, new_bs)

        (loss, (log_probs, new_bs)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, tx, lr).replace(
            batch_stats=new_bs)
        metrics = {"loss": loss, "accuracy": M.accuracy(log_probs, target)}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_bn_refresh_step(model, task: str,
                         augment_names: Sequence[str] = (),
                         num_category: int = 16) -> Callable:
    """Returns jitted (state, batch, key) -> new batch_stats.

    A forward-only train-mode pass that updates ONLY the BN running
    statistics (params/optimizer untouched), at momentum 0.5.  Used to
    re-estimate stats right before evaluation in bf16 mixed-precision
    mode: with the lineage's low default momentum the running stats lag
    the (slightly drifting) bf16 activation statistics, and eval-mode
    accuracy decays even though the weights are fine — measured on the
    30-epoch synthetic benchmark: eval 55% as-trained vs 95% after ten
    refresh passes, train accuracy unchanged.  fp32 training does not
    need it and keeps exact lineage behavior (Trainer gates this on
    dtype=bfloat16 / TrainConfig.bn_refresh_steps).
    """

    def step(state: TrainState, batch, key):
        k_aug, k_drop = jax.random.split(key)
        points = batch["points"] if isinstance(batch, dict) else batch[0]
        fusion = task in ("fusion_cls", "fusion_semseg")
        if augment_names and not fusion:
            points = aug.augment_batch(k_aug, points, tuple(augment_names))
        if task == "partseg":
            cat = batch[1]
            onehot = jax.nn.one_hot(cat, num_category, dtype=points.dtype)
            args = (points, onehot)
        elif fusion:
            R = batch["R"]
            if augment_names:
                points, R = aug.augment_fusion_batch(
                    k_aug, points, R, tuple(augment_names))
            args = (points, batch["image"], batch["K"], R, batch["t"])
        else:
            args = (points,)
        _, _, new_bs = _apply_train(model, state, k_drop, args, 0.5)
        return new_bs

    return jax.jit(step)


def make_eval_step(model, loss_fn, task: str, num_classes: int,
                   num_category: int = 16,
                   part_start=None, part_count=None,
                   max_parts: int = 6, class_weights=None) -> Callable:
    """Returns jitted (state, batch[, valid]) -> per-batch metric pieces.

    classification -> dict(loss, correct, cm [C,C])
    partseg       -> dict(loss, correct, ious [B], cats [B], valid [B])
    semseg        -> dict(loss, correct, cm [C,C])

    `valid` is an optional [B] bool row mask (full-test-set eval pads the
    final batch; padded rows are wrap-duplicates and must not count —
    ADVICE round 1).  When the loss accepts `row_mask` (the canonical
    losses do), padded rows are masked out of `loss` too; otherwise the
    unmasked loss is kept as a diagnostic.
    """
    import inspect
    try:
        _mask_loss = "row_mask" in inspect.signature(loss_fn).parameters
    except (TypeError, ValueError):
        _mask_loss = False

    def step(state: TrainState, batch, valid=None):
        variables = _split_variables(state)
        points = batch["points"] if isinstance(batch, dict) else batch[0]
        B = points.shape[0]
        vm = (jnp.ones((B,), jnp.int32) if valid is None
              else valid.astype(jnp.int32))
        lkw = {"row_mask": vm} if _mask_loss else {}
        if class_weights is not None:
            # keep eval_loss comparable with the weighted train loss
            # (code-review r5: it was silently unweighted)
            lkw["weight"] = class_weights

        def scalar_metrics(log_probs, target, aux):
            # target [B] (cls) or [B,N] (per-point); mask rows by vm
            pred = jnp.argmax(log_probs, -1).astype(jnp.int32)
            wm = vm.reshape((B,) + (1,) * (target.ndim - 1))
            hit = (pred == target).astype(jnp.int32) * wm
            per_row = target.size // B
            return pred, {
                "loss": loss_fn(log_probs, target, aux, **lkw),
                "correct": jnp.sum(hit),
                "count": jnp.sum(vm) * per_row,
                "cm": M.confusion_matrix(pred, target, num_classes,
                                         weights=wm),
            }

        if task in ("fusion_cls", "fusion_semseg"):
            target = batch["label" if task == "fusion_cls" else "seg"]
            log_probs, aux = model.apply(
                variables, points, batch["image"], batch["K"], batch["R"],
                batch["t"], train=False)
            return scalar_metrics(log_probs, target, aux)[1]
        if task == "classification":
            target = batch[1]
            log_probs, aux = model.apply(variables, points, train=False)
            return scalar_metrics(log_probs, target, aux)[1]
        if task == "partseg":
            cat, target = batch[1], batch[2]
            onehot = jax.nn.one_hot(cat, num_category, dtype=points.dtype)
            log_probs, aux = model.apply(variables, points, onehot,
                                         train=False)
            ps = part_start[cat]
            pc = part_count[cat]
            pred = M.masked_part_argmax(log_probs, ps, pc)
            ious = M.shape_ious(pred, target, ps, pc, max_parts)
            hit = (pred == target).astype(jnp.int32) * vm[:, None]
            return {
                "loss": loss_fn(log_probs, target, aux, **lkw),
                "correct": jnp.sum(hit),
                "count": jnp.sum(vm) * target.shape[1],
                "ious": ious,
                "cats": cat,
                "valid": vm,
            }
        if task == "semseg":
            target = batch[1]
            log_probs, aux = model.apply(variables, points, train=False)
            return scalar_metrics(log_probs, target, aux)[1]
        raise ValueError(task)

    return jax.jit(step)


def make_vote_partseg_step(model, num_votes: int, num_category: int,
                           part_start, part_count) -> Callable:
    """Part-seg vote ensembling: the lineage's test_partseg averages
    probabilities over re-sampled passes; the on-device analog shuffles
    the point order per vote (changing the FPS seed point and therefore
    the groupings), un-shuffles the per-point probabilities, and
    averages, then takes the category-masked argmax."""

    def step(state: TrainState, points, cat, key):
        variables = _split_variables(state)
        onehot = jax.nn.one_hot(cat, num_category, dtype=points.dtype)

        def probs_of(pts):
            log_probs, _ = model.apply(variables, pts, onehot, train=False)
            return jnp.exp(log_probs)

        probs = _shuffle_vote_probs(probs_of, points, num_votes, key)
        ps, pc = part_start[cat], part_count[cat]
        return M.masked_part_argmax(jnp.log(probs + 1e-12), ps, pc)

    return jax.jit(step)


def _shuffle_vote_probs(probs_of, points, num_votes, key):
    """Shared shuffle-vote accumulator (partseg + fusion_semseg):
    permuting the point order changes the FPS seed point and therefore
    the groupings; per-point probabilities are un-shuffled and summed
    over `num_votes` passes (vote 0 = the original order)."""
    B, N = points.shape[:2]

    def one_vote(i, acc):
        k = jax.random.fold_in(key, i)
        perm = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
            jax.random.split(k, B))  # [B,N]
        shuffled = jnp.take_along_axis(points, perm[..., None], axis=1)
        p = probs_of(shuffled)
        inv = jnp.argsort(perm, axis=1)
        return acc + jnp.take_along_axis(p, inv[..., None], axis=1)

    return jax.lax.fori_loop(1, num_votes, one_vote, probs_of(points))


def make_vote_fusion_cls_step(model, num_votes: int = 3) -> Callable:
    """Vote ensembling for the multimodal classifier (config 4): the
    lineage's rotated-pass averaging applied to the point branch.  Each
    vote rotates the cloud about Y and compensates the extrinsics
    (cam = R·x = (R·rotᵀ)·(rot·x), so R' = R @ rotᵀ) — the point→pixel
    projection and the sampled pixel features are invariant; only the
    point trunk sees a different pose."""

    def step(state: TrainState, points, image, K, R, t, key):
        variables = _split_variables(state)

        def probs_of(pts, Rv):
            log_probs, _ = model.apply(variables, pts, image, K, Rv, t,
                                       train=False)
            return jnp.exp(log_probs)

        def one_vote(i, acc):
            k = jax.random.fold_in(key, i)
            angle = jax.random.uniform(k, (points.shape[0],)) * 2.0 * jnp.pi
            rot = aug._rot_y(angle)
            # rotate normals (channels 3:6) with the xyz, matching
            # make_vote_eval_step: FusionCls(normal_channel=True) votes
            # would otherwise feed geometrically inconsistent normals
            pts = aug._apply_rot(points, rot, True)
            Rv = jnp.einsum("bij,bkj->bik", R, rot,
                            precision=jax.lax.Precision.HIGHEST)
            return acc + probs_of(pts, Rv)

        probs = jax.lax.fori_loop(1, num_votes, one_vote, probs_of(points, R))
        return jnp.argmax(probs, -1).astype(jnp.int32)

    return jax.jit(step)


def make_vote_fusion_semseg_step(model, num_votes: int = 3) -> Callable:
    """Vote ensembling for per-point multimodal segmentation (config 5):
    shuffle-votes like part-seg — permuting the point order changes the
    FPS seed point and therefore the groupings; probabilities are
    un-shuffled and averaged.  The image branch and the per-point
    projection are order-invariant, so no calib compensation is needed."""

    def step(state: TrainState, points, image, K, R, t, key):
        variables = _split_variables(state)

        def probs_of(pts):
            log_probs, _ = model.apply(variables, pts, image, K, R, t,
                                       train=False)
            return jnp.exp(log_probs)

        probs = _shuffle_vote_probs(probs_of, points, num_votes, key)
        return jnp.argmax(probs, -1).astype(jnp.int32)

    return jax.jit(step)


def make_vote_eval_step(model, num_votes: int = 3) -> Callable:
    """Vote ensembling for classification eval (the lineage's test-time
    trick): average probabilities over `num_votes` randomly Y-rotated
    passes — fully on device, one jit."""

    def step(state: TrainState, points, key):
        variables = _split_variables(state)

        def one_vote(i, acc):
            k = jax.random.fold_in(key, i)
            # rotate normals with the xyz when the model carries them
            # (channels 3:6) — stale normals would feed geometrically
            # inconsistent votes
            rotated = aug.rotate_point_cloud(k, points,
                                             rotate_normals=True)
            log_probs, _ = model.apply(variables, rotated, train=False)
            return acc + jnp.exp(log_probs)

        # vote 0 uses the unrotated cloud, like the reference protocol
        log_probs0, _ = model.apply(variables, points, train=False)
        probs = jax.lax.fori_loop(1, num_votes, one_vote,
                                  jnp.exp(log_probs0))
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    return jax.jit(step)
