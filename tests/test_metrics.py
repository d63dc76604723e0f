"""Metric reductions vs hand-computed numpy expectations."""

import jax.numpy as jnp
import numpy as np

from mm3d_tpu.utils import metrics as M


def test_accuracy_and_confusion():
    logp = jnp.log(jnp.array([
        [0.8, 0.1, 0.1], [0.1, 0.8, 0.1], [0.1, 0.1, 0.8], [0.8, 0.1, 0.1]]))
    t = jnp.array([0, 1, 0, 2])
    assert float(M.accuracy(logp, t)) == 0.5
    cm = np.asarray(M.confusion_matrix(jnp.argmax(logp, -1), t, 3))
    assert cm.sum() == 4
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[0, 2] == 1 and cm[2, 0] == 1


def test_per_class_accuracy_ignores_absent():
    cm = jnp.array([[3, 1, 0], [0, 0, 0], [1, 0, 1]])
    # class0 recall 0.75, class1 absent, class2 recall 0.5 -> 0.625
    np.testing.assert_allclose(float(M.per_class_accuracy(cm)), 0.625)


def test_iou_from_confusion():
    cm = jnp.array([[2, 1], [1, 2]])
    iou, miou = M.iou_from_confusion(cm)
    np.testing.assert_allclose(np.asarray(iou), [0.5, 0.5])
    np.testing.assert_allclose(float(miou), 0.5)


def test_masked_part_argmax_restricts_to_category():
    logp = jnp.zeros((1, 4, 6)).at[:, :, 5].set(10.0)  # global winner = 5
    start = jnp.array([2], jnp.int32)
    count = jnp.array([2], jnp.int32)  # valid parts {2,3}
    pred = M.masked_part_argmax(logp, start, count)
    assert set(np.asarray(pred).ravel()) <= {2, 3}


def test_shape_ious_protocol():
    # 1 shape, parts {0,1}, 4 points
    pred = jnp.array([[0, 0, 1, 1]])
    seg = jnp.array([[0, 1, 1, 1]])
    start = jnp.array([0], jnp.int32)
    count = jnp.array([2], jnp.int32)
    iou = M.shape_ious(pred, seg, start, count, max_parts=2)
    # part0: inter 1, union 2 -> 0.5 ; part1: inter 2, union 3 -> 2/3
    np.testing.assert_allclose(float(iou[0]), (0.5 + 2 / 3) / 2, rtol=1e-6)
    # empty-union part counts as IoU 1
    pred2 = jnp.array([[0, 0, 0, 0]])
    seg2 = jnp.array([[0, 0, 0, 0]])
    start2 = jnp.array([0], jnp.int32)
    count2 = jnp.array([2], jnp.int32)
    iou2 = M.shape_ious(pred2, seg2, start2, count2, max_parts=2)
    np.testing.assert_allclose(float(iou2[0]), 1.0)


def test_partseg_host_aggregation():
    ious = np.array([0.5, 1.0, 0.2])
    cats = np.array([0, 0, 2])
    out = M.partseg_metrics_host(ious, cats, num_categories=16)
    np.testing.assert_allclose(out["instance_miou"], ious.mean())
    np.testing.assert_allclose(out["class_miou"], (0.75 + 0.2) / 2)


def test_loss_row_mask_excludes_padded_rows():
    """eval_loss pad masking (VERDICT r3 item 7): the canonical losses
    accept row_mask, and a masked batch scores exactly like the valid
    subset alone — for plain NLL, class-weighted NLL, and the
    orthogonality-regularized pointnet_loss."""
    import jax
    import jax.numpy as jnp
    from mm3d_tpu.models.pointnet import (nll_loss, pointnet_loss,
                                          feature_transform_regularizer)
    rng = np.random.RandomState(0)
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(6, 5).astype(np.float32)))
    tgt = jnp.asarray(rng.randint(0, 5, 6))
    mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.int32)
    np.testing.assert_allclose(
        nll_loss(lp, tgt, row_mask=mask), nll_loss(lp[:4], tgt[:4]),
        rtol=1e-6)
    w = jnp.asarray(rng.rand(5).astype(np.float32)) + 0.1
    np.testing.assert_allclose(
        nll_loss(lp, tgt, weight=w, row_mask=mask),
        nll_loss(lp[:4], tgt[:4], weight=w), rtol=1e-6)
    # per-point targets [B, N]
    lp2 = jax.nn.log_softmax(
        jnp.asarray(rng.randn(6, 7, 5).astype(np.float32)))
    tgt2 = jnp.asarray(rng.randint(0, 5, (6, 7)))
    np.testing.assert_allclose(
        nll_loss(lp2, tgt2, row_mask=mask), nll_loss(lp2[:4], tgt2[:4]),
        rtol=1e-6)
    # pointnet_loss incl. the regularizer term
    tf = jnp.asarray(rng.randn(6, 3, 3).astype(np.float32))
    np.testing.assert_allclose(
        pointnet_loss(lp, tgt, {"trans_feat": tf}, row_mask=mask),
        pointnet_loss(lp[:4], tgt[:4], {"trans_feat": tf[:4]}), rtol=1e-6)
    # no mask == all-ones mask (the default path is unchanged)
    np.testing.assert_allclose(
        feature_transform_regularizer(tf),
        feature_transform_regularizer(tf, row_mask=jnp.ones(6)), rtol=1e-6)
