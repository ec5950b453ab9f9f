"""End-to-end smoke + regression tests for the full model on tiny shapes
(CPU). Uses a small config so jit compiles fast: 128x192 canvas, resnet50,
few proposals."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lang2seg_tpu.config import Config
from lang2seg_tpu.data.synthetic import synthetic_batch, synthetic_test_batch
from lang2seg_tpu.engine.train_state import (create_train_state,
                                             make_train_step)
from lang2seg_tpu.models.network import Lang2Seg


def tiny_config(**model_kw) -> Config:
    cfg = Config()
    cfg.data.canvas_h = 128
    cfg.data.canvas_w = 192
    cfg.model.backbone = "resnet26"
    cfg.model.vocab_size = 100
    cfg.model.compute_dtype = "float32"
    cfg.model.normalize_response = True   # scratch training in tests
    cfg.train.grad_clip_norm = 10.0       # random-init grads are steep
    cfg.train.learning_rate = 1e-5
    cfg.train.rpn_pre_nms_top_n = 512
    cfg.train.rpn_post_nms_top_n = 128
    cfg.train.roi_batch_size = 32
    cfg.test.rpn_pre_nms_top_n = 256
    cfg.test.rpn_post_nms_top_n = 32
    for k, v in model_kw.items():
        setattr(cfg.model, k, v)
    return cfg


@pytest.fixture(scope="module")
def trained_step():
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 2, 4, seed=0).items()}
    return cfg, model, state, step, batch


def test_train_step_runs_and_losses_finite(trained_step):
    cfg, model, state, step, batch = trained_step
    new_state, losses = step(state, batch)
    for k, v in losses.items():
        val = float(v)
        assert np.isfinite(val), f"{k} not finite: {val}"
        assert val >= 0 or k == "total_loss"
    assert int(new_state.step) == 1
    expected = {"rpn_cross_entropy", "rpn_loss_box", "cross_entropy",
                "loss_box", "loss_mask", "total_loss"}
    assert expected <= set(losses.keys())


def test_train_step_updates_trainable_but_not_frozen(trained_step):
    cfg, model, state, step, batch = trained_step
    new_state, _ = step(state, batch)
    p0, p1 = state.params, new_state.params

    # frozen: conv1 and every BN stay exactly equal
    np.testing.assert_array_equal(
        np.asarray(p0["backbone"]["conv1"]["kernel"]),
        np.asarray(p1["backbone"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(p0["backbone"]["layer2"]["block0"]["bn1"]["scale"]),
        np.asarray(p1["backbone"]["layer2"]["block0"]["bn1"]["scale"]))
    np.testing.assert_array_equal(
        np.asarray(p0["backbone"]["layer1"]["block0"]["conv1"]["kernel"]),
        np.asarray(p1["backbone"]["layer1"]["block0"]["conv1"]["kernel"]))

    # trainable: rpn + layer2 conv + encoder move
    assert not np.array_equal(
        np.asarray(p0["rpn_head"]["rpn_conv"]["kernel"]),
        np.asarray(p1["rpn_head"]["rpn_conv"]["kernel"]))
    assert not np.array_equal(
        np.asarray(p0["backbone"]["layer2"]["block0"]["conv1"]["kernel"]),
        np.asarray(p1["backbone"]["layer2"]["block0"]["conv1"]["kernel"]))
    assert not np.array_equal(
        np.asarray(p0["encoder"]["embedding"]["embedding"]),
        np.asarray(p1["encoder"]["embedding"]["embedding"]))


def test_loss_decreases_over_steps(trained_step):
    cfg, model, state, step, batch = trained_step
    first = None
    s = state
    for i in range(8):
        s, losses = step(s, batch)
        if first is None:
            first = float(losses["total_loss"])
    last = float(losses["total_loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_test_forward_shapes(trained_step):
    cfg, model, state, step, batch = trained_step
    tb = {k: jnp.asarray(v)
          for k, v in synthetic_test_batch(cfg, 2, seed=1).items()}
    out = jax.jit(
        lambda p, b: model.apply({"params": p}, b,
                                 method=Lang2Seg.test_forward)
    )(state.params, tb)
    r = cfg.test.rpn_post_nms_top_n
    assert out["rois"].shape == (2, r, 4)
    assert out["cls_prob"].shape == (2, r, 81)
    assert out["bbox_pred"].shape == (2, r, 81 * 4)
    probs = np.asarray(out["cls_prob"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)

    # mask prediction on a chosen box
    boxes = jnp.asarray([[[10.0, 10.0, 80.0, 100.0]],
                         [[5.0, 5.0, 60.0, 60.0]]])
    labels = jnp.asarray([[3], [7]], jnp.int32)
    masks = model.apply({"params": state.params}, out["gated_conv"],
                        boxes, labels, method=Lang2Seg.predict_masks)
    assert masks.shape == (2, 1, 14, 14)
    mv = np.asarray(masks)
    assert (mv >= 0).all() and (mv <= 1).all()


def test_spatial_7f_response_variant():
    cfg = tiny_config(num_filters=7, response_gate="sigmoid",
                      use_response_loss=True)
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 1, 2, seed=3).items()}
    _, losses = step(state, batch)
    assert "loss_response" in losses
    assert np.isfinite(float(losses["total_loss"]))


def test_tail_matmul_parity(rng):
    """layer4 with the explicit-matmul conv impl == the nn.Conv lowering
    with identical params (the perf path must be math-identical)."""
    from lang2seg_tpu.models.resnet import ResNetC4
    m1 = ResNetC4(depth="resnet26", dtype=jnp.float32)
    m2 = ResNetC4(depth="resnet26", dtype=jnp.float32, tail_matmul=True)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = m1.init(jax.random.PRNGKey(0), img)["params"]
    crops = jnp.asarray(rng.randn(4, 7, 7, 1024).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        a = m1.apply({"params": params}, crops, method=ResNetC4.tail)
        b = m2.apply({"params": params}, crops, method=ResNetC4.tail)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_wire_format_parity():
    """uint8 images + bit-packed masks (the transfer-lean wire formats,
    cfg.data.wire_*) must produce the SAME losses as the float path when
    the content is identical: float batch = u8.astype(f32) - means."""
    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    b = synthetic_batch(cfg, 1, 2, seed=9)
    means = np.asarray(cfg.data.pixel_means_bgr, np.float32)
    u8 = np.clip(np.round(b["images"] + means), 0, 255).astype(np.uint8)

    wire = dict(b)
    wire["images"] = u8
    assert cfg.data.canvas_w % 8 == 0
    wire["gt_masks"] = np.packbits(b["gt_masks"] > 0, axis=-1)

    flt = dict(b)
    flt["images"] = u8.astype(np.float32) - means

    _, l_wire = step(state, {k: jnp.asarray(v) for k, v in wire.items()})
    _, l_flt = step(state, {k: jnp.asarray(v) for k, v in flt.items()})
    for k in l_flt:
        np.testing.assert_allclose(float(l_wire[k]), float(l_flt[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_tail_mosaic_parity(rng):
    """Mosaic tail (all crops packed into one large image with re-zeroed
    1-px gaps) == per-crop layer4 with identical params. BN affines are
    jittered so gap pixels would carry nonzero offsets — a missing gap
    re-zero before any 3x3 conv leaks between crops and fails this."""
    from lang2seg_tpu.models.resnet import ResNetC4
    m1 = ResNetC4(depth="resnet26", dtype=jnp.float32)
    m2 = ResNetC4(depth="resnet26", dtype=jnp.float32, tail_mosaic=True)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = m1.init(jax.random.PRNGKey(0), img)["params"]
    # jitter every param (BN means/biases included) away from the
    # zero-offset init that would mask gap leakage
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [l + 0.05 * jnp.asarray(rng.randn(*l.shape), l.dtype)
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    # 18 crops -> 5x4 grid with 2 padded zero cells (R > 16 engages mosaic)
    crops = jnp.asarray(rng.randn(18, 7, 7, 1024).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        a = m1.apply({"params": params}, crops, method=ResNetC4.tail)
        b = m2.apply({"params": params}, crops, method=ResNetC4.tail)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_pooling_mode_pool_variant():
    """POOLING_MODE='pool' end-to-end: ROI max-pool feeds the heads and
    the custom-vjp backward runs under grad (model/config.py:273)."""
    cfg = tiny_config()
    cfg.model.pooling_mode = "pool"
    model, tx, state = create_train_state(cfg)
    step = make_train_step(model, cfg, tx)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 1, 2, seed=5).items()}
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))
    assert not np.array_equal(
        np.asarray(state.params["rpn_head"]["rpn_conv"]["kernel"]),
        np.asarray(new_state.params["rpn_head"]["rpn_conv"]["kernel"]))


def test_test_forward_top_mode(trained_step):
    cfg, model, state, step, batch = trained_step
    import dataclasses
    cfg2 = tiny_config()
    cfg2.test.mode = "top"
    cfg2.test.rpn_top_n = 48
    model2 = Lang2Seg(cfg=cfg2)
    tb = {k: jnp.asarray(v)
          for k, v in synthetic_test_batch(cfg2, 1, seed=2).items()}
    out = model2.apply({"params": state.params}, tb,
                       method=Lang2Seg.test_forward)
    assert out["rois"].shape == (1, 48, 4)
    assert np.asarray(out["roi_valid"]).all()
    # top mode must return score-sorted proposals
    # (proposal scores descending by construction)


@pytest.mark.slow
def test_multi_step_matches_serial_steps(trained_step):
    """make_multi_train_step (K steps scanned in one dispatch) must be
    semantically identical to K single-step dispatches: same RNG chain,
    same per-group SGD, same losses. Tolerances allow the f32
    reassociation noise between the scan-fused and standalone
    executables (~1e-5 relative observed on CPU); the RNG-chain check
    is exact."""
    from lang2seg_tpu.engine.train_state import (make_multi_train_step,
                                                 make_optimizer,
                                                 stack_batches)
    cfg, model, state, step, _ = trained_step
    from lang2seg_tpu.engine.optimizer import partition_params
    trainable, _f = partition_params(state.params, cfg)
    # the config-selected optimizer: state.opt_state was initialized by
    # create_train_state, and the fused flat-buffer layout is
    # structurally incompatible with the per-leaf chain's state
    tx = make_optimizer(trainable, cfg)

    batches = [synthetic_batch(cfg, 1, 2, seed=100 + s) for s in range(2)]

    s_serial = state
    serial_losses = []
    for b in batches:
        s_serial, l = step(s_serial, {k: jnp.asarray(v)
                                      for k, v in b.items()})
        serial_losses.append({k: float(v) for k, v in l.items()})

    multi = make_multi_train_step(model, cfg, tx, donate=False)
    s_multi, ml = multi(state, stack_batches(batches))

    assert int(s_multi.step) == int(s_serial.step) == 2
    for k in serial_losses[0]:
        for j in range(2):
            np.testing.assert_allclose(float(ml[k][j]),
                                       serial_losses[j][k],
                                       rtol=5e-5, atol=1e-6)
    flat_a = jax.tree_util.tree_leaves_with_path(s_serial.params)
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(s_multi.params)}
    for p, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p))
    # RNG chain advanced identically
    assert np.array_equal(np.asarray(s_serial.rng),
                          np.asarray(s_multi.rng))
