"""Torch-checkpoint converter parity tests: run the same weights through
torch ops and our flax modules and compare outputs. These catch
layout/permutation mistakes that would silently destroy checkpoint
parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.engine import convert  # noqa: E402


def test_conv_kernel_layout(rng):
    import torch.nn.functional as F
    w = rng.randn(8, 3, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    x = rng.randn(1, 3, 10, 12).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), padding=1).numpy()
    # ours: NHWC lax conv with converted kernel. XLA's CPU conv defaults
    # to a low-precision algorithm (~2e-3 rel error) — request HIGHEST
    # for the comparison.
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(convert._conv(w)),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_convtranspose_kernel_layout(rng):
    """torch ConvTranspose2d is the gradient of a conv (kernel applied
    spatially flipped); flax nn.ConvTranspose(transpose_kernel=False) — the
    mask head's mask_up, heads.py — runs a plain fractionally-strided conv.
    The converter must flip the spatial axes or every converted deconv
    kernel arrives rotated 180 deg per 2x2 block."""
    import flax.linen as nn
    ci, co = 6, 4
    w = rng.randn(ci, co, 2, 2).astype(np.float32)
    b = rng.randn(co).astype(np.float32)
    x = rng.randn(2, ci, 5, 7).astype(np.float32)
    m = torch.nn.ConvTranspose2d(ci, co, 2, stride=2)
    m.weight.data = torch.from_numpy(w)
    m.bias.data = torch.from_numpy(b)
    ref = m(torch.from_numpy(x)).detach().numpy()    # (2, co, 10, 14)

    mod = nn.ConvTranspose(co, (2, 2), strides=(2, 2))
    params = {"kernel": jnp.asarray(convert._convT(w).copy()),
              "bias": jnp.asarray(b)}
    with jax.default_matmul_precision("float32"):
        out = mod.apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_frozen_bn_matches_torch_eval(rng):
    from lang2seg_tpu.models.resnet import FrozenBatchNorm
    bn = torch.nn.BatchNorm2d(6)
    bn.weight.data = torch.from_numpy(rng.rand(6).astype(np.float32) + 0.5)
    bn.bias.data = torch.from_numpy(rng.randn(6).astype(np.float32))
    bn.running_mean = torch.from_numpy(rng.randn(6).astype(np.float32))
    bn.running_var = torch.from_numpy(rng.rand(6).astype(np.float32) + 0.1)
    bn.eval()
    x = rng.randn(2, 6, 4, 5).astype(np.float32)
    ref = bn(torch.from_numpy(x)).detach().numpy()

    sd = {"b.weight": bn.weight.detach().numpy(),
          "b.bias": bn.bias.detach().numpy(),
          "b.running_mean": bn.running_mean.numpy(),
          "b.running_var": bn.running_var.numpy()}
    params = convert._bn(sd, "b")
    mod = FrozenBatchNorm(6)
    out = mod.apply({"params": params},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_bilstm_encoder_matches_torch(rng):
    """Full RNNEncoder vs torch Embedding+Linear+packed bi-LSTM with the
    same weights and variable lengths (reference lang_encoder.py:27-82)."""
    from lang2seg_tpu.models.lang_encoder import RNNEncoder
    vocab, emb, vec, hid = 30, 16, 12, 10
    t_embed = torch.nn.Embedding(vocab, emb)
    t_mlp = torch.nn.Linear(emb, vec)
    t_lstm = torch.nn.LSTM(vec, hid, 1, batch_first=True,
                           bidirectional=True)

    labels = np.zeros((3, 7), np.int64)
    lengths = [7, 4, 2]
    for i, ln in enumerate(lengths):
        labels[i, :ln] = rng.randint(1, vocab, ln)

    with torch.no_grad():
        x = torch.relu(t_mlp(t_embed(torch.from_numpy(labels))))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, lengths, batch_first=True)
        out, (hn, cn) = t_lstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(out,
                                                        batch_first=True)
        ref_out = out.numpy()
        ref_hidden = hn.transpose(0, 1).reshape(3, -1).numpy()

    sd = {"rnn_encoder.embedding.weight": t_embed.weight.detach().numpy(),
          "rnn_encoder.mlp.0.weight": t_mlp.weight.detach().numpy(),
          "rnn_encoder.mlp.0.bias": t_mlp.bias.detach().numpy()}
    for suf, ours in (("", "lstm_fwd"), ("_reverse", "lstm_bwd")):
        sd[f"rnn_encoder.rnn.weight_ih_l0{suf}"] = getattr(
            t_lstm, f"weight_ih_l0{suf}").detach().numpy()
        sd[f"rnn_encoder.rnn.weight_hh_l0{suf}"] = getattr(
            t_lstm, f"weight_hh_l0{suf}").detach().numpy()
        sd[f"rnn_encoder.rnn.bias_ih_l0{suf}"] = getattr(
            t_lstm, f"bias_ih_l0{suf}").detach().numpy()
        sd[f"rnn_encoder.rnn.bias_hh_l0{suf}"] = getattr(
            t_lstm, f"bias_hh_l0{suf}").detach().numpy()
    params = convert.convert_lang_encoder(sd)

    enc = RNNEncoder(vocab_size=vocab, word_embedding_size=emb,
                     word_vec_size=vec, hidden_size=hid,
                     bidirectional=True, input_dropout_p=0.0)
    with jax.default_matmul_precision("float32"):
        out, hidden, _ = enc.apply({"params": params},
                                   jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, rtol=1e-3,
                               atol=1e-4)


def test_rpn_cls_channel_permutation(rng):
    """torch packs rpn cls scores class-major and recovers per-anchor
    2-way scores via a (2, A*H, W) view (network.py:239); our layout is
    (H, W, A, 2). With the converter's permutation both must agree."""
    a, h, w = 3, 4, 5
    wt = rng.randn(2 * a, 16, 1, 1).astype(np.float32)
    bt = rng.randn(2 * a).astype(np.float32)
    x = rng.randn(1, 16, h, w).astype(np.float32)
    import torch.nn.functional as F
    score = F.conv2d(torch.from_numpy(x), torch.from_numpy(wt),
                     torch.from_numpy(bt))           # (1, 2A, H, W)
    resh = score.view(1, 2, a * h, w)                # torch trick
    # positive-class score for anchor ai at (y, x):
    ref = np.zeros((h, w, a), np.float32)
    r = resh.numpy()
    for ai in range(a):
        for y in range(h):
            ref[y, :, ai] = r[0, 1, ai * h + y, :]

    conv = convert.convert_rpn(
        {"rpn_net.weight": rng.randn(16, 16, 3, 3).astype(np.float32),
         "rpn_net.bias": np.zeros(16, np.float32),
         "rpn_cls_score_net.weight": wt, "rpn_cls_score_net.bias": bt,
         "rpn_bbox_pred_net.weight": rng.randn(4 * a, 16, 1, 1
                                               ).astype(np.float32),
         "rpn_bbox_pred_net.bias": np.zeros(4 * a, np.float32)},
        num_anchors=a)
    kc = jnp.asarray(conv["rpn_cls"]["kernel"])      # (1,1,16,2A ours)
    bc = jnp.asarray(conv["rpn_cls"]["bias"])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), kc, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + bc
    ours = np.asarray(out).reshape(h, w, a, 2)[..., 1]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_vgg_fc6_flatten_permutation(rng):
    w6 = rng.randn(8, 512 * 49).astype(np.float32)
    sd = {"vgg.features.0.weight": rng.randn(64, 3, 3, 3).astype(np.float32),
          "vgg.features.0.bias": np.zeros(64, np.float32)}
    for idx in (2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28):
        c_out = {2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256}.get(idx, 512)
        c_in = {2: 64, 5: 64, 7: 128, 10: 128, 12: 256, 14: 256,
                17: 256}.get(idx, 512)
        sd[f"vgg.features.{idx}.weight"] = rng.randn(
            c_out, c_in, 3, 3).astype(np.float32)
        sd[f"vgg.features.{idx}.bias"] = np.zeros(c_out, np.float32)
    sd["vgg.classifier.0.weight"] = w6
    sd["vgg.classifier.0.bias"] = np.zeros(8, np.float32)
    sd["vgg.classifier.3.weight"] = rng.randn(8, 8).astype(np.float32)
    sd["vgg.classifier.3.bias"] = np.zeros(8, np.float32)
    out = convert.convert_vgg_backbone(sd)

    pool5 = rng.randn(512, 7, 7).astype(np.float32)   # torch CHW
    ref = w6 @ pool5.reshape(-1)
    ours = pool5.transpose(1, 2, 0).reshape(-1) @ out["fc6"]["kernel"][:, :8]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
