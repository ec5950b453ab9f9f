"""Full-network torch <-> JAX forward parity.

A fresh torch re-implementation of the reference baseline network's test
path (nets/network.py:458-642: ResNet-C4 head -> bi-LSTM language encoder
-> dynamic-filter gating -> RPN -> affine-grid crop -> layer4 tail ->
cls/bbox/mask heads; backbone nets/resnet_v1.py:75-190 caffe-style
bottlenecks) is random-initialized, its state_dict is converted with
engine/convert.py, and every stage's output is compared against our flax
model at <=1e-3. This pins checkpoint-conversion parity for the real
pretrained weights (res101_mask_rcnn_iter_1250000.pth et al.), which this
environment cannot download.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lang2seg_tpu.engine import convert  # noqa: E402
from lang2seg_tpu.engine.checkpoint import tolerant_restore_params  # noqa: E402
from lang2seg_tpu.engine.train_state import create_model, init_params  # noqa: E402
from lang2seg_tpu.models.network import Lang2Seg  # noqa: E402
from tests.test_network import tiny_config  # noqa: E402

A = 12  # anchors per cell: scales (4,8,16,32) x ratios (0.5,1,2)


class TBottleneck(tnn.Module):
    """Caffe-style bottleneck: stride on the FIRST 1x1 conv
    (resnet_v1.py:80)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride=stride,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + r)


class TResNet(tnn.Module):
    def __init__(self, blocks=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.inplanes = 64
        self.layer1 = self._make(64, blocks[0], 1)
        self.layer2 = self._make(128, blocks[1], 2)
        self.layer3 = self._make(256, blocks[2], 2)
        self.layer4 = self._make(512, blocks[3], 1)   # C4: stride 1 tail

    def _make(self, planes, n, stride):
        down = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [TBottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        for _ in range(1, n):
            layers.append(TBottleneck(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def head(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        return self.layer3(self.layer2(self.layer1(x)))


class TRefNet(tnn.Module):
    """State-dict twin of the reference baseline net (module names match
    the reference checkpoints so convert.py maps them)."""

    def __init__(self, vocab, hidden=512):
        super().__init__()
        self.resnet = TResNet()
        self.rnn_encoder = tnn.Module()
        self.rnn_encoder.embedding = tnn.Embedding(vocab, 512)
        self.rnn_encoder.mlp = tnn.Sequential(tnn.Linear(512, 512),
                                              tnn.ReLU())
        self.rnn_encoder.rnn = tnn.LSTM(512, hidden, 1, batch_first=True,
                                        bidirectional=True)
        self.dynamic_fc = tnn.Linear(2 * hidden, 1024)
        self.rpn_net = tnn.Conv2d(1024, 512, 3, padding=1)
        self.rpn_cls_score_net = tnn.Conv2d(512, 2 * A, 1)
        self.rpn_bbox_pred_net = tnn.Conv2d(512, 4 * A, 1)
        self.cls_score_net = tnn.Linear(2048, 81)
        self.bbox_pred_net = tnn.Linear(2048, 81 * 4)
        self.mask_up_sampling = tnn.ConvTranspose2d(2048, 256, 2, stride=2)
        self.mask_pred_net = tnn.Conv2d(256, 81, 1)

    # --- stages of the reference test path ---

    def encode(self, labels, lengths):
        x = self.rnn_encoder.mlp(self.rnn_encoder.embedding(labels))
        packed = tnn.utils.rnn.pack_padded_sequence(x, lengths,
                                                    batch_first=True)
        _, (hn, _) = self.rnn_encoder.rnn(packed)
        return hn.transpose(0, 1).reshape(labels.shape[0], -1)

    def condition(self, net_conv, hidden):
        """Baseline 1-filter gating (network.py:474-479)."""
        e = hidden.shape[0]
        filt = torch.tanh(self.dynamic_fc(hidden))        # (E, 1024)
        gated, resp = [], []
        for i in range(e):
            r = F.conv2d(net_conv, filt[i].view(1, 1024, 1, 1))
            gated.append(net_conv * r)
            resp.append(r)
        return torch.cat(gated), torch.cat(resp)

    def rpn(self, gated):
        x = F.relu(self.rpn_net(gated))
        return self.rpn_cls_score_net(x), self.rpn_bbox_pred_net(x)

    def crop(self, bottom, rois, size=7):
        """_crop_pool_layer (network.py:104-146), align_corners grid."""
        x1 = rois[:, 0:1] / 16.0
        y1 = rois[:, 1:2] / 16.0
        x2 = rois[:, 2:3] / 16.0
        y2 = rois[:, 3:4] / 16.0
        h, w = bottom.shape[2], bottom.shape[3]
        zero = torch.zeros_like(x1)
        theta = torch.cat([
            (x2 - x1) / (w - 1), zero, (x1 + x2 - w + 1) / (w - 1),
            zero, (y2 - y1) / (h - 1), (y1 + y2 - h + 1) / (h - 1)],
            1).view(-1, 2, 3)
        grid = F.affine_grid(theta, (rois.shape[0], 1, size, size),
                             align_corners=True)
        return F.grid_sample(
            bottom.expand(rois.shape[0], *bottom.shape[1:]), grid,
            align_corners=True)

    def heads(self, crops):
        fc7 = self.resnet.layer4(crops)                   # (R,2048,7,7)
        pooled = fc7.mean(dim=(2, 3))
        return self.cls_score_net(pooled), self.bbox_pred_net(pooled), fc7

    def masks(self, fc7):
        x = F.relu(self.mask_up_sampling(fc7))
        return torch.sigmoid(self.mask_pred_net(x))       # (R,81,14,14)


@pytest.fixture(scope="module")
def nets():
    cfg = tiny_config()
    cfg.model.num_filters = 1
    cfg.model.normalize_response = False
    torch.manual_seed(0)
    tnet = TRefNet(vocab=cfg.model.vocab_size)
    # keep random activations in a well-conditioned range
    for p in tnet.parameters():
        if p.ndim > 1:
            tnn.init.normal_(p, std=0.02)
    for mod in tnet.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_var.fill_(1.0)
            mod.running_mean.zero_()
    tnet.eval()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    converted = convert.convert_torch_state_dict(sd, cfg)

    model = create_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    params = tolerant_restore_params(params, converted)
    return cfg, tnet, model, params


def _rand_inputs(cfg, rng):
    h, w = cfg.data.canvas_h, cfg.data.canvas_w
    images = rng.randn(1, h, w, 3).astype(np.float32) * 30.0
    labels = np.zeros((2, cfg.data.max_len), np.int32)
    lengths = [7, 4]
    for i, ln in enumerate(lengths):
        labels[i, :ln] = rng.randint(1, cfg.model.vocab_size, ln)
    return images, labels, lengths


def test_full_network_forward_parity(nets, rng):
    cfg, tnet, model, params = nets
    images, labels, lengths = _rand_inputs(cfg, rng)
    t_img = torch.from_numpy(images.transpose(0, 3, 1, 2))

    with jax.default_matmul_precision("float32"):
        # ---- stage 1: backbone head ----
        with torch.no_grad():
            t_conv = tnet.resnet.head(t_img)              # (1,1024,h,w)
        j_conv = model.apply({"params": params}, jnp.asarray(images),
                             method=lambda m, x: m.backbone.head(x))
        ref = t_conv.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(j_conv), ref,
                                   rtol=1e-3, atol=1e-3)

        # ---- stage 2: language encoder + dynamic-filter gating ----
        with torch.no_grad():
            t_hidden = tnet.encode(torch.from_numpy(labels.astype(np.int64)),
                                   lengths)
            t_gated, t_resp = tnet.condition(t_conv, t_hidden)
        e = labels.shape[0]
        j_convE = jnp.broadcast_to(j_conv, (e,) + j_conv.shape[1:])
        j_gated, j_resp = model.apply(
            {"params": params}, j_convE, jnp.asarray(labels),
            method=lambda m, nc, lb: m._condition(nc, lb, train=False))
        np.testing.assert_allclose(
            np.asarray(j_resp)[..., 0], t_resp.numpy()[:, 0], rtol=2e-3,
            atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(j_gated), t_gated.numpy().transpose(0, 2, 3, 1),
            rtol=2e-3, atol=2e-3)

        # ---- stage 3: RPN scores/deltas (incl. channel permutation) ----
        with torch.no_grad():
            t_cls, t_box = tnet.rpn(t_gated)              # (E,2A,h,w)
        j_cls, j_box = model.apply(
            {"params": params}, j_gated,
            method=lambda m, g: m.rpn_head(g))            # (E,h,w,A,2|4)
        tc = t_cls.numpy()
        fh, fw = tc.shape[2], tc.shape[3]
        # torch packs class-major: channel = cls*A + a (network.py:239)
        ref_cls = tc.reshape(e, 2, A, fh, fw).transpose(0, 3, 4, 2, 1)
        np.testing.assert_allclose(np.asarray(j_cls), ref_cls,
                                   rtol=2e-3, atol=2e-3)
        ref_box = t_box.numpy().reshape(e, A, 4, fh, fw).transpose(
            0, 3, 4, 1, 2)
        np.testing.assert_allclose(np.asarray(j_box), ref_box,
                                   rtol=2e-3, atol=2e-3)

        # ---- stage 4: crop -> tail -> cls/bbox heads on FIXED boxes ----
        boxes = np.array([[16.0, 8.0, 100.0, 90.0],
                          [40.0, 30.0, 180.0, 120.0],
                          [0.0, 0.0, 191.0, 127.0]], np.float32)
        with torch.no_grad():
            crops0 = tnet.crop(t_gated[0:1], torch.from_numpy(boxes))
            t_score, t_bbox, t_fc7 = tnet.heads(crops0)
            t_mask = tnet.masks(t_fc7)

        def jax_heads(m, g, b):
            fc7 = m._roi_features(g, b)                   # (1,R,7,7,2048)
            r = fc7.shape[1]
            cs, bp = m.box_head(fc7.reshape(r, *fc7.shape[2:]))
            return cs, bp

        j_score, j_bbox = model.apply(
            {"params": params}, j_gated[0:1], jnp.asarray(boxes[None]),
            method=jax_heads)
        np.testing.assert_allclose(np.asarray(j_score), t_score.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(j_bbox), t_bbox.numpy(),
                                   rtol=2e-3, atol=2e-3)

        # ---- stage 5: mask head (ConvTranspose conversion) ----
        lab = jnp.asarray([[3, 7, 1]], jnp.int32)
        j_mask = model.apply({"params": params}, j_gated[0:1],
                             jnp.asarray(boxes[None]), lab,
                             method=Lang2Seg.predict_masks)
        tm = t_mask.numpy()                               # (R,81,14,14)
        ref_mask = np.stack([tm[i, c] for i, c in enumerate([3, 7, 1])])
        np.testing.assert_allclose(np.asarray(j_mask)[0], ref_mask,
                                   rtol=2e-3, atol=2e-3)


def test_proposal_stage_parity(nets, rng):
    """Proposal machinery on torch RPN outputs: decode+clip+NMS must give
    IoU-matched boxes between a NumPy reference-port and our jit pipeline
    (proposal_layer.py:19-68)."""
    from lang2seg_tpu.ops.anchors import shifted_anchors
    from lang2seg_tpu.ops.proposals import proposal_layer
    cfg, tnet, model, params = nets
    images, labels, lengths = _rand_inputs(cfg, rng)
    t_img = torch.from_numpy(images.transpose(0, 3, 1, 2))
    with torch.no_grad(), jax.default_matmul_precision("float32"):
        t_conv = tnet.resnet.head(t_img)
        t_hidden = tnet.encode(torch.from_numpy(labels.astype(np.int64)),
                               lengths)
        t_gated, _ = tnet.condition(t_conv, t_hidden)
        t_cls, t_box = tnet.rpn(t_gated[0:1])
    fh, fw = t_cls.shape[2], t_cls.shape[3]
    tc = t_cls.numpy().reshape(1, 2, A, fh, fw)
    ex = np.exp(tc - tc.max(axis=1, keepdims=True))
    pos = (ex[:, 1] / ex.sum(axis=1))[0].transpose(1, 2, 0).reshape(-1)
    deltas = t_box.numpy().reshape(A, 4, fh, fw).transpose(
        2, 3, 0, 1).reshape(-1, 4)

    anchors = np.asarray(shifted_anchors(fh, fw, 16, (4, 8, 16, 32),
                                         (0.5, 1.0, 2.0)))

    # numpy reference port: decode (+1 convention) -> clip -> topk -> NMS
    w = anchors[:, 2] - anchors[:, 0] + 1.0
    h = anchors[:, 3] - anchors[:, 1] + 1.0
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    pcx = deltas[:, 0] * w + cx
    pcy = deltas[:, 1] * h + cy
    pw = np.exp(deltas[:, 2]) * w
    ph = np.exp(deltas[:, 3]) * h
    boxes = np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], 1)
    im_h, im_w = 128.0, 192.0
    boxes[:, 0] = boxes[:, 0].clip(0, im_w - 1)
    boxes[:, 1] = boxes[:, 1].clip(0, im_h - 1)
    boxes[:, 2] = boxes[:, 2].clip(0, im_w - 1)
    boxes[:, 3] = boxes[:, 3].clip(0, im_h - 1)
    order = np.argsort(-pos)[:256]
    cand_b, cand_s = boxes[order], pos[order]
    keep = []
    sup = np.zeros(len(cand_b), bool)
    for i in range(len(cand_b)):
        if sup[i]:
            continue
        keep.append(i)
        if len(keep) == 32:
            break
        bi = cand_b[i]
        for j in range(i + 1, len(cand_b)):
            if sup[j]:
                continue
            xx1 = max(bi[0], cand_b[j][0])
            yy1 = max(bi[1], cand_b[j][1])
            xx2 = min(bi[2], cand_b[j][2])
            yy2 = min(bi[3], cand_b[j][3])
            iw = max(0.0, xx2 - xx1 + 1)
            ih = max(0.0, yy2 - yy1 + 1)
            inter = iw * ih
            ai = (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
            aj = (cand_b[j][2] - cand_b[j][0] + 1) * \
                (cand_b[j][3] - cand_b[j][1] + 1)
            if inter / (ai + aj - inter) > 0.7:
                sup[j] = True
    ref_rois = cand_b[keep]

    props = jax.jit(lambda s, d, a: proposal_layer(
        s, d, a, im_h, im_w, 256, 32, 0.7))(
        jnp.asarray(pos), jnp.asarray(deltas), jnp.asarray(anchors))
    got = np.asarray(props.rois)[np.asarray(props.valid)]
    n = min(len(ref_rois), len(got))
    assert n >= 1
    np.testing.assert_allclose(got[:n], ref_rois[:n], rtol=1e-3, atol=1e-2)
