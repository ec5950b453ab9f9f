"""Training/eval batchers producing fixed-shape TPU canvases.

Capability parity with the reference loaders:
  * Loader base (lib/loaders/loader.py:70-167): vocab maps, ref/img/ann/
    sentence indices, encode/decode/fetch of token sequences.
  * GtMRCNLoader (gt_mrcn_loader.py:143-851): per-split permuted image
    iterator with wrap detection; image blob = BGR float mean-subtracted,
    min-side 600 / max-side 1000 resize; GT ref boxes xywh->xyxy scaled;
    GT masks decoded from per-ref RLE and nearest-resized to the blob.
  * CycleLoader (cycle_loader.py:297-309): caption targets = tokens in a
    (L+2) frame with BOS/EOS slots, mask = 1 over (#tokens + 2) entries.

TPU departures: images land in a FIXED canvas (cfg.data.canvas_h/w, scale
additionally capped to fit) so every batch compiles once; the train batch
is (I images, E expressions) with img_idx indexing local images (the
reference steps one sentence at a time); mask decode+resize runs through
the native batched RLE op. Iterator state (perm + positions) is exposed
for checkpointing (state_dict/load_state_dict — parity with the
reference's pickled loader iterators, train_val.py:75-78).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from lang2seg_tpu.config import Config
from lang2seg_tpu.data import rle as rle_codec


def xywh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
    out = boxes.astype(np.float32).copy()
    out[..., 2] = out[..., 0] + out[..., 2] - 1
    out[..., 3] = out[..., 1] + out[..., 3] - 1
    return out


class Loader:
    """Vocab + index base (reference loader.py:70-167)."""

    def __init__(self, data_json: str, data_h5: Optional[str] = None):
        with open(data_json) as f:
            info = json.load(f)
        self.word_to_ix: Dict[str, int] = info["word_to_ix"]
        self.ix_to_word = {int(k): v for k, v in info["ix_to_word"].items()}
        self.vocab_size = len(self.word_to_ix)
        self.refs = info["refs"]
        self.images = info["images"]
        self.anns = info["anns"]
        self.sentences = info["sentences"]
        self.Refs = {r["ref_id"]: r for r in self.refs}
        self.Images = {i["image_id"]: i for i in self.images}
        self.Anns = {a["ann_id"]: a for a in self.anns}
        self.Sentences = {s["sent_id"]: s for s in self.sentences}
        self.sent_to_h5 = {s["sent_id"]: s["h5_id"] for s in self.sentences}
        # attribute vocab (present when prepro ran with att_json)
        self.att_to_ix: Dict[str, int] = info.get("att_to_ix", {})
        self.ix_to_att = {i: w for w, i in self.att_to_ix.items()}

        if data_h5 is not None:
            import h5py
            with h5py.File(data_h5, "r") as f:
                self.labels = np.asarray(f["labels"][...], np.int32)
            assert self.labels.shape[0] == len(self.sentences), \
                "label rows must match sentence count"
        else:
            self.labels = None

    @property
    def max_length(self) -> int:
        return self.labels.shape[1]

    def encode_labels(self, token_lists: List[List[str]]) -> np.ndarray:
        out = np.zeros((len(token_lists), self.max_length), np.int32)
        unk = self.word_to_ix.get("<UNK>", 0)
        for i, toks in enumerate(token_lists):
            for j, w in enumerate(toks[:self.max_length]):
                out[i, j] = self.word_to_ix.get(w, unk)
        return out

    def decode_labels(self, labels: np.ndarray) -> List[str]:
        out = []
        for row in labels:
            words = [self.ix_to_word[int(i)] for i in row if int(i) != 0]
            out.append(" ".join(words))
        return out

    def fetch_seq(self, sent_id) -> np.ndarray:
        return self.labels[self.sent_to_h5[sent_id]]

    def att_multihot(self, ref_id) -> np.ndarray:
        """(num_atts,) float multi-hot of a ref's attribute words."""
        out = np.zeros((len(self.att_to_ix),), np.float32)
        for w in self.Refs[ref_id].get("att_wds", []):
            if w in self.att_to_ix:
                out[self.att_to_ix[w]] = 1.0
        return out


class GtBatchLoader(Loader):
    """Fixed-canvas batcher over (image, ref, sentence) structure."""

    def __init__(self, data_json: str, data_h5: str, cfg: Config,
                 image_dir: Optional[str] = None, seed: int = 3):
        super().__init__(data_json, data_h5)
        self.cfg = cfg
        self.image_dir = image_dir or cfg.data.image_dir
        self.rng = np.random.RandomState(seed)

        # split -> image ids having refs in that split
        self.split_ix: Dict[str, List[int]] = {}
        for img in self.images:
            splits = {self.Refs[rid]["split"] for rid in img["ref_ids"]}
            for sp in splits:
                self.split_ix.setdefault(sp, []).append(img["image_id"])
        self.iterators = {sp: 0 for sp in self.split_ix}
        self.perm = {sp: self.rng.permutation(len(v))
                     for sp, v in self.split_ix.items()}

    # ---- iterator state (checkpointable) ----

    def state_dict(self) -> Dict:
        return {"iterators": dict(self.iterators),
                "perm": {k: v.copy() for k, v in self.perm.items()},
                "rng_state": self.rng.get_state()}

    def load_state_dict(self, state: Dict):
        self.iterators.update(state["iterators"])
        for k, v in state["perm"].items():
            self.perm[k] = np.asarray(v)
        self.rng.set_state(state["rng_state"])

    def reset_iterator(self, split: str):
        self.iterators[split] = 0

    # ---- image handling ----

    def _read_image(self, img_rec: Dict) -> np.ndarray:
        path = os.path.join(self.image_dir, img_rec["file_name"])
        import cv2
        im = cv2.imread(path)
        if im is None:
            raise FileNotFoundError(path)
        return im  # BGR uint8

    def _scale_for(self, h: int, w: int) -> float:
        t = self.cfg.train
        d = self.cfg.data
        scale = min(float(t.scales[0]) / min(h, w),
                    float(t.max_size) / max(h, w))
        # cap to the fixed canvas (TPU static shapes)
        scale = min(scale, d.canvas_h / h, d.canvas_w / w)
        return scale

    def _image_to_canvas(self, im: np.ndarray) -> Tuple[np.ndarray, float,
                                                        int, int]:
        import cv2
        d = self.cfg.data
        h, w = im.shape[:2]
        scale = self._scale_for(h, w)
        resized = cv2.resize(im.astype(np.float32), None, fx=scale, fy=scale,
                             interpolation=cv2.INTER_LINEAR)
        sh, sw = resized.shape[:2]
        if d.wire_uint8_images:
            # uint8 wire format: raw BGR, mean subtraction happens on
            # device (models/network.py); padding = rounded pixel means so
            # the subtracted canvas padding is ~0 like the reference's
            canvas = np.empty((d.canvas_h, d.canvas_w, 3), np.uint8)
            canvas[:] = np.round(d.pixel_means_bgr).astype(np.uint8)
            canvas[:sh, :sw] = np.clip(np.round(resized), 0, 255)
            return canvas, scale, sh, sw
        resized -= np.asarray(d.pixel_means_bgr, np.float32)
        canvas = np.zeros((d.canvas_h, d.canvas_w, 3), np.float32)
        canvas[:sh, :sw] = resized
        return canvas, scale, sh, sw

    def _ref_masks_to_canvas(self, ref_ids: List[int], sh: int,
                             sw: int) -> np.ndarray:
        d = self.cfg.data
        rles = [self.Refs[rid]["rle"] for rid in ref_ids]
        if d.reference_exact_masks:
            # scipy-imresize/PIL nearest (gt_mrcn_loader.py:210) — the
            # reference's boundary-pixel semantics, for the
            # reference-exact eval mode
            from lang2seg_tpu.utils.metrics import scipy_imresize
            out = np.zeros((len(rles), d.canvas_h, d.canvas_w), np.uint8)
            for i, r in enumerate(rles):
                out[i, :sh, :sw] = scipy_imresize(
                    rle_codec.decode(r), (sh, sw), "nearest")
            return out
        return rle_codec.decode_resize_batch(rles, d.canvas_h, d.canvas_w,
                                             sh, sw)

    # ---- batching ----

    def _next_image_ids(self, split: str, n: int) -> Tuple[List[int], bool]:
        ids, wrapped = [], False
        order = self.split_ix[split]
        for _ in range(n):
            ri = self.iterators[split]
            if ri >= len(order):
                self.perm[split] = self.rng.permutation(len(order))
                self.iterators[split] = 0
                ri = 0
                wrapped = True
            ids.append(order[self.perm[split][ri]])
            self.iterators[split] = ri + 1
        return ids, wrapped

    def get_batch(self, split: str = "train",
                  num_images: Optional[int] = None,
                  num_expr: Optional[int] = None,
                  num_shards: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Fixed-shape training batch.

        num_shards=1 (default cfg.parallel.num_data): one block of I
        images x E expressions. num_shards=n: n self-contained per-device
        blocks concatenated along axis 0 — each block's img_idx indexes
        its OWN I images — matching the shard_map contract of
        parallel/train.py (arrays shard on axis 0; shard s sees images
        [s*I:(s+1)*I] as its local 0..I-1).
        """
        num_shards = num_shards or self.cfg.parallel.num_data
        if num_shards <= 1:
            return self._sample_block(split, num_images, num_expr)
        blocks = [self._sample_block(split, num_images, num_expr)
                  for _ in range(num_shards)]
        out: Dict[str, np.ndarray] = {}
        for k in blocks[0]:
            if k == "wrapped":
                out[k] = any(b[k] for b in blocks)
            else:
                out[k] = np.concatenate([b[k] for b in blocks], axis=0)
        return out

    def _sample_block(self, split: str = "train",
                      num_images: Optional[int] = None,
                      num_expr: Optional[int] = None
                      ) -> Dict[str, np.ndarray]:
        """One block: I images, E expressions sampled from those images'
        (ref, sentence) pools (with replacement when fewer than E exist).

        DELIBERATE departure from the reference's epoch semantics: the
        reference steps every sentence of each visited image exactly once
        (train_val.py:350); here E expressions are drawn uniformly from
        the visited images' pool, so a given sentence may be skipped or
        repeated within one image visit. Image visitation is still an
        exact shuffled epoch (_next_image_ids), and per-sentence coverage
        converges to uniform at rate E/pool per visit —
        tests/test_data_pipeline.py::test_sentence_coverage_over_epochs
        pins that every sentence is visited within a few epochs."""
        t, d, m = self.cfg.train, self.cfg.data, self.cfg.model
        num_images = num_images or t.images_per_batch
        num_expr = num_expr or t.expressions_per_batch
        img_ids, wrapped = self._next_image_ids(split, num_images)

        images = np.zeros((num_images, d.canvas_h, d.canvas_w, 3),
                          np.uint8 if d.wire_uint8_images else np.float32)
        im_hw = np.zeros((num_images, 2), np.float32)
        scales = np.zeros((num_images,), np.float32)
        pool = []  # (local_img_idx, ref_id, sent_id)
        per_image_extent = []
        for li, iid in enumerate(img_ids):
            rec = self.Images[iid]
            canvas, scale, sh, sw = self._image_to_canvas(
                self._read_image(rec))
            images[li] = canvas
            im_hw[li] = (sh, sw)
            scales[li] = scale
            per_image_extent.append((sh, sw))
            for rid in rec["ref_ids"]:
                ref = self.Refs[rid]
                if split and ref["split"] != split:
                    continue
                for sid in ref["sent_ids"]:
                    pool.append((li, rid, sid))

        assert pool, f"no expressions for images {img_ids} in split {split}"
        take = [pool[i] for i in
                self.rng.choice(len(pool), size=num_expr,
                                replace=len(pool) < num_expr)] \
            if len(pool) != num_expr else pool

        img_idx = np.asarray([p[0] for p in take], np.int32)
        # stable per-sentence ids: the network derives per-example sampling
        # keys from these, so subsampling is invariant to batch
        # composition/sharding (models/network.py train_forward)
        expr_uid = np.asarray([self.sent_to_h5[p[2]] for p in take], np.int32)
        labels = np.stack([self.fetch_seq(p[2]) for p in take])
        gt_boxes = np.zeros((num_expr, 5), np.float32)
        gt_masks = np.zeros((num_expr, d.canvas_h, d.canvas_w), np.uint8)
        for ei, (li, rid, sid) in enumerate(take):
            ref = self.Refs[rid]
            box = xywh_to_xyxy(np.asarray(ref["box"], np.float32))
            gt_boxes[ei, :4] = box * scales[li]
            gt_boxes[ei, 4] = ref["category_id"]
            sh, sw = per_image_extent[li]
            gt_masks[ei] = self._ref_masks_to_canvas([rid], sh, sw)[0]

        if d.wire_packed_masks and d.canvas_w % 8 == 0:
            # bit-packed wire format, unpacked on device
            # (models/network.py train_forward)
            gt_masks = np.packbits(gt_masks > 0, axis=-1)
        batch = {"images": images, "im_hw": im_hw, "labels": labels,
                 "img_idx": img_idx, "expr_uid": expr_uid,
                 "gt_boxes": gt_boxes,
                 "gt_masks": gt_masks, "im_scales": scales,
                 "wrapped": wrapped}
        if m.use_caption_loss:
            batch.update(self._caption_targets(labels))
        if m.use_attribute_head and self.att_to_ix:
            att_labels = np.stack([self.att_multihot(p[1]) for p in take])
            batch["att_labels"] = att_labels
            batch["att_valid"] = att_labels.sum(axis=1) > 0
        return batch

    def _caption_targets(self, labels: np.ndarray) -> Dict[str, np.ndarray]:
        """BOS/EOS-framed caption labels + masks
        (cycle_loader.py:297-309)."""
        e, L = labels.shape
        cap = np.zeros((e, L + 2), np.int32)
        cap[:, 1:-1] = labels
        nonzeros = (cap != 0).sum(axis=1) + 2
        mask = (np.arange(L + 2)[None, :] < nonzeros[:, None]) \
            .astype(np.float32)
        return {"cap_labels": cap, "cap_masks": mask}

    def get_test_batch(self, split: str,
                       max_sents: Optional[int] = None,
                       buckets: Optional[Tuple[int, ...]] = None
                       ) -> Dict[str, np.ndarray]:
        """One image with ALL its sentences of the split, padded to
        max_sents slots with sent_valid (reference getTestBatch,
        gt_mrcn_loader.py:633).

        `buckets` (e.g. (8, 16, 32)) pads to the SMALLEST bucket that
        fits instead of a fixed max_sents: test_forward computes every
        padded slot, and RefCOCO averages ~8-10 sentences/image, so a
        fixed 32-slot pad wastes ~3x eval compute. One jit specialization
        per bucket size (compiled once each)."""
        d = self.cfg.data
        img_ids, wrapped = self._next_image_ids(split, 1)
        rec = self.Images[img_ids[0]]
        canvas, scale, sh, sw = self._image_to_canvas(self._read_image(rec))

        triples = []
        for rid in rec["ref_ids"]:
            ref = self.Refs[rid]
            if ref["split"] != split:
                continue
            for sid in ref["sent_ids"]:
                triples.append((rid, sid))
        s_real = len(triples)
        if buckets:
            fitting = [b for b in sorted(buckets) if b >= s_real]
            s_pad = fitting[0] if fitting else max(buckets)
        else:
            s_pad = max_sents or s_real
        assert s_real > 0

        labels = np.zeros((s_pad, self.max_length), np.int32)
        gt_boxes = np.zeros((s_pad, 5), np.float32)
        sent_valid = np.zeros((s_pad,), bool)
        bank_rows: list = []                    # rid per bank row
        row_of: Dict[int, int] = {}
        mask_ref_idx = np.zeros((s_pad,), np.int32)
        for i, (rid, sid) in enumerate(triples[:s_pad]):
            ref = self.Refs[rid]
            labels[i] = self.fetch_seq(sid)
            box = xywh_to_xyxy(np.asarray(ref["box"], np.float32))
            gt_boxes[i, :4] = box * scale
            gt_boxes[i, 4] = ref["category_id"]
            if rid not in row_of:
                row_of[rid] = len(bank_rows)
                bank_rows.append(rid)
            mask_ref_idx[i] = row_of[rid]
            sent_valid[i] = True

        batch = {"images": canvas[None], "im_hw": np.asarray([[sh, sw]],
                                                             np.float32),
                 "labels": labels, "gt_boxes": gt_boxes,
                 "sent_valid": sent_valid,
                 "im_scale": scale, "wrapped": wrapped,
                 "image_id": rec["image_id"]}
        if d.wire_mask_bank:
            # ref-deduped bank: sentences of one ref share its mask —
            # ship each mask ONCE (config.data.wire_mask_bank). The row
            # count pads to s_pad//2 when the refs fit (the common case:
            # ~3 sentences/ref), else falls back to s_pad, keeping two
            # jit specializations per sentence bucket.
            r_real = len(bank_rows)
            half = max(1, s_pad // 2)
            r_pad = half if r_real <= half else s_pad
            bank = np.zeros((r_pad, d.canvas_h, d.canvas_w), np.uint8)
            for row, rid in enumerate(bank_rows):
                bank[row] = self._ref_masks_to_canvas([rid], sh, sw)[0]
            batch["gt_mask_bank"] = bank
            batch["mask_ref_idx"] = mask_ref_idx
        else:
            gt_masks = np.zeros((s_pad, d.canvas_h, d.canvas_w), np.uint8)
            for i, (rid, _) in enumerate(triples[:s_pad]):
                gt_masks[i] = self._ref_masks_to_canvas([rid], sh, sw)[0]
            batch["gt_masks"] = gt_masks
        return batch

    def iter_attribute_batches(self, split: str, max_refs: int = 16):
        """Per image of the split: canvas + scaled GT boxes of the refs
        that carry attribute words (reference getAttributeBatch /
        eval_attributes, eval_easy_utils.py:41-80)."""
        d = self.cfg.data
        self.reset_iterator(split)
        for _ in range(len(self.split_ix[split])):
            img_ids, _ = self._next_image_ids(split, 1)
            rec = self.Images[img_ids[0]]
            rids = [rid for rid in rec["ref_ids"]
                    if self.Refs[rid]["split"] == split
                    and self.Refs[rid].get("att_wds")]
            if not rids:
                continue
            canvas, scale, sh, sw = self._image_to_canvas(
                self._read_image(rec))
            rids = rids[:max_refs]
            boxes = np.zeros((max_refs, 4), np.float32)
            valid = np.zeros((max_refs,), bool)
            for i, rid in enumerate(rids):
                boxes[i] = xywh_to_xyxy(
                    np.asarray(self.Refs[rid]["box"], np.float32)) * scale
                valid[i] = True
            yield {"images": canvas[None], "boxes": boxes[None],
                   "ref_valid": valid, "ref_ids": rids,
                   "gd_att_wds": [self.Refs[rid]["att_wds"]
                                  for rid in rids]}

    def iter_test_batches(self, split: str, max_sents: int = 32,
                          buckets: Optional[Tuple[int, ...]] = None):
        """Yield every image of the split exactly once."""
        self.reset_iterator(split)
        n = len(self.split_ix[split])
        for _ in range(n):
            yield self.get_test_batch(split, max_sents=max_sents,
                                      buckets=buckets)


class CycleBatchLoader(GtBatchLoader):
    """Alias with caption targets always on (reference CycleLoader)."""

    def get_batch(self, *a, **kw):
        batch = super().get_batch(*a, **kw)
        if "cap_labels" not in batch:
            batch.update(self._caption_targets(batch["labels"]))
        return batch
