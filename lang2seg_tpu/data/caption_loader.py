"""Caption-pretraining batcher.

Capability parity with the reference's CaptionLoader
(`lib/loaders/caption_loader.py:49`, same family as CycleLoader): batches
for pretraining the att2in2 captioner — per ref: the image, the ref's GT
box/mask (to build the region-gated features), and BOS/EOS-framed caption
targets. The captioner consumes (fc_feats, att_feats) extracted by the
backbone (engine/train_captioner.py drives the extraction).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from lang2seg_tpu.data.loader import GtBatchLoader


class CaptionBatchLoader(GtBatchLoader):
    """One (ref, sentence) pair per slot with caption targets always on;
    iterates refs of a split rather than images."""

    def get_caption_batch(self, split: str = "train",
                          num_refs: Optional[int] = None
                          ) -> Dict[str, np.ndarray]:
        batch = self.get_batch(split, num_images=None, num_expr=num_refs)
        batch.update(self._caption_targets(batch["labels"]))
        return batch
