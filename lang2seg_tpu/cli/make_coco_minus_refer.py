"""Build the coco_minus_refer pretraining instances json.

Parity with `pyutils/mask-faster-rcnn/tools/make_coco_minus_refer_
instances.py`: excludes refcoco_unc + refcocog_umd val/test images from
coco train2014 annotations.

  python -m lang2seg_tpu.cli.make_coco_minus_refer \
      --coco-instances data/coco/annotations/instances_train2014.json \
      --data-root data --out data/coco_minus_refer/instances.json
"""

from __future__ import annotations

import argparse

from lang2seg_tpu.data.coco_detection import make_coco_minus_refer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coco-instances", required=True)
    p.add_argument("--data-root", default="data")
    p.add_argument("--out", required=True)
    p.add_argument("--refer", nargs="*",
                   default=["refcoco:unc", "refcocog:umd"],
                   help="dataset:splitby pairs whose val/test images to "
                        "exclude")
    args = p.parse_args(argv)
    roots = [(args.data_root,) + tuple(r.split(":")) for r in args.refer]
    n = make_coco_minus_refer(args.coco_instances, roots, args.out)
    print(f"kept {n} images -> {args.out}")


if __name__ == "__main__":
    main()
