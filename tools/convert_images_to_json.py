#!/usr/bin/env python
"""Build data_info.json from an image folder (+ optional captions).

Spec: /root/reference/tools/convert_images_to_json.py — emits the
[{path, prompt, ratio, height, width}] records the datasets consume.
Captions come from sidecar .txt files or a captions.json mapping.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

IMG_EXT = {".png", ".jpg", ".jpeg", ".webp"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", required=True)
    p.add_argument("--out", required=True, help="output data_info.json path")
    p.add_argument("--captions", default=None, help="captions.json {name: prompt}")
    args = p.parse_args()

    captions = {}
    if args.captions:
        with open(args.captions) as f:
            captions = json.load(f)

    records = []
    for dirpath, _, files in os.walk(args.image_dir):
        for fn in sorted(files):
            if os.path.splitext(fn)[1].lower() not in IMG_EXT:
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, args.image_dir)
            with Image.open(full) as im:
                w, h = im.size
            prompt = captions.get(fn, captions.get(rel, ""))
            sidecar = os.path.splitext(full)[0] + ".txt"
            if not prompt and os.path.exists(sidecar):
                prompt = open(sidecar).read().strip()
            records.append(
                {"path": rel, "prompt": prompt, "ratio": h / w,
                 "height": h, "width": w}
            )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(records, f)
    print(f"{len(records)} records -> {args.out}")


if __name__ == "__main__":
    main()
