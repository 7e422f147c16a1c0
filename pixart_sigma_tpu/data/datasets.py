"""Datasets over the data_info.json layout (alpha + Sigma dialects).

Specs:
- InternalData / InternalDataSigma: /root/reference/diffusion/data/datasets/InternalData.py
  (feature paths :60-87/:205-240, padding :104-106/:268-274, vae sampling
  :128-132, 20-retry :114-121, dual captions :250-258, ratio filter :210)
- InternalDataMS / InternalDataMSSigma: InternalData_ms.py (closest-ratio
  bucket lookup, ratio_index/ratio_nums stats, per-bucket resize+crop)

Torch-free; items are numpy dicts with channel-last arrays:
  {latents|image [H,W,C], y [L,4096](if load_t5_feat), y_mask [L],
   img_hw [2], aspect_ratio [1], prompt str}
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, List, Optional

import numpy as np

from pixart_sigma_tpu.data.aspect import aspect_ratio_table, get_closest_ratio
from pixart_sigma_tpu.data.transforms import default_train, multiscale_train


def _replace_img_ext(path: str, dst: str) -> str:
    for ext in (".png", ".jpg", ".webp", ".jpeg", ".JPEG", ".JPG"):
        path = path.replace(ext, dst)
    return path


class PixArtDataset:
    """Single-scale dataset (alpha 'InternalData' / Sigma 'InternalDataSigma').

    dialect='alpha': features under partition/, caption_feature_wmask/,
    img_vae_features_{res}resolution/noflip (InternalData.py:55-75)
    dialect='sigma': data_info.json at root, caption_features_new/,
    img_sdxl_vae_features_{res}resolution_new, dual captions
    (InternalData.py:205-240).
    """

    def __init__(
        self,
        root: str,
        image_list_json="data_info.json",
        resolution: int = 256,
        load_vae_feat: bool = False,
        load_t5_feat: bool = False,
        max_length: int = 300,
        real_prompt_ratio: float = 1.0,
        dialect: str = "sigma",
        seed: int = 0,
        **kwargs,
    ):
        self.root = root
        self.resolution = resolution
        self.load_vae_feat = load_vae_feat
        self.load_t5_feat = load_t5_feat
        self.max_length = max_length
        self.real_prompt_ratio = real_prompt_ratio
        self.dialect = dialect
        self.seed = seed
        self.epoch = 0
        self.rng = random.Random(seed)  # retry resampling only (stateful)

        jsons = image_list_json if isinstance(image_list_json, list) else [image_list_json]
        max_ratio = 4.5 if dialect == "sigma" else 4.0
        self.meta: List[Dict[str, Any]] = []
        for jf in jsons:
            jpath = (
                os.path.join(root, jf)
                if dialect == "sigma"
                else os.path.join(root, "partition", jf)
            )
            with open(jpath) as f:
                meta = json.load(f)
            self.meta.extend([m for m in meta if m.get("ratio", 1.0) <= max_ratio])

    def __len__(self) -> int:
        return len(self.meta)

    def set_epoch(self, epoch: int) -> None:
        """Fresh per-epoch randomness for the keyed draws below (the batch
        samplers forward their set_epoch here)."""
        self.epoch = epoch

    # ------------------------------------------------------------- paths
    def _paths(self, item: Dict[str, Any], real_prompt: bool):
        img = os.path.join(self.root.replace("InternData", "InternImgs"), item["path"])
        fname = item["path"].rsplit("/", 1)[-1]
        joined = "_".join(item["path"].rsplit("/", 1))
        if self.dialect == "sigma":
            feat_dir = (
                "caption_features_new" if real_prompt else "sharegpt4v_caption_features_new"
            )
            txt = os.path.join(self.root, feat_dir, fname.replace(".png", ".npz"))
            vae = os.path.join(
                self.root,
                f"img_sdxl_vae_features_{self.resolution}resolution_new",
                fname.replace(".png", ".npy"),
            )
        else:
            txt = os.path.join(
                self.root, "caption_feature_wmask", _replace_img_ext(joined, ".npz")
            )
            vae = os.path.join(
                self.root,
                f"img_vae_features_{self.resolution}resolution/noflip",
                _replace_img_ext(joined, ".npy"),
            )
        return img, txt, vae

    # ----------------------------------------------------------- loaders
    def _load_vae(self, path: str, index: int) -> np.ndarray:
        """[mean, std] concat .npy -> sampled latent, channel-last.

        The posterior draw is keyed on (seed, item index), not a stateful
        stream: item i yields the same latent regardless of access order —
        required for multi-host consistency (each process reads a disjoint
        index stripe) and resume stability. The reference inherits a
        stateful draw from torch's global RNG (InternalData.py:128-132).
        """
        arr = np.load(path)  # [2C, h, w] (torch layout)
        mean, std = np.split(arr, 2, axis=0)
        z = np.random.default_rng((self.seed, self.epoch, index)).standard_normal(
            mean.shape, dtype=np.float32
        )
        latent = mean + std * z
        return np.transpose(latent, (1, 2, 0)).astype(np.float32)

    def _load_txt(self, path: str):
        info = np.load(path)
        fea = np.asarray(info["caption_feature"], dtype=np.float32)  # [1, T, 4096]
        fea = fea[0] if fea.ndim == 3 else fea
        if "attention_mask" in info:
            mask = np.asarray(info["attention_mask"], dtype=np.int32).reshape(-1)
        else:
            mask = np.ones((fea.shape[0],), dtype=np.int32)
        L = self.max_length
        if fea.shape[0] < L:
            # pad by repeating the last token with zero mask (spec :104-106)
            pad = np.repeat(fea[-1:], L - fea.shape[0], axis=0)
            fea = np.concatenate([fea, pad], axis=0)
            mask = np.concatenate(
                [mask, np.zeros((L - mask.shape[0],), np.int32)], axis=0
            )
        return fea[:L], mask[:L]

    def _transform_image(self, item: Dict[str, Any], img_path: str) -> np.ndarray:
        from PIL import Image

        with Image.open(img_path) as im:
            return default_train(im, self.resolution)

    def _data_info(self, item) -> Dict[str, np.ndarray]:
        return {
            "img_hw": np.asarray(
                [self.resolution, self.resolution], dtype=np.float32
            ),
            "aspect_ratio": np.asarray([1.0], dtype=np.float32),
        }

    def getdata(self, index: int) -> Dict[str, Any]:
        item = self.meta[index]
        # dual-caption choice keyed on (seed, index): order-independent
        # (multi-host + resume safe); spec InternalData.py:250-258
        real_prompt = (
            random.Random(f"{self.seed}/{self.epoch}/{index}").random()
            < self.real_prompt_ratio
        )
        img_path, txt_path, vae_path = self._paths(item, real_prompt)
        out: Dict[str, Any] = self._data_info(item)
        if self.load_vae_feat:
            out["latents"] = self._load_vae(vae_path, index)
        else:
            out["image"] = self._transform_image(item, img_path)
        if self.load_t5_feat:
            out["y"], out["y_mask"] = self._load_txt(txt_path)
        else:
            out["y_mask"] = np.ones((self.max_length,), np.int32)
        out["prompt"] = (
            item.get("prompt", "")
            if real_prompt
            else item.get("sharegpt4v", item.get("prompt", ""))
        )
        return out

    def __getitem__(self, index: int) -> Dict[str, Any]:
        # 20-retry bad-data resampling (spec InternalData.py:114-121)
        for _ in range(20):
            try:
                return self.getdata(index)
            except Exception as e:  # noqa: BLE001
                index = self.rng.randrange(len(self))
                last = e
        raise RuntimeError(f"Too many bad data: {last}")

    def get_data_info(self, idx: int) -> Dict[str, Any]:
        m = self.meta[idx]
        return {"height": m["height"], "width": m["width"]}


class PixArtMSDataset(PixArtDataset):
    """Multi-scale dataset: items land in their closest aspect-ratio bucket.

    Spec: InternalData_ms.py (InternalDataMS/InternalDataMSSigma).
    """

    def __init__(
        self,
        *args,
        aspect_ratio_type: int = 1024,
        test_ratios: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.ratios = aspect_ratio_table(aspect_ratio_type, test=test_ratios)
        self.ratio_nums: Dict[float, int] = {float(k): 0 for k in self.ratios}
        for m in self.meta:
            _, key = get_closest_ratio(m["height"], m["width"], self.ratios)
            self.ratio_nums[key] += 1

    def _vae_dir(self) -> str:
        if self.dialect == "sigma":
            return f"img_sdxl_vae_features_{self.resolution}resolution_ms_new"
        return f"img_vae_fatures_{self.resolution}_multiscale/ms"  # sic (reference typo)

    def _paths(self, item, real_prompt: bool):
        img, txt, vae = super()._paths(item, real_prompt)
        fname = item["path"].rsplit("/", 1)[-1]
        joined = "_".join(item["path"].rsplit("/", 1))
        name = fname if self.dialect == "sigma" else joined
        vae = os.path.join(self.root, self._vae_dir(), _replace_img_ext(name, ".npy"))
        return img, txt, vae

    def bucket_hw(self, index: int):
        m = self.meta[index]
        size, key = get_closest_ratio(m["height"], m["width"], self.ratios)
        return (int(size[0]), int(size[1])), key

    def _transform_image(self, item, img_path):
        from PIL import Image

        size, _ = get_closest_ratio(item["height"], item["width"], self.ratios)
        with Image.open(img_path) as im:
            return multiscale_train(im, (int(size[0]), int(size[1])))

    def _data_info(self, item):
        size, key = get_closest_ratio(item["height"], item["width"], self.ratios)
        return {
            "img_hw": np.asarray(size, dtype=np.float32),
            "aspect_ratio": np.asarray([key], dtype=np.float32),
        }
