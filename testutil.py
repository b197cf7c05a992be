#!/usr/bin/env python
"""Manual smoke script — parity with the reference's testUtil.py:37-46:
load one test image through the test-data path, optionally display it, and
save it back.  An eyeball check of the IO pipeline."""

import argparse

import numpy as np

from sggan_tpu.data.loader import load_test_triplet
from sggan_tpu.data.preprocess import preprocess_test
from sggan_tpu.utils.images import save_images


def main(argv=None):
    p = argparse.ArgumentParser(description="")
    p.add_argument("--sample_file", default="test/real_00007.png")
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=512)
    p.add_argument("--out", default="test/holis.png")
    p.add_argument("--show", action="store_true")
    a = p.parse_args(argv)

    img_u8, seg_u8, cls_u8 = (x[None] for x in
                              load_test_triplet(a.sample_file))
    img, _, _, _ = preprocess_test(img_u8, seg_u8, cls_u8,
                                   out_hw=(a.img_height, a.img_width),
                                   mask_hw=(a.img_height // 8,
                                            a.img_width // 8), n_class=34)
    img = np.asarray(img)
    print(img.shape)
    if a.show:
        import matplotlib.pyplot as plt
        plt.imshow(img[0])
        plt.show()
    save_images(img * 2.0 - 1.0, [1, 1], a.out)


if __name__ == "__main__":
    main()
