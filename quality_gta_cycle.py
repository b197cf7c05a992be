#!/usr/bin/env python
"""Two-domain (GTA <-> Cityscapes) cycle dataset builder — VERDICT r4
item 6: the north star names GTA5<->Cityscapes as the cycle objective's
intended A/B setting (reference prepare_data.py:9-39, datasets/gta), but
the bundled gta fixture ships exactly ONE triplet per split (trainA
00005.png + seg + seg_class, trainB one aachen frame, testA 00007.png
with NO seg).  A held-out GTA eval is therefore impossible with the
bundled data, and an 80-image A-side cannot be carved.  The closest
honest setup this fixture funds, built here:

  A (virtual)  = the gta fixture's sole train triplet, symlinked under
                 n_rep distinct names (the loader pairs by filename
                 across img/_seg/_seg_class) — geometric augmentation
                 (data/augment.py, the reference's seq2) provides the
                 per-step variety; documented as 1 real frame;
  B (real)     = the 80-image city train split (quality_split.py),
                 genuinely a different domain (photographs vs renders);
  testA        = the same GTA triplet (eval-on-train, stated loudly:
                 no held-out GTA seg exists in the fixture).

    python quality_gta_cycle.py [out_root] [n_rep]
"""

import os
import sys


def build(out: str, n_rep: int = 80,
          gta: str = "/root/reference/datasets/gta",
          city: str = "/root/reference/datasets/city"):
    subs = ("", "_seg", "_seg_class")
    # A side: the one GTA triplet under n_rep names
    src_name = os.listdir(os.path.join(gta, "trainA"))[0]
    for sub in subs:
        d = os.path.join(out, "trainA" + sub)
        os.makedirs(d, exist_ok=True)
        src = os.path.join(gta, "trainA" + sub, src_name)
        assert os.path.exists(src), src
        for i in range(n_rep):
            link = os.path.join(d, f"rep{i:03d}.png")
            if not os.path.lexists(link):
                os.symlink(src, link)
        # eval split: the same triplet (see module docstring)
        d = os.path.join(out, "testA" + sub)
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, src_name)
        if not os.path.lexists(link):
            os.symlink(src, link)
    # B side: the 80 city photos (held-out-split train half, seed 0 —
    # same as quality_split.build)
    import random
    names = sorted(os.listdir(os.path.join(city, "trainA")))
    random.Random(0).shuffle(names)
    train_b = names[20:]
    for sub in subs:
        d = os.path.join(out, "trainB" + sub)
        os.makedirs(d, exist_ok=True)
        for nm in train_b:
            src = os.path.join(city, "trainA" + sub, nm)
            assert os.path.exists(src), src
            link = os.path.join(d, nm)
            if not os.path.lexists(link):
                os.symlink(src, link)
    print(f"{out}: A = 1 GTA triplet x{n_rep} names, "
          f"B = {len(train_b)} city photos, testA = the GTA triplet")
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ds_gta_cycle/gta2city"
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    build(out, n_rep)
