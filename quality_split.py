#!/usr/bin/env python
"""Build the 80/20 held-out re-split of the reference city fixture
(VERDICT r4 item 5): every QUALITY.md claim previously rode the
fixture's 6-image testA (the reference's own eval glob, model.py:312);
this carves a >=20-image held-out eval from the 100 train triplets so
the headline OA/IoU and the sharpening-spike stability claims rest on a
real eval set.

Same split convention as data/prepare_data.py (random.Random(seed)
shuffle of the filename-paired list); symlinked, no copies.  All three
parallel dirs (img / _seg / _seg_class) stay filename-aligned.

    python quality_split.py [out_root] [n_test] [seed]
"""

import os
import random
import sys


def build(src: str, out: str, n_test: int = 20, seed: int = 0):
    names = sorted(os.listdir(os.path.join(src, "trainA")))
    assert len(names) > n_test, (len(names), n_test)
    random.Random(seed).shuffle(names)
    test, train = names[:n_test], names[n_test:]
    for split, files in (("trainA", train), ("testA", test)):
        for sub in ("", "_seg", "_seg_class"):
            d = os.path.join(out, split + sub)
            os.makedirs(d, exist_ok=True)
            for nm in files:
                tgt = os.path.join(src, "trainA" + sub, nm)
                assert os.path.exists(tgt), tgt
                link = os.path.join(d, nm)
                if not os.path.lexists(link):
                    os.symlink(tgt, link)
    print(f"{out}: {len(train)} train / {len(test)} held-out eval "
          f"(seed {seed})")
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ds_city80/city"
    n_test = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    build("/root/reference/datasets/city", out, n_test, seed)
