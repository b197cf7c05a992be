#!/usr/bin/env python
"""On-chip check of the eval fake-pull cut (preprocess.fake_u8).

1. Bit-exactness of the device uint8 twin ON THE TPU BACKEND (the
   exhaustive CPU proof covers numpy/XLA:CPU; this pins the VPU's f32
   arithmetic + the compiled op order) against the host
   inverse_transform of the same pulled f32 values.
2. Relay pull time at the eval shape (6, 512, 1024, 3): f32 vs uint8.
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sggan_tpu.data.preprocess import fake_u8
    from sggan_tpu.utils.images import inverse_transform

    shape = (6, 512, 1024, 3)
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), shape,
                                   jnp.float32) * 2.0)
    # boundary-lattice pixels in the mix
    lat = (2.0 * jnp.arange(256, dtype=jnp.float32) / 255.0 - 1.0)
    x = x.at[0, 0, :256, 0].set(lat)
    u8 = fake_u8(x)
    xf = np.asarray(x)
    uu = np.asarray(u8)
    bad = int((uu != inverse_transform(xf)).sum())
    print(f"on-chip bit-exactness: {bad} mismatches / {uu.size}",
          file=sys.stderr)

    # fresh arrays per pull — jax caches the host copy of an already
    # pulled array, so re-pulling x/u8 would time a no-op
    for name, mk in (("f32", lambda k: jnp.tanh(jax.random.normal(
            jax.random.PRNGKey(k), shape, jnp.float32))),
                     ("u8", lambda k: fake_u8(jnp.tanh(jax.random.normal(
                         jax.random.PRNGKey(k), shape, jnp.float32))))):
        arrs = [mk(k) for k in range(1, 4)]
        jax.block_until_ready(arrs)
        t0 = time.perf_counter()
        for a in arrs:
            np.asarray(a)
        dt = (time.perf_counter() - t0) / len(arrs)
        mb = arrs[0].size * arrs[0].dtype.itemsize / 1e6
        print(f"pull {name}: {dt:.2f} s for {mb:.0f} MB "
              f"({mb / dt:.1f} MB/s)", file=sys.stderr)
    return bad


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
