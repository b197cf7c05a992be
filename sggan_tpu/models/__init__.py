"""Model zoo: the reference's four generators/discriminators, rebuilt as
pure-functional JAX (init, apply) pairs over NHWC arrays.

Selection semantics match the reference (model.py:54-62):
    use_resnet            -> resnet generator + semantic discriminator
    use_pix2pix           -> pix2pix generator + pix2pix discriminator
    default               -> unet generator + semantic discriminator
"""

from . import generator_resnet
from . import generator_unet
from . import generator_pix2pix
from . import discriminator
from . import discriminator_pix2pix


def build(cfg):
    """Return (gen_module, disc_module) per the reference's flag logic."""
    if cfg.use_resnet:
        return generator_resnet, discriminator
    if cfg.use_pix2pix:
        return generator_pix2pix, discriminator_pix2pix
    return generator_unet, discriminator
