from .images import (imread, imsave, merge, inverse_transform, save_images,
                     get_img, one_hot)

__all__ = ["imread", "imsave", "merge", "inverse_transform", "save_images",
           "get_img", "one_hot"]
