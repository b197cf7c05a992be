from .preprocess import preprocess_train, preprocess_test, make_preprocess_train
from .loader import Dataset, train_iterator, list_split
from .augment import random_affine_params, affine_warp, augment_pair

__all__ = ["preprocess_train", "preprocess_test", "make_preprocess_train",
           "Dataset", "train_iterator", "list_split",
           "random_affine_params", "affine_warp", "augment_pair"]
