from .scores import (fast_hist, scores, scores_from_hist, hist_device,
                     scores_seg_fake)

__all__ = ["fast_hist", "scores", "scores_from_hist", "hist_device",
           "scores_seg_fake"]
