from .color import ColorLossWeights, color_loss, psnr  # noqa: F401
from .patch_metric import ncc_error, ssim_error  # noqa: F401
