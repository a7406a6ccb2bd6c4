from .attention import sdpa, set_default_impl
from .patchify import patchify, unpatchify, normalize_pix_target, masked_mse
from .preprocess import normalize_clip, denormalize_clip, gaussian_blur_nhwc, IMAGENET_MEAN, IMAGENET_STD
