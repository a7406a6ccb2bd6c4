from .layers import (
    ConvBNAct, InvertedResidual, SELayer, MBConv, DropPath, Mlp,
    MultiHeadAttention, TransformerBlock, TransformerEncoder, adaptive_avg_pool_nhwc,
)
from .mobilevit import MobileViTBackbone, MobileViTBlock, build_mobilevit_s
from .tiny_vit import TinyViT, TinyViTBackbone, tiny_vit_21m_variant
from .mae import TinyVideoMAE, TinyViTMAE, MAEDecoder
from .temporal import TemporalSSL
from .classifier import VideoClassifier
from .heads import ClassificationHead, SSLMultiTaskHead
from .dynamic import motion_scores_l1, select_topk_frames, streaming_early_exit, EarlyExitStats
