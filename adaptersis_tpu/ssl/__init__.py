from .heads import DINOHead
from .losses import dino_loss, ibot_patch_loss, koleo_loss, sinkhorn_knopp, softmax_center_teacher, update_center
from .masking import MaskingGenerator, collate_masks
from .meta_arch import SSLMetaArch, SSLConfig
