from .heads import DINOHead
from .losses import (dino_loss, ibot_patch_loss, ibot_patch_loss_masked,
                     koleo_loss, sinkhorn_knopp, softmax_center_teacher,
                     update_center, update_center_masked)
from .masking import (MaskInfo, MaskingGenerator, collate_masks,
                      collate_masks_with_indices, mask_upperbound)
from .meta_arch import SSLMetaArch, SSLConfig
