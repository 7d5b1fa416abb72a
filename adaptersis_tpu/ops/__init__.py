from .edt import edt, edt_signed_pair, penalized_distance_map
from .ms_deform_attn import MSDeformAttn, ms_deform_attn_core
from .resize import center_pad, resize_bilinear, resize_nearest, upsample2x
