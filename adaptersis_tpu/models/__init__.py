from .adapters import CACNN, CAViT, DWConv, ConvFFN, deform_inputs, get_reference_points
from .decoders import (
    ConvBlock,
    DecoderMLA,
    DecoderSETR,
    DecoderSETRF,
    DecoderUNet,
    FCUUp,
    FeatureDecoder,
    FusionModel,
    MLAHead,
)
from .encoders import FeatureEncoder
from .segmentor import AdapterSegmentor
from .vit import ARCHS, DinoVisionTransformer, build_backbone, vit_base, vit_giant2, vit_large, vit_small
