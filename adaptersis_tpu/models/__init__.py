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
from .masktrans import MaskTransformer
from .segmentor import AdapterSegmentor
from .tap_segmentor import TapSegmentor, UNetFuse
from .unet_parts import FeatureUNet
from .vit import ARCHS, DinoVisionTransformer, build_backbone, vit_base, vit_giant2, vit_large, vit_small
