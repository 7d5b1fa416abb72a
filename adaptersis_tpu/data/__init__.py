from .augment import train_augment, val_preprocess
from .clahe import clahe_rgb
from .datasets import DATASETS, AutoLaparo, CholecSeg8k, EndoVis2017, EndoVis2018, Robomis, SegDataset, SyntheticSeg
from .imagenet import ImageFolderDataset, ImageNet, ImageNetSplit
from .imagenet22k import ImageNet22k
from .loader import DataLoader
from .samplers import EpochSampler, InfiniteSampler, ShardedInfiniteSampler
