from .checkpoint import PeriodicCheckpointer, restore_checkpoint, save_checkpoint
from .convert import convert_dinov2_backbone, load_dinov2_backbone_params
from .schedules import cosine_annealing, cosine_scheduler
from .trainer import Trainer, TrainerConfig
