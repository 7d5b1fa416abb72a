from .mesh import get_mesh, shard_batch, replicate_tree, fsdp_shard_params
from .dist import init_distributed, is_main_process, get_world_size, get_rank
