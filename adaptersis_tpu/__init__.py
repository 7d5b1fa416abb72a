"""adaptersis_tpu — a TPU-native (JAX/Flax/Pallas) surgical-instrument-segmentation
framework with the capabilities of weimengmeng1999/AdapterSIS.

Reference architecture (see /root/repo/SURVEY.md): a frozen DINOv2 ViT backbone with
multi-scale feature taps, deformable cross-attention adapter blocks (CAViT/CACNN)
interleaved between the last transformer blocks and a CNN spatial-prior encoder, and a
zoo of segmentation decoders and dice-family losses, trained on endoscopy datasets.

This package is a ground-up TPU-first redesign, not a port:
  * one fused jit-compiled train step (backbone activations computed once per stream),
  * XLA-gather / Pallas multi-scale deformable attention (reference uses
    torch grid_sample / the Deformable-DETR CUDA kernel),
  * GSPMD data parallelism over a `jax.sharding.Mesh` (reference: DDP/NCCL),
  * cross-replica BatchNorm for free via global-view batch statistics under jit
    (reference: nn.SyncBatchNorm),
  * on-device image augmentation (reference: albumentations on CPU workers),
  * orbax checkpointing (reference: torch.save dicts).
"""

__version__ = "0.1.0"
