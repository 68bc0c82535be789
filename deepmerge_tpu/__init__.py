"""deepmerge_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for object-based
remote-sensing image segmentation by learned region merging.

Re-designed from scratch with the capabilities of lvxianwei/DeepMerge
(reference layout documented in SURVEY.md): GDAL-equivalent raster/vector
ingestion, multi-scale patch extraction as array ops, the S2Former
("shift-scale" transformer) model family, contrastive pair training, batched
region-embedding extraction, RAG edge scoring, and an iterative merge engine.
"""

__version__ = "0.1.0"

from deepmerge_tpu.config import Config, ModelConfig, TrainConfig, DataConfig  # noqa: F401
