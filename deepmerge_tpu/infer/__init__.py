from deepmerge_tpu.infer.extract import FeatureExtractor, FeatureStore  # noqa: F401
from deepmerge_tpu.infer.scoring import score_scene_edges, region_embeddings  # noqa: F401
from deepmerge_tpu.infer.merge import (  # noqa: F401
    MergeEngine,
    UnionFind,
    merge_scene,
    merge_scene_device,
)
