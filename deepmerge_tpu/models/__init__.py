from deepmerge_tpu.models.s2former import (  # noqa: F401
    S2Former,
    build_model,
    rel_pos_index,
    rel_pos_index_extra_token,
)
