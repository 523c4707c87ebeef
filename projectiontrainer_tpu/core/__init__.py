from projectiontrainer_tpu.core.dtypes import DTypePolicy, default_policy
from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh, local_mesh
from projectiontrainer_tpu.core.pytree import (
    path_str,
    tree_paths,
    mask_from_predicate,
    count_params,
    merge_trees,
)
