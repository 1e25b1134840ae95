from spmm_denseblock_tpu.models.graph import (
    add_self_loops,
    sym_norm_adjacency,
    mean_adjacency,
)
from spmm_denseblock_tpu.models.gnn import (
    MODELS,
    init_gcn,
    gcn_apply,
    init_sage,
    sage_apply,
    init_gin,
    gin_apply,
    init_linear,
    linear,
    init_graph_classifier,
    graph_classifier_apply,
)
from spmm_denseblock_tpu.models.train import (
    masked_cross_entropy,
    accuracy,
    make_train_step,
    make_eval_step,
)
from spmm_denseblock_tpu.models.gat import init_gat, make_gat_apply
from spmm_denseblock_tpu.models.checkpoint import (
    save_checkpoint,
    load_checkpoint,
)
from spmm_denseblock_tpu.models.checkpoint_dist import (
    make_manager,
    save_dist_checkpoint,
    restore_dist_checkpoint,
)

__all__ = [
    "add_self_loops",
    "sym_norm_adjacency",
    "mean_adjacency",
    "MODELS",
    "init_gcn",
    "gcn_apply",
    "init_sage",
    "sage_apply",
    "init_gin",
    "gin_apply",
    "init_linear",
    "linear",
    "init_graph_classifier",
    "graph_classifier_apply",
    "init_gat",
    "make_gat_apply",
    "masked_cross_entropy",
    "accuracy",
    "make_train_step",
    "make_eval_step",
    "save_checkpoint",
    "load_checkpoint",
    "make_manager",
    "save_dist_checkpoint",
    "restore_dist_checkpoint",
]
